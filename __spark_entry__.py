"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over geneticalgorithmsusingmapreduce_spark.catalog — every
operator from SURVEY.md §2 is registered there as a (spark_fn, duckdb
oracle) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geneticalgorithmsusingmapreduce_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.entry_flagship(spark)


# The driver's correctness gate verifies entries in queries() iteration
# order and stops at a budget (GATE_BUDGET entries per round).  Order
# therefore encodes priority.  Through r7 this was a hand-rotated list;
# one mis-slotted name would silently age an entry past the freshness
# invariant (r7 VERDICT "What's wrong" #3), and a head of exactly 50
# left new registrations outside the budget (r7 ADVICE).  The order is
# now DERIVED from the committed CORRECTNESS_r*.json files:
#
#   1. never-driver-checked entries first (new registrations must get
#      their first check immediately — they are infinitely stale);
#   2. entries AT the structural staleness limit (⌈N/B⌉−1 rounds since
#      green): skipping one breaks the worst-case bound the rotation
#      exists for, even when a broad refactor floods tier 3;
#   3. entries whose IMPLEMENTATION changed since their last green
#      round (r8 VERDICT #1: staleness-by-last-CHECK alone let an
#      in-round rewrite ship ungated), stalest-green first;
#   4. unchanged entries by ascending last-green round;
#   name as the deterministic tie-break throughout.
#
# "Implementation changed" is detected by a content FINGERPRINT: a hash
# over the entry's registered function source, its oracle SQL (baked at
# import, so helper-SQL changes surface in it), and the transitive
# closure of package modules / catalog helpers the function references.
# GATE_LEDGER.json records each entry's fingerprint as of its last
# driver-green round; tools/gen_gate_priority.py --update-ledger
# refreshes it at round START (before any code is touched, so the
# recorded fingerprint is exactly the code the driver just tested).
# The ledger's optional "_force_head" list is the manual escape hatch
# for rewrites the fingerprint can't see (e.g. a semantic change in a
# data fixture outside the package).
#
# With N registered entries and a budget of B=50 the driver always
# re-checks the B stalest entries, so worst-case staleness is the
# structural optimum ⌈N/B⌉ − 1 rounds (1 round at N ≤ 100; new
# registrations displace exactly as many oldest-green entries as they
# add).  tools/gen_gate_priority.py prints this order + the staleness
# ledger; tests/test_gate_priority.py asserts the invariants.
GATE_BUDGET = 50
_LEDGER_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "GATE_LEDGER.json"
)


def _last_green_rounds(here: str | None = None) -> dict[str, int]:
    """name → latest round whose committed CORRECTNESS file shows a
    full pass (rows+schema match, hash not failed, no err).  ``here``
    overrides the scan directory (tests simulate the round boundary by
    pointing it at a copy with a freshly-dropped CORRECTNESS file)."""
    import glob
    import json
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(f) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, v in rows.items():
            if (
                v.get("err") is None
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") is not False
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


_LAST_GREEN = _last_green_rounds()


# per-process module-file digest cache: fingerprinting all ~110 ledger
# entries at import re-reads the same dozen module files hundreds of
# times without it (review finding: ~1.1 s per import, ~10× cuttable)
_MODULE_DIGESTS: dict[str, bytes] = {}


def _module_digest(path: str) -> bytes | None:
    if path not in _MODULE_DIGESTS:
        import hashlib

        try:
            with open(path, "rb") as fh:
                _MODULE_DIGESTS[path] = hashlib.sha256(fh.read()).digest()
        except OSError:
            return None
    return _MODULE_DIGESTS[path]


def entry_fingerprint(name: str) -> str:
    """Content fingerprint of a registered entry: sha256 over the entry
    function's source, its oracle SQL, and the transitive closure of
    package modules (whole-file digest) and catalog-local helper
    functions (per-function source) it references.  Module granularity
    bounds the blast radius: editing operators/selection.py
    re-fingerprints the handful of selection entries, not all 100+.

    References are resolved through BOTH the function's globals
    (co_names) and its own import statements (AST walk of the source —
    review finding: catalog entries dominantly import their
    implementation modules function-locally, e.g. ``from .streaming
    import neardup``, which never appears in __globals__; without the
    AST pass a rewrite of streaming/neardup.py would ship ungated,
    the exact r8 failure mode this feature closes)."""
    import ast
    import hashlib
    import importlib
    import inspect
    import textwrap
    import types

    pkg = catalog.__name__.rsplit(".", 1)[0]
    h = hashlib.sha256()
    seen_mods: set[str] = set()
    seen_fns: set[int] = set()

    def add_module(mod: types.ModuleType) -> None:
        f = getattr(mod, "__file__", None)
        if not f or mod.__name__ in seen_mods:
            return
        seen_mods.add(mod.__name__)
        d = _module_digest(f)
        if d is None:
            return
        h.update(d)
        for v in vars(mod).values():
            if isinstance(v, types.ModuleType) and v.__name__.startswith(pkg):
                add_module(v)

    def add_local_imports(fn, src: str) -> None:
        """Resolve the function's own import statements to package
        modules (function-local imports are invisible in __globals__)."""
        base = getattr(fn, "__module__", "") or ""
        try:
            tree = ast.parse(textwrap.dedent(src))
        except SyntaxError:
            return
        targets: set[str] = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module is not None:
                if node.level:  # relative: resolve against fn's module
                    parts = base.split(".")
                    anchor = ".".join(parts[: len(parts) - node.level])
                    modname = f"{anchor}.{node.module}" if anchor else None
                else:
                    modname = node.module
                if modname and modname.startswith(pkg):
                    targets.add(modname)
                    # `from X import Y` where Y is itself a submodule
                    for alias in node.names:
                        targets.add(f"{modname}.{alias.name}")
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.startswith(pkg):
                        targets.add(alias.name)
        for modname in targets:
            try:
                add_module(importlib.import_module(modname))
            except ImportError:
                continue  # `from X import Y` with Y a non-module member

    def add_fn(fn) -> None:
        fn = inspect.unwrap(fn)
        if id(fn) in seen_fns:
            return
        seen_fns.add(id(fn))
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            return
        h.update(src.encode())
        add_local_imports(fn, src)
        g = getattr(fn, "__globals__", {})
        for nm in fn.__code__.co_names:
            v = g.get(nm)
            if isinstance(v, types.ModuleType) and v.__name__.startswith(pkg):
                add_module(v)
            elif isinstance(v, types.FunctionType) and getattr(
                v, "__module__", ""
            ).startswith(pkg):
                add_fn(v)

    add_fn(catalog.QUERIES[name])
    h.update((catalog.ORACLES.get(name) or "").encode())
    return h.hexdigest()[:16]


def _load_ledger() -> dict:
    import json

    try:
        with open(_LEDGER_PATH) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _changed_since_green() -> set[str]:
    """Entries whose current fingerprint differs from the one recorded at
    their last driver-green round (plus the ledger's explicit
    _force_head names).  Absent-from-ledger entries are assumed
    unchanged — the ledger accumulates from r9 on; never-checked
    entries already rank first without fingerprint evidence.  Any
    fingerprinting error degrades to 'unchanged' (staleness ordering
    still applies) rather than failing the driver's queries() call."""
    ledger = _load_ledger()
    changed = set(ledger.get("_force_head", []))
    for name, rec in ledger.items():
        if name.startswith("_") or name not in catalog.QUERIES:
            continue
        try:
            if entry_fingerprint(name) != rec.get("fp"):
                changed.add(name)
        except Exception:
            continue
    # Round-boundary window (r9 VERDICT #1): between the driver dropping
    # CORRECTNESS_r{N}.json and the next round's --update-ledger, a
    # first-time-green entry has a green row but no ledger fingerprint.
    # Treating it as unchanged would silently disable its re-gating —
    # rank it changed until the ledger absorbs it at round start.
    for name in _LAST_GREEN:
        if name in catalog.QUERIES and name not in ledger:
            changed.add(name)
    return changed


_CHANGED = _changed_since_green()


def _gate_order(names):
    # Four tiers: never-checked first (a new registration MUST get its
    # first check — there are always few); then entries AT the
    # structural staleness limit (⌈N/B⌉−1 rounds since green — skipping
    # one would break the worst-case-staleness bound the rotation
    # exists for, and a broad refactor can flood the changed tier past
    # the budget: r9 re-fingerprinted 54/110 and would have pushed the
    # three r6-green entries to 3-round staleness); then
    # changed-since-green (stalest-green first); then unchanged by
    # staleness.
    import math

    max_green = max(_LAST_GREEN.values(), default=0)
    n, b = len(names), GATE_BUDGET
    limit = max_green - (math.ceil(n / b) - 1)

    def key(name):
        lg = _LAST_GREEN.get(name)
        if lg is None:
            return (0, 0, name)
        if lg <= limit:
            return (1, lg, name)
        if name in _CHANGED:
            return (2, lg, name)
        return (3, lg, name)

    return sorted(names, key=key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: catalog.QUERIES[n] for n in _gate_order(catalog.QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: catalog.ORACLES[n] for n in _gate_order(catalog.ORACLES)}
