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
#   2. then ascending last-driver-green round (stalest first);
#   3. name as the deterministic tie-break.
#
# With N registered entries and a budget of B=50 the driver always
# re-checks the B stalest entries, so worst-case staleness is the
# structural optimum ⌈N/B⌉ − 1 rounds (1 round at N ≤ 100; new
# registrations displace exactly as many oldest-green entries as they
# add).  tools/gen_gate_priority.py prints this order + the staleness
# ledger; tests/test_gate_priority.py asserts the invariants.
GATE_BUDGET = 50


def _last_green_rounds() -> dict[str, int]:
    """name → latest round whose committed CORRECTNESS file shows a
    full pass (rows+schema match, hash not failed, no err)."""
    import glob
    import json
    import re

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


def _gate_order(names):
    # never-checked → -1 → ahead of every checked entry
    return sorted(names, key=lambda n: (_LAST_GREEN.get(n, -1), n))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: catalog.QUERIES[n] for n in _gate_order(catalog.QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: catalog.ORACLES[n] for n in _gate_order(catalog.ORACLES)}
