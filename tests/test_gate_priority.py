"""The correctness-gate order is DERIVED, and its invariants hold.

r7 VERDICT "What's wrong" #3 / "Next round" #6: a hand-maintained
100-name priority list has a silent failure mode (one mis-slotted name
ages an entry past the freshness invariant).  The order is now computed
from the committed CORRECTNESS_r*.json files; these tests pin the
properties the rotation exists for, so a regression in the derivation
fails CI rather than silently skipping an entry for a round.
"""

from __future__ import annotations

import __spark_entry__ as entry
from geneticalgorithmsusingmapreduce_spark import catalog


def _order():
    return entry._gate_order(catalog.QUERIES)


def test_every_registered_entry_is_ordered_once():
    names = _order()
    assert sorted(names) == sorted(catalog.QUERIES)
    assert len(names) == len(set(names))


def test_never_checked_entries_lead_and_fit_in_budget():
    # r7 ADVICE: a new registration must get its FIRST driver check the
    # round it lands — never-checked entries sort ahead of every checked
    # entry (changed or not), and there must be room for them inside
    # the budget
    names = _order()
    new = [n for n in names if n not in entry._LAST_GREEN]
    checked = [n for n in names if n in entry._LAST_GREEN]
    assert len(new) <= entry.GATE_BUDGET
    if new and checked:
        assert max(names.index(n) for n in new) < min(
            names.index(n) for n in checked
        )


def _staleness_limit():
    import math

    max_green = max(entry._LAST_GREEN.values(), default=0)
    return max_green - (
        math.ceil(len(catalog.QUERIES) / entry.GATE_BUDGET) - 1
    )


def test_changed_entries_sort_before_fresh_unchanged_stalest_first():
    # r8 VERDICT #1: an in-round rewrite re-verifies before any
    # fresh-green unchanged entry (entries AT the structural staleness
    # limit have their own higher tier — skipping one would break the
    # worst-case bound); within the changed tier the stalest-green
    # lead (their hard signal is oldest)
    names = _order()
    limit = _staleness_limit()
    changed = [
        n for n in names
        if n in entry._CHANGED and entry._LAST_GREEN.get(n, 99) > limit
    ]
    fresh_unchanged = [
        n for n in names
        if n in entry._LAST_GREEN and n not in entry._CHANGED
        and entry._LAST_GREEN[n] > limit
    ]
    if changed and fresh_unchanged:
        assert max(names.index(n) for n in changed) < min(
            names.index(n) for n in fresh_unchanged
        )
    greens = [entry._LAST_GREEN[n] for n in changed]
    assert greens == sorted(greens)


def test_at_limit_entries_never_displaced_past_budget():
    # the r9 regression this pins: 54 changed entries would have pushed
    # the three r6-green (already 2-round-stale) entries past the
    # budget into 3-round staleness — at-limit entries rank right after
    # never-checked, inside the budget
    names = _order()
    limit = _staleness_limit()
    at_limit = [
        n for n in names
        if n in entry._LAST_GREEN and entry._LAST_GREEN[n] <= limit
    ]
    for n in at_limit:
        assert names.index(n) < entry.GATE_BUDGET, n


def test_stalest_entries_fill_the_gate_head():
    # among UNCHANGED checked entries, the head must be exactly the
    # stalest ones — no unchanged entry in the head may be fresher than
    # any unchanged entry in the tail (changed entries have their own
    # tier and may legitimately be fresh-green yet head-ranked)
    names = _order()
    budget = entry.GATE_BUDGET
    head = [
        entry._LAST_GREEN[n] for n in names[:budget]
        if n in entry._LAST_GREEN and n not in entry._CHANGED
    ]
    tail = [
        entry._LAST_GREEN[n] for n in names[budget:]
        if n in entry._LAST_GREEN and n not in entry._CHANGED
    ]
    if head and tail:
        assert max(head) <= min(tail)


def test_worst_case_staleness_is_structural_optimum():
    # simulate future rounds with the TIERED key (a re-greened entry
    # leaves the changed tier — its fingerprint is re-recorded at the
    # next round start): every round greens its head-of-budget; no
    # entry may go unchecked for more than ceil(N / budget) rounds
    import math

    names = _order()
    budget = entry.GATE_BUDGET
    n_rounds = math.ceil(len(names) / budget)
    last = dict(entry._LAST_GREEN)
    changed = set(entry._CHANGED)
    this_round = max(last.values()) + 1
    seen = set()
    for rnd in range(this_round, this_round + n_rounds):
        limit = max(last.values()) - (n_rounds - 1)

        def key(n):
            if n not in last:
                return (0, 0, n)
            if last[n] <= limit:
                return (1, last[n], n)
            if n in changed:
                return (2, last[n], n)
            return (3, last[n], n)

        order = sorted(names, key=key)
        for n in order[:budget]:
            last[n] = rnd
            changed.discard(n)
            seen.add(n)
    assert seen == set(names)


def test_derivation_reads_committed_rounds():
    # sanity: the committed history contains r7 greens and nothing newer
    assert entry._LAST_GREEN, "no CORRECTNESS files found"
    assert max(entry._LAST_GREEN.values()) >= 7


# --- content-fingerprint re-gating (r8 VERDICT #1 / ADVICE) --------------

def test_fingerprint_is_deterministic_and_distinguishes_entries():
    a1 = entry.entry_fingerprint("sga_tournament")
    a2 = entry.entry_fingerprint("sga_tournament")
    b = entry.entry_fingerprint("text_fingerprint")
    assert a1 == a2
    assert a1 != b


def test_fingerprint_covers_function_local_imports():
    # review finding (r9): catalog entries dominantly import their
    # implementation modules FUNCTION-locally (`from .streaming import
    # neardup as nd_stream`), which never appears in __globals__ — the
    # AST pass must resolve them, or a rewrite of those modules ships
    # ungated (the exact r8 #1 failure mode)
    def covered(name):
        paths = set()
        orig = entry._module_digest

        def spy(p):
            paths.add(p)
            return orig(p)

        entry._module_digest = spy
        try:
            entry.entry_fingerprint(name)
        finally:
            entry._module_digest = orig
        return paths

    for name, want in [
        ("streaming_neardup", "streaming/neardup.py"),
        ("streaming_neardup_guarded", "streaming/neardup.py"),
        ("emb_ivf_append_int8", "streaming/ivf_append.py"),
        ("incremental_sga", "streaming/incremental.py"),
        ("sga_tournament", "operators/selection.py"),
    ]:
        assert any(want in p for p in covered(name)), (name, want)


def _ledger_max_round(ledger):
    return max(
        (
            rec.get("round", 0)
            for name, rec in ledger.items()
            if not name.startswith("_") and isinstance(rec, dict)
        ),
        default=0,
    )


def test_committed_ledger_covers_every_checked_entry():
    # the round-start refresh must leave no green entry unfingerprinted —
    # an absent row would otherwise disable re-gating.  Scoped to rounds
    # the ledger has ABSORBED (r9 VERDICT #1): the ledger updates at
    # round start by design, so entries first-green in a newer
    # CORRECTNESS file are legitimately pending — _changed_since_green
    # ranks those into the changed tier instead (pinned below).
    ledger = entry._load_ledger()
    lmax = _ledger_max_round(ledger)
    for name, green in entry._LAST_GREEN.items():
        if name in catalog.QUERIES and green <= lmax:
            assert name in ledger, f"{name} green but not in GATE_LEDGER.json"
            assert ledger[name].get("fp"), name


def test_pending_absorption_entries_rank_changed():
    # the flip side of the scoped coverage test: a green entry the
    # ledger hasn't absorbed yet must land in the changed tier, never
    # silently-unchanged
    pending = [
        n for n in entry._LAST_GREEN
        if n in catalog.QUERIES and n not in entry._load_ledger()
    ]
    for n in pending:
        assert n in entry._CHANGED, n


def test_touched_entry_jumps_to_gate_head(monkeypatch, tmp_path):
    # simulate an in-round rewrite of a FRESH (latest-green, tail-ranked)
    # entry: corrupt its ledger fingerprint and assert the derived order
    # ranks it ahead of every unchanged checked entry
    import json

    # derive the probe from the ledger's own max round (r9 VERDICT #1:
    # hardcoding a latest-green name broke the moment the driver dropped
    # a newer CORRECTNESS file that didn't include it)
    ledger = entry._load_ledger()
    lmax = _ledger_max_round(ledger)
    name = min(
        n for n, rec in ledger.items()
        if not n.startswith("_") and isinstance(rec, dict)
        and rec.get("round") == lmax and n in catalog.QUERIES
    )
    ledger[name] = {"round": ledger[name]["round"], "fp": "0" * 16}
    p = tmp_path / "ledger.json"
    p.write_text(json.dumps(ledger))
    monkeypatch.setattr(entry, "_LEDGER_PATH", str(p))
    changed = entry._changed_since_green()
    assert name in changed
    monkeypatch.setattr(entry, "_CHANGED", changed)
    order = entry._gate_order(catalog.QUERIES)
    limit = _staleness_limit()
    fresh_unchanged = [
        n for n in order
        if n in entry._LAST_GREEN and n not in changed
        and entry._LAST_GREEN[n] > limit
    ]
    assert order.index(name) < min(order.index(n) for n in fresh_unchanged)


def test_force_head_escape_hatch(monkeypatch, tmp_path):
    import json

    name = "skew_salted_revenue"
    ledger = entry._load_ledger()
    ledger["_force_head"] = [name]
    p = tmp_path / "ledger.json"
    p.write_text(json.dumps(ledger))
    monkeypatch.setattr(entry, "_LEDGER_PATH", str(p))
    changed = entry._changed_since_green()
    assert name in changed
    monkeypatch.setattr(entry, "_CHANGED", changed)
    order = entry._gate_order(catalog.QUERIES)
    limit = _staleness_limit()
    fresh_unchanged = [
        n for n in order
        if n in entry._LAST_GREEN and n not in changed
        and entry._LAST_GREEN[n] > limit
    ]
    assert order.index(name) < min(order.index(n) for n in fresh_unchanged)


def test_boundary_fresh_correctness_drop_keeps_suite_green(
    monkeypatch, tmp_path
):
    # r9 VERDICT #1, the exact scenario: the driver drops a fresh
    # CORRECTNESS_r{N+1}.json (greening this round's gate head) BEFORE
    # the next round's --update-ledger absorbs it.  Every invariant in
    # this file must hold in that state — the suite may never be red at
    # the round boundary.
    import json
    import os
    import shutil

    here = os.path.dirname(os.path.abspath(entry.__file__))
    import glob as globmod

    for f in globmod.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        shutil.copy(f, tmp_path)
    new_round = max(entry._LAST_GREEN.values()) + 1
    head = entry._gate_order(catalog.QUERIES)[: entry.GATE_BUDGET]
    fake = {
        n: {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "spark_rows": 1,
            "oracle_rows": 1,
            "err": None,
        }
        for n in head
    }
    (tmp_path / f"CORRECTNESS_r{new_round}.json").write_text(
        json.dumps(fake)
    )
    monkeypatch.setattr(
        entry, "_LAST_GREEN", entry._last_green_rounds(str(tmp_path))
    )
    monkeypatch.setattr(entry, "_CHANGED", entry._changed_since_green())
    test_every_registered_entry_is_ordered_once()
    test_never_checked_entries_lead_and_fit_in_budget()
    test_changed_entries_sort_before_fresh_unchanged_stalest_first()
    test_at_limit_entries_never_displaced_past_budget()
    test_stalest_entries_fill_the_gate_head()
    test_worst_case_staleness_is_structural_optimum()
    test_committed_ledger_covers_every_checked_entry()
    test_pending_absorption_entries_rank_changed()


def test_unchanged_codebase_reports_no_changes():
    # with the committed ledger and the committed code in agreement,
    # nothing should rank as changed at round start... but entries this
    # ROUND touches will legitimately appear here mid-round (a broad
    # refactor of a shared module re-fingerprints its whole family), so
    # only assert the mechanism isn't wholesale-firing (a bug in the
    # fingerprint walk would flip EVERYTHING to changed at once)
    assert len(entry._CHANGED) < 0.8 * len(catalog.QUERIES)
