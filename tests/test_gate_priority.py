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
    # entry, and there must be room for them inside the budget
    names = _order()
    new = [n for n in names if n not in entry._LAST_GREEN]
    checked = [n for n in names if n in entry._LAST_GREEN]
    assert len(new) <= entry.GATE_BUDGET
    if new and checked:
        assert max(names.index(n) for n in new) < min(
            names.index(n) for n in checked
        )


def test_stalest_entries_fill_the_gate_head():
    # the driver checks the first GATE_BUDGET entries: they must be
    # exactly the stalest ones — no checked entry in the head may be
    # fresher than any checked entry in the tail
    names = _order()
    budget = entry.GATE_BUDGET
    head = [entry._LAST_GREEN[n] for n in names[:budget] if n in entry._LAST_GREEN]
    tail = [entry._LAST_GREEN[n] for n in names[budget:] if n in entry._LAST_GREEN]
    if head and tail:
        assert max(head) <= min(tail)


def test_worst_case_staleness_is_structural_optimum():
    # simulate future rounds: every round greens its head-of-budget; no
    # entry may go unchecked for more than ceil(N / budget) rounds
    import math

    names = _order()
    budget = entry.GATE_BUDGET
    n_rounds = math.ceil(len(names) / budget)
    last = dict(entry._LAST_GREEN)
    this_round = max(last.values()) + 1
    seen = set()
    for rnd in range(this_round, this_round + n_rounds):
        order = sorted(names, key=lambda n: (last.get(n, -1), n))
        for n in order[:budget]:
            last[n] = rnd
            seen.add(n)
    assert seen == set(names)


def test_derivation_reads_committed_rounds():
    # sanity: the committed history contains r7 greens and nothing newer
    assert entry._LAST_GREEN, "no CORRECTNESS files found"
    assert max(entry._LAST_GREEN.values()) >= 7
