"""Print the derived correctness-gate order + staleness ledger.

The gate order used by ``__spark_entry__.queries()`` is computed from
the committed ``CORRECTNESS_r*.json`` files (never-checked entries
first, then ascending last-driver-green round) — see the rationale in
``__spark_entry__.py``.  This tool makes the derivation inspectable:

    python tools/gen_gate_priority.py            # full order
    python tools/gen_gate_priority.py --head     # the 50 gated this round

Columns: position, entry name, last driver-green round ('never' for new
registrations), and whether the entry lands inside this round's budget.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    head_only = "--head" in sys.argv
    names = entry._gate_order(entry.catalog.QUERIES)
    budget = entry.GATE_BUDGET
    for i, n in enumerate(names):
        if head_only and i >= budget:
            break
        lg = entry._LAST_GREEN.get(n)
        mark = "GATE" if i < budget else "tail"
        print(f"{i + 1:4d}  {mark}  last_green={lg if lg else 'never':>5}  {n}")
    n_new = sum(1 for n in names if n not in entry._LAST_GREEN)
    print(
        f"# {len(names)} entries, budget {budget}, "
        f"{n_new} never-checked (all inside the budget: "
        f"{all(names.index(n) < budget for n in names if n not in entry._LAST_GREEN)})",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
