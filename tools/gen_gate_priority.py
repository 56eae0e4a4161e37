"""Print the derived correctness-gate order + staleness ledger.

The gate order used by ``__spark_entry__.queries()`` is computed from
the committed ``CORRECTNESS_r*.json`` files plus a content-fingerprint
ledger (never-checked OR changed-since-last-green entries first, then
ascending last-driver-green round) — see the rationale in
``__spark_entry__.py``.  This tool makes the derivation inspectable and
maintains the ledger:

    python tools/gen_gate_priority.py                  # full order
    python tools/gen_gate_priority.py --head           # the 50 gated this round
    python tools/gen_gate_priority.py --update-ledger  # refresh GATE_LEDGER.json

--update-ledger must run at round START, before any code is edited:
for every entry whose last-green round advanced since the ledger was
written, it records the CURRENT fingerprint — which at round start is
exactly the code the driver just tested.  It also drops _force_head
names that have been re-greened.

Columns: position, entry name, last driver-green round ('never' for new
registrations, 'CHANGED' when the implementation moved since the last
green), and whether the entry lands inside this round's budget.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entry  # noqa: E402


def update_ledger() -> None:
    ledger = entry._load_ledger()
    force = set(ledger.get("_force_head", []))
    n_new = n_kept = 0
    for name in sorted(entry.catalog.QUERIES):
        lg = entry._LAST_GREEN.get(name)
        if lg is None:
            continue
        rec = ledger.get(name)
        if rec is not None and rec.get("round", -1) >= lg:
            n_kept += 1
            continue
        ledger[name] = {"round": lg, "fp": entry.entry_fingerprint(name)}
        force.discard(name)  # just re-greened → force no longer needed
        n_new += 1
    # drop ledger rows for unregistered (renamed/retired) entries
    for name in [n for n in ledger if not n.startswith("_")]:
        if name not in entry.catalog.QUERIES:
            del ledger[name]
    ledger["_force_head"] = sorted(force)
    with open(entry._LEDGER_PATH, "w") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"ledger: {n_new} fingerprints recorded/refreshed, {n_kept} kept, "
        f"{len(force)} force-head -> {entry._LEDGER_PATH}"
    )


def main() -> None:
    if "--update-ledger" in sys.argv:
        update_ledger()
        return
    head_only = "--head" in sys.argv
    names = entry._gate_order(entry.catalog.QUERIES)
    budget = entry.GATE_BUDGET
    for i, n in enumerate(names):
        if head_only and i >= budget:
            break
        lg = entry._LAST_GREEN.get(n)
        mark = "GATE" if i < budget else "tail"
        state = (
            "CHANGED" if n in entry._CHANGED
            else (lg if lg else "never")
        )
        print(f"{i + 1:4d}  {mark}  last_green={state:>7}  {n}")
    n_new = sum(1 for n in names if n not in entry._LAST_GREEN)
    n_chg = len(entry._CHANGED)
    print(
        f"# {len(names)} entries, budget {budget}, "
        f"{n_new} never-checked, {n_chg} changed-since-green "
        f"(all inside the budget: "
        f"{all(names.index(n) < budget for n in names if n not in entry._LAST_GREEN or n in entry._CHANGED)})",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
