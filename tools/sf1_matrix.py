"""Assemble the sf1 validation matrix (r5 VERDICT #3) from a
check_correctness sweep log into a markdown table — one row per
registered entry (the table is computed from catalog.QUERIES, so the
row count tracks registrations), zero blank cells.

Usage: python tools/sf1_matrix.py /tmp/sf1_sweep.log
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark import catalog  # noqa: E402

PASS_RE = re.compile(
    r"PASS (\w+) \((\d+) rows, ([\d.]+)s \[spark ([\d.]+) duck ([\d.]+)\]"
)


def main() -> None:
    log = sys.argv[1]
    rows: dict[str, list] = {}
    mode = "full"
    for line in open(log):
        if line.startswith("=="):
            mode = "surrogate" if "surrogate" in line else "full"
            continue
        m = PASS_RE.match(line.strip())
        if m:
            name, n, tot, sp, du = m.groups()
            # a later full row overrides an earlier surrogate row
            prev = rows.get(name)
            if prev is None or (prev[0] == "surrogate" and mode == "full"):
                rows[name] = [mode, int(n), float(sp), float(du)]
            elif prev[0] == mode:
                rows[name] = [mode, int(n), float(sp), float(du)]
    missing = [n for n in catalog.QUERIES if n not in rows]
    print("| entry | sf1 check | rows | spark s | duck s |")
    print("|---|---|---|---|---|")
    for n in sorted(catalog.QUERIES):
        if n in rows:
            mode, cnt, sp, du = rows[n]
            tag = "full hash" if mode == "full" else "surrogate hash (1/11 orders)"
            print(f"| {n} | {tag} | {cnt} | {sp} | {du} |")
        else:
            print(f"| {n} | NOT RUN | — | — | — |")
    print()
    full = sum(1 for v in rows.values() if v[0] == "full")
    sur = sum(1 for v in rows.values() if v[0] == "surrogate")
    print(
        f"{len(rows)}/{len(catalog.QUERIES)} green at sf1 "
        f"({full} full, {sur} surrogate); missing: {missing or 'none'}"
    )


if __name__ == "__main__":
    main()
