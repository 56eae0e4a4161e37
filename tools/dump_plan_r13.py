"""Dump .explain("formatted") for named catalog entries to plans/r13/.

Usage: python tools/dump_plan_r13.py <suffix> <query> [query ...]
Writes plans/r13/<query>_<suffix>.txt (suffix = before|after).
"""

from __future__ import annotations

import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from contextlib import redirect_stdout

from geneticalgorithmsusingmapreduce_spark import catalog  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("dump-plan-r13")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = catalog.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {p} ({len(buf.getvalue())} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
