"""Dump .explain("formatted") for named catalog entries.

Usage: python tools/dump_plan.py <out_subdir> <suffix> <query> [query ...]
  e.g. python tools/dump_plan.py r14 after corpus_curation_full

Writes plans/<out_subdir>/<query>_<suffix>.txt.

Env: SPARK_GRAFT_SF_DIR picks the data dir (default
/root/testdata/sf0.01 — NOT the bench sf: entry BUILD eagerly
materializes checkpoint-truncated rungs, so plan dumps at sf0.1 pay the
full span-rung compute just to print a plan, r13 ADVICE; the physical
plan SHAPE is sf-independent)."""

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
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    sub, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    unknown = [n for n in names if n not in catalog.QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(REPO, "plans", sub)
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = catalog.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as f:
            f.write(f"# {name} [{suffix}] sf_dir={sf_dir}\n")
            f.write(buf.getvalue())
        print(f"wrote {p} ({len(buf.getvalue())} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
