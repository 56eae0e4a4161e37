"""Same-phase A/B: r8 dedup-then-derive tournament vs r9 bucket-stored.

One session, strictly alternating runs at each sf dir — the box's 2-4x
phase variance makes cross-session comparisons meaningless (BASELINE
comparator discipline). Prints one JSON line.

    python tools/ab_tournament_store.py [sf_dir ...] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark import catalog  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.operators import (  # noqa: E402
    selection as selection_ops,
    shuffle as shuffle_ops,
)
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def r8_shape(spark, sf_dir):
    sh = shuffle_ops.with_shuffle_key(
        catalog._pop_with_fitness(spark, sf_dir),
        catalog.SEED * 1_000_033, n_buckets=32,
    )
    return selection_ops.tournament_parents(
        sh, genome_df=catalog._pop_genomes_unique(spark, sf_dir)
    )


def r9_shape(spark, sf_dir):
    # the registered entry, store write included (unsorted)
    sh = shuffle_ops.with_shuffle_key(
        catalog._pop_with_fitness(spark, sf_dir),
        catalog.SEED * 1_000_033, n_buckets=32,
    )
    out = selection_ops.tournament_parents(
        sh, genome_df=catalog._pop_genome_store(spark, sf_dir)
    )
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    sf_dirs = args or [f"{REPO}/.localdata/sf10"]
    spark = build_session("gamr-ab-store")
    spark.sparkContext.setLogLevel("ERROR")
    from geneticalgorithmsusingmapreduce_spark import runtime

    out = {"runs": runs, "dirs": {}}
    for sf in sf_dirs:
        rec = {"r8": [], "r9": []}
        for _ in range(runs):
            for tag, fn in (("r8", r8_shape), ("r9", r9_shape)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                noop(fn(spark, sf))
                rec[tag].append(round(time.perf_counter() - t0, 2))
                runtime.release_cleanups()
                import gc

                gc.collect()
                spark.sparkContext._jvm.System.gc()
        rec["r8_min"] = min(rec["r8"])
        rec["r9_min"] = min(rec["r9"])
        out["dirs"][sf] = rec
        print(json.dumps({sf: rec}), flush=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
