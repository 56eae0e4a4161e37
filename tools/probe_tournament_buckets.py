"""r7 probe: the applyInPandas tournament (W3) at a POPULATION-SIZED
bucket count (shuffle.buckets_for_pop), after the fixed n_buckets=32
fixture OOM-killed the worker at sf100 (171M individuals → 5.3M-row
pandas groups).

Two facts measured, one process each side:
  1. sf10 parity: the window form (W1) and the pandas form (W3) must be
     row-identical at the sized bucket count too (the gate pins 32; the
     dial must not change semantics at 256).
  2. sf10 + sf100 timing of W3 at buckets_for_pop(pop) — the row the
     sf100 matrix cites for the sized config (alias
     `tournament_pandas_sized`).

Usage: python tools/probe_tournament_buckets.py [sf10_dir sf100_dir]
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
    selection as selection_ops, shuffle as shuffle_ops,
)
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def sized_w3(spark, sf_dir, n_buckets):
    sh = shuffle_ops.with_shuffle_key(
        catalog._pop_with_fitness(spark, sf_dir),
        catalog.SEED * 1_000_033, n_buckets=n_buckets,
    )
    return selection_ops.tournament_parents_pandas(sh)


def sized_w1(spark, sf_dir, n_buckets):
    sh = shuffle_ops.with_shuffle_key(
        catalog._pop_with_fitness(spark, sf_dir),
        catalog.SEED * 1_000_033, n_buckets=n_buckets,
    )
    # r8 ADVICE: the lineitem fixture repeats ~24% of iids — default
    # unique_ids=True would fan out duplicate winner rows in the genome
    # join-back and fail the W1/W3 parity assert spuriously (the shipped
    # fixtures violate the duplicate-id contract; .localdata happens not
    # to). Mirror the catalog entry: id-unique derive-after-dedup lookup.
    return selection_ops.tournament_parents(
        sh, genome_df=catalog._pop_genomes_unique(spark, sf_dir)
    )


def main() -> None:
    # accepts 0, 1, or 2 positional dirs (r7 ADVICE: the old
    # `argv[1] if len(argv) > 2` silently ignored a single argument)
    sf10 = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.localdata/sf10"
    sf100 = sys.argv[2] if len(sys.argv) > 2 else f"{REPO}/.localdata/sf100"
    spark = build_session("gamr-probe-w3-buckets")
    spark.sparkContext.setLogLevel("ERROR")

    n10 = catalog._pop_with_fitness(spark, sf10).count()
    b10 = shuffle_ops.buckets_for_pop(n10)
    # parity at the SIZED count — the configuration the sf100 matrix
    # actually cites (r7 ADVICE: a hard-coded 256 verified a setting
    # nothing runs) — plus 512, the sf100-sized count
    for nb in sorted({b10, 512}):
        w1 = sized_w1(spark, sf10, nb).select(
            "part", "pos", "parent", "parent_fitness"
        )
        w3 = sized_w3(spark, sf10, nb).select(
            "part", "pos", "parent", "parent_fitness"
        )
        diff = w1.exceptAll(w3).count() + w3.exceptAll(w1).count()
        print(json.dumps({
            "sf10_pop": n10, "buckets_for_pop_sf10": b10,
            "parity_n_buckets": nb, "w1_w3_diff_rows": diff,
        }), flush=True)
        assert diff == 0, f"W1/W3 parity broke at n_buckets={nb}"

    out = {}
    for name, d in (("sf10", sf10), ("sf100", sf100)):
        n = catalog._pop_with_fitness(spark, d).count()
        b = shuffle_ops.buckets_for_pop(n)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        sized_w3(spark, d, b).write.format("noop").mode("overwrite").save()
        out[name] = {
            "pop": n, "n_buckets": b,
            "sec": round(time.perf_counter() - t0, 2),
        }
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
    ratio = round(out["sf100"]["sec"] / out["sf10"]["sec"], 2)
    print(json.dumps({
        "name": "tournament_pandas_sized",
        "small_sec": out["sf10"]["sec"], "big_sec": out["sf100"]["sec"],
        "ratio": ratio, "detail": out,
    }), flush=True)


if __name__ == "__main__":
    main()
