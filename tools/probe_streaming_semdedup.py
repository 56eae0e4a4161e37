"""Decade probe for streaming_semdedup at the SIZED configuration
(centroids_for_count — the gate entry pins C=8 for a static oracle;
at scale C tracks the corpus so intra-cluster history sweeps stay
bounded). 3 micro-batches, batch-0-trained quantizer, cumulative
cross-batch verify — the full streaming loop per leg.

Usage: python tools/probe_streaming_semdedup.py [SMALL_DIR BIG_DIR]
  defaults .localdata/sf10e .localdata/sf100e
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from geneticalgorithmsusingmapreduce_spark import runtime  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.operators import ann  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.streaming import semdedup as sd  # noqa: E402


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10e"
    big = sys.argv[2] if len(sys.argv) > 2 else ".localdata/sf100e"
    spark = build_session("gamr-probe-ssd")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for tag, d in (("small", small), ("big", big)):
        aug = ann.augmented_embeddings(spark, d)
        n = aug.count()
        c = ann.centroids_for_count(n)
        t0 = time.perf_counter()
        st = sd.start_streaming_semdedup(
            spark, aug, n_batches=3, n_centroids=c, timeout_sec=3600,
        )
        agg = st.results.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum(
                (F.col("vec_b") == F.col("vec_a") + 1_000_000)
                .cast("long")
            ).alias("plants"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        out[tag] = {
            "dir": d, "n_vecs": n, "C": c, "sec": round(dt, 2),
            "pairs": int(agg.pairs), "plants": int(agg.plants or 0),
            "per_batch": st.history,
        }
        for df in (st.assigned, st.results):
            runtime.free_checkpoint(df)
        runtime.release_persists()
        print(json.dumps({tag: out[tag]}), flush=True)
    out["ratio"] = round(out["big"]["sec"] / out["small"]["sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
