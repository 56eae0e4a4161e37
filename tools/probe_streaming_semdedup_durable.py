"""Decade + history-re-read probe for streaming_semdedup_durable
(r11 VERDICT "Next round" #1): the durable cent_id-partitioned
assignment store, per-batch re-read restricted to PROBED cells, and
sampled batch-0 training. The evidence the verdict asks for is
per-batch history BYTES read: over B batches the durable variant's
re-read tracks batch-size × probed-cell mass (≈ flat once the store
covers the space), while the in-memory variant re-ships the WHOLE
cumulative history each batch (ΣB ≈ B²/2). Runs B=6 batches so the
shape is visible, at the sized-C config per leg.

Reported per leg: wall seconds, pairs, plant coverage, and the
per-batch history rows [probed_cells, history_cells,
history_bytes_read, store_bytes_total] from state.history.

Usage: python tools/probe_streaming_semdedup_durable.py [SMALL BIG]
  defaults .localdata/sf10e .localdata/sf100e (embeddings-only dirs)
  PROBE_BATCHES=6
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
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
    n_batches = int(os.environ.get("PROBE_BATCHES", "6"))
    spark = build_session("gamr-probe-ssdd")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_batches": n_batches}
    for tag, d in (("small", small), ("big", big)):
        aug = ann.augmented_embeddings(spark, d)
        n = aug.count()
        c = ann.centroids_for_count(n)
        hist_dir = tempfile.mkdtemp(prefix="gamr_probe_ssdd_")
        try:
            t0 = time.perf_counter()
            st = sd.start_streaming_semdedup_durable(
                spark, aug, hist_dir, n_batches=n_batches,
                n_centroids=c, timeout_sec=7200,
            )
            res = sd.durable_results(spark, hist_dir)
            agg = res.agg(
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
        finally:
            shutil.rmtree(hist_dir, ignore_errors=True)
        runtime.release_persists()
        print(json.dumps({tag: out[tag]}), flush=True)
    out["ratio"] = round(out["big"]["sec"] / out["small"]["sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
