"""Decade probe for the FULLY-COMPOSED curation ladder
(corpus_curation_full, r11 VERDICT "Next round" #3): gates → exact
digest → doc MinHash/LSH → candidate-restricted chunk containment →
embedding SemDeDup → perplexity rank-drop → split, one plan, at the
AT-SCALE config (sem_rung="fast", C sized by centroids_for_count,
skew cap) over the multi-plant ladder fixture (one victim class per
rung) at sf10 → sf100 combo dirs.

The composed pipeline's decade should track its parts, each already
measured standalone: curation_semdedup 5.38×, curation_ppl 5.57×
(BASELINE.md r11) — the full ladder is their union minus the shared
stages 1-4.

Usage: python tools/probe_curation_full_scale.py [SMALL_DIR BIG_DIR]
  defaults .localdata/sf10de .localdata/sf100de (docs+embeddings)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from geneticalgorithmsusingmapreduce_spark import catalog, runtime  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.operators import (  # noqa: E402
    ann, pipeline as pipe,
)
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10de"
    big = sys.argv[2] if len(sys.argv) > 2 else ".localdata/sf100de"
    spark = build_session("gamr-probe-ccfull")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for tag, d in (("small", small), ("big", big)):
        emb = ann.paraphrase_embeddings(spark, d)
        # fixture truncation mirrors the shipped catalog entry (the
        # 5-branch HOF union re-derives per pipeline action otherwise);
        # INSIDE the timed window — materializing the fixture is part
        # of the entry's real cost
        t0 = time.perf_counter()
        docs = runtime.local_checkpoint_truncated(
            catalog._full_ladder_docs(spark, d)
        )
        res = pipe.curate_corpus_full(
            docs, emb, sem_centroids=None, sem_cap=8192, sem_rung="fast",
        )
        agg = res.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("dup_count") > 1).cast("long")).alias("dd_reps"),
            F.sum("nd_dropped").alias("nd_dropped"),
            F.sum("cc_absorbed").alias("cc_absorbed"),
            F.sum("sd_absorbed").alias("sd_absorbed"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        runtime.free_checkpoint(docs)
        runtime.release_persists()
        runtime.release_cleanups()
        out[tag] = {
            "dir": d, "sec": round(dt, 2), "rows": int(agg.rows),
            "dd_reps": int(agg.dd_reps or 0),
            "nd_dropped": int(agg.nd_dropped or 0),
            "cc_absorbed": int(agg.cc_absorbed or 0),
            "sd_absorbed": int(agg.sd_absorbed or 0),
        }
        print(json.dumps({tag: out[tag]}), flush=True)
    out["ratio"] = round(out["big"]["sec"] / out["small"]["sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
