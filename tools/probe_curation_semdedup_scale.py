"""Decade probe for the SEMANTIC-composed curation pipeline (r11 —
r10 VERDICT "Next round" #3 at-scale evidence): gates → exact digest →
doc near-dup → candidate-restricted chunk containment → SemDeDup stage
→ split, over the paraphrase fixture at sf10 → sf100 (docs+embeddings
combo dirs; doc_id space is larger than vec_id space at these scales,
so the semantic stage covers the embedded prefix — a timing probe, the
row-level semantics are gate/sf1-hash-checked).

The semantic stage runs the AT-SCALE config: sem_rung="fast" (sampled
training + two-level probe, C sized by centroids_for_count) with the
skew-bound cap — the same rung whose standalone decade measured 8.48×
(probe_semdedup_r11). Reported per leg: wall seconds, survivor rows,
plants dropped by the semantic stage (sd coverage over the embedded
prefix).

Usage: python tools/probe_curation_semdedup_scale.py [SMALL_DIR BIG_DIR]
  defaults .localdata/sf10de .localdata/sf100de
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
from geneticalgorithmsusingmapreduce_spark.operators import (  # noqa: E402
    ann, pipeline as pipe, textops,
)
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10de"
    big = sys.argv[2] if len(sys.argv) > 2 else ".localdata/sf100de"
    spark = build_session("gamr-probe-ccsem")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for tag, d in (("small", small), ("big", big)):
        docs = textops.paraphrase_corpus(spark, d)
        emb = ann.paraphrase_embeddings(spark, d)
        t0 = time.perf_counter()
        res = pipe.curate_corpus_semdedup(
            docs, emb, sem_centroids=None, sem_cap=8192, sem_rung="fast",
        )
        agg = res.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("sd_absorbed") > 0).cast("long")).alias("reps"),
            F.sum("sd_absorbed").alias("absorbed"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        runtime.release_persists()
        out[tag] = {
            "dir": d, "sec": round(dt, 2), "rows": int(agg.rows),
            "sd_reps": int(agg.reps or 0),
            "sd_absorbed": int(agg.absorbed or 0),
        }
        print(json.dumps({tag: out[tag]}), flush=True)
    out["ratio"] = round(out["big"]["sec"] / out["small"]["sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
