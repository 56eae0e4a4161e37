"""Decade probe for the SIZED SemDeDup configs (centroids_for_count —
fixed target cluster size, C = n/256): the registered gate entry pins
C=8 so its training replay stays a static oracle; this measures the
two scale rungs the operator documents:

* EXACT — flat Lloyd's + exact argmax assignment (training and
  assignment are n·C = n²/256 at fixed-K sizing: the quadratic term;
  measured 13.82×/decade before the fast rung existed).
* FAST — sampled training (fixed m=262k slice → m·C linear in n) +
  two-level assignment (n·~3√C·D). Its recall cost is REPORTED, not
  assumed: planted perturbed copies (vec_b = vec_a + 1e6) found by
  each rung, fast/exact relative plant recall.
* EXACT_SAMPLED (r11 VERDICT #4) — sampled training (same fixed-size
  slice as FAST, via train_mod) + EXACT argmax assignment + the skew
  cap: the fallback rung with its flat-training term removed but zero
  assignment approximation. Baseline to beat: the flat exact rung's
  11.18× (r11) / 13.82× (r10).

Usage: python tools/probe_semdedup_scale.py [SMALL_DIR BIG_DIR]
  defaults .localdata/sf10e .localdata/sf100e (embeddings-only dirs)
  PROBE_RUNGS=exact,fast,exact_sampled (the exact big leg is ~6 min)
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


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10e"
    big = sys.argv[2] if len(sys.argv) > 2 else ".localdata/sf100e"
    rungs = os.environ.get(
        "PROBE_RUNGS", "exact,fast,exact_sampled"
    ).split(",")
    spark = build_session("gamr-probe-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for tag, d in (("small", small), ("big", big)):
        aug = ann.augmented_embeddings(spark, d)
        n = aug.count()
        c = ann.centroids_for_count(n)
        out[tag] = {"dir": d, "n_vecs": n, "C": c}
        for rung in rungs:
            t0 = time.perf_counter()
            if rung == "exact":
                pairs = ann.semantic_cluster_pairs(
                    aug, n_centroids=c, iters=2
                )
            elif rung == "exact_sampled":
                import math

                s = max(1, math.ceil(n / 262_144))
                pairs = ann.semantic_cluster_pairs(
                    aug, n_centroids=c, iters=2, train_mod=s, cap=8192,
                )
            else:
                pairs = ann.semantic_cluster_pairs_fast(
                    aug, n_centroids=c, iters=2, n_vecs=n
                )
            agg = pairs.agg(
                F.count(F.lit(1)).alias("pairs"),
                F.sum(
                    (F.col("vec_b") == F.col("vec_a") + 1_000_000)
                    .cast("long")
                ).alias("plants"),
            ).collect()[0]
            dt = time.perf_counter() - t0
            runtime.release_persists()
            out[tag][rung] = {
                "sec": round(dt, 2),
                "pairs": int(agg.pairs),
                "plants": int(agg.plants or 0),
            }
            print(json.dumps({tag: {rung: out[tag][rung]}}), flush=True)
    for rung in rungs:
        if rung in out["small"] and rung in out["big"]:
            out[f"ratio_{rung}"] = round(
                out["big"][rung]["sec"] / out["small"][rung]["sec"], 2
            )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
