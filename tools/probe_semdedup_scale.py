"""Decade probe for the SIZED SemDeDup config (centroids_for_count —
C ≈ √n): the registered gate entry pins C=8 so its training replay
stays a static oracle, but a fixed C is quadratic in candidate volume
a decade later (the dedup_embedding_cosine story). This measures the
scale path the operator documents: C=512 at sf10 (220k augmented
vectors), C=2048 at sf100 (2.2M).

Usage: python tools/probe_semdedup_scale.py [SMALL_DIR BIG_DIR]
  defaults .localdata/sf10e .localdata/sf100e (embeddings-only dirs)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark import runtime  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.operators import ann  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10e"
    big = sys.argv[2] if len(sys.argv) > 2 else ".localdata/sf100e"
    spark = build_session("gamr-probe-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tag, d in (("small", small), ("big", big)):
        aug = ann.augmented_embeddings(spark, d)
        n = aug.count()
        c = ann.centroids_for_count(n)
        t0 = time.perf_counter()
        pairs = ann.semantic_cluster_pairs(aug, n_centroids=c, iters=2)
        n_pairs = pairs.count()
        dt = time.perf_counter() - t0
        runtime.release_persists()
        out[tag] = {
            "dir": d, "n_vecs": n, "C": c,
            "sec": round(dt, 2), "pairs": n_pairs,
        }
        print(json.dumps({tag: out[tag]}), flush=True)
    out["ratio"] = round(out["big"]["sec"] / out["small"]["sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
