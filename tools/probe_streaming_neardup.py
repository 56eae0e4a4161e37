"""r8 probe: the cross-batch streaming near-dup at scale, GUARDED.

The oracle-checked `streaming_neardup` entry runs unguarded so its
result is arrival-order-independent and replayable as static SQL; at
the sf100 Zipf decade the unguarded candidate stage inherits the same
hot-bucket blowup the static `dedup_minhash_lsh` hits (450M candidates
OOM'd a 48 GB heap — BASELINE.md r7), so the at-scale row is measured
with the per-batch guard at the production default (max_bucket=64),
over the same augmented corpus the static capped entry measures.

Usage: python tools/probe_streaming_neardup.py [sf10_dir sf100_dir]
Prints one JSON line per scale + a summary row for the sf100 matrix
(alias `streaming_neardup_guarded`).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark.operators import textops  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.streaming import neardup  # noqa: E402


def main() -> None:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.localdata/sf10"
    sf100 = sys.argv[2] if len(sys.argv) > 2 else f"{REPO}/.localdata/sf100"
    spark = build_session("gamr-probe-streaming-neardup")
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    for name, d in (("sf10", sf10), ("sf100", sf100)):
        docs = textops.augmented_corpus(spark, d)
        t0 = time.perf_counter()
        st = neardup.start_streaming_neardup(
            spark, docs, n_batches=3, max_bucket=64, timeout_sec=1800
        )
        n_pairs = st.results.count()
        sec = round(time.perf_counter() - t0, 2)
        for df in (st.bands, st.sets, st.results):
            df.unpersist()
        out[name] = {"sec": sec, "pairs": n_pairs}
        print(json.dumps({"scale": name, **out[name]}), flush=True)
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
    print(json.dumps({
        "name": "streaming_neardup_guarded",
        "small_sec": out["sf10"]["sec"], "big_sec": out["sf100"]["sec"],
        "ratio": round(out["sf100"]["sec"] / out["sf10"]["sec"], 2),
        "pairs": {k: v["pairs"] for k, v in out.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
