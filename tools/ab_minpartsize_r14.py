"""A/B spark.sql.adaptive.coalescePartitions.minPartitionSize on the
curation-family entries (r14). Hypothesis: AQE coalesces the small-bytes
/ heavy-interpreted-work exchanges (shingle folds, collect_set postings,
gram HOFs) down to 1-2 partitions, serializing 30+ s of per-token work
onto 1-2 of 32 cores. parallelismFirst=true already targets
max(bytes/defaultParallelism, minPartitionSize); the 1 MB default floor
is what bites when a whole rung's shuffle is ~2 MB.

Usage: python tools/ab_minpartsize_r14.py [--runs N] <entry> [entry ...]
Alternates sessions: default (1 MB floor) vs 64 KB floor, interleaved
A/B/A/B so burst-throttle drift hits both sides equally.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark import catalog  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def timed(entries: list[str], conf: dict[str, str], runs: int,
          sf_dir: str) -> dict[str, float]:
    spark = build_session("gamr-ab-minpart", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name in entries:
        fn = catalog.QUERIES[name]
        readings = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            readings.append(time.perf_counter() - t0)
        out[name] = round(min(readings), 2)
        print(f"[ab] {name} {conf or 'default'}: "
              + " ".join(f"{r:.2f}" for r in readings), file=sys.stderr,
              flush=True)
    spark.stop()
    return out


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    small = {"spark.sql.adaptive.coalescePartitions.minPartitionSize":
             "65536"}
    results = []
    for rep in range(2):
        results.append(("default", timed(args, {}, runs, sf_dir)))
        results.append(("64k", timed(args, small, runs, sf_dir)))
    agg: dict[str, dict[str, float]] = {}
    for tag, res in results:
        for k, v in res.items():
            agg.setdefault(k, {}).setdefault(tag, v)
            agg[k][tag] = min(agg[k][tag], v)
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
