"""A/B adaptive query execution on catalog entries (r14).

The sqlexec probe showed a single noop save of the containment entry
spawning 58 jobs — AQE materializes every Exchange as its own job, and
local-mode per-job fixed cost measured ~0.4 s (scheduling + Catalyst
re-planning between stages). Hypothesis: for the composed curation
ladders (20+ exchanges per action) the AQE job-boundary tax outweighs
what coalescing buys at bench scale.

Usage: python tools/ab_aqe_r14.py [--runs N] <entry> [entry ...]
Interleaves sessions A (AQE on, shipped default) / B (AQE off) twice.
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


def timed(entries, conf, runs, sf_dir):
    spark = build_session("gamr-ab-aqe", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in entries:
        fn = catalog.QUERIES[name]
        readings = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            readings.append(time.perf_counter() - t0)
        out[name] = round(min(readings), 2)
        print(f"[ab] {name} aqe={conf.get('spark.sql.adaptive.enabled','on')}: "
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
    off = {"spark.sql.adaptive.enabled": "false"}
    agg: dict[str, dict[str, float]] = {}
    for rep in range(2):
        for tag, conf in (("aqe_on", {}), ("aqe_off", off)):
            res = timed(args, conf, runs, sf_dir)
            for k, v in res.items():
                cur = agg.setdefault(k, {})
                cur[tag] = min(cur.get(tag, 1e9), v)
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
