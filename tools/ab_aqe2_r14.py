"""Within-session A/B of runtime SQL confs on catalog entries (r14).

spark.sql.adaptive.enabled is a runtime conf, so one session can
alternate it run-by-run — removes the cross-session JIT/page-cache
drift that polluted the first A/B. Pattern per entry: warmup (on),
then on/off/on/off readings.

Usage: python tools/ab_aqe2_r14.py [--runs N] <entry> [entry ...]
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


def main() -> None:
    args = sys.argv[1:]
    pairs = 2
    if args and args[0] == "--runs":
        pairs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("gamr-ab-aqe2")
    spark.sparkContext.setLogLevel("ERROR")
    agg: dict[str, dict[str, float]] = {}
    for name in args:
        fn = catalog.QUERIES[name]
        # warmup
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.catalog.clearCache()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        readings: dict[str, list[float]] = {"on": [], "off": []}
        for _ in range(pairs):
            for tag, val in (("on", "true"), ("off", "false")):
                spark.conf.set("spark.sql.adaptive.enabled", val)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                readings[tag].append(time.perf_counter() - t0)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        agg[name] = {t: round(min(v), 2) for t, v in readings.items()}
        print(f"[ab] {name} on: "
              + " ".join(f"{r:.2f}" for r in readings["on"])
              + " | off: "
              + " ".join(f"{r:.2f}" for r in readings["off"]),
              file=sys.stderr, flush=True)
    print(json.dumps(agg))
    spark.stop()


if __name__ == "__main__":
    main()
