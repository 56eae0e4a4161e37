"""Time individual catalog entries with bench.py's exact methodology
(noop sink, min-of-N, clearCache between runs) without running the whole
bench. Usage:

    python tools/time_entry.py [--runs N] <query> [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (session core count, as in bench.py).
Prints one `[time] name: run1 run2 ... -> min` line per entry to stderr
and a final JSON line {name: min_sec} to stdout.
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
    runs = 3
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    if not args:
        sys.exit("usage: time_entry.py [--runs N] <query> [query ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("gamr-time-entry")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name in args:
        fn = catalog.QUERIES[name]
        readings = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            readings.append(time.perf_counter() - t0)
            print(
                f"[time] {name} run {len(readings)}: {readings[-1]:.2f}s",
                file=sys.stderr, flush=True,
            )
        out[name] = round(min(readings), 4)
        print(
            f"[time] {name}: "
            + " ".join(f"{r:.2f}" for r in readings)
            + f" -> min {out[name]:.2f}s",
            file=sys.stderr, flush=True,
        )
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
