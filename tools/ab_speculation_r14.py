"""A/B: spark.speculation in local mode (r14).

The session factory shipped speculation=true since round 1 (mirroring
the reference's mapred.map.tasks.speculative.execution), with a comment
claiming it is inert in local mode. It is not: the speculation checker
re-enqueues copies of sub-ms tasks onto the same cores, and the
duplicated launches + scheduler churn are a fixed per-job tax.

Runs the same trivial one-exchange aggregation 6x in each of two fresh
sessions (speculation on / off) and prints both timing vectors. The
deltas feed session.py's r14 default (off under local[*],
SPARK_GRAFT_SPECULATION=1 re-enables for cluster deployment).

Usage: python tools/ab_speculation_r14.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def run(tag: str, spec: str) -> list[float]:
    spark = build_session(
        f"ab-spec-{tag}", extra_conf={"spark.speculation": spec}
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(100_000)
    df.count()  # warm
    res = []
    for _ in range(6):
        t0 = time.perf_counter()
        df.groupBy((F.col("id") % 100).alias("k")).count().count()
        res.append(round(time.perf_counter() - t0, 3))
    spark.stop()
    print(f"speculation={spec}: {res} min={min(res)}", flush=True)
    return res


def main() -> None:
    run("on", "true")
    run("off", "false")


if __name__ == "__main__":
    main()
