"""Count Spark JOBS launched by the durable streaming-semdedup loop
(r13 VERDICT "Next round" #6 evidence): runs the 3-batch durable loop
at sf0.01 and reports total jobs (statusTracker, ungrouped = all) plus
the per-batch history counters. Run on the before/after trees to show
the jobs/batch reduction; the pair set itself is oracle-checked by the
catalog entry, not here.

Usage: python tools/probe_durable_jobcount_r14.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark.operators import ann  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.streaming import (  # noqa: E402
    semdedup as sd_stream,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("gamr-probe-ssdd-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    emb = ann.augmented_embeddings(spark, sf_dir)
    emb.count()  # warm the scan outside the counted window
    jobs_before = len(tracker.getJobIdsForGroup(None))
    d = tempfile.mkdtemp(prefix="gamr_ssdd_jobs_")
    t0 = time.perf_counter()
    try:
        st = sd_stream.start_streaming_semdedup_durable(
            spark, emb, d, n_batches=3
        )
        wall = round(time.perf_counter() - t0, 2)
        jobs = len(tracker.getJobIdsForGroup(None)) - jobs_before
        n_pairs = sd_stream.durable_results(spark, d).count()
        print(json.dumps({
            "jobs_total_3_batches": jobs,
            "wall_sec": wall,
            "n_pairs": n_pairs,
            "history": st.history,
        }), flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
