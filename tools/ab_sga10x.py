"""Same-box A/B of the README-scale SGA generation (r5 VERDICT #7).

Runs ONLY the sga_10kbit_x10 measurement from bench.py — the reference
README's own 10x example (`hadoop jar ga.jar 4 4 10000 100 10`, pop
1,328,772) — in an isolated process, with Spark's event log enabled so
the standing number gets a stage-time breakdown (executor run / shuffle
read wait / shuffle write / GC / task deserialization) instead of a
cross-round variance argument.

Usage: python tools/ab_sga10x.py [label] [event_log_dir]
Prints one JSON line: {label, sec_per_gen, per_gen, best_by_gen, stages}.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "head"
    evdir = sys.argv[2] if len(sys.argv) > 2 else ""

    # event-log confs ride PYSPARK_SUBMIT_ARGS so the same tool drives
    # ANY checkout's build_session unmodified (the r4 worktree predates
    # any conf hook): the A/B must not edit the code it measures
    if evdir:
        os.makedirs(evdir, exist_ok=True)
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            f"--conf spark.eventLog.enabled=true "
            f"--conf spark.eventLog.compress=false "
            f"--conf spark.eventLog.rolling.enabled=false "
            f"--conf spark.eventLog.dir={evdir} pyspark-shell"
        )

    from geneticalgorithmsusingmapreduce_spark.session import build_session

    spark = build_session()

    from geneticalgorithmsusingmapreduce_spark.plans import sga

    pop10 = sga.pop_from_multiplier(10_000, 10)
    res10 = sga.run_sga(
        spark, n_bits=10_000, pop_size=pop10, seed=42,
        max_generations=4, n_buckets=128,
    )
    out = {
        "label": label,
        "pop": pop10,
        "sec_per_gen": round(
            min(s.wall_ms for s in res10.stats[2:]) / 1000, 3
        ),
        "per_gen": [round(s.wall_ms / 1000, 3) for s in res10.stats],
        "best_by_gen": [s.best_fitness for s in res10.stats],
    }
    app_id = spark.sparkContext.applicationId
    spark.stop()

    if evdir:
        tot = {
            "executor_run_sec": 0.0, "shuffle_fetch_wait_sec": 0.0,
            "shuffle_write_sec": 0.0, "jvm_gc_sec": 0.0,
            "deser_sec": 0.0, "result_ser_sec": 0.0,
            "shuffle_read_mb": 0.0, "shuffle_write_mb": 0.0,
            "n_stages": 0,
        }
        # Spark 4 rolling layout: eventlog_v2_<appid>/events_*_<appid>
        d2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
        if os.path.isdir(d2):
            paths = sorted(
                os.path.join(d2, n) for n in os.listdir(d2)
                if n.startswith("events_")
            )
        else:
            paths = [os.path.join(evdir, app_id)]

        def _lines():
            for p in paths:
                with open(p) as f:
                    yield from f

        # one pass: stage counts + task-level sums (TaskEnd carries the
        # metrics) — r6 ADVICE: the log was parsed twice
        for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerStageCompleted":
                tot["n_stages"] += 1
                continue
            if kind != "SparkListenerTaskEnd":
                continue
            m = ev.get("Task Metrics") or {}
            tot["executor_run_sec"] += m.get("Executor Run Time", 0) / 1e3
            tot["jvm_gc_sec"] += m.get("JVM GC Time", 0) / 1e3
            tot["deser_sec"] += (
                m.get("Executor Deserialize Time", 0) / 1e3
            )
            tot["result_ser_sec"] += (
                m.get("Result Serialization Time", 0) / 1e3
            )
            srm = m.get("Shuffle Read Metrics") or {}
            tot["shuffle_fetch_wait_sec"] += (
                srm.get("Fetch Wait Time", 0) / 1e3
            )
            tot["shuffle_read_mb"] += (
                srm.get("Local Bytes Read", 0)
                + srm.get("Remote Bytes Read", 0)
            ) / 1e6
            swm = m.get("Shuffle Write Metrics") or {}
            tot["shuffle_write_sec"] += (
                swm.get("Shuffle Write Time", 0) / 1e9  # ns
            )
            tot["shuffle_write_mb"] += (
                swm.get("Shuffle Bytes Written", 0) / 1e6
            )
        out["stages"] = {k: round(v, 2) for k, v in tot.items()}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
