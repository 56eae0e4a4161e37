"""SparkSession factory tuned for this engine.

Local-mode settings mirror what a 1000-executor cluster deployment would
set per-executor (AQE on, shuffle partitions sized to parallelism, Arrow
for the Pandas-UDF escape hatches). Nothing here is required for
correctness — queries() callables accept any session the driver hands us.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _blas_threads() -> str:
    """'1' (the shipped pin) unless SPARK_GRAFT_BLAS_PIN=0 — the A/B
    dial that lets tools/ab_int8_kernels.py price the pin without a
    code edit."""
    if os.environ.get("SPARK_GRAFT_BLAS_PIN", "1") == "0":
        return str(os.cpu_count() or 1)
    return "1"


def build_session(
    app: str = "gamr-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """extra_conf entries are applied last, so they can override the
    defaults below AND set create-time-only core confs (e.g.
    spark.io.compression.codec — a SparkConf setting that cannot be
    changed on a live session).

    Codec policy (r6 VERDICT #4, decided by tools/ab_codec.py —
    strictly-alternating same-box A/B at sf0.1 and sf10, BASELINE.md
    r7): lz4 STAYS the default. zstd showed no wall-clock win while
    shuffles fit in page cache — up to ~16% slower on shuffle-heavy
    text entries at sf10 (compression CPU in the task path) vs ~12%
    faster on two scan-bound ones, i.e. noise-band overall. Its ~2×
    spill-byte reduction only pays when node-local disk bounds wide
    text shuffles (the sf100 decade) — flip it per-workload via
    extra_conf={"spark.io.compression.codec": "zstd"}, as scale_bench's
    SCALE_BENCH_CONF does."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # persist() captures a non-adaptive plan by default — cached
        # exchanges would materialize at the raw shuffle partition count
        # (catalog._ensure_adaptive_cached_plans has the full rationale)
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        # the reference enables speculative execution on every job
        # (reference src/edu/illinois/ga/MapReduce.java:281, CGA.java:341)
        # to mask straggler tasks; same knob, Spark spelling. r14
        # CORRECTION to the long-standing comment here ("no effect in
        # local mode"): it measurably DOES have an effect in local mode,
        # and a purely harmful one — the speculation checker re-enqueues
        # copies of sub-ms tasks onto the SAME cores (there is no other
        # node to mask), measured at +0.5-0.9 s of scheduler churn on a
        # trivial one-exchange agg (1.6-2.4 s → 0.76-0.97 s with it off;
        # tools/ab_speculation_r14.py) — a fixed tax on every job of
        # every entry. This factory always builds local[N] sessions, so
        # the default here is OFF; a cluster deployment (where the knob
        # belongs, per the reference) re-enables it with
        # SPARK_GRAFT_SPECULATION=1 — parameterized, not hardcoded, per
        # the scale-dependent-settings rule.
        .config(
            "spark.speculation",
            {"1": "true", "0": "false"}.get(
                os.environ.get("SPARK_GRAFT_SPECULATION", ""), "false"
            ),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # one BLAS thread per Python worker: the float64 matmul kernels
        # (Lloyd's partials, SemDeDup assignment/tiles) otherwise spawn
        # an OpenBLAS pool of nproc threads in EACH of the 32 parallel
        # workers — 1,024 threads of pure oversubscription on a 32-core
        # box; task-level parallelism is already the outer loop.
        # SPARK_GRAFT_BLAS_PIN=0 disables (the A/B dial —
        # tools/ab_int8_kernels.py prices this pin against the r10
        # int8-family readings)
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", _blas_threads())
        .config("spark.executorEnv.OMP_NUM_THREADS", _blas_threads())
        .config("spark.executorEnv.MKL_NUM_THREADS", _blas_threads())
        .config("spark.ui.enabled", "false")
        # collect_set/collect_list aggregation (LSH shingle sets,
        # containment postings, span folds) runs as
        # ObjectHashAggregate, which silently falls back to SORT-based
        # aggregation once a task sees >128 distinct groups
        # (spark.sql.objectHashAggregate.sortBased.fallbackThreshold's
        # ancient default) — the fallback sorts every row AND walks the
        # interpreted TypedImperativeAggregate serialize/merge path, the
        # exact stack a live jstack of the r14 bench showed grinding
        # (Collect.deserialize inside SortBasedAggregator) on the
        # containment entry. Our group counts are 10^4-10^6 per task at
        # bench scale with SMALL per-group state (int64 set members), so
        # the hash map stays modest; 4M groups × ~100 B state bounds one
        # task's map at ~hundreds of MB on this 128 GiB box. On a
        # memory-tight cluster, size via SPARK_GRAFT_OBJAGG_FALLBACK
        # (per-task map entries before graceful sort fallback).
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            os.environ.get("SPARK_GRAFT_OBJAGG_FALLBACK", str(1 << 22)),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local-mode split sizing: test-scale parquet is tens of MB, so the
        # 128 MB default packs a whole table into ~3 input tasks and leaves
        # 29 of 32 cores idle on scan-heavy plans. 8 MB ≈ one task per core
        # at sf0.1. (On a real cluster the default is right — tune per
        # executor-memory/core ratio, not this constant.)
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
