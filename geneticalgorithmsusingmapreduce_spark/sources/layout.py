"""Parquet layout compaction — the small-files problem (r9 extension).

A 100 TB ingestion that appends per micro-batch (streaming sinks, the
incremental IVF postings, per-generation stores) accumulates thousands
of KB-sized part files per partition; every downstream scan then pays
one task + one footer read per file, and the NameNode/object-store
listing dominates planning. The standard fix is a periodic compaction
pass: rewrite each layout at ~target file sizes.

Spark shape: size the output file count from the layout's ON-DISK
bytes (no row scan — same rule family as bucketing.buckets_for_path),
then `repartition(n)` + write with `maxRecordsPerFile` unset (the
repartition already bounds per-file bytes by construction). The
shuffle IS the honest cost of compaction — it is what re-packs rows
into full files; at 100 TB you run it per partition directory (e.g.
one day at a time), never over the whole table at once, and only on
layouts whose file count exceeds a threshold.

Content-invariance is the correctness contract: the compacted layout
must hold exactly the source's rows — the registered entry hash-checks
an aggregate over the compacted READ-BACK against the oracle's view of
the original table, and tests pin the file-count reduction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def layout_file_stats(path: str) -> dict:
    """Data-file count and bytes of a parquet layout (driver-side
    listing — the same signal a compaction scheduler keys on)."""
    n_files = 0
    n_bytes = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            # count data files only: success markers / CRCs are not
            # scan tasks
            if f.startswith(("_", ".")):
                continue
            n_files += 1
            n_bytes += os.path.getsize(os.path.join(root, f))
    return {"files": n_files, "bytes": n_bytes}


def files_for_bytes(n_bytes: int, target_bytes: int = 128 << 20) -> int:
    """Output file count for a compaction: ⌈bytes / target⌉, floor 1.
    Parquet re-encoding changes the byte total somewhat (dictionary
    re-buildup, row-group packing), but the scheduler only needs the
    order of magnitude right — a 10,000-file layout becoming 8 files
    vs 11 is the same win."""
    return max(1, -(-n_bytes // target_bytes))


def compact_layout(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 << 20,
) -> dict:
    """Rewrite the parquet layout at ``src_path`` into ``dst_path`` with
    ~target-sized files. Returns {"files_before", "files_after",
    "n_files_planned", "bytes_before"} for the caller's ledger."""
    before = layout_file_stats(src_path)
    n = files_for_bytes(before["bytes"], target_bytes)
    df = spark.read.parquet(src_path)
    df.repartition(n).write.mode("overwrite").parquet(dst_path)
    after = layout_file_stats(dst_path)
    return {
        "files_before": before["files"],
        "bytes_before": before["bytes"],
        "n_files_planned": n,
        "files_after": after["files"],
    }


def compacted(spark: SparkSession, dst_path: str) -> DataFrame:
    return spark.read.parquet(dst_path)
