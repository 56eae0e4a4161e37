"""Partitioned layout + partition pruning: at 100 TB a date-partitioned
table turns a time-range query from a full scan into reading only the
matching directories. Pins that (a) the write lays out partition dirs,
(b) the read plan prunes them (PartitionFilters, partitionCount < total)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from geneticalgorithmsusingmapreduce_spark.sources.registry import read_events

SF = "/root/testdata/sf0.001"


def test_partition_pruning(spark, tmp_path):
    ev = read_events(spark, SF).withColumn("day", F.to_date("ts"))
    out = str(tmp_path / "events_by_day")
    ev.write.mode("overwrite").partitionBy("day").parquet(out)

    days = sorted(d for d in os.listdir(out) if d.startswith("day="))
    assert len(days) > 3  # the fixture spans a month

    pick = days[1].split("=", 1)[1]
    q = (
        spark.read.parquet(out)
        .filter(F.col("day") == pick)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q.collect()
    p = q._jdf.queryExecution().executedPlan().toString()
    p = p.split("== Initial Plan ==")[0]
    assert "PartitionFilters: [" in p and "day" in p.split(
        "PartitionFilters:"
    )[1].split("]")[0]

    want = (
        read_events(spark, SF)
        .filter(F.to_date("ts") == pick)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, q.collect())) == sorted(map(tuple, want))
