"""AQE skew-join handling: a hot key in a sort-merge join gets its
oversized partition split at runtime (complementing the static salting
in operators/skew.py — AQE is the runtime re-plan path the session
enables; salting is the declarative fallback when key semantics allow).
Thresholds are shrunk so the local fixture triggers the same code path a
256 MB-per-partition hot key would at scale."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # keep AQE from pre-coalescing everything into one partition,
        # which would mask the skew split
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 95% of left rows share key 0; right is uniform
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("lv"),
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("rv")
        )
        # bare join: a downstream agg keyed on k would forbid the split
        # (it needs the join's hash distribution intact) — that shape is
        # what operators/skew.py's salting is for
        j = left.join(right, "k").select("k", "lv", "rv")
        # finalize THIS df's adaptive plan (count() would plan separately)
        n = len(j.collect())
        p = j._jdf.queryExecution().executedPlan().toString()
        p = p.split("== Initial Plan ==")[0]
        assert "skew=true" in p  # the hot partition was split at runtime
        assert n == 300_000  # every left row matches exactly one right key
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
