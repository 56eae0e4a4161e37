"""Skew-aware aggregation: two-stage salted groupBy.

Engine extension for the 100 TB story: a groupBy on a low-cardinality or
skewed key funnels entire hot keys through single reducers. Salting
splits each key into S sub-keys for the first (partial) aggregation, so
the heavy key's rows spread across S tasks; the second aggregation
merges S tiny partials per key. AQE's skew-join handling covers joins;
this covers aggregations, where AQE can't split a single group.

Only algebraic aggregates compose this way (sum/count/min/max — the
merge of partials is the same function); the helper is typed accordingly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ALGEBRAIC = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column | str]],
    salt_buckets: int = 16,
    salt_source: str | Column = None,
) -> DataFrame:
    """Two-stage aggregation: stage 1 groups by (keys + salt), stage 2 by
    keys. ``aggs`` maps output name → (fn, input expr) with fn in
    sum/count/min/max. ``salt_source`` defaults to a per-row random salt
    (F.rand-based — fine, salting doesn't need determinism for
    correctness, only the VALUES do; pass a column for seeded runs)."""
    salt = (
        F.floor(F.rand(seed=0) * salt_buckets).cast("int")
        if salt_source is None
        else F.expr(f"pmod(hash({salt_source}), {salt_buckets})")
        if isinstance(salt_source, str)
        else salt_source
    )
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            ALGEBRAIC[fn](col).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[
            _MERGE[fn](name).alias(name)
            for name, (fn, _col) in aggs.items()
        ]
    )
