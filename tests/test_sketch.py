"""CMS + HLL sketches (operators/sketch.py): overestimate property,
estimate accuracy, and determinism across partitionings (mergeability)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geneticalgorithmsusingmapreduce_spark.operators import sketch


def test_cms_never_underestimates(spark):
    df = spark.range(5000).select((F.col("id") % 97).alias("k"))
    rows = sketch.cms_frequencies(df, "k", top_n=30).collect()
    assert len(rows) == 30
    assert all(r.cms_est >= r.exact_n for r in rows)


def test_cms_exact_when_no_collision(spark):
    # 3 distinct keys in a 4x64 sketch: collision odds in all 4 rows are
    # negligible, so min-of-rows recovers exact counts
    df = spark.createDataFrame(
        [(1,)] * 10 + [(2,)] * 5 + [(3,)] * 1, "k long"
    )
    rows = {r.k: (r.exact_n, r.cms_est)
            for r in sketch.cms_frequencies(df, "k").collect()}
    assert rows == {1: (10, 10), 2: (5, 5), 3: (1, 1)}


def test_hll_estimate_within_bound(spark):
    # raw HLL at M=16: sigma = 1.04/4 = 26%; 1000 distinct ids must land
    # well inside 3 sigma
    df = spark.range(1000).select(F.col("id").alias("k"))
    r = sketch.hll_distinct(df, "k").collect()[0]
    assert r.exact_distinct == 1000
    assert abs(r.hll_est - 1000) < 1000 * 0.78
    assert r.err_pm == (r.hll_est - 1000) * 1000 // 1000


def test_hll_partitioning_invariant(spark):
    # registers are per-key maxima — the estimate must not depend on how
    # rows are partitioned (the mergeable-summary property)
    df = spark.range(2000).select((F.col("id") % 500).alias("k"))
    a = sketch.hll_distinct(df, "k").collect()[0]
    b = sketch.hll_distinct(df.repartition(13), "k").collect()[0]
    assert (a.hll_est, a.exact_distinct) == (b.hll_est, b.exact_distinct)


def test_bloom_no_false_negatives_and_bounded_fpp(spark):
    from pyspark.sql import functions as F

    fact = spark.range(4000).select((F.col("id") % 2000).alias("k"))
    build = spark.range(100).select((F.col("id") * 7).alias("k"))  # 0,7,...693
    r = sketch.bloom_prune_stats(fact, build, "k").collect()[0]
    # every build key < 700 appears twice in fact (ids k and k+2000 map to
    # the same k mod 2000): true matches = 100 keys x 2 rows
    assert r.fact_rows == 4000
    assert r.true_matches == 200
    assert r.passed >= r.true_matches           # no false negatives
    # 100 keys x 3 hashes in 4096 bits -> fpp ~ (300/4096)^3 < 0.1%
    assert r.passed - r.true_matches <= 40


def test_bloom_empty_build_passes_nothing(spark):
    from pyspark.sql import functions as F

    fact = spark.range(100).select(F.col("id").alias("k"))
    build = spark.range(0).select(F.col("id").alias("k"))
    r = sketch.bloom_prune_stats(fact, build, "k").collect()[0]
    assert (r.fact_rows, r.passed, r.true_matches) == (100, 0, 0)


def test_hll_grouped_matches_global_per_group(spark):
    from geneticalgorithmsusingmapreduce_spark.operators import sketch

    # numeric strings: the seeded hash chain casts keys to bigint
    rows = [(str(i % 97), "a") for i in range(500)]
    rows += [(str(1000 + i % 13), "b") for i in range(100)]
    rows += [(None, "c")] * 5  # group whose keys are all NULL
    df = spark.createDataFrame(rows, "user_id string, event_type string")
    got = {
        r.event_type: r
        for r in sketch.hll_distinct_by(df, "user_id", "event_type").collect()
    }
    assert got["a"].exact_distinct == 97 and got["b"].exact_distinct == 13
    assert got["c"].exact_distinct == 0 and got["c"].hll_est == 0
    # each group's sketch must equal the GLOBAL sketch of that group's
    # rows alone (grouped partial registers == per-group independence)
    for g in ("a", "b"):
        solo = sketch.hll_distinct(
            df.filter(f"event_type = '{g}'"), "user_id"
        ).collect()[0]
        assert got[g].hll_est == solo.hll_est
        assert got[g].err_pm == solo.err_pm
