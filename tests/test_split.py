"""Deterministic split properties (operators/split.py): assignment is a
pure function of (seed, key) — stable under subsetting/append — and the
per-mille thresholds produce roughly the requested proportions."""

from __future__ import annotations

import pyspark.sql.functions as F

from geneticalgorithmsusingmapreduce_spark.operators import split
from geneticalgorithmsusingmapreduce_spark.sources.registry import read_table

SF = "/root/testdata/sf0.001"


def test_split_stable_under_subset(spark):
    docs = read_table(spark, SF, "documents").select("doc_id")
    full = {
        r.doc_id: (r.pm, r.split)
        for r in split.assign_splits(docs).collect()
    }
    sub = docs.filter(F.col("doc_id") % 3 == 0)
    for r in split.assign_splits(sub).collect():
        assert full[r.doc_id] == (r.pm, r.split)


def test_split_proportions_and_seed_sensitivity(spark):
    docs = read_table(spark, SF, "documents").select("doc_id")
    counts = dict(
        (r.split, r.n)
        for r in split.assign_splits(docs)
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    n = sum(counts.values())
    assert 0.7 < counts["train"] / n < 0.9
    assert 0.03 < counts["val"] / n < 0.2
    assert 0.03 < counts["test"] / n < 0.2

    a = {r.doc_id: r.split for r in split.assign_splits(docs, seed=1).collect()}
    b = {r.doc_id: r.split for r in split.assign_splits(docs, seed=2).collect()}
    assert any(a[k] != b[k] for k in a)  # seed actually feeds the hash


def test_importance_sample_stable_and_bounded(spark):
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    kept = {
        r.doc_id: (r.keep_pm, r.pm)
        for r in split.importance_sample(docs).collect()
    }
    n = docs.count()
    # clamp bounds: keep rate must land within [floor, ceil] per-mille
    assert 0.05 * n <= len(kept) <= 0.95 * n
    assert all(100 <= k <= 900 and p < k for k, p in kept.values())
    # decision is a pure function of (seed, doc_id, text): a re-read of a
    # repartitioned subset keeps exactly the same documents
    sub = docs.filter(F.col("doc_id") % 2 == 0).repartition(7)
    sub_kept = {
        r.doc_id: (r.keep_pm, r.pm)
        for r in split.importance_sample(sub).collect()
    }
    assert sub_kept == {
        k: v for k, v in kept.items() if k % 2 == 0
    }


def test_mixture_sample_downsamples_toward_target(spark):
    from pyspark.sql import functions as F

    from geneticalgorithmsusingmapreduce_spark.operators import split as sp
    from geneticalgorithmsusingmapreduce_spark.sources.registry import (
        read_table,
    )

    docs = read_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "source", "text"
    )
    weights = {f"src{i}": (i % 4) + 1 for i in range(17)}
    kept = sp.mixture_sample(docs, weights)
    rows = kept.collect()
    # unlisted sources are dropped entirely
    assert all(r.source in weights for r in rows)
    # with uniform actual shares (1/17) and target share 4/Σw > 1/17,
    # weight-4 sources are under-represented -> rate clamps to 1, every
    # doc kept; weight-1 sources are over-represented -> strictly thinned
    per = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_docs = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s, w in weights.items():
        if w == 4:
            assert per.get(s, 0) == n_docs[s], s
        if w == 1:
            assert per.get(s, 0) < n_docs[s], s
    # pure function of (seed, doc_id): stable under repartitioning
    again = {
        (r.doc_id, r.source)
        for r in sp.mixture_sample(docs.repartition(7), weights).collect()
    }
    assert again == {(r.doc_id, r.source) for r in rows}


def test_mixture_sample_zero_token_source(spark):
    # ADVICE r3: a listed source whose docs ALL tokenize to zero tokens
    # has no token mass to thin — it must keep everything (rate40 =
    # 2^40 > any 40-bit draw) instead of tripping ANSI DIVIDE_BY_ZERO
    rows = [(i, "a", f"real text number {i} with words") for i in range(40)]
    rows += [(100 + i, "z", "") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = split.mixture_sample(docs, {"a": 1, "z": 1}, seed=7)
    got = {(r.doc_id, r.source) for r in out.collect()}
    assert {(100 + i, "z") for i in range(5)} <= got  # all z docs kept
    assert all(s in ("a", "z") for _, s in got)
