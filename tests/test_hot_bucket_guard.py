"""Hot-bucket skew guard on the LSH candidate paths (textops
max_bucket): oversized (band, bucket) groups are skipped entirely,
members of a skipped bucket can still pair through their other bands,
and the default (None) is a byte-identical no-op. Rationale: a bucket
of size m lands m·(m−1)/2 candidate pairs in ONE sort-merge-join task;
the sf100 probe stalled/spilled on exactly this (BASELINE.md r6)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from geneticalgorithmsusingmapreduce_spark.operators import textops


def _minhash_sigs(spark, rows):
    # rows: (doc_id, [mh0..mh7])
    return spark.createDataFrame(
        [(d, *mh) for d, mh in rows],
        "doc_id long, " + ", ".join(f"mh{i} long" for i in range(8)),
    )


def test_minhash_cap_drops_hot_bucket_keeps_small(spark):
    # 10 boilerplate docs share ALL 8 minhashes -> every band bucket has
    # size 10; docs 100/101 share only band 0 (mh0, mh1) -> bucket of 2
    hot = [(i, [7, 8, 9, 10, 11, 12, 13, 14]) for i in range(10)]
    pair = [
        (100, [1, 2, 300, 301, 302, 303, 304, 305]),
        (101, [1, 2, 400, 401, 402, 403, 404, 405]),
    ]
    sigs = _minhash_sigs(spark, hot + pair)
    capped = {
        (r.doc_a, r.doc_b)
        for r in textops.lsh_candidate_pairs(sigs, max_bucket=4).collect()
    }
    assert capped == {(100, 101)}
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in textops.lsh_candidate_pairs(sigs).collect()
    }
    # guard only removes pairs, never invents them
    assert capped < uncapped
    assert len(uncapped) == 10 * 9 // 2 + 1


def test_minhash_cap_other_bands_still_pair(spark):
    # docs 0..5 share band 0 (hot, size 6 > cap 4) AND docs 0/1 also
    # share band 3 (bucket of 2): the hot band is skipped, the small
    # band still yields the (0, 1) candidate
    rows = []
    for i in range(6):
        mh = [5, 6, 100 + i, 200 + i, 300 + i, 400 + i, 500 + i, 600 + i]
        rows.append((i, mh))
    rows[0] = (0, rows[0][1][:6] + [77, 78])
    rows[1] = (1, rows[1][1][:6] + [77, 78])
    sigs = _minhash_sigs(spark, rows)
    got = {
        (r.doc_a, r.doc_b)
        for r in textops.lsh_candidate_pairs(sigs, max_bucket=4).collect()
    }
    assert got == {(0, 1)}


def test_simhash_cap_semantics(spark):
    # 40 docs with an identical fingerprint -> all four 16-bit band
    # buckets have size 40 (hamming 0 pairs, but pure boilerplate mass);
    # docs 900/901 differ by one bit -> three shared band buckets of 2
    ident = [(i, 0x1111_2222_3333_4444) for i in range(40)]
    near = [(900, 0x0A0A_0B0B_0C0C_0D0D), (901, 0x0A0A_0B0B_0C0C_0D0C)]
    sigs = spark.createDataFrame(ident + near, "doc_id long, simhash long")
    capped = textops.simhash_pairs(sigs, max_bucket=16).collect()
    assert {(r.doc_a, r.doc_b, r.hamming) for r in capped} == {(900, 901, 1)}
    uncapped = textops.simhash_pairs(sigs).collect()
    assert len(uncapped) == 40 * 39 // 2 + 1


def test_cap_none_is_identity(spark):
    sigs = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5)], "doc_id long, simhash long"
    )
    a = {(r.doc_a, r.doc_b) for r in textops.simhash_pairs(sigs).collect()}
    b = {
        (r.doc_a, r.doc_b)
        for r in textops.simhash_pairs(sigs, max_bucket=None).collect()
    }
    assert a == b == {(1, 2), (1, 3), (2, 3)}


def test_duck_qualify_fragment_matches_semantics():
    # the DuckDB twin prunes the same window the Spark side prunes
    frag = textops._duck_bucket_qualify(2)
    rows = duckdb.sql(
        "SELECT doc_id FROM (VALUES (1, 0, 7), (2, 0, 7), (3, 0, 7),"
        f" (4, 1, 9)) t(doc_id, band, bucket) {frag} ORDER BY doc_id"
    ).fetchall()
    assert rows == [(4,)]
    assert textops._duck_bucket_qualify(None) == ""
