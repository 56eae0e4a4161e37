"""Semantic stage composed into the curation pipeline (r10 VERDICT #3):
the paraphrase fixture must sail through every order-sensitive stage
and collapse ONLY at the embedding stage, with sd_absorbed credit."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from geneticalgorithmsusingmapreduce_spark.operators import (
    ann, pipeline as pipe, textops,
)

SF = "/root/testdata/sf0.001"

PLANT_OFFSET = 2_000_000


def _views(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_paraphrase_fixture_engine_parity(spark):
    # the reversed-token doc and perturbed embedding must be
    # byte-identical across engines (they feed a hash-gated entry)
    con = _views(SF)
    sd = {
        r.doc_id: r.text
        for r in textops.paraphrase_corpus(spark, SF).collect()
    }
    dd = dict(con.sql(f"SELECT doc_id, text FROM {textops.DUCK_PARA_AUG} _q").fetchall())
    assert sd == dd
    se = {
        r.vec_id: tuple(r.embedding)
        for r in ann.paraphrase_embeddings(spark, SF).collect()
    }
    de = {
        v: tuple(e)
        for v, e in con.sql(
            f"SELECT vec_id, embedding FROM {ann.DUCK_PARA_EMB} _q"
        ).fetchall()
    }
    assert se == de


def test_paraphrase_survives_every_earlier_stage(spark):
    # stages 1-4 (gates → digest → MinHash/LSH → chunk containment)
    # must keep the planted paraphrases: each plant has a unique digest
    # and word-n-gram shingles disjoint from its base, so only an
    # embedding-level stage can see through it
    docs = textops.paraphrase_corpus(spark, SF)
    final = pipe._chunk_containment_final(docs).collect()
    kept_ids = {r.doc_id for r in final}
    base_kept = {i for i in kept_ids if i < PLANT_OFFSET and i % 10 == 0}
    pairs_kept = {b for b in base_kept if b + PLANT_OFFSET in kept_ids}
    # every gated-in (base, plant) pair rides through stages 1-4 intact
    assert pairs_kept == base_kept
    assert len(pairs_kept) > 0


def test_semantic_stage_drops_paraphrases_with_credit(spark):
    docs = textops.paraphrase_corpus(spark, SF)
    stage4 = {r.doc_id for r in pipe._chunk_containment_final(docs).collect()}
    stage4_plants = {i for i in stage4 if i >= PLANT_OFFSET}
    out = pipe.curate_corpus_semdedup(
        docs, ann.paraphrase_embeddings(spark, SF),
    ).collect()
    ids = {r.doc_id for r in out}
    plants_left = {i for i in ids if i >= PLANT_OFFSET}
    # the semantic stage catches plants stages 1-4 could not (the
    # cluster restriction may miss a boundary plant — SemDeDup's
    # documented trade — but the bulk must collapse)
    assert len(stage4_plants) > 0
    assert len(plants_left) < len(stage4_plants)
    dropped = len(stage4_plants) - len(plants_left)
    # absorbers carry sd_absorbed credit summing to >= the plant drops
    # attributed to surviving reps (attribution to a dropped rep is
    # lost by the single-pass rule, so <= total drops)
    credit = sum(r.sd_absorbed for r in out)
    assert 0 < credit
    assert credit <= len(stage4) - len(ids)
    assert dropped > 0


def test_composed_pipeline_engine_parity(spark):
    con = _views(SF)
    got = sorted(
        tuple(r) for r in pipe.curate_corpus_semdedup(
            textops.paraphrase_corpus(spark, SF),
            ann.paraphrase_embeddings(spark, SF),
        ).collect()
    )
    duck = sorted(con.sql(
        "SELECT * FROM " + pipe.duck_curate_semdedup_sql(
            textops.DUCK_PARA_AUG, ann.DUCK_PARA_EMB
        ) + " _q"
    ).fetchall())
    assert got == duck
    assert len(got) > 0


def test_ppl_stage_drops_most_surprising_decile(spark):
    # the CCNet-style quality filter: rank-based drop removes exactly
    # ceil(n/10) survivors at drop_pm=100, and what drops is the
    # HIGH-surprise tail (rare-token junk), never the boilerplate
    base = " ".join(["the quick brown fox jumps over the lazy dog over"] * 3)
    docs = [(i, base) for i in range(18)]
    docs += [(100 + i, base + f" zzqx{i}a zzqx{i}b zzqx{i}c") for i in range(2)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pipe.curate_corpus_ppl(df, min_tokens=5, ppl_drop_pm=100).collect()
    kept = {r.doc_id for r in out}
    # 18 identical docs collapse to ONE survivor at the digest stage;
    # survivors = {min(base ids)} U {100, 101} = 3 docs -> drop ceil(0.3)=1
    assert len(kept) == 2
    assert 0 in kept          # the boilerplate representative stays
    assert len({100, 101} & kept) == 1  # one junk doc drops (rank ties -> id)
