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

def test_full_ladder_engine_parity(spark):
    # r11 VERDICT #3 (+ the span rung, r12 #1): the fully-composed
    # ladder — span cut included — hash-replays end to end
    from geneticalgorithmsusingmapreduce_spark import catalog

    con = _views(SF)
    got = sorted(
        tuple(r)
        for r in catalog.QUERIES["corpus_curation_full"](spark, SF).collect()
    )
    duck = sorted(con.sql(
        "SELECT * FROM " + pipe.duck_curate_full_sql(
            catalog._FULL_LADDER_DUCK, ann.DUCK_PARA_EMB, span_k=13
        ) + " _q"
    ).fetchall())
    assert got == duck
    assert len(got) > 0


def test_full_ladder_one_victim_class_per_rung(spark):
    # each plant class dies at ITS rung and is credited there: +5M exact
    # copies at the digest, +1M perturbed near-dups at doc LSH, +4M
    # excerpts at chunk containment, +2M paraphrases at the semantic
    # stage, and the ppl stage drops exactly the top decile of stage-5
    # survivors. Runs WITH the span rung (the entry's config,
    # span_k=13), so the +3M span class is asserted here too.
    from geneticalgorithmsusingmapreduce_spark import catalog

    docs = catalog._full_ladder_docs(spark, SF)
    emb = ann.paraphrase_embeddings(spark, SF)
    # which base ids pass the gates (lang + >= 12 tokens)?
    toks = "filter(split(lower(text), ' '), t -> t != '')"
    gated = {
        r.doc_id
        for r in docs.filter(F.expr(f"size({toks}) >= 12"))
        .filter(F.expr(
            pipe._lang_guess_expr("spark")) == "en").collect()
    }
    final2, _cut = pipe._semdedup_final(docs, emb, span_k=13)
    rows = {r.doc_id: r for r in final2.collect()}
    survivors = set(rows)
    # stage-2.5 victims (span rung, r12 #1): every +3M span plant
    # whose 20-token slice was re-planted at a shifted offset SURVIVES
    # as a document but loses exactly that span — 20 tokens credited —
    # while its base keeps the canonical occurrence; all OTHER plant
    # classes are span-blind by construction (substitutions every
    # ≤ 12 tokens, k = 13), pinned separately below
    sp = {d for d in gated if 3_000_000 <= d < 4_000_000
          and d - 3_000_000 in gated}
    sp_rows = {d: rows[d] for d in sp & survivors}
    assert sp and len(sp_rows) >= 0.9 * len(sp)
    assert all(r.span_dropped_tokens == 20 for r in sp_rows.values())
    assert all(r.n_tokens == 12 for r in sp_rows.values())
    # stage-2 victims: every exact copy whose base passed gates is
    # gone, and its base carries dup_count 2
    xc = {d for d in gated if d >= 5_000_000}
    assert xc and not (xc & survivors)
    for d in xc:
        base = d - 5_000_000
        if base in rows:
            assert rows[base].dup_count == 2
    # stage-3 victims: the BULK of perturbed near-dups whose base
    # passed gates dies with nd_dropped credit on the base. The
    # every-12th-token substitution (span-rung blindness, J ≈ 0.6)
    # makes banded-LSH candidacy probabilistic per plant
    # (P = 1-(1-J²)⁴ ≈ 0.83) — deterministic for the fixed corpus and
    # identical in the oracle, but no longer all-plants like the old
    # J ≈ 1 ' zz9' construction
    nd = {d for d in gated if 1_000_000 <= d < 2_000_000
          and d - 1_000_000 in gated}
    nd_dead = nd - survivors
    assert nd and len(nd_dead) >= 0.7 * len(nd)
    # a plant that slips past a band can still die at chunk
    # containment (its unperturbed chunks match the base at J ≥ 0.5) —
    # it is then credited in cc_absorbed, so nd_dropped accounts for
    # the bulk but not necessarily all of nd_dead (measured at
    # sf0.001: 42 of 44, the other 2 caught downstream)
    assert sum(r.nd_dropped for r in rows.values()) >= 0.85 * len(nd_dead)
    # stage-4 victims: the BULK of excerpts dies (bases have >= 80
    # tokens, so they always pass gates), with cc_absorbed credit —
    # same probabilistic-candidacy note (zq + zr substitutions,
    # chunk J ≈ 0.67, P ≈ 0.9 per excerpt)
    ex = {d for d in gated if 4_000_000 <= d < 5_000_000}
    ex_dead = ex - survivors
    assert ex and len(ex_dead) >= 0.7 * len(ex)
    assert sum(r.cc_absorbed for r in rows.values()) >= len(ex_dead)
    # stage-5 victims: the BULK of paraphrases collapses (the cluster
    # restriction may miss a boundary plant — SemDeDup's documented
    # trade, same 5 boundary survivors as the paraphrase-only fixture),
    # with sd_absorbed credit on the absorbing bases
    para = {d for d in gated if 2_000_000 <= d < 3_000_000
            and d - 2_000_000 in survivors}
    left = para & survivors
    assert para and len(left) < len(para) / 4
    assert sum(r.sd_absorbed for r in rows.values()) >= len(para) - len(left)
    # stage 6: the composed output keeps exactly n - ceil(n/10) rows
    out = catalog.QUERIES["corpus_curation_full"](spark, SF).collect()
    import math

    n = len(survivors)
    assert len(out) == n - math.ceil(n * 100 / 1000.0)


def test_ladder_plants_span_blind_except_span_class(spark):
    # the "provably keeps" half of the span-rung fixture contract:
    # running repeated-span REMOVAL at the ladder's k=13 over the
    # digest-survivor fixture must cut the +3M span plants (exactly
    # their 20-token slice) and NOTHING from the +1M near-dups or +4M
    # excerpts — their substitutions every ≤ 12 tokens mean no
    # 13-token window can repeat against any other doc
    from geneticalgorithmsusingmapreduce_spark import catalog
    from geneticalgorithmsusingmapreduce_spark.operators import dedup

    docs = catalog._full_ladder_docs(spark, SF)
    out = {
        r.doc_id: r
        for r in dedup.repeated_span_removal(docs, k=13).collect()
    }
    nd = [r for d, r in out.items() if 1_000_000 <= d < 2_000_000]
    ex = [r for d, r in out.items() if 4_000_000 <= d < 5_000_000]
    sp = [r for d, r in out.items() if 3_000_000 <= d < 4_000_000]
    assert nd and all(r.span_dropped_tokens == 0 for r in nd)
    assert ex and all(r.span_dropped_tokens == 0 for r in ex)
    assert sp and all(r.span_dropped_tokens == 20 for r in sp)
