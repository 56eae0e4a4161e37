"""Chunk-level exact dedup (operators/dedup.dedup_exact_chunks): the
repeated-paragraph duplication mode document-level digests cannot see.
Reference scope note: the reference engine has no text pipeline at all —
this is part of the LLM-training-data extension surface (SURVEY.md §6)."""

from __future__ import annotations

from geneticalgorithmsusingmapreduce_spark.operators import (
    dedup, pipeline,
)


def _mk_docs(spark, boiler, n=8, boil_every=4):
    rows = []
    for i in range(1, n + 1):
        body = " ".join(f"d{i}w{j}" for j in range(40))
        text = f"{boiler} {body}" if i % boil_every == 0 else body
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_chunks_collapse(spark):
    # 32-token boilerplate == one full chunk window: chunk 0 of every
    # boilerplated doc is byte-identical, every other chunk is unique
    boiler = " ".join(f"bp{j}" for j in range(32))
    docs = _mk_docs(spark, boiler, n=8, boil_every=4)  # docs 4, 8 boiled
    out = dedup.dedup_exact_chunks(pipeline.chunk_documents(docs)).collect()
    by_rep = {(r.doc_id, r.chunk_id): r.dup_count for r in out}
    # the boilerplate chunk collapsed to its smallest owner (doc 4,
    # chunk 0) and absorbed doc 8's copy
    assert by_rep[(4, 0)] == 2
    assert (8, 0) not in by_rep
    # everything else is unique
    assert all(c == 1 for k, c in by_rep.items() if k != (4, 0))
    # document-level dedup would have seen NOTHING: all texts distinct
    assert docs.select("text").distinct().count() == 8


def test_representative_is_lexicographic_min(spark):
    # identical chunk content owned by (doc 2, chunk 1) and (doc 2,
    # chunk 3) and (doc 1, chunk 5): representative must be the struct
    # min (1, 5), NOT min doc with min chunk independently
    rows = [
        (2, 1, 3, "x y z"),
        (2, 3, 3, "x y z"),
        (1, 5, 3, "x y z"),
        (1, 0, 2, "a b"),
    ]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_id long, n_chunk_tokens long, "
              "chunk_text string",
    )
    out = {
        (r.doc_id, r.chunk_id): r.dup_count
        for r in dedup.dedup_exact_chunks(chunks).collect()
    }
    assert out == {(1, 5): 3, (1, 0): 1}


def test_chunk_dedup_shuffles_digests_not_text(spark):
    # the exchange must carry the 16-byte digest projection, never
    # chunk_text — pin it in the optimized plan: no Exchange input
    # schema contains chunk_text
    boiler = " ".join(f"bp{j}" for j in range(32))
    docs = _mk_docs(spark, boiler)
    df = dedup.dedup_exact_chunks(pipeline.chunk_documents(docs))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the Aggregate's child projection carries digest_bin + ids only;
    # chunk_text exists below the digest projection, not above it
    agg_idx = plan.index("Aggregate")
    assert "chunk_text" not in plan[:agg_idx]


def test_chunk_near_dup_finds_planted_perturbed_pairs(spark):
    # r8 (r7 VERDICT "Next round" #3): the chunk-level LSH pipeline must
    # recover the planted perturbed-paragraph pairs — docs 8k and 8k+4
    # share a pair-keyed 32-token paragraph differing in ONE trailing
    # token, so their chunk 0s are near- but not exact-duplicates
    from geneticalgorithmsusingmapreduce_spark import catalog

    sf = "/root/testdata/sf0.001"
    found = {
        (r.doc_a, r.chunk_a, r.doc_b, r.chunk_b)
        for r in catalog.QUERIES["chunk_dedup_neardup"](spark, sf).collect()
    }
    n_docs = catalog.read_table(spark, sf, "documents").count()
    planted = {
        (8 * k, 0, 8 * k + 4, 0)
        for k in range(0, (n_docs - 4) // 8 + 1)
        if 8 * k + 4 < n_docs
    }
    hit = planted & found
    # deterministic seeded LSH: ≥90% of planted pairs band-collide
    # (k=8/b=4 at J≈0.935 → expected recall ~99.98%)
    assert len(hit) >= 0.9 * len(planted), (len(hit), len(planted))
    # ...and chunk-level EXACT dedup provably cannot see them: the
    # paired chunk texts differ (bp31 vs zz8)
    from geneticalgorithmsusingmapreduce_spark.operators import (
        dedup, pipeline,
    )

    boiled = catalog._nd_boiler_docs(spark, sf)
    reps = dedup.dedup_exact_chunks(pipeline.chunk_documents(boiled))
    dup_chunk0 = {
        (r.doc_id, r.chunk_id)
        for r in reps.filter("dup_count > 1 and chunk_id = 0").collect()
        if r.doc_id % 8 in (0, 4)
    }
    assert not dup_chunk0, dup_chunk0


def test_containment_excerpts_collapse_in_composed_pipeline(spark):
    # r9 (r8 VERDICT "Next round" #4): the planted excerpt docs —
    # unique digest, whole-doc J below τ, but their single chunk a
    # near-copy of the base doc's chunk 0 — must survive every stage
    # the plain pipeline runs and be DROPPED by the chunk-containment
    # stage of the composed pipeline, crediting the base via
    # cc_absorbed.
    from geneticalgorithmsusingmapreduce_spark import catalog

    sf = "/root/testdata/sf0.001"
    docs = catalog._cc_docs(spark, sf)
    planted = {
        r.doc_id for r in docs.filter("doc_id >= 2000000").collect()
    }
    assert planted, "fixture planted no excerpts at this sf"

    from geneticalgorithmsusingmapreduce_spark.operators import pipeline

    plain = {
        r.doc_id
        for r in pipeline.curate_corpus_neardup(docs).collect()
    }
    kept_plain = planted & plain
    # the plain pipeline provably KEEPS the excerpts: unique digests,
    # below doc-level τ. (A 32-token excerpt can guess a different
    # LANGUAGE than its base and die at the gate — doc 190's does at
    # sf0.001 — so assert near-total survival, not total.)
    assert len(kept_plain) >= 0.8 * len(planted), (
        len(kept_plain), len(planted),
    )

    composed = pipeline.curate_corpus_chunk_neardup(docs)
    rows = composed.collect()
    kept_composed = kept_plain & {r.doc_id for r in rows}
    assert not kept_composed, f"excerpts survived: {kept_composed}"
    # absorption is credited to base docs, one per chunk-dropped excerpt
    absorbed = sum(r.cc_absorbed for r in rows)
    assert absorbed == len(kept_plain)
    bases = {r.doc_id for r in rows if r.cc_absorbed > 0}
    assert bases and all(b < 2_000_000 for b in bases)


def test_chunk_count_closed_form_matches_chunking(spark):
    # the containment denominator uses ⌈max(n_tokens−32,0)/16⌉+1 from
    # the GATE's n_tokens instead of re-chunking the corpus (an sf100
    # second-full-scan trap) — the formula must equal chunk_documents'
    # actual per-doc counts (lower() in the gate tokenizer doesn't
    # change whitespace splits)
    from pyspark.sql import functions as F

    from geneticalgorithmsusingmapreduce_spark import catalog
    from geneticalgorithmsusingmapreduce_spark.functions import text as tf
    from geneticalgorithmsusingmapreduce_spark.operators import pipeline

    docs = catalog.read_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).select("doc_id", "text")
    actual = (
        pipeline.chunk_documents(docs)
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("nc"))
    )
    formula = docs.select(
        "doc_id",
        F.expr(
            f"cast(ceil(greatest(cast(size({tf.SPARK_TOKENS}) as bigint)"
            f" - 32, 0) / 16.0) as int) + 1"
        ).alias("ncf"),
    )
    diff = (
        actual.join(formula, "doc_id")
        .filter("nc != ncf")
        .count()
    )
    assert diff == 0


def test_candidate_restricted_chunking_matches_unrestricted(spark):
    # r10 (r9 VERDICT "Next round" #2): the candidate-restricted
    # pipeline must produce EXACTLY the unrestricted composition's
    # output on the planted corpus — the inverted-index restriction is
    # a scale heuristic whose recall is measured, not assumed. Run
    # both over the FULL-corpus fixture and diff row sets.
    from geneticalgorithmsusingmapreduce_spark import catalog
    from geneticalgorithmsusingmapreduce_spark.operators import pipeline

    sf = "/root/testdata/sf0.001"
    docs = catalog._cc_full_docs(spark, sf)
    unres = {
        tuple(r)
        for r in pipeline.curate_corpus_chunk_neardup(docs).collect()
    }
    res = {
        tuple(r)
        for r in pipeline.curate_corpus_chunk_containment(docs).collect()
    }
    assert res == unres, (
        f"only-restricted={len(res - unres)} "
        f"only-unrestricted={len(unres - res)}"
    )


def test_full_corpus_containment_entry_drops_planted_excerpts(spark):
    # the registered full-corpus entry: every planted excerpt that the
    # doc-level stages keep must be dropped by the chunk stage, with
    # absorption credited to a base doc
    from geneticalgorithmsusingmapreduce_spark import catalog

    sf = "/root/testdata/sf0.001"
    docs = catalog._cc_full_docs(spark, sf)
    planted = {
        r.doc_id for r in docs.filter("doc_id >= 2000000").collect()
    }
    assert planted
    rows = catalog.corpus_curation_chunk_containment(spark, sf).collect()
    surviving = planted & {r.doc_id for r in rows}
    assert not surviving, f"excerpts survived: {surviving}"
    assert sum(r.cc_absorbed for r in rows) >= 0.8 * len(planted)

def test_repeated_spans_find_shifted_plants(spark):
    # r11 VERDICT #2: arbitrary-offset repeated spans that fixed
    # 32-token chunk windows provably miss. Hand-built corpus: doc 1 is
    # 30 unique tokens; doc 2 re-plants doc 1's tokens 4..23 (0-based
    # 3..22, 20 tokens) at token offset 7 behind unique fillers.
    span = " ".join(f"s{j}" for j in range(20))
    rows = [
        (1, "a0 a1 a2 " + span + " a3 a4 a5 a6"),
        (2, "p0 p1 p2 p3 p4 p5 p6 " + span + " q0 q1 q2 q3 q4"),
        (3, " ".join(f"u{j}" for j in range(30))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in dedup.repeated_span_dedup(docs, k=8).collect()
    }
    # doc 1's copy sits at offsets 3..22, doc 2's at 7..26; 20 tokens,
    # 13 duplicated 8-windows each; doc 3 is untouched
    assert spans == {(1, 3, 22, 20, 13), (2, 7, 26, 20, 13)}
    # the same corpus through chunk-exact dedup: no chunk collapses —
    # the shifted plant is invisible to fixed 32-token windows
    chunked = dedup.dedup_exact_chunks(pipeline.chunk_documents(docs))
    assert all(r.dup_count == 1 for r in chunked.collect())


def test_repeated_spans_within_doc_and_merge(spark):
    # a within-doc repeat counts (the suffix-array formulation marks
    # both sites), and overlapping windows merge into ONE maximal span
    body = " ".join(f"w{j}" for j in range(8))
    rows = [(1, body + " x0 x1 x2 " + body)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        (r.span_start, r.span_end, r.span_tokens)
        for r in dedup.repeated_span_dedup(docs, k=8).collect()
    }
    # two 8-token sites at offsets 0 and 11; gap of 3 unique tokens
    # keeps them as separate islands (11 - 0 > k)
    assert spans == {(0, 7, 8), (11, 18, 8)}


def test_repeated_spans_fixture_plants_marked_exactly(spark):
    # the registered fixture: every plant doc (id ≥ 3,000,000) must
    # carry exactly one span [7, 26] — fillers are per-doc unique, so
    # nothing can extend an island across them
    from geneticalgorithmsusingmapreduce_spark.operators import textops

    corpus = textops.span_corpus(spark, "/root/testdata/sf0.001")
    out = dedup.repeated_span_dedup(corpus, k=8).collect()
    plants = {}
    for r in out:
        if r.doc_id >= 3_000_000:
            plants.setdefault(r.doc_id, []).append(r)
    n_planted = corpus.filter("doc_id >= 3000000").count()
    assert n_planted > 0 and len(plants) == n_planted
    for doc_id, rs in plants.items():
        assert len(rs) == 1
        assert (rs[0].span_start, rs[0].span_end) == (7, 26)


def test_span_removal_cuts_shifted_plant_keeps_canonical(spark):
    # r12 VERDICT #1: removal semantics — the corpus-wide FIRST
    # occurrence (min (doc_id, pos)) survives, every later occurrence
    # is cut, and untouched docs come back tokenizer-normalized only
    span = " ".join(f"s{j}" for j in range(20))
    rows = [
        (1, "a0 a1 a2 " + span + " a3 a4 a5 a6"),
        (2, "p0 p1 p2 p3 p4 p5 p6 " + span + " q0 q1 q2 q3 q4"),
        (3, " ".join(f"u{j}" for j in range(30))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.repeated_span_removal(docs, k=8).collect()}
    # doc 1 holds the canonical copy: untouched
    assert out[1].text == rows[0][1]
    assert out[1].span_dropped_tokens == 0 and out[1].n_spans == 0
    # doc 2's shifted copy (tokens 7..26) is cut, fillers survive
    assert out[2].text == "p0 p1 p2 p3 p4 p5 p6 q0 q1 q2 q3 q4"
    assert out[2].span_dropped_tokens == 20 and out[2].n_spans == 1
    assert out[2].n_tokens == 12
    assert out[3].span_dropped_tokens == 0


def test_span_removal_fully_cut_and_within_doc(spark):
    # an exact duplicate doc is cut to EMPTY (span-granularity exact
    # dup — its content survives at the canonical site), and a
    # within-doc repeat loses its SECOND site only
    body = " ".join(f"w{j}" for j in range(8))
    rows = [
        (1, " ".join(f"u{j}" for j in range(30))),
        (2, " ".join(f"u{j}" for j in range(30))),
        (3, body + " x0 x1 x2 " + body),
        (4, "v0 v1 v2 v3 v4 v5"),  # < k tokens: never marked
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.repeated_span_removal(docs, k=8).collect()}
    assert out[1].span_dropped_tokens == 0
    assert out[2].text == "" and out[2].n_tokens == 0
    assert out[2].span_dropped_tokens == 30 and out[2].n_spans == 1
    assert out[3].text == body + " x0 x1 x2"
    assert out[3].span_dropped_tokens == 8
    assert out[4].text == rows[3][1] and out[4].span_dropped_tokens == 0


def test_span_removal_engine_parity_and_fixture(spark):
    # the registered entry's shape: spark vs the DuckDB twin must agree
    # byte-for-byte on the span_corpus fixture (rewritten text included
    # — the gate hash covers it), and every plant must lose exactly
    # [7, 26] while its base is untouched
    import duckdb

    from geneticalgorithmsusingmapreduce_spark.operators import textops

    sf = "/root/testdata/sf0.001"
    corpus = textops.span_corpus(spark, sf)
    got = sorted(
        tuple(r) for r in dedup.repeated_span_removal(corpus).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    duck = sorted(con.sql(
        "SELECT * FROM "
        + dedup.duck_repeated_span_removal_sql(textops.DUCK_SPAN_AUG)
        + " _q"
    ).fetchall())
    assert got == duck and len(got) > 0
    plants = [r for r in got if r[0] >= 3_000_000]
    n_planted = corpus.filter("doc_id >= 3000000").count()
    assert len(plants) == n_planted > 0
    for _id, text, n_tokens, dropped, n_spans in plants:
        assert (n_tokens, dropped, n_spans) == (12, 20, 1)
        assert text.startswith("pre") and text.endswith("x4")
