"""IVF generation lifecycle (streaming/ivf_rebuild.py): atomic
marker-file commit, serve continuity through a rebuild, rebuild ≡
from-scratch build. r9 VERDICT "Next round" #3."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geneticalgorithmsusingmapreduce_spark.operators import ann
from geneticalgorithmsusingmapreduce_spark.sources.registry import read_table
from geneticalgorithmsusingmapreduce_spark.streaming import ivf_rebuild as ir

SF = "/root/testdata/sf0.001"


def _serve_rows(spark, d):
    cents, postings = ir.read_serve_tables(spark, d)
    return {
        tuple(r)
        for r in ann.ivf_serve_topk_int8(postings, cents).collect()
    }


def test_generation_swap_serve_continuity(spark, tmp_path):
    # the lifecycle contract: an uncommitted generation is INVISIBLE;
    # the old generation serves bit-identically until the marker lands;
    # the swap is the marker create alone; deleting the superseded
    # generation never disturbs the serve output
    emb = read_table(spark, SF, "embeddings")
    d = str(tmp_path / "idx")

    # no committed generation yet → serving must fail loudly
    with pytest.raises(FileNotFoundError):
        ir.serve_generation(spark, d)

    # gen 0: first-C-seeded centroids (the ivf_topk baseline quantizer)
    qz = emb.select("vec_id", F.expr(ann.quantize_expr()).alias("qv"))
    seed_rows = [
        (int(r.vec_id), [int(x) for x in r.qv])
        for r in qz.filter("vec_id < 8").collect()
    ]
    ir.write_generation(spark, emb, d, 0, seed_rows)
    with pytest.raises(FileNotFoundError):
        ir.serve_generation(spark, d)  # written but NOT committed
    ir.commit_generation(spark, d, 0)
    assert ir.serve_generation(spark, d) == 0
    gen0 = _serve_rows(spark, d)

    # gen 1 written (trained quantizer) — old generation still serves
    trained_rows, _ = ann.train_centroid_rows(
        emb, n_centroids=8, iters=3, compute_inertia=False
    )
    ir.write_generation(spark, emb, d, 1, trained_rows)
    assert ir.serve_generation(spark, d) == 0
    assert _serve_rows(spark, d) == gen0

    # the swap is one atomic marker create
    ir.commit_generation(spark, d, 1)
    assert ir.serve_generation(spark, d) == 1
    gen1 = _serve_rows(spark, d)
    assert gen1 != gen0  # trained quantizer changes probe/serve sets

    # deleting the superseded generation is a separate post-swap step
    ir.delete_generation(spark, d, 0)
    assert ir.committed_generations(spark, d) == [1]
    assert _serve_rows(spark, d) == gen1

    # double-commit is an error, not a silent overwrite
    with pytest.raises(FileExistsError):
        ir.commit_generation(spark, d, 1)


def test_rebuild_matches_from_scratch_build(spark, tmp_path):
    # rebuild_index over a drifted gen-0 index must serve EXACTLY what
    # a from-scratch trained build serves (the oracle also pins this
    # cross-engine; here we pin it Spark-vs-Spark without the stream)
    emb = read_table(spark, SF, "embeddings")
    d = str(tmp_path / "idx")
    qz = emb.select("vec_id", F.expr(ann.quantize_expr()).alias("qv"))
    seed_rows = [
        (int(r.vec_id), [int(x) for x in r.qv])
        for r in qz.filter("vec_id < 8").collect()
    ]
    ir.write_generation(spark, emb, d, 0, seed_rows)
    ir.commit_generation(spark, d, 0)

    assert ir.rebuild_index(spark, emb, d, n_centroids=8, iters=3) == 1
    rebuilt = _serve_rows(spark, d)

    cents, _ = ann.train_centroids(
        emb, n_centroids=8, iters=3, compute_inertia=False
    )
    scratch = {
        tuple(r) for r in ann.ivf_topk_int8(emb, cents).collect()
    }
    assert rebuilt == scratch


def test_append_alarm_rebuild_composed(spark, tmp_path):
    # r10 VERDICT #6: append → skew alarm → retrain → atomic generation
    # swap, all inside ONE foreachBatch maintenance path. Batch 0 is
    # diverse (trains a spread quantizer); batches 1-2 pile onto one
    # region, driving max/mean list skew over the threshold.
    emb = read_table(spark, SF, "embeddings").select(
        "vec_id",
        F.expr(
            "CASE WHEN vec_id % 3 = 0 THEN embedding "
            "ELSE transform(embedding, (x, i) -> cast(0.9 + "
            "(vec_id % 7) * 0.001 + i * 0.0001 as float)) END"
        ).alias("embedding"),
    )
    idx = str(tmp_path / "genidx")
    st = ir.start_ivf_append_gen(
        spark, emb, idx, n_batches=3, n_centroids=4, iters=2,
        rebuild_skew=1.5,
    )
    # the alarm fired and triggered at least one in-stream rebuild
    assert st.rebuilds, st.history
    # mid-rebuild, readers still resolved the OLD generation (the
    # uncommitted N+1 directory is invisible until the marker lands)
    for (b, old, new, skew), seen in zip(st.rebuilds, st.mid_rebuild_serve):
        assert seen == old
        assert skew > 1.5
    # deletion is DEFERRED past the committing batch (r11 ADVICE: an
    # in-flight reader of generation N must survive N+1's commit): any
    # in-stream GC ran at a strictly later batch than the rebuild that
    # superseded the generation it removed
    gc_batch = {gen: b for b, gen in st.gc_done}
    for b, old, new, skew in st.rebuilds:
        if old in gc_batch:
            assert gc_batch[old] > b, (st.rebuilds, st.gc_done)
    # a generation superseded in the FINAL batch is still on disk —
    # draining pending_gc is the caller's explicit post-stream GC step
    for gen in st.pending_gc:
        assert gen in ir.committed_generations(spark, idx)
        ir.delete_generation(spark, idx, gen)
    # post-GC: exactly the latest generation is committed, the old
    # ones are deleted, and serving resolves the new one
    assert ir.committed_generations(spark, idx) == [st.gen]
    assert ir.serve_generation(spark, idx) == st.gen
    assert st.gen == st.rebuilds[-1][2]
    # no vector lost across the swap: the final generation's postings
    # hold every ingested vec_id exactly once
    cents, postings = ir.read_serve_tables(spark, idx)
    got = sorted(r.vec_id for r in postings.select("vec_id").collect())
    want = sorted(r.vec_id for r in emb.select("vec_id").collect())
    assert got == want
    # and the index serves: top-k against the new generation works
    res = ann.ivf_serve_topk_int8(postings, cents, n_queries=2, k=5)
    byq = {}
    for r in res.collect():
        byq.setdefault(r.query_id, []).append(r)
    assert byq and all(len(v) == 5 for v in byq.values())
