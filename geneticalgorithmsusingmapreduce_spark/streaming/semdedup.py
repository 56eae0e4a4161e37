"""Streaming semantic dedup: cross-batch embedding near-dup (r11 —
extends the streaming family's exact-digest → MinHash/LSH ladder with
its embedding rung).

An incremental corpus pipeline must semantically dedup NEW documents
against everything already ingested. The state the SemDeDup restriction
needs is exactly the durable artifact the batch operator already
defines: the ASSIGNMENT frame [vec_id, cent_id, qv, n2] (quantized
vector + Voronoi cell under centroids trained once on batch 0 — the
fixed-quantizer discipline of streaming/ivf_append.py; re-training is
the rebuild lifecycle's job, streaming/ivf_rebuild.py).

Topology per micro-batch (foreachBatch, the streaming/neardup.py
pattern; the reference analog is the forked incremental Hadoop's
buffered-state-across-runs idea,
``reference src/edu/illinois/incr_ga/IncMapReduce.java:241-325``):

    batch vecs → Arrow assignment kernel (vs FIXED batch-0 centroids)
    candidates = intra-cluster only: (batch × history) cross blocks +
                 the batch's own upper triangle — history × history
                 pairs are NEVER re-emitted
    verified  = float64 pre-filter + exact decimal(38,0) certificate
                (the batch operator's own verify, unchanged)
    history  ∪= batch assignments; results ∪= pairs tagged found_batch

Every pair is found in EXACTLY the batch where its later member
arrives, so with deterministic routing (vec_id mod n_batches) the final
result set equals the STATIC semantic_cluster_pairs output (trained on
the batch-0 slice) with found_batch = greatest(vec_a mod B, vec_b mod
B) — which the catalog oracle replays symbolically: hash equality
proves the cross-batch state machinery finds precisely the batch
operator's pair set, each exactly once, in the right batch.

Scale notes: the per-batch exchange is keyed on cent_id (batch rows +
history rows ship once per batch — at scale the history side lives as
cent_id-partitioned parquet and only the probed cells re-read, the
ivf_append serve shape); the skew cap applies per-batch exactly as in
the batch operator (the gate entry runs uncapped: order-dependent
physical grouping is inherent to streaming, and the output is
cap-invariant anyway).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import ann
from ..runtime import free_checkpoint, local_checkpoint_truncated

_ASSIGN_SCHEMA = "vec_id long, cent_id long, qv array<long>, n2 long"
_PAIR_BATCH_SCHEMA = (
    "vec_a long, vec_b long, dot long, na2 long, nb2 long, "
    "found_batch long"
)


@dataclass
class SemDedupState:
    assigned: DataFrame  # cumulative [vec_id, cent_id, qv, n2]
    results: DataFrame   # [vec_a, vec_b, dot, na2, nb2, found_batch]
    centroid_rows: list | None = None
    batches_done: int = 0
    history: list[tuple[int, int]] = field(default_factory=list)
    # (batch_id, n_new_pairs)


def start_streaming_semdedup(
    spark: SparkSession,
    emb: DataFrame,
    n_batches: int = 3,
    tau_milli: int = 800,
    n_centroids: int = ann.N_CENTROIDS,
    iters: int = 2,
    timeout_sec: float = 300,
) -> SemDedupState:
    """Ingest ``emb`` [vec_id, embedding] in ``n_batches`` micro-batches
    (routing vec_id % n_batches), semantically deduping each batch
    against the cumulative assignment history. Returns the final state;
    ``results`` carries [vec_a, vec_b, dot, na2, nb2, found_batch]."""
    import time

    t2 = tau_milli * tau_milli
    state = SemDedupState(
        assigned=spark.createDataFrame([], _ASSIGN_SCHEMA),
        results=spark.createDataFrame(
            [], _PAIR_BATCH_SCHEMA
        ),
    )

    def new_vs_all(pdf):
        import pandas as pd

        fresh = pdf["fresh"].to_numpy() == 1
        va, n2a, xfa = ann._sorted_block(pdf, fresh)
        if not len(va):
            return ann._empty_pairs()
        parts = [ann._tile_pairs(va, n2a, xfa, t2=t2)]
        vh, n2h, xfh = ann._sorted_block(pdf, ~fresh)
        if len(vh):
            parts.append(
                ann._tile_pairs(va, n2a, xfa, vh, n2h, xfh, t2=t2)
            )
        return pd.concat(parts, ignore_index=True)

    def one_batch(_df: DataFrame, _bid: int) -> None:
        b = state.batches_done
        if b >= n_batches:
            return
        batch = emb.filter(F.col("vec_id") % n_batches == b)
        if b == 0:
            rows, _ = ann.train_centroid_rows(
                batch, n_centroids, iters,
                compute_inertia=False, seed_by_rank=True,
            )
            state.centroid_rows = rows
        asg = local_checkpoint_truncated(
            ann.kernel_assign(batch, state.centroid_rows)
            .filter(F.col("n2") > 0)
        )
        tagged = (
            asg.withColumn("fresh", F.lit(1))
            .unionByName(state.assigned.withColumn("fresh", F.lit(0)))
        )
        keep = (
            "dot >= 0 AND "
            "cast(1000000 as decimal(38,0)) * cast(dot as decimal(38,0))"
            " * cast(dot as decimal(38,0)) >= "
            f"cast({t2} as decimal(38,0)) * cast(na2 as decimal(38,0))"
            " * cast(nb2 as decimal(38,0))"
        )
        new_pairs = (
            tagged.groupBy("cent_id")
            .applyInPandas(new_vs_all, schema=ann._PAIR_SCHEMA)
            .filter(F.expr(keep))
            .withColumn("found_batch", F.lit(b).cast("long"))
        )
        prev_assigned, prev_results = state.assigned, state.results
        state.assigned = local_checkpoint_truncated(
            prev_assigned.unionByName(asg)
        )
        state.results = local_checkpoint_truncated(
            prev_results.unionByName(new_pairs)
        )
        n_new = state.results.count() - sum(n for _, n in state.history)
        state.history.append((b, n_new))
        free_checkpoint(prev_assigned)
        free_checkpoint(prev_results)
        free_checkpoint(asg)
        state.batches_done = b + 1

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1000).load()
    )
    q = (
        stream.writeStream.foreachBatch(one_batch)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + timeout_sec
        while state.batches_done < n_batches and time.time() < deadline:
            if not q.isActive:
                exc = q.exception()
                raise RuntimeError(
                    f"streaming_semdedup: stream died after "
                    f"{state.batches_done}/{n_batches} batches"
                ) from exc
            time.sleep(0.2)
    finally:
        q.stop()
    if state.batches_done < n_batches:
        raise RuntimeError(
            f"streaming_semdedup: only {state.batches_done}/{n_batches} "
            "batches completed before the deadline"
        )
    return state

