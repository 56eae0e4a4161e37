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
history rows ship once per batch); the skew cap applies per-batch
exactly as in the batch operator (the gate entry runs uncapped:
order-dependent physical grouping is inherent to streaming, and the
output is cap-invariant anyway).

Two variants:

* ``start_streaming_semdedup`` — in-memory cumulative history
  (checkpoint-rotated union). Correct, but the WHOLE history re-ships
  through the cent_id exchange every batch (ΣB ≈ B²/2 history-bytes
  over B batches) and batch-0 training is flat Lloyd's over the full
  batch (an n·C/3 term). Kept as the minimal-moving-parts form and the
  r11 gate entry.
* ``start_streaming_semdedup_durable`` — the scale shape its docstring
  promised (r11 VERDICT "Next round" #1): history lives as
  cent_id-PARTITIONED PARQUET (the ivf_append serve layout) and each
  batch re-reads ONLY the cells it probes — explicit per-cell paths,
  directory-level pruning, so per-batch history bytes track
  batch×probed-cells, not total history; batch-0 training runs on a
  deterministic fixed-modulus sample (the fast rung's trick,
  operators/ann.py semantic_cluster_pairs_fast), killing the n·C/3
  term while keeping the oracle symbolic (train_filter replay). Pairs
  land per batch in a found_batch-partitioned store, so driver state
  is counters only — nothing corpus-sized lives in memory between
  batches.
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


def _new_vs_all_fn(t2: int):
    """Per-cent_id pair kernel over a tagged union: the fresh block's
    own upper triangle + fresh × history cross tiles — history ×
    history pairs are never re-emitted. Shared by both variants."""
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

    return new_vs_all


def _keep_expr(t2: int) -> str:
    """The exact decimal(38,0) cosine certificate — the batch
    operator's own verify, unchanged (_cluster_pairs_from_assign)."""
    return (
        "dot >= 0 AND "
        "cast(1000000 as decimal(38,0)) * cast(dot as decimal(38,0))"
        " * cast(dot as decimal(38,0)) >= "
        f"cast({t2} as decimal(38,0)) * cast(na2 as decimal(38,0))"
        " * cast(nb2 as decimal(38,0))"
    )


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

    new_vs_all = _new_vs_all_fn(t2)

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
        new_pairs = (
            tagged.groupBy("cent_id")
            .applyInPandas(new_vs_all, schema=ann._PAIR_SCHEMA)
            .filter(F.expr(_keep_expr(t2)))
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


@dataclass
class DurableSemDedupState:
    history_dir: str
    centroid_rows: list | None = None
    batches_done: int = 0
    history: list[dict] = field(default_factory=list)
    # per batch: {batch, n_new_pairs, probed_cells, history_cells,
    #             history_bytes_read, store_bytes_total}


def read_probed_cells(
    spark: SparkSession, assign_base: str, probed: list[int]
):
    """Read ONLY the probed cells' directories from the
    cent_id-partitioned assignment store — explicit per-cell paths, so
    pruning holds by construction (an unprobed cell's files are never
    listed, opened, or read; pinned via DataFrame.inputFiles in
    tests/test_streaming_semantic.py). Returns
    (frame_or_None, bytes_read, n_live_cells)."""
    import os

    cell_dirs = [
        os.path.join(assign_base, f"cent_id={c}") for c in probed
    ]
    live = [d for d in cell_dirs if os.path.isdir(d)]
    if not live:
        return None, 0, 0
    hist_bytes = sum(_dir_bytes(d) for d in live)
    hist = spark.read.option("basePath", assign_base).parquet(
        *live
    ).select(
        "vec_id", F.col("cent_id").cast("long").alias("cent_id"),
        "qv", "n2",
    )
    return hist, hist_bytes, len(live)


def _dir_bytes(path: str) -> int:
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def start_streaming_semdedup_durable(
    spark: SparkSession,
    emb: DataFrame,
    history_dir: str,
    n_batches: int = 3,
    tau_milli: int = 800,
    n_centroids: int = ann.N_CENTROIDS,
    iters: int = 2,
    train_sample_mod: int = 4,
    timeout_sec: float = 300,
) -> DurableSemDedupState:
    """Cross-batch semantic dedup with DURABLE cent_id-partitioned
    history (r11 VERDICT "Next round" #1 — the scale shape the
    in-memory variant's docstring named but didn't implement).

    Per micro-batch (routing vec_id % n_batches):

        batch 0: train the coarse quantizer on the SAMPLED slice
                 vec_id % (n_batches·train_sample_mod) == 0 — a fixed
                 deterministic modulus, so the DuckDB oracle replays
                 training symbolically via train_filter (rank seeds);
                 sampling kills the in-memory variant's flat n·C/3
                 batch-0 training term (the fast rung's trick,
                 operators/ann.py semantic_cluster_pairs_fast)
        batch b: Arrow-assign the batch against the FIXED centroids →
                 probed cells = the batch's distinct cent_ids (≤ C
                 driver scalars) → read ONLY those cells' directories
                 from {history_dir}/assign (explicit per-cell paths —
                 directory-level pruning, the ivf_append serve shape;
                 an unprobed cell's bytes are never opened, pinned in
                 tests) → fresh-triangle + fresh×history pair kernel →
                 exact decimal certificate → append the pairs to
                 {history_dir}/pairs (partitionBy found_batch) and the
                 batch's assignments to {history_dir}/assign
                 (partitionBy cent_id)

    Driver state between batches is COUNTERS ONLY — assignments and
    results live in the partitioned stores, so per-batch cost tracks
    batch-size × probed-cell mass, not total history: over B batches
    the history bytes re-read stay ~flat per batch (recorded per batch
    in ``state.history`` as evidence) instead of the in-memory
    variant's ΣB ≈ B²/2 re-ship. Output equivalence: a history row in
    an unprobed cell can never pair with a batch row (pairs require
    equal cent_id), so the pruned read emits EXACTLY the pair set of
    the in-memory variant under the same centroids — and the whole
    loop replays symbolically as the static semantic_cluster_pairs
    with found_batch = greatest(vec_a % B, vec_b % B), which the gate
    entry hash-checks.

    Reference analog: the incremental fork's persistent reduce state
    (``reference src/edu/illinois/incr_ga/IncMapReduce.java:241-325``),
    here as a partitioned columnar store instead of re-shipped
    sequence files."""
    import os
    import time

    t2 = tau_milli * tau_milli
    state = DurableSemDedupState(history_dir)
    new_vs_all = _new_vs_all_fn(t2)
    assign_base = os.path.join(history_dir, "assign")
    pairs_base = os.path.join(history_dir, "pairs")
    train_mod = n_batches * train_sample_mod

    def one_batch(_df: DataFrame, _bid: int) -> None:
        b = state.batches_done
        if b >= n_batches:
            return
        batch = emb.filter(F.col("vec_id") % n_batches == b)
        if b == 0:
            rows, _ = ann.train_centroid_rows(
                batch.filter(F.col("vec_id") % train_mod == 0),
                n_centroids, iters,
                compute_inertia=False, seed_by_rank=True,
            )
            state.centroid_rows = rows
        asg = local_checkpoint_truncated(
            ann.kernel_assign(batch, state.centroid_rows)
            .filter(F.col("n2") > 0)
        )
        probed = sorted(
            int(r["cent_id"])
            for r in asg.select("cent_id").distinct().collect()
        )
        hist, hist_bytes, n_live = read_probed_cells(
            spark, assign_base, probed
        )
        if hist is not None:
            tagged = (
                asg.withColumn("fresh", F.lit(1))
                .unionByName(hist.withColumn("fresh", F.lit(0)))
            )
        else:
            tagged = asg.withColumn("fresh", F.lit(1))
        new_pairs = (
            tagged.groupBy("cent_id")
            .applyInPandas(new_vs_all, schema=ann._PAIR_SCHEMA)
            .filter(F.expr(_keep_expr(t2)))
            .withColumn("found_batch", F.lit(b).cast("long"))
        )
        new_pairs.write.mode("append").partitionBy("found_batch").parquet(
            pairs_base
        )
        # a zero-pair batch writes no found_batch=b directory at all
        bdir = os.path.join(pairs_base, f"found_batch={b}")
        n_new = spark.read.parquet(bdir).count() if os.path.isdir(bdir) else 0
        asg.write.mode("append").partitionBy("cent_id").parquet(
            assign_base
        )
        free_checkpoint(asg)
        state.history.append({
            "batch": b,
            "n_new_pairs": int(n_new),
            "probed_cells": len(probed),
            "history_cells": n_live,
            "history_bytes_read": int(hist_bytes),
            "store_bytes_total": int(_dir_bytes(assign_base)),
        })
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
                    f"streaming_semdedup_durable: stream died after "
                    f"{state.batches_done}/{n_batches} batches"
                ) from exc
            time.sleep(0.2)
    finally:
        q.stop()
    if state.batches_done < n_batches:
        raise RuntimeError(
            f"streaming_semdedup_durable: only {state.batches_done}/"
            f"{n_batches} batches completed before the deadline"
        )
    return state


def durable_results(spark: SparkSession, history_dir: str) -> DataFrame:
    """The accumulated pair store as a DataFrame
    [vec_a, vec_b, dot, na2, nb2, found_batch]."""
    import os

    pairs_base = os.path.join(history_dir, "pairs")
    if not os.path.isdir(pairs_base):  # a run that found zero pairs
        return spark.createDataFrame([], _PAIR_BATCH_SCHEMA)
    return spark.read.parquet(pairs_base).select(
        "vec_a", "vec_b", "dot", "na2", "nb2",
        F.col("found_batch").cast("long").alias("found_batch"),
    )
