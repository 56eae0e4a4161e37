"""Decompose the corpus_curation_full span rung at sf0.1: times each
sub-frame of _neardup_kept's span branch (survivors, occ, canon, spans,
rewrite, checkpoint) over the checkpoint-truncated ladder fixture.
Prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from geneticalgorithmsusingmapreduce_spark import catalog, runtime  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.operators import (  # noqa: E402
    dedup as dedup_ops, pipeline as pipe,
)
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("gamr-probe-ladder-span")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    # warm
    catalog.QUERIES["word_counts"](spark, sf_dir).write.format(
        "noop").mode("overwrite").save()

    t0 = time.perf_counter()
    docs = runtime.local_checkpoint_truncated(
        catalog._full_ladder_docs(spark, sf_dir)
    )
    out["fixture_ckpt_sec"] = round(time.perf_counter() - t0, 2)
    out["fixture_parts"] = docs.rdd.getNumPartitions()

    lang, min_tokens = "en", 12
    facets = docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("digest"),
        F.expr(f"cast(size({pipe._TOKS}) as bigint)").alias("n_tokens"),
        F.expr(pipe._lang_guess_expr("spark")).alias("lang_guess"),
    )
    gated = facets.filter(
        (F.col("lang_guess") == lang) & (F.col("n_tokens") >= min_tokens)
    )
    survivors = gated.groupBy("digest").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("dup_count"),
    ).persist()
    t0 = time.perf_counter()
    out["n_survivors"] = survivors.count()
    out["survivors_sec"] = round(time.perf_counter() - t0, 2)

    par = spark.sparkContext.defaultParallelism
    sdocs = docs.join(
        survivors.select("doc_id"), "doc_id", "leftsemi"
    ).repartition(par, "doc_id")
    k = 13
    occ = dedup_ops._gram_occurrences(sdocs, k)
    t0 = time.perf_counter()
    out["n_windows"] = occ.count()
    out["occ_sec"] = round(time.perf_counter() - t0, 2)
    out["occ_parts"] = occ.rdd.getNumPartitions()

    canon = (
        occ.groupBy("g64")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.struct("doc_id", "pos")).alias("c"),
        )
        .filter(F.col("n") >= 2)
        .select(
            "g64",
            F.col("c.doc_id").alias("c_doc"),
            F.col("c.pos").alias("c_pos"),
        )
    )
    t0 = time.perf_counter()
    out["n_dup_grams"] = canon.count()
    out["canon_sec"] = round(time.perf_counter() - t0, 2)

    marked = (
        occ.join(canon, "g64")
        .filter("NOT (doc_id = c_doc AND pos = c_pos)")
        .select("doc_id", "pos")
    )
    spans = dedup_ops._span_islands(marked, k).groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    t0 = time.perf_counter()
    out["n_span_docs"] = spans.count()
    out["spans_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    removal = dedup_ops.repeated_span_removal(sdocs, k).filter(
        F.col("n_tokens") >= 1
    )
    noop(removal)
    out["rewrite_noop_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cut = runtime.local_checkpoint_truncated(
        removal.repartition(par, "doc_id")
    )
    out["ckpt_sec"] = round(time.perf_counter() - t0, 2)
    out["cut_parts"] = cut.rdd.getNumPartitions()

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
