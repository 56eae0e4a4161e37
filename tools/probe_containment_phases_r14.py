"""Phase attribution for corpus_curation_chunk_containment at sf0.1
(r14): sequentially materialize each rung of the pipeline in one
session so the per-rung deltas attribute the entry's wall-clock.
Rungs: doc stage (_neardup_kept) -> candidate stage (postings ->
cand_pairs -> cand_docs) -> chunk stage (chunk_near_dup_pairs) ->
containment + split (the full entry).

    python tools/probe_containment_phases_r14.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from geneticalgorithmsusingmapreduce_spark import catalog, runtime  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.operators import (  # noqa: E402
    pipeline as pipeline_ops,
)
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session("gamr-probe-containment")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, object] = {"sf_dir": sf_dir}

    docs = catalog._cc_full_docs(spark, sf_dir)

    t0 = time.perf_counter()
    kept, shingles = pipeline_ops._neardup_kept(docs, return_shingles=True)
    kept = runtime.scoped_persist(kept)
    out["n_kept"] = kept.count()
    out["doc_stage_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ksh = shingles.select("doc_id", "sh64").join(
        kept.select("doc_id"), "doc_id", "leftsemi"
    )
    postings = (
        ksh.groupBy("sh64")
        .agg(F.collect_set("doc_id").alias("ds"))
        .filter(F.size("ds").between(2, 50))
    )
    cand_pairs = (
        postings.select(F.explode("ds").alias("doc_a"), "ds")
        .select("doc_a", F.explode("ds").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 4)
    )
    cand_docs = (
        cand_pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand_pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = runtime.scoped_persist(cand_docs)
    out["n_cand_docs"] = cand_docs.count()
    out["cand_stage_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cdocs = docs.join(cand_docs, "doc_id", "leftsemi")
    cpairs = pipeline_ops.chunk_near_dup_pairs(cdocs)
    out["n_cpairs"] = cpairs.count()
    out["chunk_stage_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out), flush=True)
    runtime.release_persists()

    t0 = time.perf_counter()
    full = catalog.QUERIES["corpus_curation_chunk_containment"](
        spark, sf_dir
    )
    full.write.format("noop").mode("overwrite").save()
    out["full_entry_sec"] = round(time.perf_counter() - t0, 2)
    runtime.release_persists()
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
