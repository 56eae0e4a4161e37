"""Phase-level timing of repeated_span_removal at sf0.1 (r14 VERDICT
item 1/3): times (a) occ materialize, (b) canon agg, (c) marked+islands
+spans fold, (d) rewrite scan, each with the noop sink, plus the report
sibling for reference. Prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from geneticalgorithmsusingmapreduce_spark.operators import (  # noqa: E402
    dedup as dedup_ops, textops,
)
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("gamr-probe-spanrm")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    docs = textops.span_corpus(spark, sf_dir)

    t0 = time.perf_counter()
    out["n_docs"] = docs.count()
    out["docs_count_sec"] = round(time.perf_counter() - t0, 2)

    k = 8
    t0 = time.perf_counter()
    occ = dedup_ops._gram_occurrences(docs, k)
    n_occ = occ.count()  # materializes the persist
    out["n_windows"] = n_occ
    out["occ_materialize_sec"] = round(time.perf_counter() - t0, 2)

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
    out["canon_agg_sec"] = round(time.perf_counter() - t0, 2)

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
    out["spans_fold_sec"] = round(time.perf_counter() - t0, 2)

    # full operator (warm occ persist): isolates the rewrite scan cost
    t0 = time.perf_counter()
    noop(dedup_ops.repeated_span_removal(docs, k))
    out["full_removal_warmocc_sec"] = round(time.perf_counter() - t0, 2)

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    noop(dedup_ops.repeated_span_removal(docs, k))
    out["full_removal_cold_sec"] = round(time.perf_counter() - t0, 2)

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    noop(dedup_ops.repeated_span_dedup(docs, k))
    out["report_sibling_cold_sec"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
