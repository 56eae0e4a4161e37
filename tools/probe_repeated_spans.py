"""Decade probe for repeated_span_dedup (r11 VERDICT "Next round" #2
— the suffix-array-style arbitrary-offset repeated-span operator):
one corpus scan emits k-token window grams map-side, duplicated grams
fold through ONE 8-byte-key hash agg, marked windows semi-join back,
and the per-doc gaps-and-islands merge rides a doc_id-partitioned
window — every term linear in total tokens, so the decade should track
the data ratio like the other one-scan text entries (BM25 5.57×,
unigram_logppl 3.95×).

Runs over the SPAN fixture (textops.span_corpus — every 10th doc gets
a plant with a 20-token span copied at a shifted offset), because the
Zipf corpus has ZERO organic 8-gram repeats (measured: 24M windows,
0 duplicated grams — random draws from a 10k vocab collide with
probability ~1e-32 at 8 tokens), so raw documents would time an
operator whose mark/merge stages see empty inputs. With the fixture
every leg carries real span mass and the probe reports it: wall
seconds, docs with spans, spans, duplicated window mass.

Usage: python tools/probe_repeated_spans.py [SMALL_DIR BIG_DIR]
  defaults .localdata/sf10d .localdata/sf100d (documents-only dirs)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from geneticalgorithmsusingmapreduce_spark import runtime  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.operators import dedup, textops  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10d"
    big = sys.argv[2] if len(sys.argv) > 2 else ".localdata/sf100d"
    spark = build_session("gamr-probe-spans")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for tag, d in (("small", small), ("big", big)):
        docs = textops.span_corpus(spark, d)
        n_docs = docs.count()
        t0 = time.perf_counter()
        spans = dedup.repeated_span_dedup(docs, k=8)
        agg = spans.agg(
            F.count(F.lit(1)).alias("spans"),
            F.countDistinct("doc_id").alias("docs_with_spans"),
            F.sum("n_windows").alias("dup_windows"),
            F.sum("span_tokens").alias("span_token_mass"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        runtime.release_persists()
        out[tag] = {
            "dir": d, "n_docs": n_docs, "sec": round(dt, 2),
            "spans": int(agg.spans),
            "docs_with_spans": int(agg.docs_with_spans),
            "dup_windows": int(agg.dup_windows or 0),
            "span_token_mass": int(agg.span_token_mass or 0),
        }
        print(json.dumps({tag: out[tag]}), flush=True)
    out["ratio"] = round(out["big"]["sec"] / out["small"]["sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
