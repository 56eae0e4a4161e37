"""Phase attribution for corpus_curation_chunk_neardup at a given sf:
time the doc-level stage (gates → digest dedup → doc near-dup = _neardup_kept),
then the full composed entry — chunk stage ≈ difference. One session,
back-to-back (same phase).

    SCALE_BENCH_CONF=... python tools/probe_chunkpipe_phases.py <sf_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark import catalog, runtime  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.operators import (  # noqa: E402
    pipeline as pipeline_ops,
)
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.localdata/sf10"
    extra = dict(
        kv.split("=", 1)
        for kv in os.environ.get("SCALE_BENCH_CONF", "").split(",")
        if "=" in kv
    )
    spark = build_session("gamr-probe-chunkpipe", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": sf_dir}

    docs = catalog._cc_docs(spark, sf_dir)
    t0 = time.perf_counter()
    kept = pipeline_ops._neardup_kept(docs)
    n_kept = kept.count()
    out["doc_stage_sec"] = round(time.perf_counter() - t0, 2)
    out["n_kept"] = n_kept
    print(json.dumps(out), flush=True)
    runtime.release_persists()

    t0 = time.perf_counter()
    kept2 = runtime.scoped_persist(pipeline_ops._neardup_kept(docs))
    kdocs = docs.join(kept2.select("doc_id"), "doc_id", "leftsemi")
    cpairs = pipeline_ops.chunk_near_dup_pairs(kdocs).filter(
        "doc_a != doc_b"
    )
    out["n_cpairs"] = cpairs.count()
    out["docplus_chunk_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out), flush=True)
    runtime.release_persists()

    t0 = time.perf_counter()
    full = pipeline_ops.curate_corpus_chunk_neardup(docs)
    full.write.format("noop").mode("overwrite").save()
    out["full_entry_sec"] = round(time.perf_counter() - t0, 2)
    runtime.release_persists()
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
