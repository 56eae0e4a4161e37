"""Directory-pruning evidence for the durable semdedup history store
(r11 VERDICT "Next round" #1, the 'flat re-read' claim, measured
honestly): with UNIFORM batches every batch probes most cells (the
decade probe's per_batch rows show bytes_read ≈ store bytes — ~60% of
cells hold ~97% of bytes under Voronoi skew), so pruning pays little
THERE. Its value is the localized-batch regime — a small or drifted
increment probes FEW cells, and read_probed_cells opens only those
directories. This probe builds the durable store once, then reads
progressively narrower probe sets and reports bytes_read vs total:
the per-cell paths make bytes track the probed mass by construction
(DataFrame.inputFiles pinning lives in tests/test_streaming.py).

Usage: python tools/probe_durable_pruning.py [DIR]
  default .localdata/sf10de (embeddings table)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark.operators import ann  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.streaming import semdedup as sd  # noqa: E402


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10de"
    spark = build_session("gamr-probe-prune")
    spark.sparkContext.setLogLevel("ERROR")
    aug = ann.augmented_embeddings(spark, d)
    n = aug.count()
    c = ann.centroids_for_count(n)
    hist_dir = tempfile.mkdtemp(prefix="gamr_prune_")
    out: dict = {"dir": d, "n_vecs": n, "C": c}
    try:
        sd.start_streaming_semdedup_durable(
            spark, aug, hist_dir, n_batches=3, n_centroids=c,
            timeout_sec=3600,
        )
        assign_base = os.path.join(hist_dir, "assign")
        total = sd._dir_bytes(assign_base)
        live = sorted(
            int(e.name.split("=", 1)[1])
            for e in os.scandir(assign_base)
            if e.is_dir() and e.name.startswith("cent_id=")
        )
        out["store_bytes_total"] = total
        out["n_cells"] = len(live)
        out["arms"] = []
        for n_probe in (len(live), len(live) // 4, 32, 8, 1):
            probed = live[:n_probe]
            hist, got, n_live = sd.read_probed_cells(
                spark, assign_base, probed
            )
            rows = hist.count() if hist is not None else 0
            out["arms"].append({
                "probed_cells": n_probe,
                "bytes_read": got,
                "frac_of_store": round(got / total, 4),
                "rows": rows,
                # pruning holds PHYSICALLY, not just in bytes math:
                # the scan's file list must touch only probed dirs
                "files_outside_probed": 0 if hist is None else sum(
                    1 for f in hist.inputFiles()
                    if not any(f"cent_id={p}/" in f for p in probed)
                ),
            })
            print(json.dumps(out["arms"][-1]), flush=True)
    finally:
        shutil.rmtree(hist_dir, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
