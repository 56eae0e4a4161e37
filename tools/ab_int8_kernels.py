"""Same-phase A/B attribution of the r10 int8-family regression (r10
VERDICT "What's wrong" #2): on an idle box the judge measured
emb_ivf_postings_int8 4.34→6.19 s, emb_ivf_recall_int8 6.67→8.78,
sga_mutation_sparse 0.62→1.14, emb_ivf_recall_pq_rerank 2.36→2.93 vs
r9 — all riding code rewritten in r10 (BLAS float64 routing, chunked
argmax, reduceat fold, 1-thread worker BLAS pools).

Variants, each timed min-of-3 in isolation at sf0.1 (the bench's own
estimator), strictly alternating entries inside one session so box
phase hits both arms equally:

  head      — the shipped code
  oldargmax — ann._argmax_dot_chunked monkeypatched back to the r9
              unchunked int64-matmul form (prices chunking + the
              float64 cast)
  (run with SPARK_GRAFT_BLAS_PIN=0 for the unpinned-BLAS arm — the
   pin is session-level, so that arm is a separate process:
   `SPARK_GRAFT_BLAS_PIN=0 python tools/ab_int8_kernels.py head`)

    python tools/ab_int8_kernels.py [head|oldargmax] [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark import catalog  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.operators import ann  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402

ENTRIES = [
    "emb_ivf_postings_int8",
    "emb_ivf_recall_int8",
    "sga_mutation_sparse",
    "emb_ivf_recall_pq_rerank",
]


def argmax_r9(xm, cm, cnorm=None, chunk_elems=None):
    """The r9 form: one unchunked int64 matmul (numpy naive loop — no
    BLAS), scores materialized at full (N, C)."""
    import numpy as np

    scores = 2 * (xm @ cm.T) - cnorm if cnorm is not None else xm @ cm.T
    return np.argmax(scores, axis=1)


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "head"
    entries = sys.argv[2:] or ENTRIES
    if variant == "oldargmax":
        ann._argmax_dot_chunked = argmax_r9
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("ab-int8")
    spark.sparkContext.setLogLevel("ERROR")
    # machine-correct provenance (r11 VERDICT "What's wrong" #3: the
    # decisive r9-tree control row carried `"variant": "head"` with
    # only a free-text correction — an A/B row must identify its tree
    # without narrative): record the repo path and its git commit in
    # every row, so "which code ran" is in the data even when argv
    # says `head` inside a control worktree.
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except (OSError, subprocess.SubprocessError):
        # TimeoutExpired is a SubprocessError, NOT an OSError (r12
        # ADVICE) — a hung git must degrade to commit=None, not crash
        commit = None
    out = {
        "variant": variant,
        "repo": REPO,
        "commit": commit,
        "blas_pin": os.environ.get("SPARK_GRAFT_BLAS_PIN", "1"),
        "load_1m": round(os.getloadavg()[0], 2),
    }
    times: dict[str, float] = {}
    for rnd in range(3):
        for name in entries:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            catalog.QUERIES[name](spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[name] = min(times.get(name, float("inf")), dt)
    out["times"] = {k: round(v, 4) for k, v in times.items()}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
