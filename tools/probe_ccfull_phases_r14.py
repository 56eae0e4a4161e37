"""Phase timing for corpus_curation_full at sf0.1 (r14): wraps
runtime.local_checkpoint_truncated to log the duration of each eager
checkpoint materialization (fixture, span-rung cut, stage-4 final,
stage-5 final2), then times the residual noop (LM + rank + split).
Prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark import catalog, runtime  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402

_orig = runtime.local_checkpoint_truncated
_ckpts: list[float] = []


def timed_ckpt(df, eager=True):
    t0 = time.perf_counter()
    out = _orig(df, eager=eager)
    _ckpts.append(round(time.perf_counter() - t0, 2))
    print(f"[ckpt {len(_ckpts)}] {_ckpts[-1]:.2f}s", file=sys.stderr,
          flush=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("gamr-probe-ccfull-r14")
    spark.sparkContext.setLogLevel("ERROR")
    runtime.local_checkpoint_truncated = timed_ckpt
    out: dict = {}
    # warm the session on a cheap entry first so JIT/codegen warmup
    # does not land on phase 1
    catalog.QUERIES["word_counts"](spark, sf_dir).write.format(
        "noop").mode("overwrite").save()
    for run in range(2):
        _ckpts.clear()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = catalog.QUERIES["corpus_curation_full"](spark, sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_noop = time.perf_counter() - t0
        out[f"run{run}"] = {
            "ckpts_sec": list(_ckpts),
            "build_sec": round(t_build, 2),
            "noop_sec": round(t_noop, 2),
            "total_sec": round(t_build + t_noop, 2),
        }
        runtime.release_persists()
        runtime.release_cleanups()
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
