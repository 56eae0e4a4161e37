"""Diagnose the corpus_curation_full run-over-run degradation: for 3
consecutive builds of the entry, log each checkpoint's duration AND
partition count, plus persisted-RDD storage info after each run.
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
_log: list[dict] = []


def timed_ckpt(df, eager=True):
    t0 = time.perf_counter()
    out = _orig(df, eager=eager)
    dt = round(time.perf_counter() - t0, 2)
    nparts = out.rdd.getNumPartitions()
    _log.append({"sec": dt, "parts": nparts})
    print(f"[ckpt {len(_log)}] {dt:.2f}s parts={nparts}",
          file=sys.stderr, flush=True)
    return out


def storage_info(spark):
    sc = spark.sparkContext
    infos = sc._jsc.sc().getRDDStorageInfo()
    return [
        {
            "id": i.id(),
            "name": str(i.name())[:40],
            "mem_mb": round(i.memSize() / 1e6, 1),
            "parts": i.numCachedPartitions(),
        }
        for i in infos
    ]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("gamr-probe-ccparts-r14")
    spark.sparkContext.setLogLevel("ERROR")
    runtime.local_checkpoint_truncated = timed_ckpt
    out: dict = {}
    catalog.QUERIES["word_counts"](spark, sf_dir).write.format(
        "noop").mode("overwrite").save()
    for run in range(3):
        _log.clear()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = catalog.QUERIES["corpus_curation_full"](spark, sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_noop = time.perf_counter() - t0
        out[f"run{run}"] = {
            "ckpts": list(_log),
            "build_sec": round(t_build, 2),
            "noop_sec": round(t_noop, 2),
            "storage_after": storage_info(spark),
        }
        print(f"[run {run}] build={t_build:.1f} noop={t_noop:.1f} "
              f"storage={len(out[f'run{run}']['storage_after'])} rdds",
              file=sys.stderr, flush=True)
        if _log and _log[0]["sec"] > 100:
            break  # enough evidence
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
