"""Same-phase A/B: run_sga storage="memory" (persist + stats-truncated
localCheckpoint) vs storage="bucketed" (per-generation bucketed parquet
store) — the durable-loop trade, priced at two scales in one session:

  * pop 132,878 (10k-bit, 1× multiplier)  — the WIDE fast-path regime
  * pop 1,328,772 (10k-bit, README's 10×) — the skinny role-pivot regime

Reports sec/gen (min over generations ≥ 2 of 4) per mode, strictly
alternating, plus trajectory equality (best_by_gen must be identical —
storage is physical only).

    python tools/ab_loop_storage.py [--runs N]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark.plans import sga  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def main() -> None:
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = build_session("gamr-ab-loop-storage")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for label, pop in (
        ("pop_132878_wide", sga.pop_from_multiplier(10_000, 1)),
        ("pop_1328772_skinny", sga.pop_from_multiplier(10_000, 10)),
    ):
        recs = {"memory": [], "bucketed": []}
        traj = {}
        for _rep in range(runs):
            for mode in ("memory", "bucketed"):
                res = sga.run_sga(
                    spark, n_bits=10_000, pop_size=pop, seed=42,
                    max_generations=4, n_buckets=128, storage=mode,
                )
                spg = min(s.wall_ms for s in res.stats[2:]) / 1000
                recs[mode].append(round(spg, 3))
                traj[mode] = [s.best_fitness for s in res.stats]
        assert traj["memory"] == traj["bucketed"], (
            "storage changed the trajectory!", traj
        )
        out[label] = {
            "pop": pop,
            "memory_min": min(recs["memory"]),
            "bucketed_min": min(recs["bucketed"]),
            "memory": recs["memory"],
            "bucketed": recs["bucketed"],
            "best_by_gen": traj["memory"],
        }
        print(json.dumps({label: out[label]}), flush=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
