"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query's full plan is executed via the noop sink (no driver collect
overhead — measures scan→compute→shuffle, which is what scales).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark import catalog  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def ga_loop_benchmarks(spark) -> dict[str, float]:
    """BASELINE.md targets: sec/generation at the reference's own example
    scale (SGA: 10,000-bit ONEMAX, pop = ceil(1·n·log2 n) = 132,878,
    mirroring `hadoop jar ga.jar 4 4 10000 100 1`; cGA: 1000-bit vector,
    tournament 4). Steady-state timing: one warm generation, then the
    measured one."""
    import pyspark.sql.functions as F

    from geneticalgorithmsusingmapreduce_spark.functions import bits
    from geneticalgorithmsusingmapreduce_spark.operators import (
        cga as cga_ops, fitness as fit_ops, generate,
    )
    from geneticalgorithmsusingmapreduce_spark.plans import sga

    out: dict[str, float] = {}

    n_bits, pop_size = 10_000, 132_878
    nl = bits.n_longs(n_bits)
    pop = fit_ops.with_fitness(
        generate.random_population(spark, pop_size, n_bits, 42, 32), nl=nl
    ).persist()
    pop.count()
    cur = pop
    for it in range(3):  # gen 0-1 warm Python workers/JIT; gen 2 measured
        t0 = time.perf_counter()
        ch = fit_ops.with_fitness(
            sga.next_generation(cur, n_bits, 42, it, 32), nl=nl
        ).localCheckpoint(eager=True)
        ch.count()
        dt = time.perf_counter() - t0
        if cur is not pop:
            cur.unpersist()
        cur = ch
    out["sga_10kbit_gen_sec"] = round(dt, 4)
    pop.unpersist()
    cur.unpersist()

    # incr_ga's hardcoded scale: 64,000-bit genomes (1,000 longs), pop
    # 6,000 (reference src/edu/illinois/incr_ga/MapReduce.java:31-32) —
    # exercises the Arrow kernel paths at 6.4x the 10k-bit width
    n_bits, pop_size = 64_000, 6_000
    nl = bits.n_longs(n_bits)
    pop = fit_ops.with_fitness(
        generate.random_population(spark, pop_size, n_bits, 42, 32), nl=nl
    ).persist()
    pop.count()
    cur = pop
    for it in range(2):  # gen 0 warms; gen 1 measured
        t0 = time.perf_counter()
        ch = fit_ops.with_fitness(
            sga.next_generation(cur, n_bits, 42, it, 32), nl=nl
        ).localCheckpoint(eager=True)
        ch.count()
        dt = time.perf_counter() - t0
        if cur is not pop:
            cur.unpersist()
        cur = ch
    out["sga_64kbit_gen_sec"] = round(dt, 4)
    pop.unpersist()
    cur.unpersist()

    vec = generate.init_prob_vectors(spark, 2, 500).persist()  # 1000 bits
    vec.count()
    for it in range(2):
        t0 = time.perf_counter()
        samples = cga_ops.sample_members(vec, 4, 42 + it)
        fits = cga_ops.member_fitness(samples)
        w, l = cga_ops.winner_loser(fits)
        nv = cga_ops.update_vectors(vec, w, l, 42 + it, 13_000)
        nv.agg(F.count(F.lit(1))).collect()
        dt = time.perf_counter() - t0
    out["cga_1kbit_gen_sec"] = round(dt, 4)
    vec.unpersist()
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session("gamr-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name, fn in catalog.QUERIES.items():
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT+cache)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    timings.update(ga_loop_benchmarks(spark))

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
