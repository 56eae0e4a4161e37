"""Same-phase A/B: skinny role-pivot generation vs the pre-r8 wide
window shape, at the two SMALL-pop bench settings whose r7→r8 readings
regressed ~1.7x (r8 VERDICT "What's wrong" #3) — sga_10kbit_gen_sec
(pop 132,878) and sga_64kbit_gen_sec (pop 6,000).

The r8 event-log A/B measured the two shapes a WASH at 1.33M pop; the
open question is whether the pivot's FIXED overhead (explode + join +
ObjectHashAggregate setup) dominates at small pops, or whether the r8
bench readings were box phase. Strictly alternating min-of-3 in one
session answers it.

    python tools/ab_pivot_overhead.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark.functions import bits  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.operators import (  # noqa: E402
    crossover, fitness as fit_ops, generate, selection, shuffle,
)
from geneticalgorithmsusingmapreduce_spark.plans import sga  # noqa: E402
from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402


def next_generation_wide(pop, n_bits, seed, generation, n_buckets=32):
    """The one-pass wide-window generation — the SHIPPED fast path
    (selection.paired_parents_onepass), so the A/B prices exactly the
    code next_generation routes to below WIDE_PATH_BYTES (review
    finding: an inlined copy here would silently desynchronize the
    benchmark from the code it justifies)."""
    gen_seed = None if seed is None else seed * 1_000_033 + generation
    sh = shuffle.with_shuffle_key(pop, gen_seed, n_buckets=n_buckets)
    pairs = selection.paired_parents_onepass(sh)
    return crossover.crossover_children(pairs, n_bits, gen_seed)


def bench_shape(spark, tag, gen_fn, n_bits, pop_size, gens, warm):
    nl = bits.n_longs(n_bits)
    pop = fit_ops.with_fitness(
        generate.random_population(spark, pop_size, n_bits, 42, 32), nl=nl
    ).persist()
    pop.count()
    cur = pop
    best = float("inf")
    times = []
    for it in range(gens):
        t0 = time.perf_counter()
        ch = fit_ops.with_fitness(
            gen_fn(cur, n_bits, 42, it, 32), nl=nl
        ).localCheckpoint(eager=True)
        ch.count()
        dt = time.perf_counter() - t0
        times.append(round(dt, 3))
        if it >= warm:
            best = min(best, dt)
        if cur is not pop:
            cur.unpersist()
        cur = ch
    pop.unpersist()
    cur.unpersist()
    return {"tag": tag, "best": round(best, 4), "times": times}


def main() -> None:
    spark = build_session("gamr-ab-pivot")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, n_bits, pop_size in (
        ("sga_10kbit_gen_sec", 10_000, sga.pop_from_multiplier(10_000, 1)),
        ("sga_64kbit_gen_sec", 64_000, 6_000),
    ):
        recs = {"skinny": [], "wide": []}
        for _rep in range(3):  # strictly alternating, min-of-3
            for tag, fn in (
                ("skinny", sga.next_generation),
                ("wide", next_generation_wide),
            ):
                r = bench_shape(
                    spark, tag, fn, n_bits, pop_size, gens=4, warm=2
                )
                recs[tag].append(r["best"])
        out[name] = {
            "skinny_min3": min(recs["skinny"]),
            "wide_min3": min(recs["wide"]),
            "skinny": recs["skinny"],
            "wide": recs["wide"],
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
