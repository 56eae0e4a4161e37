"""Bit-flip mutation: rate accuracy + expression/numpy path parity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from geneticalgorithmsusingmapreduce_spark.functions import bits
from geneticalgorithmsusingmapreduce_spark.operators import generate, mutate


def test_flip_rate_close_to_nominal(spark):
    pop = generate.random_population(spark, 2000, 256, seed=1)
    mut = mutate.apply_mutation(pop, 256, rate=0.05, seed=9)
    j = pop.alias("a").join(mut.alias("b"), "id")
    flips = j.select(
        F.expr(
            "+".join(
                f"bit_count(element_at(a.genome, {k+1}) ^ element_at(b.genome, {k+1}))"
                for k in range(4)
            )
        ).alias("f")
    ).agg(F.sum("f")).collect()[0][0]
    rate = flips / (2000 * 256)
    assert abs(rate - 0.05) < 0.005


def test_numpy_mask_matches_expression(spark):
    # same stream, two physical paths: expression form at 256 bits vs
    # np_mutation_mask directly
    seed, n_bits = 4, 256
    pop = generate.random_population(spark, 300, n_bits, seed=2)
    mut = mutate.apply_mutation(pop, n_bits, rate=0.1, seed=seed)
    got = {
        r.id: tuple(r.genome)
        for r in mut.collect()
    }
    orig = {r.id: np.array(r.genome, dtype=np.int64) for r in pop.collect()}
    ss = bits.seed_salt(seed, mutate.SALT_MUTATE)
    t21 = mutate._t21(0.1)
    keys = sorted(orig)
    masks = mutate.np_mutation_mask(ss, keys, n_bits, t21)
    for i, k in enumerate(keys):
        assert tuple(orig[k] ^ masks[i]) == got[k]


def test_sparse_mutation_rate_and_determinism(spark):
    # the low-rate Poisson path: measured flip rate ≈ nominal, and the
    # same seed reproduces the exact same flips
    pop = generate.random_population(spark, 3000, 1024, seed=6)
    nl = 16
    a = mutate.apply_mutation_sparse(pop, 1024, rate=0.002, seed=31)
    b = mutate.apply_mutation_sparse(pop, 1024, rate=0.002, seed=31)
    ra = sorted((r.id, tuple(r.genome)) for r in a.collect())
    rb = sorted((r.id, tuple(r.genome)) for r in b.collect())
    assert ra == rb  # deterministic given the seed
    j = pop.alias("x").join(a.alias("y"), "id")
    flips = j.selectExpr(
        "sum(" + "+".join(
            f"bit_count(element_at(x.genome,{k+1}) ^ element_at(y.genome,{k+1}))"
            for k in range(nl)
        ) + ") AS f"
    ).collect()[0].f
    rate = flips / (3000 * 1024)
    assert abs(rate - 0.002) < 0.0005


def test_mutation_preserves_tail_mask(spark):
    pop = generate.random_population(spark, 500, 130, seed=3)  # 2-bit tail
    mut = mutate.apply_mutation(pop, 130, rate=0.5, seed=7)
    mx = mut.selectExpr("max(element_at(genome, 3)) AS m").collect()[0].m
    assert 0 <= mx <= 3
