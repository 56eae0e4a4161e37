"""Hypothesis property tests over the pure Python/numpy twins of the
engine's kernels (SURVEY.md §5.2(3), widened beyond fixed seeds).

These target the layer where a silent divergence would poison every
oracle check at once: the seeded hash stream, genome construction, and
the bitwise GA invariants. No SparkSession per example — each property
runs hundreds of cases in milliseconds; cross-engine (Spark/DuckDB)
parity at fixed seeds is covered by test_prng/test_numpy_kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geneticalgorithmsusingmapreduce_spark.functions import bits, prng

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(st.lists(I64, min_size=1, max_size=4), I64)
@settings(max_examples=300, deadline=None)
def test_np_xxhash64_matches_py_everywhere(cols, seed):
    got = prng.np_xxhash64(
        [np.array([c], dtype=np.int64) for c in cols], seed=seed
    )
    assert int(got[0]) == prng.py_xxhash64(cols, seed=seed)


@given(I64)
@settings(max_examples=300, deadline=None)
def test_np_popcount_matches_python(x):
    arr = np.array([x], dtype=np.int64)
    assert int(prng.np_popcount64(arr)[0]) == (x & (2**64 - 1)).bit_count()


@given(st.integers(min_value=1, max_value=4096))
@settings(max_examples=100, deadline=None)
def test_tail_mask_zeroes_exactly_past_nbits(n_bits):
    nl = bits.n_longs(n_bits)
    assert nl == -(-n_bits // 64)
    mask = bits.last_long_mask(n_bits)
    kept = mask & (2**64 - 1)
    assert kept.bit_count() == n_bits - (nl - 1) * 64


@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.lists(st.integers(min_value=0, max_value=2**31), min_size=1,
             max_size=5, unique=True),
    st.integers(min_value=1, max_value=512),
)
@settings(max_examples=60, deadline=None)
def test_np_genome_tail_clean_and_fitness_bounded(seed, keys, n_bits):
    g = bits.np_genome(seed, np.array(keys, dtype=np.int64), n_bits)
    nl = bits.n_longs(n_bits)
    assert g.shape == (len(keys), nl)
    # bits beyond n_bits must be zero (tail mask)
    tail = np.uint64(g[:, -1].view(np.uint64)) & ~np.uint64(
        bits.last_long_mask(n_bits) & (2**64 - 1)
    )
    assert not tail.any()
    fit = prng.np_popcount64(g).sum(axis=1)
    assert (fit <= n_bits).all() and (fit >= 0).all()


@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=1, max_value=512),
)
@settings(max_examples=60, deadline=None)
def test_np_crossover_conserves_bit_multiset(seed, pair_key, n_bits):
    keys = np.array([pair_key, pair_key + 7], dtype=np.int64)
    pa = bits.np_genome(seed, keys, n_bits)
    pb = bits.np_genome(seed + 1, keys, n_bits)
    c1, c2 = bits.np_crossover(pa, pb, seed + 2, keys, n_bits)
    # per-position multiset conservation: {c1,c2} == {a,b} bitwise
    assert ((c1 | c2) == (pa | pb)).all()
    assert ((c1 & c2) == (pa & pb)).all()


@given(
    st.integers(min_value=0, max_value=2**62),
    st.integers(min_value=0, max_value=2**63 - 1),
)
@settings(max_examples=300, deadline=None)
def test_bernoulli_threshold_matches_reference_rule(h, p64):
    """The fixed-point Bernoulli rule is |draw| <= p (reference
    CGA.java:103). The engine's numpy/py twin: bit = (draw & MAX) <= p64,
    strictly in [0, MAX] — p64=0 can still fire (draw==0), p64=MAX always
    fires; the probability is (p64+1)/2^63, monotone in p64."""
    draw = prng.py_xxhash64([h])
    bit = int((draw & (2**63 - 1)) <= p64)
    assert bit in (0, 1)
    if p64 == 2**63 - 1:
        assert bit == 1
