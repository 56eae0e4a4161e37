"""Bit-flip mutation (engine extension — the reference SGA has **no**
mutation operator at all: selection + crossover only, which is why its
convergence stalls near the optimum and the stop rule tolerates
``nBits − 10``. A complete GA engine needs one.)

Semantics: each genome bit flips independently with probability ``rate``
(fixed-point p64 = rate · Long.MAX_VALUE, the reference's probability
encoding). mutated = genome XOR mask where mask bits are iid
Bernoulli(rate) draws from the seeded stream — same three-way
implementation story as every stochastic operator (Spark expressions /
DuckDB twin / numpy kernel above LARGE_NL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import bits, prng

SALT_MUTATE = 6
LONG_MAX = 2**63 - 1


def _mask_long_sql(ss: int, key: str, j: int, p64: int, dialect: str) -> str:
    """One int64 whose bits are iid Bernoulli(p64/2^63) draws — literal
    per-bit terms; bit 63's weight is the int64 sign value."""
    terms = []
    for b in range(64):
        if dialect == "spark":
            h = prng.spark_hash(str(ss), key, str(j * 64 + b))
            u = prng.spark_unit_bits(h, 63)
            w = str(1 << b) if b < 63 else "(cast(-9223372036854775807 as bigint) - 1)"
            terms.append(f"(CASE WHEN {u} < {p64} THEN {w} ELSE cast(0 as bigint) END)")
        else:
            terms.append(None)  # duck path built in duck_mutation_query
    return "(" + " + ".join(terms) + ")"


def mutation_expr(seed: int, key: str, n_bits: int, rate: float) -> str:
    """array<bigint> mask with tail bits zeroed (flips never touch the
    unused tail)."""
    nl = bits.n_longs(n_bits)
    ss = bits.seed_salt(seed, SALT_MUTATE)
    p64 = int(rate * LONG_MAX)
    elems = []
    for j in range(nl):
        e = _mask_long_sql(ss, key, j, p64, "spark")
        m = bits.last_long_mask(n_bits)
        if j == nl - 1 and m != -1:
            e = f"({e} & {m})"
        elems.append(e)
    return "array(" + ", ".join(elems) + ")"


def apply_mutation(
    df: DataFrame, n_bits: int, rate: float, seed: int,
    key: str = "id", genome: str = "genome",
) -> DataFrame:
    """[*df.columns with genome replaced by the mutated genome].

    Dispatch note: per-bit Bernoulli masks need nl·64 hash draws per row
    — the expression form blows the 64 KB codegen limit at just 2 longs
    (measured 50 s at sf0.1 for 4 longs, interpreted), so the numpy
    kernel is the default for anything wider than one long."""
    nl = bits.n_longs(n_bits)
    if nl > 1:
        import numpy as np
        import pandas as pd

        ss = bits.seed_salt(seed, SALT_MUTATE)
        p64 = int(rate * LONG_MAX)

        def kernel(batches):
            for pdf in batches:
                keys = pdf[key].to_numpy()
                g = np.stack(pdf[genome].map(
                    lambda a: np.asarray(a, dtype=np.int64)))
                mask = np_mutation_mask(ss, keys, n_bits, p64)
                out = pdf.copy()
                out[genome] = list(g ^ mask)
                yield out

        return df.mapInPandas(kernel, schema=df.schema)
    mexpr = mutation_expr(seed, key, n_bits, rate)
    xo = ", ".join(
        f"element_at({genome}, {j + 1}) ^ element_at(__m, {j + 1})"
        for j in range(nl)
    )
    return (
        df.withColumn("__m", F.expr(mexpr))
        .withColumn(genome, F.expr(f"array({xo})"))
        .drop("__m")
    )


def np_mutation_mask(ss: int, keys, n_bits: int, p64: int):
    """(N, nl) int64 masks — same stream as mutation_expr."""
    import numpy as np

    nl = bits.n_longs(n_bits)
    k = np.asarray(keys, dtype=np.int64).reshape(-1, 1)
    bit_idx = np.arange(nl * 64, dtype=np.int64).reshape(1, -1)
    h = prng.np_xxhash64([ss, np.broadcast_to(k, (len(k), nl * 64)),
                          np.broadcast_to(bit_idx, (len(k), nl * 64))])
    u = (h >> np.int64(1)) + np.int64(1 << 62)
    flips = (u < p64).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    packed = (
        flips.reshape(len(k), nl, 64) * weights.reshape(1, 1, 64)
    ).sum(axis=2).astype(np.uint64).view(np.int64)
    m = bits.last_long_mask(n_bits)
    if m != -1:
        packed[:, -1] &= m
    return packed


def duck_mutation_query(
    source_sql: str, seed: int, n_bits: int, rate: float,
    key: str = "id", genome: str = "genome",
) -> str:
    """Oracle twin: explode (row, bit) → one hash chain → Bernoulli →
    pack per long → XOR with the original genome."""
    nl = bits.n_longs(n_bits)
    ss = bits.seed_salt(seed, SALT_MUTATE)
    p64 = int(rate * LONG_MAX)
    m = bits.last_long_mask(n_bits)
    # masks are a pure function of the key: build over DISTINCT keys
    # (duplicate keys would double-count the packed weights), join back
    base = (
        f"SELECT __k, bi FROM "
        f"(SELECT DISTINCT {key} AS __k FROM ({source_sql}) _mm) _dk "
        f"CROSS JOIN range(0, {nl * 64}) _b(bi)"
    )
    hq = prng.duck_hash_query(base, [str(ss), "__k", "bi"], "__h")
    bit = prng.duck_bernoulli_bit("__h", str(p64))
    weight = (
        "CASE WHEN bi % 64 = 63 THEN (-9223372036854775807)::BIGINT - 1 "
        "ELSE (1::BIGINT << (bi % 64)::INT) END"
    )
    packed = f"""(
      SELECT __k, bi // 64 AS j,
             cast(sum(CASE WHEN ({bit}) = 1 THEN {weight} ELSE 0 END)
                  as bigint) AS ml
      FROM {hq} _hb GROUP BY __k, bi // 64
    )"""
    tail = f" & {m}::BIGINT" if m != -1 else ""
    masks = f"""(
      SELECT __k, list(CASE WHEN j = {nl - 1} THEN ml{tail} ELSE ml END
                       ORDER BY j) AS mask
      FROM {packed} _pk GROUP BY __k
    )"""
    xo = ", ".join(
        # NB: DuckDB's ^ is POWER — integer xor is the xor() function
        f"xor(list_extract(s.{genome}, {j + 1}), list_extract(m.mask, {j + 1}))"
        for j in range(nl)
    )
    return f"""(
      SELECT s.{key} AS {key}, [{xo}] AS {genome}
      FROM ({source_sql}) s JOIN {masks} m ON m.__k = s.{key}
    )"""
