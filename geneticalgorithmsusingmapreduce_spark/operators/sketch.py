"""Approximate-query-processing sketches (scale extensions; the
"Approximation Algorithms for Large Scale Data Analysis" PODS line in
PAPERS.md): Count-Min frequency estimation and HyperLogLog distinct
counting, built DETERMINISTICALLY so the DuckDB oracle can replay the
sketch cell-for-cell — unlike Spark's builtin approx_count_distinct,
whose internals aren't oracle-checkable.

Both sketches are mergeable summaries — the property that makes them the
100 TB shape: every partition folds its rows into a fixed-size array
map-side, the exchange moves only the W·D (CMS) or M (HLL) cells, and
cell-wise sum/max merges partials associatively. The implementations
below express exactly that as groupBy aggregations, so Spark plans them
as partial+final hash aggs over sketch cells — the row stream never
crosses the shuffle.

Determinism discipline: all hash draws come through xxhash64 (bit-exact
DuckDB twin via functions.prng); estimates are computed with a single
fixed-parenthesization double expression over exact int64 cell values,
so both engines round identically (IEEE ops on identical inputs in an
identical order).

NULL policy: every operator here sketches the NON-NULL keys only,
filtered identically on both sides. Spark's xxhash64 silently SKIPS
null arguments (xxhash64(NULL) == the seed) while the DuckDB replica
propagates NULL — pushing the filter into the operators removes the
one place the twins could diverge, and matches count(DISTINCT ...)
semantics, which also ignores NULLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import prng

# --------------------------------------------------------------------------
# Count-Min sketch
# --------------------------------------------------------------------------

CMS_D = 4    # hash rows
CMS_W = 64   # cells per row — deliberately small so collisions are real
             # at gate scale and the overestimate property is exercised


def cms_cell(row: int, key: str, w: int = CMS_W) -> str:
    """Spark expr: cell index of ``key`` in hash row ``row`` — low bits
    of an independent xxhash64 stream (w is a power of two)."""
    return f"({prng.spark_hash(key, str(row))} & {w - 1})"


def cms_frequencies(
    df: DataFrame, key: str, top_n: int = 20,
    d: int = CMS_D, w: int = CMS_W,
) -> DataFrame:
    """Count-Min frequency estimates vs exact counts for the top_n
    heaviest keys. Output: [<key>, exact_n, cms_est] — cms_est >= exact_n
    always (CMS never underestimates), with overestimates where cells
    collide.

    Scale shape: the sketch build explodes each row into d (row, cell)
    coordinates and hash-aggregates — map-side partials shrink every
    partition to ≤ d·w cells before the exchange, so the shuffle is
    O(d·w·n_partitions) regardless of row count. The estimate probe
    touches only the top_n keys (exact side: one keyed agg — kept here
    because the query REPORTS the error; production readers skip it and
    probe the d·w-cell broadcast directly)."""
    structs = ", ".join(
        f"struct({r} as r, {cms_cell(r, 'k', w)} as cell)" for r in range(d)
    )
    coords = F.explode(F.expr(f"array({structs})")).alias("rc")
    cells = (
        df.select(F.expr(key).alias("k"))
        .filter("k IS NOT NULL")
        .select("k", coords)
        .groupBy("rc.r", "rc.cell")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    exact = (
        df.filter(F.expr(key).isNotNull())
        .groupBy(F.expr(key).alias("k"))
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "k")
        .limit(top_n)
    )
    probes = exact.select("k", "exact_n", coords).select(
        "k", "exact_n", "rc.r", "rc.cell"
    )
    return (
        probes.join(cells, ["r", "cell"])
        .groupBy("k", "exact_n")
        .agg(F.min("cn").alias("cms_est"))
        .select(F.col("k").alias(key), "exact_n", "cms_est")
    )


def duck_cms_sql(
    table_sql: str, key: str, top_n: int = 20,
    d: int = CMS_D, w: int = CMS_W,
) -> str:
    """Oracle twin: replay the d hash rows through the xxhash64 chain
    (exploded as rows through ONE chain, same pattern as the old minhash
    oracle) and fold identical cell sums."""
    base = (
        f"SELECT k, r FROM (SELECT {key} AS k FROM {table_sql} _t "
        f"WHERE {key} IS NOT NULL) _k CROSS JOIN range(0, {d}) _r(r)"
    )
    hq = prng.duck_hash_query(base, ["k", "r"], "h")
    return f"""(
      WITH coords AS (
        SELECT k, r, (h & {w - 1}) AS cell FROM {hq} _h
      ), cells AS (
        SELECT r, cell, count(*) AS cn FROM coords GROUP BY r, cell
      ), exact AS (
        SELECT {key} AS k, count(*) AS exact_n FROM {table_sql} _e
        WHERE {key} IS NOT NULL
        GROUP BY {key} ORDER BY exact_n DESC, k LIMIT {top_n}
      ), probes AS (
        SELECT DISTINCT e.k, e.exact_n, c.r, c.cell
        FROM exact e JOIN coords c ON c.k = e.k
      )
      SELECT p.k AS {key}, p.exact_n, min(cl.cn) AS cms_est
      FROM probes p JOIN cells cl ON cl.r = p.r AND cl.cell = p.cell
      GROUP BY p.k, p.exact_n
    )"""


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------

HLL_B = 4            # 2^4 = 16 registers
HLL_M = 1 << HLL_B

# err_pm divides a possibly NEGATIVE dividend (the sf0.01 events fixture
# genuinely under-estimates: est 148 vs exact 150). Safe as written:
# Spark's `div` and DuckDB's integer `//` BOTH truncate toward zero
# (verified: -2000//150 = -13 in both engines) — the r4 ADVICE note that
# DuckDB `//` floors applies only to FLOAT operands. Keep both sides on
# integer operands and they stay identical.
_ERR_PM_EXPR = (
    "CASE WHEN exact_distinct = 0 THEN 0 ELSE "
    "(hll_est - exact_distinct) * 1000 div exact_distinct END"
)
# raw HLL only (no LinearCounting small-range correction): the correction
# needs ln(), whose last-ulp rounding is not guaranteed identical between
# the JVM and DuckDB's libm — and M=16 keeps the gate fixture's
# cardinality (~150 users at sf0.01) above the 2.5·M correction regime,
# so raw HLL is the textbook-correct estimator there anyway.
HLL_ALPHA = 0.673  # alpha_16 (Flajolet et al. 2007)


def _hll_rho_expr(rest: str) -> str:
    """Shared rho expression (both dialects): leading-zero count of the
    60-bit remainder + 1, CLAMPED to 60 — the theoretical maximum 61
    (all 60 bits zero, p = 2^-60 per key but deterministic forever for
    an unlucky key) would need a 2^-1 term the exact-int64 register
    scaling cannot represent; Spark's shiftleft would silently wrap on
    the resulting negative shift while DuckDB raises. Clamping costs
    ~2^-60 relative estimate error and keeps both engines total."""
    return (
        f"(CASE WHEN {rest} = 0 THEN 60 "
        f"ELSE 61 - length(bin({rest})) END)"
    )


def _hll_est_expr() -> str:
    """Shared estimate expression (valid in BOTH dialects): every literal
    is CAST to double explicitly — a bare 0.673 parses as DECIMAL in both
    Spark and DuckDB, and decimal arithmetic rounds differently from the
    IEEE double path the determinism argument relies on."""
    two60 = "CAST(1152921504606846976 AS DOUBLE)"
    return (
        f"cast(round((CAST({HLL_ALPHA} AS DOUBLE) * {HLL_M} * {HLL_M})"
        f" * {two60} / (cast(s_present as double) + "
        f"cast(({HLL_M} - n_present) as double) * {two60})) as bigint)"
    )


def hll_distinct(df: DataFrame, key: str) -> DataFrame:
    """HyperLogLog distinct-count estimate next to the exact count.
    Output: [exact_distinct, hll_est, err_pm] (one row; err_pm =
    signed per-mille error — |err| ≲ 1.04/√M ≈ 260‰ at M=16, chosen
    small exactly so the bound is visibly exercised).

    Register j (low B hash bits) holds max(rho) over its keys, where
    rho = leading-zero count of the remaining 60 bits + 1. The per-
    register max is a partial agg (the mergeable-summary property);
    the final fold is M rows. The estimate denominator Σ 2^(-reg) is
    computed EXACTLY as Σ 2^(60-reg) in int64 (empty registers
    contribute 2^60), so the only float ops are one division and one
    multiply by alpha·M² — identical IEEE results in both engines."""
    h = prng.spark_hash(key)
    rest = f"shiftrightunsigned({h}, {HLL_B})"
    # bit length via bin(): length of the minimal binary string
    rho = _hll_rho_expr(rest)
    regs = (
        df.filter(F.expr(key).isNotNull())
        .select(
            F.expr(f"({h} & {HLL_M - 1})").alias("j"),
            F.expr(rho).alias("rho"),
        )
        .groupBy("j")
        .agg(F.max("rho").alias("reg"))
    )
    scaled = regs.agg(
        F.sum(F.expr("cast(shiftleft(cast(1 as bigint), 60 - reg) as bigint)"))
        .alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    exact = df.agg(F.count_distinct(F.expr(key)).alias("exact_distinct"))
    # count_distinct already ignores NULL keys — same set the registers saw
    est = _hll_est_expr()
    # empty-input guard: zero non-null keys leaves s_present NULL and
    # exact_distinct 0 — define the result as (0, 0, 0) instead of a
    # NULL estimate and an ANSI DIVIDE_BY_ZERO on err_pm
    return (
        scaled.crossJoin(exact)  # 1 row × 1 row
        .select(
            "exact_distinct",
            F.expr(f"coalesce({est}, 0)").alias("hll_est"),
        )
        .select(
            "exact_distinct", "hll_est",
            F.expr(_ERR_PM_EXPR).alias("err_pm"),
        )
    )


def duck_hll_sql(table_sql: str, key: str) -> str:
    base = (
        f"SELECT DISTINCT {key} AS k FROM {table_sql} _t "
        f"WHERE {key} IS NOT NULL"
    )
    hq = prng.duck_hash_query(base, ["k"], "h")
    # unsigned logical shift: negative h must wrap to [0, 2^64) first
    # (h::UBIGINT raises on negatives; the HUGEINT detour is prng's
    # standard unsigned-wraparound idiom)
    rest = f"(({prng._u('h')} // {1 << HLL_B})::BIGINT)"
    rho = _hll_rho_expr(rest)
    est = _hll_est_expr()
    return f"""(
      WITH regs AS (
        SELECT (h & {HLL_M - 1}) AS j, max({rho}) AS reg FROM {hq} _h
        GROUP BY 1
      ), scaled AS (
        SELECT cast(sum(1::BIGINT << (60 - reg)) as bigint) AS s_present,
               count(*) AS n_present
        FROM regs
      ), ex AS (
        SELECT count(DISTINCT {key}) AS exact_distinct FROM {table_sql} _e
      )
      SELECT exact_distinct, coalesce({est}, 0) AS hll_est,
             CASE WHEN exact_distinct = 0 THEN 0 ELSE
               (coalesce({est}, 0) - exact_distinct) * 1000 // exact_distinct
             END AS err_pm
      FROM scaled, ex
    )"""


# --------------------------------------------------------------------------
# Bloom filter (membership; semi-join pruning)
# --------------------------------------------------------------------------

def hll_distinct_by(df: DataFrame, key: str, group: str) -> DataFrame:
    """GROUPED HyperLogLog: one sketch per ``group`` value — the shape a
    100 TB per-tenant/per-source cardinality report actually takes. The
    exchange moves (group, j, max-rho) partial registers — G·M cells,
    never rows (the mergeable-summary property, per group); same
    exact-integer estimator as hll_distinct. Output: [group,
    exact_distinct, hll_est, err_pm], one row per group."""
    h = prng.spark_hash(key)
    rest = f"shiftrightunsigned({h}, {HLL_B})"
    rho = _hll_rho_expr(rest)
    regs = (
        df.filter(F.expr(key).isNotNull() & F.expr(group).isNotNull())
        .select(
            F.expr(group).alias("g"),
            F.expr(f"({h} & {HLL_M - 1})").alias("j"),
            F.expr(rho).alias("rho"),
        )
        .groupBy("g", "j")
        .agg(F.max("rho").alias("reg"))
    )
    scaled = regs.groupBy("g").agg(
        F.sum(F.expr("cast(shiftleft(cast(1 as bigint), 60 - reg) as bigint)"))
        .alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    exact = (
        df.filter(F.expr(group).isNotNull())
        .groupBy(F.expr(group).alias("g"))
        .agg(F.count_distinct(F.expr(key)).alias("exact_distinct"))
    )
    est = _hll_est_expr()
    # groups whose keys are all NULL have no registers: left join from
    # the exact side and coalesce the estimate to 0 (same policy as the
    # global variant's empty-input guard)
    return (
        exact.join(scaled, "g", "left")
        .select(
            F.col("g").alias(group),
            "exact_distinct",
            F.expr(f"coalesce({est}, 0)").alias("hll_est"),
        )
        .select(
            group, "exact_distinct", "hll_est",
            F.expr(_ERR_PM_EXPR).alias("err_pm"),
        )
    )


def duck_hll_by_sql(table_sql: str, key: str, group: str) -> str:
    base = (
        f"SELECT DISTINCT {group} AS g, {key} AS k FROM {table_sql} _t "
        f"WHERE {key} IS NOT NULL AND {group} IS NOT NULL"
    )
    hq = prng.duck_hash_query(base, ["k"], "h")  # SELECT * carries g
    rest = f"(({prng._u('h')} // {1 << HLL_B})::BIGINT)"
    rho = _hll_rho_expr(rest)
    est = _hll_est_expr()
    return f"""(
      WITH regs AS (
        SELECT g, (h & {HLL_M - 1}) AS j, max({rho}) AS reg FROM {hq} _h
        GROUP BY 1, 2
      ), scaled AS (
        SELECT g, cast(sum(1::BIGINT << (60 - reg)) as bigint) AS s_present,
               count(*) AS n_present
        FROM regs GROUP BY g
      ), ex AS (
        SELECT {group} AS g, count(DISTINCT {key}) AS exact_distinct
        FROM {table_sql} _e WHERE {group} IS NOT NULL GROUP BY 1
      )
      SELECT ex.g AS {group}, exact_distinct, coalesce({est}, 0) AS hll_est,
             CASE WHEN exact_distinct = 0 THEN 0 ELSE
               (coalesce({est}, 0) - exact_distinct) * 1000 // exact_distinct
             END AS err_pm
      FROM ex LEFT JOIN scaled ON ex.g = scaled.g
    )"""


BLOOM_K = 3        # hash functions
BLOOM_M = 4096     # bits — sized for ~hundreds of build keys at ~1% fpp


def bloom_bits(key: str, k: int = BLOOM_K, m: int = BLOOM_M) -> list[str]:
    """Spark exprs: the k bit positions of ``key`` (m a power of two)."""
    return [f"({prng.spark_hash(key, str(i))} & {m - 1})" for i in range(k)]


def bloom_prune_stats(
    fact: DataFrame, build: DataFrame, key: str,
    k: int = BLOOM_K, m: int = BLOOM_M,
) -> DataFrame:
    """Bloom-filter semi-join pruning, measured: build a deterministic
    k-hash/m-bit Bloom filter over the build side's keys, probe every
    fact row, and report [fact_rows, passed, true_matches] — passed ≥
    true_matches always (no false negatives), and passed − true_matches
    is the false-positive overhead the m/k sizing controls.

    This is the runtime-filter pattern (Spark's own
    spark.sql.optimizer.runtime.bloomFilter does it inside the engine):
    at 100 TB the filter prunes fact rows BEFORE the join shuffle, so
    the exchange carries only probable matches. Here the bit set is a
    broadcast of ≤ k·|build| positions (deduped ints — the whole filter
    is m bits ≡ at most m rows); the probe explodes each DISTINCT fact
    key's k positions and makes ONE broadcast join against the bit set
    — k separate per-hash joins would re-scan and re-dedup the build
    side k times (Spark does not reuse the structurally-identical
    subtree across differently-aliased joins). Deterministic xxhash64
    positions, so the oracle rebuilds the identical filter."""
    exprs = bloom_bits("k", k, m)
    bits = (
        build.filter(F.expr(key).isNotNull())
        .select(F.expr(key).alias("k"))
        .select(F.explode(F.array(
            *[F.expr(e) for e in exprs]
        )).alias("bit")).distinct()
    )
    factk = fact.filter(F.expr(key).isNotNull()).select(
        F.expr(key).alias("k")
    )
    coords = factk.distinct().select(
        "k", F.explode(F.array(*[F.expr(e) for e in exprs])).alias("bit")
    )
    # a key passes iff ALL k of its positions are set: duplicate
    # positions (two hashes, same bit) contribute one coord row each, so
    # count(*) == k exactly when every position matched
    flags = (
        coords.join(F.broadcast(bits), "bit")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("nh"))
        .filter(F.col("nh") == k)
        .select("k", F.lit(1).alias("p"))
    )
    truth = build.filter(F.expr(key).isNotNull()).select(
        F.expr(key).alias("k")
    ).distinct().withColumn("t", F.lit(1))
    return (
        factk.join(F.broadcast(flags), "k", "left")
        .join(F.broadcast(truth), "k", "left")
        .agg(
            F.count(F.lit(1)).alias("fact_rows"),
            F.sum(F.coalesce(F.col("p"), F.lit(0))).alias("passed"),
            F.sum(F.expr("CASE WHEN t = 1 THEN 1 ELSE 0 END"))
            .alias("true_matches"),
        )
    )


def duck_bloom_sql(
    fact_sql: str, build_sql: str, key: str,
    k: int = BLOOM_K, m: int = BLOOM_M,
) -> str:
    # probe over DISTINCT fact keys (the pass flag is per key), then
    # weight by key multiplicity at the final fold
    fbase = (
        f"SELECT k, i FROM (SELECT DISTINCT {key} AS k FROM {fact_sql} _f"
        f" WHERE {key} IS NOT NULL) _k CROSS JOIN range(0, {k}) _i(i)"
    )
    bbase = (
        f"SELECT k, i FROM (SELECT DISTINCT {key} AS k FROM {build_sql} _b"
        f" WHERE {key} IS NOT NULL) _k CROSS JOIN range(0, {k}) _i(i)"
    )
    fh = prng.duck_hash_query(fbase, ["k", "i"], "h")
    bh = prng.duck_hash_query(bbase, ["k", "i"], "h")
    return f"""(
      WITH bits AS (
        SELECT DISTINCT (h & {m - 1}) AS bit FROM {bh} _bb
      ), pass AS (
        SELECT c.k,
               CASE WHEN count(bits.bit) = {k} THEN 1 ELSE 0 END AS p
        FROM (SELECT k, (h & {m - 1}) AS bit FROM {fh} _fc) c
        LEFT JOIN bits USING (bit)
        GROUP BY c.k
      ), truth AS (
        SELECT DISTINCT {key} AS k, 1 AS t FROM {build_sql} _t
        WHERE {key} IS NOT NULL
      )
      SELECT count(*) AS fact_rows,
             cast(sum(p.p) as bigint) AS passed,
             cast(sum(CASE WHEN t.t = 1 THEN 1 ELSE 0 END) as bigint)
               AS true_matches
      FROM (SELECT {key} AS k FROM {fact_sql} _fr
            WHERE {key} IS NOT NULL) f
      JOIN pass p USING (k)
      LEFT JOIN truth t USING (k)
    )"""
