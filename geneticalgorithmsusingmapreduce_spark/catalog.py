"""Query catalog: every operator from SURVEY.md §2 (plus the scale
extensions) registered as a (spark_fn, oracle_sql) pair.

The driver contract (__spark_entry__.py) runs each spark_fn at sf0.01 and
hash-compares against the DuckDB oracle. Column names are aliased
identically on both sides (the comparator sorts columns by name).

Determinism rules for oracle-checked entries:
- stochastic inputs come from functions.prng/bits seeded xxhash64 streams
  (bit-exact in both engines);
- no floating-point aggregation unless computed as exact-int sums followed
  by one division;
- argmax/argmin tie-broken by a composed exact ordering key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .functions import bits
from .operators import cga as cga_ops
from .operators import fitness as fit_ops, generate
from .operators import selection as selection_ops, shuffle as shuffle_ops
from .plans import sga as sga_plan
from .sources.registry import read_table

GENOME_BITS = 256  # flagship genome width (4 longs)
NL = bits.n_longs(GENOME_BITS)
SEED = 42

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# Unique individual id for lineitem-derived populations (l_linenumber 1..7).
LI_IID = "(l_orderkey * 8 + l_linenumber)"


def lineitem_population(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic population derived from lineitem rows (SURVEY.md §7.2):
    one individual per row, genome seeded by the (orderkey, linenumber) id.
    Exercises S1 scan → generator → scalar pipeline."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.expr(LI_IID).alias("iid"), "l_returnflag"
    )
    return generate.population_from_table(li, "iid", GENOME_BITS, SEED)


def lineitem_population_duck() -> str:
    """Oracle twin: subquery exposing (iid, l_returnflag, genome)."""
    src = f"SELECT {LI_IID} AS iid, l_returnflag FROM lineitem"
    return bits.duck_genome_query(
        src, "iid", ["iid", "l_returnflag"], GENOME_BITS, SEED
    )


_DUCK_FIT = bits.popcount_sql("genome", "duckdb")


# --- P1/P2 + A1/A2: flagship --------------------------------------------

@register(
    "flagship_best_by_flag",
    f"""
    WITH fit AS (
      SELECT l_returnflag, iid, genome, {_DUCK_FIT} AS fitness
      FROM {lineitem_population_duck()} _p
    )
    SELECT l_returnflag,
           count(*) AS pop,
           max(fitness) AS best_fitness,
           cast(sum(fitness) as bigint) AS sum_fitness,
           arg_max(genome, fitness * 4294967296 + (iid % 2147483648)) AS best_genome
    FROM fit GROUP BY l_returnflag
    """,
)
def flagship_best_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → deterministic genome generator (G1-from-table) → ONEMAX
    fitness (P1/P2) → grouped best-individual agg (A1/A2 as partial+final
    hash agg). The reference's §3.1 lifecycle collapsed onto one shuffle;
    max_by tie-broken on (fitness, iid) so the oracle matches exactly."""
    fit = fit_ops.with_fitness(lineitem_population(spark, sf_dir), nl=NL)
    return fit.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("pop"),
        F.max("fitness").alias("best_fitness"),
        F.sum("fitness").alias("sum_fitness"),
        F.max_by(
            "genome", F.expr("fitness * 4294967296 + (iid % 2147483648)")
        ).alias("best_genome"),
    )


# --- G1: pure generator --------------------------------------------------

@register(
    "population_generate",
    f"""
    SELECT id, genome, {_DUCK_FIT} AS fitness
    FROM {generate.population_gen_duckdb_sql(4096, GENOME_BITS, SEED)} _p
    """,
)
def population_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 seeded: 4096 individuals from spark.range — no input files (the
    reference needs dummy seed records S3; range() replaces them)."""
    pop = generate.random_population(spark, 4096, GENOME_BITS, SEED)
    return fit_ops.with_fitness(pop, nl=NL)


# --- G2: probability-vector init ----------------------------------------

@register(
    "cga_init_vectors",
    generate.prob_vectors_duckdb_sql(8),
)
def cga_init_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: 8 splits × 704 bit-probabilities at fixed-point p=0.5, exploded
    model layout (one row per model bit)."""
    return generate.init_prob_vectors(spark, 8)


# --- SGA generation pipeline: O1/X1 → W1 → W2 → P4 ----------------------

def _pop_with_fitness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem-derived evaluated population [id, genome, fitness]."""
    pop = lineitem_population(spark, sf_dir).select(
        F.col("iid").alias("id"), "genome"
    )
    return fit_ops.with_fitness(pop, nl=NL)


def _duck_pop_fit() -> str:
    return (
        f"(SELECT iid AS id, genome, {_DUCK_FIT} AS fitness "
        f"FROM {lineitem_population_duck()} _pf)"
    )


@register(
    "sga_shuffle",
    f"""
    SELECT id, skey, part FROM
    {shuffle_ops.duck_shuffle_query(_duck_pop_fit(), SEED * 1_000_033, n_buckets=32)} _s
    """,
)
def sga_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/X1: seeded random sort key + uniform bucket routing — the honest
    replacement for the reference's contract-violating random comparator
    (``reference src/edu/illinois/ga/LongArrayWritable.java:52-58``) and
    random partitioner (``src/edu/illinois/ga/MapReduce.java:39-50``)."""
    sh = shuffle_ops.with_shuffle_key(
        _pop_with_fitness(spark, sf_dir), SEED * 1_000_033, n_buckets=32
    )
    return sh.select("id", "skey", "part")


@register(
    "sga_tournament",
    f"""
    SELECT part, pos, parent, parent_fitness FROM
    {selection_ops.duck_tournament_sql(
        "(SELECT id, genome, fitness, skey, part FROM "
        + shuffle_ops.duck_shuffle_query(_duck_pop_fit(), SEED * 1_000_033, n_buckets=32)
        + " _q)"
    )} _t
    """,
)
def sga_tournament(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: sliding-window tournament (size 5, wrap-around flush) as ROWS
    frame window aggregation."""
    sh = shuffle_ops.with_shuffle_key(
        _pop_with_fitness(spark, sf_dir), SEED * 1_000_033, n_buckets=32
    )
    return selection_ops.tournament_parents(sh)


@register(
    "sga_generation",
    f"""
    WITH ch AS (
      SELECT id, genome FROM
      {sga_plan.duck_generation_sql(_duck_pop_fit(), GENOME_BITS, SEED)} _g
    )
    SELECT id, genome, {_DUCK_FIT} AS fitness FROM ch
    """,
)
def sga_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full composed generation: evaluate → shuffle → tournament → pair →
    crossover → children (+ child fitness). The reference's entire
    map-shuffle-reduce job (§3.1) as one declarative plan with a single
    exchange."""
    children = sga_plan.next_generation(
        _pop_with_fitness(spark, sf_dir), GENOME_BITS, SEED, generation=0
    )
    return fit_ops.with_fitness(children, nl=NL)


# --- cGA pipeline: G3/P3 → A3 → J1/J2+P5 → P6 ---------------------------

CGA_SPLITS = 8
CGA_T = 4
CGA_POP = 1000
_CGA_VEC_DUCK = generate.prob_vectors_duckdb_sql(CGA_SPLITS)
_CGA_GEN_SEED = SEED * 1_000_033


def _cga_vectors(spark: SparkSession):
    return generate.init_prob_vectors(spark, CGA_SPLITS)


@register(
    "cga_sample",
    f"SELECT * FROM {cga_ops.duck_samples_sql(f'({_CGA_VEC_DUCK})', CGA_T, _CGA_GEN_SEED)} _q",
)
def cga_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3/P3: T Bernoulli tournament members per model bit from the seeded
    stream (fixed-point threshold compare, no floats)."""
    return cga_ops.sample_members(_cga_vectors(spark), CGA_T, _CGA_GEN_SEED)


@register(
    "cga_member_fitness",
    f"""SELECT * FROM {cga_ops.duck_member_fitness_sql(
        cga_ops.duck_samples_sql(f'({_CGA_VEC_DUCK})', CGA_T, _CGA_GEN_SEED)
    )} _q""",
)
def cga_member_fitness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-member ONEMAX over the distributed genome — partial map-side
    sums + T-row final agg (replaces the reference's side-file fold)."""
    return cga_ops.member_fitness(
        cga_ops.sample_members(_cga_vectors(spark), CGA_T, _CGA_GEN_SEED)
    )


@register(
    "cga_generation",
    f"""SELECT * FROM {cga_ops.duck_update_sql(
        f'({_CGA_VEC_DUCK})', CGA_T, _CGA_GEN_SEED, CGA_POP
    )} _q""",
)
def cga_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cGA generation: sample → winner/loser (J2 broadcast scalars) →
    shuffle-free vector update (P5, clamped fixed-point)."""
    vec = _cga_vectors(spark)
    fits = cga_ops.member_fitness(
        cga_ops.sample_members(vec, CGA_T, _CGA_GEN_SEED)
    )
    w, l = cga_ops.winner_loser(fits)
    return cga_ops.update_vectors(vec, w, l, _CGA_GEN_SEED, CGA_POP)


@register(
    "cga_convergence",
    f"""SELECT * FROM {cga_ops.duck_convergence_sql(
        cga_ops.duck_update_sql(f'({_CGA_VEC_DUCK})', CGA_T, _CGA_GEN_SEED, CGA_POP)
    )} _q""",
)
def cga_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/A4: unconverged-bit count after one update step."""
    vec = _cga_vectors(spark)
    fits = cga_ops.member_fitness(
        cga_ops.sample_members(vec, CGA_T, _CGA_GEN_SEED)
    )
    w, l = cga_ops.winner_loser(fits)
    return cga_ops.convergence_stats(
        cga_ops.update_vectors(vec, w, l, _CGA_GEN_SEED, CGA_POP)
    )


def entry_flagship(spark: SparkSession) -> DataFrame:
    return flagship_best_by_flag(spark, "/root/testdata/sf0.001")
