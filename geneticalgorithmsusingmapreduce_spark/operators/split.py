"""Deterministic dataset splitting (train/val/test) — a core
training-data-pipeline operation (scale extension; the reference's only
randomness is its population bootstrap).

Why hash-based, not ``randomSplit``: a split assigned by
``rand() < 0.8`` changes whenever the data is re-partitioned, re-read,
or appended to — at 100 TB you cannot afford (and must never need) a
materialized assignment table just to keep train/test stable. Hashing
the record key through the engine-wide seeded xxhash64 stream makes the
assignment a pure function of (seed, key): reproducible across runs,
engines (DuckDB oracle), cluster sizes, and incremental arrivals —
appending new documents never reassigns old ones. This is the standard
content-addressed split used by large corpus pipelines.

Mechanics: per-mille bucket = top-20 hash bits mod 1000 (the mod bias at
2^20/1000 is < 0.1% and identical in both engines — the contract is
determinism + mirror-exactness, not perfect uniformity), then threshold
into train/val/test. Map-only: no shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import bits, prng, text

SALT_SPLIT = 6  # distinct stream from genome/mask/shuffle/sample/pair
SALT_IMPORTANCE = 8  # importance-sampling stream (7 unused; 6 doubles
#                      as mutate's — different key domains, kept apart)


def assign_splits(
    df: DataFrame,
    key: str = "doc_id",
    seed: int = 42,
    train_pm: int = 800,
    val_pm: int = 100,
) -> DataFrame:
    """Adds [pm, split] to ``df``: pm ∈ [0,1000) from the seeded hash of
    ``key``; split ∈ {train, val, test} by per-mille thresholds."""
    ss = bits.seed_salt(seed, SALT_SPLIT)
    h = prng.spark_hash(str(ss), key)
    pm = f"({prng.spark_unit_bits(h, 20)} % 1000)"
    return df.withColumn("pm", F.expr(pm)).withColumn(
        "split",
        F.expr(
            f"CASE WHEN pm < {train_pm} THEN 'train' "
            f"WHEN pm < {train_pm + val_pm} THEN 'val' "
            "ELSE 'test' END"
        ),
    )


def importance_sample(
    docs: DataFrame,
    seed: int = 42,
    floor_pm: int = 100,
    ceil_pm: int = 900,
) -> DataFrame:
    """Quality-weighted deterministic sampling — the corpus-curation step
    that downsamples low-quality documents instead of hard-dropping them
    (mixture re-weighting). Keep probability per-mille = the document's
    English-stopword ratio clamped to [floor_pm, ceil_pm] (more natural
    prose → higher keep rate; floor keeps a trickle of everything for
    diversity), decided by comparing against the seeded hash of doc_id.

    Same scale contract as assign_splits: a pure function of
    (seed, doc_id, text) — map-only, no shuffle, no rand(), stable under
    repartitioning and appends, so re-runs and incremental arrivals
    never flip old decisions. Output: kept docs
    [doc_id, keep_pm, pm]."""
    from .textops import STOPWORDS, _count_in

    toks = text.SPARK_TOKENS
    sw = _count_in(toks, STOPWORDS["en"], "spark")
    keep = (
        f"least({ceil_pm}, greatest({floor_pm}, "
        f"CASE WHEN size({toks}) > 0 THEN cast({sw} as bigint) * 1000 "
        f"div size({toks}) ELSE 0 END))"
    )
    ss = bits.seed_salt(seed, SALT_IMPORTANCE)
    h = prng.spark_hash(str(ss), "doc_id")
    pm = f"({prng.spark_unit_bits(h, 20)} % 1000)"
    return (
        docs.withColumn("keep_pm", F.expr(keep))
        .withColumn("pm", F.expr(pm))
        .filter(F.col("pm") < F.col("keep_pm"))
        .select("doc_id", "keep_pm", "pm")
    )


def duck_importance_sample_sql(
    source_sql: str,
    seed: int = 42,
    floor_pm: int = 100,
    ceil_pm: int = 900,
) -> str:
    from .textops import STOPWORDS, _count_in
    from ..functions import text

    toks = text.DUCK_TOKENS
    sw = _count_in(toks, STOPWORDS["en"], "duckdb")
    keep = (
        f"least({ceil_pm}, greatest({floor_pm}, "
        f"CASE WHEN len({toks}) > 0 THEN cast({sw} as bigint) * 1000 "
        f"// len({toks}) ELSE 0 END))"
    )
    ss = bits.seed_salt(seed, SALT_IMPORTANCE)
    hq = prng.duck_hash_query(
        source_sql,
        [str(ss), "doc_id"],
        "__is",
        extra=[
            f"{keep} AS keep_pm",
            f"({prng.duck_unit_bits('__is', 20)} % 1000) AS pm",
        ],
    )
    return (
        f"(SELECT doc_id, keep_pm, pm FROM {hq} _i WHERE pm < keep_pm)"
    )


def stratified_sample(
    docs: DataFrame,
    stratum: str = "source",
    per_stratum: int = 50,
    seed: int = 42,
) -> DataFrame:
    """Balanced corpus draw: keep (up to) ``per_stratum`` documents per
    ``stratum`` value, chosen by ranking the seeded hash of doc_id
    within each stratum — the deterministic replacement for
    ``sampleBy``'s rand() (which re-draws on every re-read and cannot
    hit an exact per-group count).

    Scale shape: ONE exchange on the stratum key + an in-partition
    window sort on the 64-bit hash; at 1000 executors a hot stratum is
    the usual skew problem — the hash rank is salted by doc_id, so
    pre-aggregating per (stratum, hash-bucket) top-k before the final
    window is the documented mitigation if a stratum outgrows one task.
    Output: [doc_id, stratum, rk]."""
    from pyspark.sql import Window

    ss = bits.seed_salt(seed, SALT_IMPORTANCE) + 99  # distinct stream
    h = prng.spark_hash(str(ss), "doc_id")
    w = Window.partitionBy("stratum").orderBy("hk", "doc_id")
    return (
        docs.select("doc_id", F.col(stratum).alias("stratum"),
                    F.expr(h).alias("hk"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= per_stratum)
        .select("doc_id", "stratum", F.col("rk").cast("bigint").alias("rk"))
    )


def duck_stratified_sample_sql(
    source_sql: str,
    stratum: str = "source",
    per_stratum: int = 50,
    seed: int = 42,
) -> str:
    ss = bits.seed_salt(seed, SALT_IMPORTANCE) + 99
    hq = prng.duck_hash_query(source_sql, [str(ss), "doc_id"], "__st")
    return f"""(
      SELECT doc_id, stratum, rk FROM (
        SELECT doc_id, {stratum} AS stratum,
               row_number() OVER (PARTITION BY {stratum}
                 ORDER BY __st, doc_id) AS rk
        FROM {hq} _h
      ) _r WHERE rk <= {per_stratum}
    )"""


def duck_assign_splits_sql(
    source_sql: str,
    key: str = "doc_id",
    seed: int = 42,
    train_pm: int = 800,
    val_pm: int = 100,
) -> str:
    ss = bits.seed_salt(seed, SALT_SPLIT)
    return prng.duck_hash_query(
        source_sql,
        [str(ss), key],
        "__sp",
        extra=[
            f"({prng.duck_unit_bits('__sp', 20)} % 1000) AS pm",
            f"CASE WHEN ({prng.duck_unit_bits('__sp', 20)} % 1000) < {train_pm}"
            f" THEN 'train' WHEN ({prng.duck_unit_bits('__sp', 20)} % 1000) <"
            f" {train_pm + val_pm} THEN 'val' ELSE 'test' END AS split",
        ],
    )


SALT_MIXTURE = 9  # mixture-sampling stream


def mixture_sample(
    docs: DataFrame, weights: dict[str, int], seed: int = 42
) -> DataFrame:
    """Corpus mixture re-weighting by TOKEN MASS: downsample each source
    so the retained corpus's token distribution approaches the target
    ``weights`` (source → relative weight; unlisted sources drop — the
    spec IS the data recipe). The canonical pretraining-mix step (e.g.
    "webtext 60‰ / books 25‰ / code 15‰") expressed declaratively:

      rate_s = min(1, (w_s / Σw) / (tokens_s / tokens_total))

    i.e. only over-represented sources are thinned (no upsampling);
    under-represented ones keep everything and the realized mix is the
    closest achievable by pure filtering. Rates are computed IN THE
    PLAN as exact wide-integer arithmetic (decimal(38,0) /
    HUGEINT — overflow-free at any corpus size), fixed-point 2^40, so
    the DuckDB oracle replays them bit-for-bit; the keep decision is
    the seeded 40-bit hash draw per doc_id — a pure function of
    (seed, doc_id), stable under repartition/appends like every sampler
    here.

    Scale shape: one hash-agg for per-source token totals (tiny result:
    |sources| rows), broadcast back; the keep filter is map-side. The
    doc stream shuffles zero times. Output: kept docs
    [doc_id, source, n_tokens]."""
    spark = docs.sparkSession
    wsum = sum(weights.values())
    wdf = spark.createDataFrame(
        sorted(weights.items()), "source string, w long"
    )
    toks = f"cast(size({text.SPARK_TOKENS}) as bigint)"
    base = docs.select("doc_id", "source", F.expr(toks).alias("n_tokens"))
    totals = (
        base.join(F.broadcast(wdf), "source")
        .groupBy("source", "w")
        .agg(F.sum("n_tokens").alias("src_tokens"))
    )
    tot_all = totals.agg(F.sum("src_tokens").alias("all_tokens"))
    # src_tokens = 0 (a listed source whose docs all tokenize empty) has
    # no token mass to thin — keep everything (rate40 = 2^40) instead of
    # tripping ANSI DIVIDE_BY_ZERO; the DuckDB twin guards identically.
    rate = (
        "case when src_tokens = 0 then cast(1099511627776 as bigint) else "
        "cast(least(cast(1099511627776 as decimal(38,0)), "
        "(cast(w as decimal(38,0)) * 1099511627776 * all_tokens) div "
        f"({wsum} * src_tokens)) as bigint) end"
    )
    rates = totals.crossJoin(tot_all).select(
        "source", F.expr(rate).alias("rate40")
    )
    ss = bits.seed_salt(seed, SALT_MIXTURE)
    h = prng.spark_hash(str(ss), "doc_id")
    draw = prng.spark_unit_bits(h, 40)
    return (
        base.join(F.broadcast(rates), "source")
        .filter(F.expr(f"{draw} < rate40"))
        .select("doc_id", "source", "n_tokens")
    )


def duck_mixture_sample_sql(
    docs_sql: str, weights: dict[str, int], seed: int = 42
) -> str:
    wsum = sum(weights.values())
    vals = ", ".join(f"('{s}', {w})" for s, w in sorted(weights.items()))
    toks = f"cast(len({text.DUCK_TOKENS}) as bigint)"
    ss = bits.seed_salt(seed, SALT_MIXTURE)
    base = (
        f"SELECT doc_id, source, {toks} AS n_tokens FROM {docs_sql} _m"
    )
    hq = prng.duck_hash_query(
        f"({base})", [str(ss), "doc_id"], "__mx",
        extra=[f"{prng.duck_unit_bits('__mx', 40)} AS draw"],
    )
    return f"""(
      WITH w(source, w) AS (VALUES {vals}),
      b AS (SELECT doc_id, source, n_tokens, draw FROM {hq} _b),
      totals AS (
        SELECT b.source, any_value(w.w) AS w,
               sum(b.n_tokens) AS src_tokens
        FROM b JOIN w USING (source) GROUP BY b.source
      ), rates AS (
        SELECT source,
               CASE WHEN src_tokens = 0 THEN 1099511627776::BIGINT ELSE
               (least(1099511627776::HUGEINT,
                      (w::HUGEINT * 1099511627776 *
                       (SELECT sum(src_tokens) FROM totals))
                      // ({wsum} * src_tokens)))::BIGINT END AS rate40
        FROM totals
      )
      SELECT b.doc_id, b.source, b.n_tokens
      FROM b JOIN rates USING (source)
      WHERE b.draw < rates.rate40
    )"""
