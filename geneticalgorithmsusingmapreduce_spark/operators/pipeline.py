"""End-to-end corpus curation: the LLM-training-data path composed as
ONE declarative plan — quality gate → language gate → exact-digest dedup
→ deterministic split assignment.

This is the composition story the individual operators exist for: every
facet (token count, language vote, 128-bit digest) is a column
expression in a single map-side projection, the ONLY shuffle in the
whole pipeline is the digest group-by (16-byte keys — document text
never crosses the exchange), and the split assignment is again map-only.
At 100 TB: scan → project → one exchange → project, with the gates
pushed ahead of the shuffle so rejected documents never shuffle at all.
Plan-shape pinned in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import split as split_ops
from .textops import LANGS, STOPWORDS, _count_in

_TOKS = "filter(split(lower(text), ' '), t -> t != '')"


def _lang_guess_expr(dialect: str) -> str:
    from ..functions import text as text_fns

    toks = _TOKS if dialect == "spark" else text_fns.DUCK_TOKENS
    scores = {
        lang: _count_in(toks, STOPWORDS[lang], dialect) for lang in LANGS
    }
    best = "GREATEST(" + ", ".join(scores.values()) + ")"
    guess = "CASE "
    for lang in LANGS:
        guess += f"WHEN {scores[lang]} = {best} THEN '{lang}' "
    return guess + "END"


def curate_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 12,
    seed: int = 42,
    train_pm: int = 800,
    val_pm: int = 100,
) -> DataFrame:
    """docs[doc_id, text] → curated [doc_id, digest, n_tokens, dup_count,
    pm, split]: keep ``lang`` documents with ≥ min_tokens tokens, one
    canonical doc (min doc_id) per exact content digest, hash-split."""
    facets = docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("digest"),
        F.expr(f"cast(size({_TOKS}) as bigint)").alias("n_tokens"),
        F.expr(_lang_guess_expr("spark")).alias("lang_guess"),
    )
    gated = facets.filter(
        (F.col("lang_guess") == lang) & (F.col("n_tokens") >= min_tokens)
    )
    deduped = gated.groupBy("digest").agg(
        F.min("doc_id").alias("doc_id"),
        # identical digest ⇒ identical text ⇒ identical facets; min() is
        # just a deterministic "any"
        F.min("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    return split_ops.assign_splits(
        deduped, key="doc_id", seed=seed, train_pm=train_pm, val_pm=val_pm
    ).select("doc_id", "digest", "n_tokens", "dup_count", "pm", "split")


def duck_curate_corpus_sql(
    docs_sql: str,
    lang: str = "en",
    min_tokens: int = 12,
    seed: int = 42,
    train_pm: int = 800,
    val_pm: int = 100,
) -> str:
    from ..functions import text as text_fns

    toks = text_fns.DUCK_TOKENS
    guess = _lang_guess_expr("duckdb")
    ded = f"""
      SELECT digest, min(doc_id) AS doc_id, min(n_tokens) AS n_tokens,
             count(*) AS dup_count
      FROM (
        SELECT doc_id, md5(text) AS digest,
               len({toks}) AS n_tokens, {guess} AS lang_guess
        FROM {docs_sql} _f
      ) _g
      WHERE lang_guess = '{lang}' AND n_tokens >= {min_tokens}
      GROUP BY digest
    """
    assigned = split_ops.duck_assign_splits_sql(
        ded, key="doc_id", seed=seed, train_pm=train_pm, val_pm=val_pm
    )
    return (
        f"(SELECT doc_id, digest, n_tokens, dup_count, pm, split "
        f"FROM {assigned} _o)"
    )
