"""Gate-time ln() rounding-margin assertions (r10 ADVICE, medium).

bm25_topk and unigram_logppl are the only registered entries whose
cross-engine hash rides a transcendental: both quantize ln values as
floor(1e6·ln(x) + 0.5).  Spark evaluates ln via JVM Math.log, DuckDB
via its bundled libm — each is within ~1 ulp of the true value, so the
engines can disagree by ~2 ulp.  For ln values of magnitude ≤ ~20 that
is an absolute error ≤ ~1e-14 on 1e6·x, i.e. the rounded int64 can only
flip when 1e6·ln(x) + 0.5 lands within ~1e-8 of an integer boundary.

These tests recompute every ln input the registered entries evaluate —
the 4 BM25 idf arguments and the full unigram vocabulary — at BOTH gate
scales (sf0.001 and sf0.01) in driver-side Python, and assert each
quantity clears the boundary by a wide margin (1e-6, ~100× the worst
cross-engine divergence).  If a future testdata refresh lands a value
inside the margin, THIS fails loudly instead of the gate hash flaking.
"""

from __future__ import annotations

import math
import os
from collections import Counter

import duckdb
import pytest

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]

MARGIN = 1e-6  # distance from the nearest rounding boundary, in micro-units


def _boundary_distance(x: float) -> float:
    """Distance of 1e6·x + 0.5 from the nearest integer — the quantity
    that must stay large for floor(1e6·x + 0.5) to be engine-stable."""
    v = 1e6 * x + 0.5
    return abs(v - round(v))


def _tokens(sf_dir: str) -> list[list[str]]:
    con = duckdb.connect()
    rows = con.execute(
        "SELECT lower(text) FROM read_parquet(?) ORDER BY doc_id",
        [os.path.join(sf_dir, "documents.parquet")],
    ).fetchall()
    con.close()
    return [[t for t in r[0].split(" ") if t] for r in rows]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bm25_idf_margins(sf_dir):
    from geneticalgorithmsusingmapreduce_spark.catalog import BM25_TERMS

    docs = _tokens(sf_dir)
    n_docs = len(docs)
    for term in BM25_TERMS:
        df = sum(1 for toks in docs if term in toks)
        x = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        assert _boundary_distance(x) > MARGIN, (term, df, x)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_unigram_logp_margins(sf_dir):
    counts: Counter[str] = Counter()
    for toks in _tokens(sf_dir):
        counts.update(toks)
    total = sum(counts.values())
    worst = min(
        _boundary_distance(math.log(c / total)) for c in counts.values()
    )
    assert worst > MARGIN, worst
