"""Generate local sf1 testdata (10x the driver's sf0.1) for at-scale
validation + bench — r4 VERDICT #1: every scale claim above sf0.1 was
argued from plan shape, never measured. The driver's generator tops out
at sf0.1; this produces schema- and distribution-compatible tables at
10x so the scale-critical entries get measured rows (the oracle check
is self-consistent: Spark result vs DuckDB oracle over the SAME
parquet, so exact generator parity is not required — only shape/
distribution fidelity, which is matched to the measured sf0.1 stats:
row ratios, key densities, value ranges, vocab, ts windows).

Deterministic: every column is a pure function of the row id via
xxhash64 — no rand(), no partition sensitivity. Writes to the out dir
(default /root/repo/.localdata/sf1, gitignored); region/nation are
copied verbatim from sf0.1 (they are sf-invariant).

Usage: python tools/gen_sf1.py [out_dir] [scale_multiplier]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geneticalgorithmsusingmapreduce_spark.session import build_session  # noqa: E402

SRC = "/root/testdata/sf0.1"

# measured sf0.1 row counts (see BASELINE.md sf1 section)
BASE = {
    "customer": 15_000, "supplier": 1_000, "part": 20_000,
    "orders": 150_000, "events": 100_000, "documents": 5_000,
    "embeddings": 2_000,
}

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch", "dup",
]


def h(tag: str, *cols: str) -> str:
    """Deterministic non-negative int64 stream: one xxhash64 draw keyed
    by a literal tag + the id columns."""
    args = ", ".join(list(cols) + [f"'{tag}'"])
    return f"(xxhash64({args}) & 9223372036854775807)"


def pick(options: list[str], expr: str) -> str:
    arr = ", ".join(f"'{o}'" for o in options)
    return f"element_at(array({arr}), cast({expr} % {len(options)} as int) + 1)"


def documents_frame(spark, n_docs: int):
    """The Zipf document table (shared by gen_sf1 and
    gen_documents_only — same xxhash64 streams, byte-identical text).

    ZIPFIAN token draw (r5 VERDICT #1): the r4/r5 generator drew every
    token uniformly from the 30-word head vocab, so at 55k+ docs every
    5-gram shingle's document frequency blew past the ngram index's
    max_df and dedup_ngram_jaccard was vacuously 0 rows at sf1+ — the
    text-family scale evidence was measured on unrealistically uniform
    boilerplate. Real corpora are Zipf-tailed; emulate with the
    standard inverse-CDF draw for s=1: u ~ U[0,1), rank = floor(V^u)
    (P(rank=r) ~ 1/r). Ranks 1..30 map to the REAL head vocab — the
    head carries ~ln(30)/ln(V) = 37% of token mass, so stopword /
    language-guess signal survives — and ranks 31..V are synthetic
    'w{rank}' tail words, so RARE shingles exist at every scale and
    the inverted index / LSH recall rows measure a realistic df
    distribution. Deterministic: rank is a pure function of (id, i).

    ORGANIC boilerplate (r12 VERDICT "Next round" #6): the pure-Zipf
    draw contains zero repeated ≥8-grams (measured: 24M windows, 0
    dup grams — evidence/gen_datasets.log), so the repeated-span
    operators' decade rows ran only on synthetic plant fixtures.
    Real web corpora carry license headers / navigation chrome:
    splice one of 8 fixed 24-token boilerplate blocks into ~1% of
    docs at a VARYING token offset (offset = hash % (len+1)) — the
    duplication mode fixed 32-token chunking provably misses and the
    span rung exists for. 24-token blocks inside 10-100-token docs
    keep doc-level Jaccard ≈ 0.12, so near-dup/cluster entries are
    untouched; per-template copy count ~ n_docs/800 scales with sf."""
    vocab_arr = "array(" + ", ".join(f"'{w}'" for w in VOCAB[:30]) + ")"
    zipf_v = 10_000
    zipf_rank = (
        "cast(pow(" + f"{zipf_v}.0D, "
        "((xxhash64(id, i, 'dw') & 9223372036854775807)"
        " / 9.223372036854775807e18)) as int)"
    )
    n_bp, bp_len = 8, 24
    bp_arr = "array(" + ", ".join(
        "array(" + ", ".join(f"'bp{t}x{j}'" for j in range(bp_len)) + ")"
        for t in range(n_bp)
    ) + ")"
    return spark.range(n_docs).selectExpr(
        "id",
        # 10..100 words; every 20th doc ends in the 'dup' marker token
        # (matches the ~5% marked docs at sf0.1)
        "transform("
        f"sequence(1, cast({h('dn', 'id')} % 91 + 10 as int)),"
        f"i -> CASE WHEN {zipf_rank} <= 30"
        f" THEN element_at({vocab_arr}, {zipf_rank})"
        f" ELSE concat('w', {zipf_rank}) END) AS toks",
    ).selectExpr(
        "id",
        f"""CASE WHEN {h('bp', 'id')} % 100 = 0 THEN concat(
              slice(toks, 1, cast({h('bpo', 'id')} % (size(toks) + 1) as int)),
              element_at({bp_arr},
                         cast({h('bpv', 'id')} % {n_bp} as int) + 1),
              slice(toks,
                    cast({h('bpo', 'id')} % (size(toks) + 1) as int) + 1,
                    size(toks)))
            ELSE toks END AS toks""",
    ).selectExpr(
        "id AS doc_id",
        "concat(concat_ws(' ', toks),"
        " CASE WHEN id % 20 = 0 THEN ' dup' ELSE '' END) AS text",
        pick(["en", "en", "en", "en", "de", "es", "fr", "zh"],
             h("dl", "id")) + " AS lang",
        f"concat('src', cast({h('ds', 'id')} % 20 as string)) AS source",
    ).selectExpr(
        "doc_id", "text", "lang", "source",
        "cast(length(text) as bigint) AS n_chars",
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.localdata/sf1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    spark = build_session("gamr-gen-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    n = {t: c * mult for t, c in BASE.items()}

    def write(df, name):
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"wrote {name}")

    # sf-invariant dims: copy verbatim
    for t in ("region", "nation"):
        write(spark.read.parquet(f"{SRC}/{t}.parquet"), t)

    write(
        spark.range(n["customer"]).selectExpr(
            "id AS c_custkey",
            "concat('Customer#', lpad(cast(id as string), 9, '0')) AS c_name",
            f"cast({h('cn', 'id')} % 25 as int) AS c_nationkey",
            f"cast(round(({h('cb', 'id')} % 1099999) / 100.0 - 999.99, 2)"
            " as double) AS c_acctbal",
            pick(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD",
                  "FURNITURE"], h("cm", "id")) + " AS c_mktsegment",
        ), "customer",
    )

    write(
        spark.range(n["supplier"]).selectExpr(
            "id AS s_suppkey",
            "concat('Supplier#', lpad(cast(id as string), 9, '0')) AS s_name",
            f"cast({h('sn', 'id')} % 25 as int) AS s_nationkey",
            f"cast(round(({h('sb', 'id')} % 1099999) / 100.0 - 999.99, 2)"
            " as double) AS s_acctbal",
        ), "supplier",
    )

    write(
        spark.range(n["part"]).selectExpr(
            "id AS p_partkey",
            "concat('part ', " + pick(VOCAB[:12], h("p1", "id"))
            + ", ' ', " + pick(VOCAB[12:24], h("p2", "id")) + ") AS p_name",
            f"concat('Brand#', cast({h('pb', 'id')} % 5 + 1 as string),"
            f" cast({h('pb2', 'id')} % 5 + 1 as string)) AS p_brand",
            pick(["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY",
                  "PROMO"], h("pt", "id"))
            + " || ' ' || "
            + pick(["ANODIZED", "BURNISHED", "PLATED", "POLISHED",
                    "BRUSHED"], h("pt2", "id"))
            + " || ' ' || "
            + pick(["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"],
                   h("pt3", "id")) + " AS p_type",
            f"cast({h('ps', 'id')} % 50 + 1 as int) AS p_size",
            f"cast(round(900 + ({h('pp', 'id')} % 110000) / 100.0, 2)"
            " as double) AS p_retailprice",
        ), "part",
    )

    n_cust, n_ord = n["customer"], n["orders"]
    orders = spark.range(n_ord).selectExpr(
        "id AS o_orderkey",
        f"{h('oc', 'id')} % {n_cust} AS o_custkey",
        pick(["O", "F", "P"], h("os", "id")) + " AS o_orderstatus",
        f"cast(round(1000 + ({h('op', 'id')} % 45000000) / 100.0, 2)"
        " as double) AS o_totalprice",
        # 1995-01-01 .. 2001-08-01 (2404 days), day granularity like src
        f"timestampadd(DAY, cast({h('od', 'id')} % 2405 as int),"
        " timestamp'1995-01-01 00:00:00') AS o_orderdate",
        pick(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"], h("opr", "id")) + " AS o_orderpriority",
    )
    write(orders, "orders")

    # lineitem: 1..7 lines per order (uniform, ~4 avg -> 4x orders rows)
    li = (
        spark.range(n_ord)
        .selectExpr(
            "id AS l_orderkey",
            f"explode(sequence(1, cast({h('ln', 'id')} % 7 + 1 as int)))"
            " AS l_linenumber",
        )
        .selectExpr(
            "l_orderkey", "l_linenumber",
            f"{h('lp', 'l_orderkey', 'l_linenumber')} % {n['part']}"
            " AS l_partkey",
            f"{h('ls', 'l_orderkey', 'l_linenumber')} % {n['supplier']}"
            " AS l_suppkey",
            f"cast({h('lq', 'l_orderkey', 'l_linenumber')} % 50 + 1"
            " as double) AS l_quantity",
            f"cast(round(({h('le', 'l_orderkey', 'l_linenumber')} % 9000000)"
            " / 100.0 + 1000, 2) as double) AS l_extendedprice",
            f"cast(({h('ld', 'l_orderkey', 'l_linenumber')} % 11) / 100.0"
            " as double) AS l_discount",
            f"cast(({h('lt', 'l_orderkey', 'l_linenumber')} % 9) / 100.0"
            " as double) AS l_tax",
            pick(["A", "N", "R"], h("lr", "l_orderkey", "l_linenumber"))
            + " AS l_returnflag",
            pick(["O", "F"], h("ll", "l_orderkey", "l_linenumber"))
            + " AS l_linestatus",
            "timestampadd(DAY, cast("
            + h("lsd", "l_orderkey", "l_linenumber")
            + " % 2500 as int), timestamp'1995-01-02 00:00:00')"
            " AS l_shipdate",
        )
    )
    write(li, "lineitem")

    n_users = max(1, n["events"] * 1500 // 100_000)
    write(
        spark.range(n["events"]).selectExpr(
            "id AS event_id",
            # Jan 2024, microsecond jitter like the source table
            "timestamp_micros(unix_micros(timestamp'2024-01-01 00:00:00')"
            f" + {h('ets', 'id')} % (30 * 86400000000)) AS ts",
            f"{h('eu', 'id')} % {n_users} AS user_id",
            pick(["view", "view", "view", "view", "click", "click", "click",
                  "signup", "error", "purchase"], h("et", "id"))
            + " AS event_type",
            f"cast(round(({h('ev', 'id')} % 56022) / 100.0, 2) as double) AS value",
            f"concat('{{\"k\": ', cast({h('ep', 'id')} % 100 as string),"
            " '}') AS props",
        ), "events",
    )

    write(documents_frame(spark, n["documents"]), "documents")

    write(
        spark.range(n["embeddings"]).selectExpr(
            "id AS vec_id",
            # uniform(-0.577, 0.577) ~ the source table's range
            "transform(sequence(0, 63), j ->"
            " cast(((xxhash64(id, j, 'em') & 9223372036854775807)"
            " % 1155) / 1000.0 - 0.577 as float)) AS embedding",
            f"cast({h('elb', 'id')} % 10 as int) AS label",
        ), "embeddings",
    )

    print(f"done -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
