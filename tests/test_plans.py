"""Physical-plan assertions — the 100 TB evidence (SURVEY.md §4).

These tests pin the properties that make the engine scale: filters and
projections reach the parquet reader, small dims broadcast, hot
expressions stay inside whole-stage codegen, windows share exchanges,
and the flagship pipeline has exactly the shuffles it needs — so a
regression that silently adds an exchange or drops out of codegen fails
CI, not the cluster."""

from __future__ import annotations

from geneticalgorithmsusingmapreduce_spark import catalog

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    """Finalized physical plan: execute first (AQE only finalizes at
    runtime), then keep the Final Plan section (the string otherwise
    repeats every operator in the Initial Plan section too)."""
    df.collect()  # a write would spawn a separate QueryExecution
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.split("== Initial Plan ==")[0]


def test_scan_pushdown_reaches_parquet(spark):
    p = _plan(catalog.QUERIES["scan_filter_project"](spark, SF))
    assert "PushedFilters: [" in p or "DataFilters: [" in p
    # column pruning: the read schema must carry only the needed columns
    assert "l_comment" not in p
    seg = p[p.index("ReadSchema"):]
    assert "l_extendedprice" in seg and "l_returnflag" not in seg


def test_broadcast_join_selected(spark):
    p = _plan(catalog.QUERIES["join_broadcast_revenue"](spark, SF))
    assert "BroadcastHashJoin" in p
    # nation is hint-forced; customer is AQE's choice (r7 VERDICT #1:
    # a pinned broadcast of a table that grows with the corpus is a
    # scale trap) — at test scale AQE still broadcasts it, so both dims
    # arrive without a shuffle exchange on their own join keys
    assert p.count("BroadcastHashJoin") >= 2
    # the one forced hint must be nation's, not customer's
    import re

    src = __import__("inspect").getsource(
        catalog.join_broadcast_revenue.__wrapped__
        if hasattr(catalog.join_broadcast_revenue, "__wrapped__")
        else catalog.join_broadcast_revenue
    )
    assert len(re.findall(r"\.join\(F\.broadcast\(", src)) == 1
    assert ".join(F.broadcast(n)" in src


def test_semi_anti_join_operators(spark):
    p = _plan(catalog.QUERIES["join_semi_anti"](spark, SF))
    assert "LeftSemi" in p and "LeftAnti" in p


def test_flagship_is_single_shuffle(spark):
    # scan → genome gen → fitness → grouped agg: exactly one exchange,
    # with the partial aggregate BEFORE it (map-side combine). Note the
    # agg is SortAggregate, not Hash: grouped max_by carries an
    # array<bigint> buffer, which the hash-agg's fixed-size row can't
    # hold — fine, since the partial agg shrinks each partition to
    # #groups rows before the shuffle.
    p = _plan(catalog.QUERIES["flagship_best_by_flag"](spark, SF))
    assert p.count("Exchange hashpartitioning") == 1
    assert "partial_max_by" in p.split("Exchange")[1]  # partial below it


def test_flagship_stays_in_codegen(spark):
    # the genome/popcount projection must sit inside a WholeStageCodegen
    # span — interpreted fallback was a 12× regression (functions.prng)
    p = _plan(catalog.QUERIES["flagship_best_by_flag"](spark, SF))
    assert "*(1)" in p  # at least one codegen stage wrapping the scan side


def test_window_queries_share_one_exchange(spark):
    # all analytic windows share a partitioning → one exchange, one sort
    p = _plan(catalog.QUERIES["window_analytics"](spark, SF))
    assert p.count("Exchange") == 1
    assert p.count("Sort") <= 2


def test_tournament_exchange_count(spark):
    # seeded shuffle + tournament windows + pairing: the bucket exchange
    # must be reused by every window (no per-window re-shuffle)
    p = _plan(catalog.QUERIES["sga_tournament"](spark, SF))
    assert p.count("Exchange hashpartitioning(part") <= 2


def _formatted_plan(df) -> str:
    """explain('formatted') as a string — per-node Input/Output column
    lists, which the tree string doesn't carry."""
    df.collect()  # finalize AQE
    jdf = df._jdf
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        jdf.queryExecution(), "formatted"
    )


def test_tournament_shuffle_is_skinny(spark):
    # r8 (r7 VERDICT "Next round" #1): selection needs only
    # (id, fitness, skey) — the tournament/pairing window exchanges
    # must NOT carry genome bytes (pop × genome was the engine's
    # dominant sf100 cost); genomes join back by id through a hash
    # join, never a wide sort.
    import re

    for name in ("sga_tournament", "sga_generation"):
        p = _formatted_plan(catalog.QUERIES[name](spark, SF))
        # split into per-node blocks: "(12) Exchange ..." sections
        blocks = re.split(r"\n(?=\(\d+\) )", p)
        # window exchanges partition on part ALONE; the pairing pivot's
        # (part, pair) exchange is the one sanctioned genome carrier
        part_exchanges = [
            b for b in blocks
            if b.startswith("(") and "Exchange" in b.split("\n")[0]
            and re.search(r"hashpartitioning\(part#\d+L?, \d+\)", b)
        ]
        assert part_exchanges, f"{name}: no window exchange found"
        for b in part_exchanges:
            assert "genome" not in b and "parent#" not in b, (
                f"{name}: window exchange carries genome bytes:\n{b[:400]}"
            )
        # the skinny side of the genome join-back must hash-build (a
        # wide-side hash build OOM'd sf100; a genome-side SMJ sort is
        # allowed — merge sorts spill)
        assert "ShuffledHashJoin" in p, f"{name}: join-back not hash join"
        # every WINDOW sort (skey / rn / pos ordering — the O(n log n)
        # per-bucket sorts) must be genome-free; only join-id merge
        # sorts may see genome-carrying rows
        window_sorts = [
            b for b in blocks
            if b.startswith("(") and b.split("\n")[0].endswith("Sort")
            and re.search(r"Arguments: \[[^\]]*(skey|rn|pos)#", b)
        ]
        assert window_sorts, f"{name}: no window sorts found"
        for b in window_sorts:
            assert "genome" not in b and "parent#" not in b and (
                " pa#" not in b
            ), f"{name}: window sort carries genome bytes:\n{b[:400]}"


def test_tournament_genome_side_zero_exchange(spark):
    # r9 (r8 VERDICT #1): the genome lookup is the BUCKET-STORED
    # generation — in sga_tournament NO exchange anywhere carries
    # genome bytes (the r8 shape still exchanged bare ids for the
    # dedup), the store scan is a bucketed read (Bucketed: true),
    # and it feeds the join-back directly.
    import re

    p = _formatted_plan(catalog.QUERIES["sga_tournament"](spark, SF))
    blocks = re.split(r"\n(?=\(\d+\) )", p)
    exchanges = [
        b for b in blocks
        if b.startswith("(") and "Exchange" in b.split("\n")[0]
    ]
    assert exchanges, "no exchanges found (plan parse failed?)"
    for b in exchanges:
        assert "genome" not in b and "parent#" not in b, (
            f"genome bytes cross an exchange:\n{b[:400]}"
        )
    assert "Bucketed: true" in p, "store scan did not ride the bucketing"
    assert "ShuffledHashJoin" in p


def test_cga_generation_no_join_no_extra_shuffle(spark):
    # the recomputing update is a projection over the model: no join
    # operators anywhere in the plan
    p = _plan(catalog.QUERIES["cga_generation"](spark, SF))
    assert "Join" not in p


def test_dedup_genomes_partial_aggregation(spark):
    # map-side partial agg before the exchange (duplicate-heavy inputs
    # shrink before shuffling)
    p = _plan(catalog.QUERIES["dedup_genomes"](spark, SF))
    first_agg = p.index("HashAggregate")
    assert "HashAggregate" in p[first_agg + 1:]  # partial + final pair


# --- ANN / dedup extension plan shapes (VERDICT r1 #8) -------------------
# These pin the properties that make the 100 TB paths viable: candidate
# generation via bucketed equi-joins (never all-pairs), broadcast for the
# small sides, and partial aggregation below every exchange. A refactor
# that silently degrades one of these to a cartesian product fails here.

import re


def _join_on(p: str, key: str) -> bool:
    """True if some equi-join in the plan keys on `key` (any join strategy
    Catalyst picks at this scale — broadcast here, SMJ/shuffled-hash at
    100 TB — is fine; what matters is the join is keyed, not cross)."""
    return re.search(
        rf"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[(\w+#\d+L?, )*{key}#\d+", p
    ) is not None


def test_ivf_topk_keyed_probe_no_cartesian(spark):
    p = _plan(catalog.QUERIES["emb_ivf_topk"](spark, SF))
    assert "CartesianProduct" not in p
    # candidates probe via an equi-join on the centroid id; the only
    # nested-loop joins are the deliberate broadcasts of the tiny
    # query/centroid sets (k rows), never two big sides
    assert _join_on(p, "cent_id")
    # per-query partial top-k: final agg shuffles on query_id only
    assert "Exchange hashpartitioning(query_id" in p


def test_lsh_pairs_bucketed_join(spark):
    p = _plan(catalog.QUERIES["emb_lsh_pairs"](spark, SF))
    assert "CartesianProduct" not in p
    assert _join_on(p, "bucket")


def test_cosine_near_dup_bucketed_join(spark):
    p = _plan(catalog.QUERIES["dedup_embedding_cosine"](spark, SF))
    assert "CartesianProduct" not in p
    assert _join_on(p, "bucket")


def test_minhash_lsh_band_bucket_join(spark):
    p = _plan(catalog.QUERIES["dedup_minhash_lsh"](spark, SF))
    assert "CartesianProduct" not in p
    assert _join_on(p, "band")  # self-join keyed (band, bucket)


def test_simhash_band_bucket_join(spark):
    p = _plan(catalog.QUERIES["dedup_simhash"](spark, SF))
    assert "CartesianProduct" not in p
    assert _join_on(p, "band")


def test_ngram_jaccard_shingle_keyed_join(spark):
    # candidates come from the df-pruned inverted index (posting-list
    # explode — no join at all), and the r5 verify joins the candidate
    # list to per-doc sh64 SETS keyed on the doc ids with the
    # intersection as a per-row array op — never an all-pairs product,
    # and never the old exploded per-shingle join (which materialized
    # |candidates|x|shingles/doc| rows before aggregating)
    p = _plan(catalog.QUERIES["dedup_ngram_jaccard"](spark, SF))
    assert "CartesianProduct" not in p
    assert _join_on(p, "doc_a") and _join_on(p, "doc_b")
    assert "array_intersect" in p


def test_topk_dot_is_broadcast_nlj_baseline(spark):
    # the exact baseline deliberately broadcasts the Q=5 query rows; it
    # must be a *broadcast* NLJ (small side shipped), never a cartesian
    p = _plan(catalog.QUERIES["emb_topk_dot"](spark, SF))
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_digest_dedup_exchange_carries_digest(spark):
    # the 100 TB exact-dedup variant: the shuffle keys on the 16-byte
    # binary digest, and the document text never crosses the exchange
    p = _plan(catalog.QUERIES["dedup_exact_digest"](spark, SF))
    assert "Exchange hashpartitioning(digest_bin" in p
    shuffled = p.split("Exchange hashpartitioning(digest_bin")[0]
    assert "text#" not in shuffled  # post-exchange side is digest+id only
    assert "partial_min" in p.split("Exchange")[1]  # map-side combine


def test_minhash_signatures_single_exchange(spark):
    # signatures: one hash-agg shuffle keyed by doc_id, partials below it
    p = _plan(catalog.QUERIES["minhash_signatures"](spark, SF))
    assert p.count("Exchange hashpartitioning") == 1
    assert "partial_min" in p.split("Exchange")[1]


def test_corpus_curation_single_exchange(spark):
    # the composed curation pipeline (gates → digest dedup → split) has
    # exactly ONE shuffle, keyed on the digest, with map-side partial
    # aggregation and the document text never crossing the exchange
    p = _plan(catalog.QUERIES["corpus_curation"](spark, SF))
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange hashpartitioning(digest" in p
    partial = next(
        l for l in p.splitlines() if "partial_min" in l
    )
    assert "text#" not in partial  # shuffled rows are (digest, id, tokens)


def test_asof_and_range_extend_plan_suite(spark):
    # temporal joins keep their scale shapes under composition with scans
    p = _plan(catalog.QUERIES["events_asof_join"](spark, SF))
    assert "CartesianProduct" not in p
    p2 = _plan(catalog.QUERIES["events_range_join"](spark, SF))
    assert "CartesianProduct" not in p2 and "BroadcastNestedLoopJoin" not in p2


def test_importance_sample_map_only(spark):
    # deterministic sampling is a pure projection + filter: no exchange,
    # no rand(), pushes the scan down to (doc_id, text)
    p = _plan(catalog.QUERIES["doc_importance_sample"](spark, SF))
    assert "Exchange" not in p
    assert "rand(" not in p


def test_repetition_single_exchange(spark):
    # posexplode → ONE doc_id exchange → window lead() bigrams → both
    # aggs reuse the window's partitioning (doc_id ⊂ (doc_id, gram)).
    # A second exchange means the aggs stopped reusing it; any HOF
    # lambda means the bigram builder fell out of codegen.
    p = _plan(catalog.QUERIES["text_repetition"](spark, SF))
    assert p.count("Exchange hashpartitioning") == 1
    # bigram built by a codegen'd Project (window lead + concat), not a
    # transform() lambda (the tokenizer's filter-lambda lives inside the
    # one-off Generate and is fine — it is not the per-bigram hot path)
    assert "Window [lead(tok" in p
    assert "*(3) Project [doc_id" in p and "concat(tok" in p


def test_kmeans_stats_broadcast_assignment(spark):
    # the post-training assignment pass must broadcast the centroid table
    # (8 rows) — never shuffle the vector table against it
    p = _plan(catalog.QUERIES["emb_kmeans_clusters"](spark, SF))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_shipping_priority_broadcast_dim(spark):
    # Q3 shape: the filtered customer dim broadcasts; only the fact-fact
    # join may exchange. TakeOrderedAndProject caps the top-10 without a
    # global sort of the aggregated rows.
    p = _plan(catalog.QUERIES["shipping_priority"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_local_supplier_volume_dims_broadcast(spark):
    # Q5 shape: supplier/nation/region all arrive via broadcast — a
    # 6-table join with exactly the fact-fact exchanges and nothing else
    p = _plan(catalog.QUERIES["local_supplier_volume"](spark, SF))
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p


def test_cached_plans_get_adaptive_coalescing(spark):
    # persist() captures its physical plan at call time; without
    # canChangeCachedPlanOutputPartitioning AQE is bypassed for the
    # cached subtree and every cached exchange materializes at the raw
    # spark.sql.shuffle.partitions (200 near-empty tasks per round on a
    # driver-default session at gate scale). Pin that cache
    # materialization IS coalesced: a tiny grouped result must come back
    # in far fewer partitions than the configured shuffle width.
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        cached = (
            spark.range(10_000)
            .groupBy((F.col("id") % 50).alias("k"))
            .count()
            .persist()
        )
        cached.count()  # materialize
        assert cached.rdd.getNumPartitions() < 32
    finally:
        cached.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_neardup_pairs_read_from_parquet_artifact(spark):
    # r5 VERDICT #2: the verified pair graph must arrive via a parquet
    # scan (distributed serve), never through the driver — a regression
    # back to collect+createDataFrame would show as LocalTableScan
    p = _plan(catalog.QUERIES["neardup_pairs_roundtrip"](spark, SF))
    assert "FileScan parquet" in p
    assert "LocalTableScan" not in p
    # consumers read the identical artifact
    p2 = _plan(catalog.QUERIES["dedup_clusters_star"](spark, SF))
    assert "LocalTableScan" not in p2


def test_banded_cosine_pairids_join_is_skinny(spark):
    # the banded self-join must move only (vec_id, band, bucket) rows;
    # the quantized arrays join back AFTER cross-band dedup — qv must
    # not appear among the self-join keys' exchange
    from geneticalgorithmsusingmapreduce_spark.operators import ann

    df = ann.cosine_near_pairs(
        ann.augmented_embeddings(spark, SF), n_planes=16, bands=2
    )
    p = _plan(df)
    # exactly one pair-dedup (the cross-band distinct) before verify
    assert "HashAggregate" in p or "SortAggregate" in p
    # the quantize kernel runs ONCE: every later reference to the banded
    # base (band rows + both array sides) must be served from the
    # persisted materialization, not recomputed (the plan TEXT repeats
    # the cached subtree per reference, so count cache scans, not nodes)
    assert "InMemoryTableScan" in p


def test_distinct_counts_no_expand(spark):
    # r7: the naive 3-way countDistinct over the joined fact measured
    # 25.24x for 10x data at the sf10->sf100 decade — Spark EXPANDs the
    # joined rows 3x (one copy per distinct agg) after shuffling them at
    # full width. The rewrite keeps each distinct agg two-level on a
    # narrow projection and joins orders only against DISTINCT
    # (orderkey, flag) pairs: no Expand node anywhere, and the tiny
    # 3-row per-column results come back via broadcast joins.
    p = _plan(catalog.QUERIES["distinct_counts"](spark, SF))
    assert "Expand" not in p
    assert "BroadcastHashJoin" in p  # the 3-row result stitch-up


def test_q5_orders_customer_join_first(spark):
    # r7: Catalyst never reorders joins without CBO, so the Q5 rewrite's
    # property must be pinned structurally: the orders x customer join
    # reduces to a skinny (o_orderkey, c_nationkey) projection BEFORE
    # lineitem joins — the optimized plan must contain that two-column
    # Project (it cannot exist under the old li-first ordering, where
    # customer joined the full-width fact output).
    import re

    df = catalog.QUERIES["local_supplier_volume"](spark, SF)
    p = df._jdf.queryExecution().optimizedPlan().toString()
    assert re.search(r"Project \[o_orderkey#\d+L?, c_nationkey#\d+L?\]", p)


def test_semdedup_balanced_single_block_exchange(spark):
    # the skew-bounded verify's physical contract: ONE exchange keyed
    # (cent_id, bi, bj) feeding the block_pair kernel — hot-cluster rows
    # replicate across block groups INSIDE that exchange, never a second
    # shuffle, and the census collect stays model-sized (pre-aggregated)
    from geneticalgorithmsusingmapreduce_spark.operators import ann

    aug = ann.augmented_embeddings(spark, SF)
    df = ann.semantic_cluster_pairs(aug, tau_milli=700, n_centroids=16,
                                    cap=24)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in p
    assert p.count("hashpartitioning(cent_id") == 1
    assert "bi" in p and "bj" in p  # the block keys ride that exchange
