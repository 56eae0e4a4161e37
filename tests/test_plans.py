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
    # the big fact-fact join may be SMJ or shuffled-hash; the dims must
    # never arrive via a shuffle exchange on their own join keys
    assert p.count("BroadcastHashJoin") >= 2


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
