"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over geneticalgorithmsusingmapreduce_spark.catalog — every
operator from SURVEY.md §2 is registered there as a (spark_fn, duckdb
oracle) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geneticalgorithmsusingmapreduce_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.entry_flagship(spark)


# The driver's correctness gate verifies entries in queries() iteration
# order and stops at a budget (50 entries per round).  Order therefore
# encodes priority.  Round-6 rotation (r5 VERDICT "Next round" #8): the
# 44 entries whose last driver-green row is r4 (every name present in
# CORRECTNESS_r04.json but absent from r05) run FIRST, followed by the
# two entries registered this round, so after r6 no entry's last green
# row is older than r5.  The r5-green entries fill the tail, where being
# skipped costs nothing; four cheap r5 entries pad the head to the full
# 50-budget.
_GATE_PRIORITY = [
    # last driver-green in r4 — re-green in r6
    "cga_sample", "cga_member_fitness", "cga_generation",
    "cga_convergence", "sga_tournament_pandas", "cga_update_join",
    "dedup_genomes", "top_k_individuals", "cga_tagged_union",
    "scan_filter_project", "events_tumbling", "events_sliding",
    "events_session", "text_language_guess", "text_quality",
    "text_fingerprint", "dedup_exact_text",
    # minhash/shingle family grouped so the codegen shapes compile once;
    # the r6 hot-bucket-guard entries sit next to their uncapped
    # siblings for the same reason (first driver check this round)
    "minhash_signatures", "dedup_minhash_lsh", "dedup_minhash_lsh_capped",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "dedup_simhash", "dedup_simhash_capped",
    "emb_topk_dot", "emb_topk_numpy", "emb_lsh_pairs",
    "multimodal_features", "multimodal_frames", "multimodal_resize",
    "pricing_summary", "join_broadcast_revenue", "join_semi_anti",
    "rollup_order_stats", "emb_ivf_recall", "hll_distinct_by_type",
    "join_bucketed_revenue", "orc_roundtrip", "sga_mutation",
    "sga_mutation_sparse", "incremental_sga", "cube_order_stats",
    "window_analytics", "skew_salted_revenue", "events_json_extract",
    "emb_ivf_topk",
    # registered in r6 — first driver check
    "neardup_pairs_roundtrip", "emb_cosine_banded_recall",
    # the clustering referee pair stays in the head (r5 VERDICT #6):
    # curation_neardup warms the shingle/LSH/star codegen shapes, star
    # reuses the pair artifact neardup_pairs_roundtrip just built. The
    # 50-budget forced two r5-green heads out when the hot-bucket-guard
    # entries registered: word_counts (a pad) and dedup_clusters —
    # min-label is the documented-deprecated clustering path, star is
    # what the curation pipeline ships, and both displaced entries stay
    # one round fresh (r5-green) and slot at 51-52 via the new_slot rank
    "corpus_curation_neardup", "dedup_clusters_star",
    # <- entries registered after this round (absent from this list)
    #    slot here, ahead of the r5-fresh tail
    "flagship_best_by_flag", "population_generate", "cga_init_vectors",
    "sga_shuffle", "sga_tournament", "sga_generation",
    "orders_by_month", "orders_id_arrays", "pivot_status_by_flag",
    "regex_funcs", "string_funcs", "sequencefile_roundtrip",
    "streaming_running_best", "events_asof_join", "events_range_join",
    "dedup_exact_digest", "doc_chunking", "chunk_packing",
    "corpus_curation", "doc_train_val_test",
    "order_price_quartiles", "text_token_stats", "streaming_dedup",
    "streaming_windowed_counts", "events_resample",
    "events_series_similarity", "events_partitioned_scan",
    "dedup_cosine_banded", "set_ops_custkeys", "set_ops_all_custkeys",
    "distinct_counts",
    "emb_ivf_index_roundtrip", "corpus_mixture_sample",
    "doc_importance_sample", "doc_stratified_sample",
    "emb_ivf_topk_trained", "emb_kmeans_clusters", "cms_user_counts",
    "hll_distinct_users", "bloom_join_prune", "decontaminate",
    "pii_redact", "text_repetition", "csv_json_roundtrip",
    "local_supplier_volume", "shipping_priority",
]


def _gate_order(names):
    rank = {n: i for i, n in enumerate(_GATE_PRIORITY)}
    # unknown (newly registered) names slot after the re-green block,
    # ahead of the r4-fresh tail
    new_slot = _GATE_PRIORITY.index("flagship_best_by_flag") - 0.5
    return sorted(names, key=lambda n: (rank.get(n, new_slot), n))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: catalog.QUERIES[n] for n in _gate_order(catalog.QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: catalog.ORACLES[n] for n in _gate_order(catalog.ORACLES)}
