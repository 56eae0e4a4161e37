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
# encodes priority.  Round-7 rotation (r6 VERDICT "Next round" #6): the
# 48 entries whose last driver-green row is r5 run FIRST (notably
# dedup_clusters and word_counts, displaced by the r6 budget), plus the
# two entries registered this round — exactly the 50 budget.  The
# r6-green entries fill the tail, where being skipped costs nothing;
# after r7 no entry's last green row is older than r6.
_GATE_PRIORITY = [
    # last driver-green in r5 — re-green in r7 (family grouping kept so
    # codegen shapes compile once)
    "dedup_clusters", "word_counts",
    "flagship_best_by_flag", "population_generate", "cga_init_vectors",
    "sga_shuffle", "sga_tournament", "sga_generation",
    "orders_by_month", "orders_id_arrays", "pivot_status_by_flag",
    "regex_funcs", "string_funcs", "sequencefile_roundtrip",
    "streaming_running_best", "events_asof_join", "events_range_join",
    "dedup_exact_digest", "doc_chunking", "chunk_packing",
    # registered in r7 — first driver check: chunk_dedup_exact sits by
    # the chunking family, the sized banded entry by its 16-plane sibling
    "chunk_dedup_exact",
    "corpus_curation", "doc_train_val_test",
    "order_price_quartiles", "text_token_stats", "streaming_dedup",
    "streaming_windowed_counts", "events_resample",
    "events_series_similarity", "events_partitioned_scan",
    "dedup_cosine_banded", "dedup_cosine_banded_sized",
    "set_ops_custkeys", "set_ops_all_custkeys",
    "distinct_counts",
    "emb_ivf_index_roundtrip", "corpus_mixture_sample",
    "doc_importance_sample", "doc_stratified_sample",
    "emb_ivf_topk_trained", "emb_kmeans_clusters", "cms_user_counts",
    "hll_distinct_users", "bloom_join_prune", "decontaminate",
    "pii_redact", "text_repetition", "csv_json_roundtrip",
    "local_supplier_volume", "shipping_priority",
    # <- entries registered after this round (absent from this list)
    #    slot here, ahead of the r6-fresh tail
    # last driver-green in r6 — tail (one round fresh; re-green in r8).
    # corpus_curation_neardup's guard threading and dedup_clusters_star's
    # artifact reuse were re-verified locally at sf0.01 this round
    # (hash-pass, tools/check_correctness.py) after their r6 green.
    "cga_sample", "cga_member_fitness", "cga_generation",
    "cga_convergence", "sga_tournament_pandas", "cga_update_join",
    "dedup_genomes", "top_k_individuals", "cga_tagged_union",
    "scan_filter_project", "events_tumbling", "events_sliding",
    "events_session", "text_language_guess", "text_quality",
    "text_fingerprint", "dedup_exact_text",
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
    "neardup_pairs_roundtrip", "emb_cosine_banded_recall",
    "corpus_curation_neardup", "dedup_clusters_star",
]


def _gate_order(names):
    rank = {n: i for i, n in enumerate(_GATE_PRIORITY)}
    # unknown (newly registered) names slot after the re-green block,
    # ahead of the r6-fresh tail
    new_slot = _GATE_PRIORITY.index("cga_sample") - 0.5
    return sorted(names, key=lambda n: (rank.get(n, new_slot), n))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: catalog.QUERIES[n] for n in _gate_order(catalog.QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: catalog.ORACLES[n] for n in _gate_order(catalog.ORACLES)}
