"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (revenue-by-nation: the SCIP
pipeline skeleton in relational form — scan → filter → broadcast-join
dims → partial+final agg) on sf0.001. ``queries()``/``oracle_sql()``
expose the full operator registry (scip_spark/queries.py and the
functions/* extension modules), each mapped to a SURVEY.md §2 operator.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scip_spark.entry_queries  # noqa: E402,F401  populates the registry
from scip_spark.queries import REGISTRY  # noqa: E402


def _pin_session_confs(spark: SparkSession) -> None:
    """Runtime confs the queries depend on, set on the driver's own
    session: nanos-timestamp parquet reads (events table) and a fixed
    UTC session timezone so timestamp formatting matches the oracle's
    naive timestamps regardless of host TZ."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    # nanos-timestamp parquet needs this (harmless otherwise); the
    # driver supplies its own session so set it here, not in session.py
    _pin_session_confs(spark)
    return REGISTRY["q5_local_supplier_volume"].fn(spark, "/root/testdata/sf0.001")


# Union of queries any past driver CORRECTNESS run has verified green
# (r01 ∪ r02 ∪ r03 ∪ r04 ∪ r05): 160 of the 169 registry entries.
# Listing checked queries LAST rotates the driver's 50-query budget onto
# the 9 never-driver-checked ones (bigram_merge_candidates, bm25_topk,
# bpe_compression, feature_hash_docs, hybrid_search_rrf,
# model_quality_scores, phrase_search_docs, sliding_distinct_users,
# vocab_novelty_by_batch). Refresh with each round's green rows.
_DRIVER_CHECKED = {
    "ab_test_conversion", "ann_ivf_topk", "ann_ivfpq_residual_topk",
    "ann_ivfpq_topk", "ann_lsh_buckets", "ann_lsh_multiprobe_topk",
    "ann_lsh_topk", "ann_opq_topk", "ann_pq_topk",
    "approx_percentile_prices", "array_functions", "asof_join_events",
    "attribution_touchpoints", "audio_window_plan",
    "bigram_merge_candidates", "bm25_topk", "boilerplate_chunk_scrub",
    "bot_burst_users", "bpe_compression", "cdc_apply_merge",
    "cohort_retention", "column_profile_customer",
    "conditional_aggregation", "contamination_ngram",
    "contrastive_negatives", "corpus_chunk_pack", "corpus_chunk_windows",
    "corpus_clean", "corpus_hash_sample", "corpus_lang_quota",
    "corpus_mixture_upsample", "corpus_pack_shards", "corpus_split_assign",
    "correlated_scalar_subquery", "correlation_pricing", "cosine_topk",
    "cube_returnflag_linestatus", "cusum_revenue_shift",
    "datetime_functions", "dedup_cluster_sizes",
    "dedup_connected_components", "dedup_containment_pairs",
    "dedup_embedding_cosine", "dedup_exact", "dedup_incremental",
    "dedup_lsh_pairs", "dedup_lsh_pairs_skew", "dedup_minhash_signatures",
    "dedup_ngram_jaccard", "dedup_semantic_keep", "dedup_setsim_join",
    "dedup_simhash", "dedup_triangle_count", "distinct_groups",
    "doc_fingerprint", "embedding_centroid_drift",
    "embedding_doc_consistency", "embedding_stats",
    "entity_resolution_customers", "event_transition_matrix",
    "explode_tokens", "feature_hash_docs", "fk_integrity_audit",
    "frequent_item_pairs", "full_outer_join_balance", "funnel_conversion",
    "gapfill_monthly_revenue", "global_stats", "group_minmax_normalize",
    "grouping_sets_revenue", "heavy_hitter_tokens",
    "higher_moments_by_flag", "hll_distinct_users", "hybrid_search_rrf",
    "imaging_pipeline_e2e", "interval_overlap_orders", "join_size_estimate",
    "json_extract_events", "key_skew_profile", "keyed_branch_concat",
    "kmeans_embeddings", "kmv_difference_estimate",
    "kmv_distinct_by_priority", "kmv_intersection_estimate",
    "kmv_union_estimate", "l_diversity_audit", "lang_id_heuristic",
    "lateral_topk_orders", "lsh_scurve_design", "mad_by_flag",
    "map_explode_props", "masked_extent_by_group", "math_functions",
    "mean_tensor_by_group", "median_price_by_flag",
    "merge_upsert_emulation", "model_quality_scores",
    "monthly_order_rollup", "moving_median_revenue", "multimodal_meta",
    "numeric_profile_lineitem", "order_gaps_ntile", "order_seasonality",
    "pagerank_suppliers", "phrase_search_docs", "pii_scrub_customers",
    "pit_join_lineitem_scd2", "pivot_channels", "pseudonymize_events",
    "q10_returned_items", "q11_important_stock", "q12_priority_shipping",
    "q13_customer_distribution", "q14_promo_effect", "q15_top_supplier",
    "q16_parts_supplier", "q17_small_quantity_avg",
    "q18_large_volume_customer", "q19_discounted_revenue",
    "q1_pricing_summary", "q20_potential_promotion", "q21_waiting_orders",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_order_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_type_profit", "quality_quantile_bins", "quality_repetition",
    "quantile_sketch_prices", "quantile_sketch_rollup",
    "range_join_quantity_bands", "recursive_order_streaks",
    "regression_trend_by_priority", "revenue_anomaly_days",
    "rfm_segmentation", "rollup_order_date", "running_sum_per_customer",
    "salted_token_counts", "sample_exact_k", "sample_with_replacement",
    "scd2_customer_orders", "semi_anti_join", "sessionize_events",
    "set_ops_customers", "sliding_distinct_users", "sliding_window_events",
    "snapshot_diff_orders", "soft_delete_filter", "split_leakage_pairs",
    "string_functions_part", "table_checksum", "text_quality", "tf_idf",
    "time_to_conversion", "token_budget_by_domain", "token_count_bpe",
    "top_event_paths", "topk_per_group", "tumbling_window_events",
    "union_sources", "unpivot_part_metrics", "variant_extract_events",
    "vocab_novelty_by_batch", "winsorized_pricing", "zorder_key_lineitem"
}


#: verified most recently (round 6): sorts LAST so the driver's
#: ~50-query budget re-verifies the stalest rows first
_RECENTLY_CHECKED = {
    "asof_join_events", "bigram_merge_candidates", "bm25_topk",
    "bpe_compression", "cohort_retention", "conditional_aggregation",
    "cube_returnflag_linestatus", "distinct_groups",
    "event_transition_matrix", "explode_tokens", "feature_hash_docs",
    "funnel_conversion", "global_stats", "group_minmax_normalize",
    "grouping_sets_revenue", "hybrid_search_rrf", "imaging_pipeline_e2e",
    "json_extract_events", "keyed_branch_concat", "median_price_by_flag",
    "merge_upsert_emulation", "model_quality_scores",
    "monthly_order_rollup", "multimodal_meta", "order_gaps_ntile",
    "phrase_search_docs", "pivot_channels", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "range_join_quantity_bands", "rfm_segmentation", "rollup_order_date",
    "running_sum_per_customer", "salted_token_counts", "sample_exact_k",
    "semi_anti_join", "sessionize_events", "set_ops_customers",
    "sliding_distinct_users", "sliding_window_events", "soft_delete_filter",
    "string_functions_part", "time_to_conversion", "topk_per_group",
    "tumbling_window_events", "union_sources", "unpivot_part_metrics",
    "vocab_novelty_by_batch", "zorder_key_lineitem"
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    driver-unverified queries run first (see _DRIVER_CHECKED)."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session_confs(spark)
            return fn(spark, sf_dir)

        return run

    ordered = sorted(
        REGISTRY, key=lambda n: (n in _DRIVER_CHECKED, n in _RECENTLY_CHECKED)
    )
    return {name: wrap(REGISTRY[name].fn) for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each SQL-expressible query."""
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
