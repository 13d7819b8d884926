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


# --- GEN:rotation begin ---
# Union of queries any past driver CORRECTNESS run has verified green
# (r09 ∪ ... ∪ r14). Listing checked queries LAST (stalest-
# verified first among them) rotates the driver's ~50-query budget onto
# the least-recently-verified entries. Regenerate with tools/gen_rotation.py.
_DRIVER_CHECKED = {
    "ab_test_conversion", "ann_graph_topk", "ann_ivf_topk",
    "ann_ivfpq_residual_topk", "ann_ivfpq_topk", "ann_ivfsq8_topk",
    "ann_jl_topk", "ann_lsh_buckets", "ann_lsh_multiprobe_topk",
    "ann_lsh_topk", "ann_opq_topk", "ann_pq_topk", "ann_sq8_topk",
    "approx_percentile_prices", "array_functions", "asof_join_events",
    "attribution_touchpoints", "audio_window_plan", "balanced_range_splits",
    "benford_first_digit_audit", "bigram_merge_candidates",
    "bigram_surprisal_scores", "bloom_autosized_screen",
    "bloom_contamination_screen", "bloom_prefilter_join",
    "bloom_screen_streaming", "bloom_sharded_screen",
    "bloom_sharded_screen_streaming", "bm25_topk",
    "boilerplate_chunk_scrub", "bot_burst_users",
    "boundaries_csv_roundtrip", "bpe_compression", "cdc_apply_merge",
    "cms_stream_token_counts", "cms_token_counts", "cohort_retention",
    "column_profile_customer", "conditional_aggregation",
    "contamination_ngram", "contamination_normalized",
    "contrastive_negatives", "coreset_kcenter", "corpus_chunk_pack",
    "corpus_chunk_windows", "corpus_clean", "corpus_cluster_safe_split",
    "corpus_drift_chi2", "corpus_drift_chi2_stream", "corpus_es_sample",
    "corpus_hash_sample", "corpus_lang_quota", "corpus_length_batches",
    "corpus_mixture_upsample", "corpus_pack_shards", "corpus_split_assign",
    "corpus_stratified_eval", "corpus_temperature_mix",
    "corpus_temperature_mix_stream", "corpus_training_order",
    "corpus_weighted_sample", "correction_pickle_roundtrip",
    "correlated_scalar_subquery", "correlation_pricing", "cosine_topk",
    "cube_returnflag_linestatus", "cusum_revenue_shift",
    "datasource_image_checksum", "datasource_image_stream_checksum",
    "datetime_functions", "decontaminate_train_spans",
    "dedup_cluster_sizes", "dedup_connected_components",
    "dedup_containment_pairs", "dedup_editdistance_pairs",
    "dedup_embedding_cosine", "dedup_exact", "dedup_incremental",
    "dedup_keep_best_quality", "dedup_lsh_pairs", "dedup_lsh_pairs_skew",
    "dedup_method_agreement", "dedup_minhash_signatures",
    "dedup_ngram_jaccard", "dedup_rate_by_source", "dedup_semantic_keep",
    "dedup_setsim_join", "dedup_simhash", "dedup_substring_clean",
    "dedup_substring_spans", "dedup_substring_spans_stream",
    "dedup_triangle_count", "distinct_groups", "doc_fingerprint",
    "dp_randomized_response", "dsir_importance_weights",
    "dsir_importance_weights_stream", "dyadic_hist_price_quantiles",
    "dyadic_stream_price_quantiles", "embedding_centroid_drift",
    "embedding_covariance_fp", "embedding_doc_consistency",
    "embedding_jl_projection", "embedding_semantic_keep",
    "embedding_sq8_checksum", "embedding_stats",
    "entity_resolution_customers", "event_transition_matrix",
    "ewma_anomaly_days", "ewma_anomaly_days_stream", "explode_tokens",
    "feature_hash_docs", "fk_integrity_audit", "frequent_item_pairs",
    "full_outer_join_balance", "funnel_conversion",
    "gapfill_monthly_revenue", "global_stats", "group_minmax_normalize",
    "grouping_sets_revenue", "heavy_hitter_tokens",
    "higher_moments_by_flag", "hilbert_key_lineitem", "hll_distinct_users",
    "hybrid_search_rrf", "imaging_feature_checksum", "imaging_pipeline_e2e",
    "interval_overlap_orders", "join_size_estimate", "json_extract_events",
    "key_skew_profile", "keyed_branch_concat", "kll_quantile_prices",
    "kll_quantiles_by_priority", "kmeans_embeddings",
    "kmv_difference_estimate", "kmv_distinct_by_priority",
    "kmv_intersection_estimate", "kmv_stream_distinct_by_priority",
    "kmv_union_estimate", "kn_surprisal_scores",
    "kn_surprisal_scores_stream", "knn_graph_mutual", "l_diversity_audit",
    "lang_id_heuristic", "lateral_topk_orders", "lsh_scurve_design",
    "mad_by_flag", "map_explode_props", "masked_extent_by_group",
    "math_functions", "mean_tensor_by_group", "median_price_by_flag",
    "merge_upsert_emulation", "mmr_diversified_topk",
    "model_quality_scores", "monthly_order_rollup", "moving_median_revenue",
    "multimodal_meta", "numeric_profile_lineitem", "order_gaps_ntile",
    "order_seasonality", "pagerank_suppliers", "parquet_sink_roundtrip",
    "phrase_search_docs", "pii_luhn_audit", "pii_scrub_customers",
    "pit_join_lineitem_scd2", "pivot_channels", "pseudonymize_events",
    "q10_returned_items", "q11_important_stock", "q12_priority_shipping",
    "q13_customer_distribution", "q14_promo_effect", "q15_top_supplier",
    "q16_parts_supplier", "q17_small_quantity_avg",
    "q18_large_volume_customer", "q19_discounted_revenue",
    "q1_pricing_summary", "q20_potential_promotion", "q21_waiting_orders",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_order_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_type_profit", "qc_filter_checksum",
    "quality_blocklist_filter", "quality_c4_filters",
    "quality_gopher_rules", "quality_quantile_bins", "quality_repetition",
    "quality_repetition_rules", "quality_score_calibration",
    "quality_score_calibration_stream", "quantile_sketch_prices",
    "quantile_sketch_rollup", "range_join_quantity_bands",
    "recursive_order_streaks", "regression_trend_by_priority",
    "revenue_anomaly_days", "rfm_segmentation", "rollup_order_date",
    "rtbf_cascade_delete", "running_sum_per_customer",
    "salted_token_counts", "sample_exact_k", "sample_with_replacement",
    "scd2_customer_orders", "semi_anti_join", "session_window_native",
    "sessionize_events", "set_ops_customers", "sliding_distinct_users",
    "sliding_window_events", "snapshot_diff_orders", "soft_delete_filter",
    "split_leakage_pairs", "stream_stream_attribution",
    "string_functions_part", "table_checksum", "text_quality", "tf_idf",
    "tiff_codec_checksum", "time_to_conversion", "token_budget_by_domain",
    "token_count_bpe", "top_event_paths", "topk_per_group",
    "trigram_backoff_scores", "tumbling_window_events", "union_sources",
    "unpivot_part_metrics", "variant_extract_events", "video_frame_plan",
    "vocab_novelty_by_batch", "winnow_dup_pairs", "winnow_dup_spans",
    "winsorized_pricing", "zarr_schema_synthesis", "zorder_key_lineitem"
}


#: last driver round each query was verified green in (stalest
#: sort FIRST so the ~50-query budget always lands on the least-
#: recently-verified rows). Regenerated each round from the
#: CORRECTNESS_r*.json green rows by tools/gen_rotation.py.
_LAST_GREEN_ROUND = {
    "ab_test_conversion": 10, "ann_graph_topk": 14, "ann_ivf_topk": 12,
    "ann_ivfpq_residual_topk": 13, "ann_ivfpq_topk": 13, "ann_ivfsq8_topk":
    10, "ann_jl_topk": 12, "ann_lsh_buckets": 12, "ann_lsh_multiprobe_topk":
    13, "ann_lsh_topk": 12, "ann_opq_topk": 13, "ann_pq_topk": 13,
    "ann_sq8_topk": 10, "approx_percentile_prices": 10, "array_functions":
    11, "asof_join_events": 13, "attribution_touchpoints": 11,
    "audio_window_plan": 11, "balanced_range_splits": 12,
    "benford_first_digit_audit": 13, "bigram_merge_candidates": 13,
    "bigram_surprisal_scores": 10, "bloom_autosized_screen": 10,
    "bloom_contamination_screen": 13, "bloom_prefilter_join": 13,
    "bloom_screen_streaming": 13, "bloom_sharded_screen": 11,
    "bloom_sharded_screen_streaming": 11, "bm25_topk": 13,
    "boilerplate_chunk_scrub": 13, "bot_burst_users": 11,
    "boundaries_csv_roundtrip": 14, "bpe_compression": 13,
    "cdc_apply_merge": 11, "cms_stream_token_counts": 14,
    "cms_token_counts": 14, "cohort_retention": 14,
    "column_profile_customer": 14, "conditional_aggregation": 14,
    "contamination_ngram": 12, "contamination_normalized": 10,
    "contrastive_negatives": 14, "coreset_kcenter": 11, "corpus_chunk_pack":
    12, "corpus_chunk_windows": 12, "corpus_clean": 12,
    "corpus_cluster_safe_split": 11, "corpus_drift_chi2": 11,
    "corpus_drift_chi2_stream": 11, "corpus_es_sample": 12,
    "corpus_hash_sample": 12, "corpus_lang_quota": 12,
    "corpus_length_batches": 12, "corpus_mixture_upsample": 12,
    "corpus_pack_shards": 12, "corpus_split_assign": 12,
    "corpus_stratified_eval": 10, "corpus_temperature_mix": 10,
    "corpus_temperature_mix_stream": 10, "corpus_training_order": 14,
    "corpus_weighted_sample": 14, "correction_pickle_roundtrip": 14,
    "correlated_scalar_subquery": 11, "correlation_pricing": 11,
    "cosine_topk": 12, "cube_returnflag_linestatus": 14,
    "cusum_revenue_shift": 11, "datasource_image_checksum": 14,
    "datasource_image_stream_checksum": 14, "datetime_functions": 11,
    "decontaminate_train_spans": 14, "dedup_cluster_sizes": 14,
    "dedup_connected_components": 12, "dedup_containment_pairs": 14,
    "dedup_editdistance_pairs": 12, "dedup_embedding_cosine": 12,
    "dedup_exact": 12, "dedup_incremental": 14, "dedup_keep_best_quality":
    12, "dedup_lsh_pairs": 12, "dedup_lsh_pairs_skew": 12,
    "dedup_method_agreement": 11, "dedup_minhash_signatures": 13,
    "dedup_ngram_jaccard": 13, "dedup_rate_by_source": 12,
    "dedup_semantic_keep": 14, "dedup_setsim_join": 14, "dedup_simhash": 13,
    "dedup_substring_clean": 13, "dedup_substring_spans": 14,
    "dedup_substring_spans_stream": 14, "dedup_triangle_count": 14,
    "distinct_groups": 14, "doc_fingerprint": 13, "dp_randomized_response":
    13, "dsir_importance_weights": 11, "dsir_importance_weights_stream": 11,
    "dyadic_hist_price_quantiles": 14, "dyadic_stream_price_quantiles": 14,
    "embedding_centroid_drift": 14, "embedding_covariance_fp": 12,
    "embedding_doc_consistency": 14, "embedding_jl_projection": 12,
    "embedding_semantic_keep": 13, "embedding_sq8_checksum": 10,
    "embedding_stats": 13, "entity_resolution_customers": 14,
    "event_transition_matrix": 14, "ewma_anomaly_days": 12,
    "ewma_anomaly_days_stream": 12, "explode_tokens": 14,
    "feature_hash_docs": 10, "fk_integrity_audit": 14,
    "frequent_item_pairs": 11, "full_outer_join_balance": 11,
    "funnel_conversion": 10, "gapfill_monthly_revenue": 11, "global_stats":
    10, "group_minmax_normalize": 10, "grouping_sets_revenue": 10,
    "heavy_hitter_tokens": 13, "higher_moments_by_flag": 11,
    "hilbert_key_lineitem": 11, "hll_distinct_users": 13,
    "hybrid_search_rrf": 10, "imaging_feature_checksum": 14,
    "imaging_pipeline_e2e": 14, "interval_overlap_orders": 11,
    "join_size_estimate": 14, "json_extract_events": 10, "key_skew_profile":
    14, "keyed_branch_concat": 10, "kll_quantile_prices": 14,
    "kll_quantiles_by_priority": 14, "kmeans_embeddings": 13,
    "kmv_difference_estimate": 13, "kmv_distinct_by_priority": 13,
    "kmv_intersection_estimate": 13, "kmv_stream_distinct_by_priority": 14,
    "kmv_union_estimate": 13, "kn_surprisal_scores": 11,
    "kn_surprisal_scores_stream": 11, "knn_graph_mutual": 13,
    "l_diversity_audit": 11, "lang_id_heuristic": 13, "lateral_topk_orders":
    11, "lsh_scurve_design": 14, "mad_by_flag": 11, "map_explode_props": 11,
    "masked_extent_by_group": 13, "math_functions": 11,
    "mean_tensor_by_group": 13, "median_price_by_flag": 10,
    "merge_upsert_emulation": 10, "mmr_diversified_topk": 13,
    "model_quality_scores": 10, "monthly_order_rollup": 10,
    "moving_median_revenue": 11, "multimodal_meta": 10,
    "numeric_profile_lineitem": 14, "order_gaps_ntile": 10,
    "order_seasonality": 11, "pagerank_suppliers": 13,
    "parquet_sink_roundtrip": 14, "phrase_search_docs": 10,
    "pii_luhn_audit": 13, "pii_scrub_customers": 11,
    "pit_join_lineitem_scd2": 11, "pivot_channels": 10,
    "pseudonymize_events": 11, "q10_returned_items": 11,
    "q11_important_stock": 13, "q12_priority_shipping": 11,
    "q13_customer_distribution": 11, "q14_promo_effect": 11,
    "q15_top_supplier": 11, "q16_parts_supplier": 11,
    "q17_small_quantity_avg": 11, "q18_large_volume_customer": 11,
    "q19_discounted_revenue": 13, "q1_pricing_summary": 10,
    "q20_potential_promotion": 13, "q21_waiting_orders": 11,
    "q22_global_sales_opportunity": 11, "q2_min_cost_supplier": 11,
    "q3_shipping_priority": 10, "q4_order_priority": 11,
    "q5_local_supplier_volume": 10, "q6_forecast_revenue": 11,
    "q7_volume_shipping": 11, "q8_market_share": 13,
    "q9_product_type_profit": 13, "qc_filter_checksum": 14,
    "quality_blocklist_filter": 12, "quality_c4_filters": 12,
    "quality_gopher_rules": 12, "quality_quantile_bins": 14,
    "quality_repetition": 13, "quality_repetition_rules": 12,
    "quality_score_calibration": 12, "quality_score_calibration_stream": 12,
    "quantile_sketch_prices": 14, "quantile_sketch_rollup": 14,
    "range_join_quantity_bands": 10, "recursive_order_streaks": 12,
    "regression_trend_by_priority": 12, "revenue_anomaly_days": 12,
    "rfm_segmentation": 10, "rollup_order_date": 10, "rtbf_cascade_delete":
    12, "running_sum_per_customer": 10, "salted_token_counts": 10,
    "sample_exact_k": 10, "sample_with_replacement": 14,
    "scd2_customer_orders": 12, "semi_anti_join": 10,
    "session_window_native": 12, "sessionize_events": 10,
    "set_ops_customers": 10, "sliding_distinct_users": 10,
    "sliding_window_events": 10, "snapshot_diff_orders": 12,
    "soft_delete_filter": 10, "split_leakage_pairs": 14,
    "stream_stream_attribution": 12, "string_functions_part": 10,
    "table_checksum": 12, "text_quality": 13, "tf_idf": 13,
    "tiff_codec_checksum": 14, "time_to_conversion": 10,
    "token_budget_by_domain": 13, "token_count_bpe": 13, "top_event_paths":
    12, "topk_per_group": 10, "trigram_backoff_scores": 12,
    "tumbling_window_events": 10, "union_sources": 10,
    "unpivot_part_metrics": 10, "variant_extract_events": 12,
    "video_frame_plan": 12, "vocab_novelty_by_batch": 10,
    "winnow_dup_pairs": 12, "winnow_dup_spans": 12, "winsorized_pricing": 9,
    "zarr_schema_synthesis": 14, "zorder_key_lineitem": 10
}
# --- GEN:rotation end ---


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    driver-unverified queries run first, then stalest-verified
    (see _DRIVER_CHECKED / _LAST_GREEN_ROUND)."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session_confs(spark)
            return fn(spark, sf_dir)

        return run

    ordered = sorted(
        REGISTRY, key=lambda n: (n in _DRIVER_CHECKED, _LAST_GREEN_ROUND.get(n, 0), n)
    )
    return {name: wrap(REGISTRY[name].fn) for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each SQL-expressible query."""
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
