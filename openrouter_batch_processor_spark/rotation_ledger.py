"""Driver-CORRECTNESS rotation ledger.

The external driver hash-checks only the FIRST 50 registry queries per
round, so full driver coverage of the registry is achieved by ROTATING
never-yet-checked queries into the front-50 window each round while the
ops-coverage invariant (tests/test_registry_order.py) is maintained
against the UNION of this ledger and the current window.

Each entry lists the queries that received a green driver CORRECTNESS
row in that round (source: CORRECTNESS_r0N.json committed by the
driver). Append a new round's list after its CORRECTNESS file lands;
`driver_green()` is what the ordering test treats as already-certified.
"""

from __future__ import annotations

DRIVER_CHECKED: dict[str, list[str]] = {
    "r01": [
        "llm_pipeline_mock",
        "s2_file_inventory",
        "f3_human_size",
        "f17_status_route",
        "f12_elapsed",
        "f11_ts_format",
        "w1_renumber",
        "g1_group_hash",
        "g2_usage_fold",
        "q1_pricing_summary",
        "q3_top_revenue",
        "j2_hash_probe",
        "j5_resolution",
        "o3_sort_topk",
        "p_filters",
        "x1_exact_dedup",
        "f16_formats",
        "text_token_stats",
        "events_ewma",
        "events_transitions",
        "sources_fingerprint_setops",
        "events_props_json",
        "chunk_documents_sliding",
        "pack_documents_stream",
        "corpus_to_training_stream",
        "text_quality",
        "text_langid",
        "text_fingerprints",
        "text_tfidf_topk",
        "text_heavy_hitters",
        "dedup_minhash_bands",
        "dedup_minhash_jaccard",
        "dedup_clusters",
        "dedup_simhash",
        "sim_topk_bruteforce",
        "sim_ivf_topk",
        "sim_neardup_pairs",
        "events_tumbling",
        "events_sessionize",
        "f13_json_repair",
        "f14_f15_encoding",
        "f6_f7_filenames",
        "f8_footer",
        "g4_child_counts",
        "o2_newest_listing",
        "x3_artifact_union",
        "p5_p6_path_guards",
        "j3_j4_model_dim_join",
        "q6_revenue_forecast",
        "q4_priority_check",
    ],
    "r02": [
        "g2_usage_fold",
        "events_sessionize",
        "dedup_simhash",
        "llm_pipeline_multimodal",
        "sketch_kmv_setops",
        "cdc_snapshot_diff",
        "multimodal_features",
        "audit_table_profile",
        "p7_sentinel_groups",
        "g2_usage_full_tolerant",
        "sketch_kmv_distinct",
        "sketch_hll_distinct",
        "graph_pagerank_lite",
        "graph_triangles",
        "streaming_dedup_watermark",
        "dedup_containment",
        "dedup_multisignal",
        "dedup_prefix_filter_pairs",
        "dedup_decontaminate",
        "dedup_simhash_pairs",
        "sim_rp_lsh_pairs",
        "sim_ann_recall",
        "corpus_prep_pipeline",
        "fuzzy_match_parts",
        "text_bm25_topk",
        "text_unigram_nll",
        "text_vocab_coverage",
        "text_repetition",
        "text_pii_redaction",
        "events_peak_concurrency",
        "w1_renumber",
        "events_pivot_daily",
        "x3_artifact_union",
        "streaming_static_enrich",
        "f13_json_repair",
        "s2_file_inventory",
        "f17_status_route",
        "f6_f7_filenames",
        "g1_group_hash",
        "j3_j4_model_dim_join",
        "o2_newest_listing",
        "p5_p6_path_guards",
        "p_filters",
        "f12_elapsed",
        "f14_f15_encoding",
        "f16_formats",
        "f3_human_size",
        "f8_footer",
        "j5_resolution",
        "llm_pipeline_mock",
    ],
    "r03": [
        "dedup_simhash",
        "dedup_simhash_pairs",
        "dedup_clusters",
        "dedup_minhash_jaccard",
        "dedup_prefix_filter_pairs",
        "sketch_cms_heavy_hitters",
        "dedup_incremental_candidates",
        "dedup_apply_survivors",
        "sim_neardup_multiprobe",
        "sim_multiprobe_recall",
        "multimodal_frame_sample",
        "sketch_bloom_decontaminate",
        "cdc_incremental_rollup",
        "dedup_report",
        "audit_distribution_drift",
        "sample_train_val_test_split",
        "sim_neardup_bucketed",
        "q5_local_supplier_volume",
        "q7_volume_shipping",
        "q8_market_share",
        "q2_min_cost_supplier",
        "events_anomaly_zscore",
        "topk_suppliers_per_nation",
        "cube_docs_source_lang",
        "events_funnel",
        "kmeans_lite_clusters",
        "events_sliding",
        "x1_dedup_keep_first",
        "asof_trade_quote",
        "w_rank_lag_orders",
        "g_distinct_users_salted",
        "range_join_nearby_clicks",
        "rollup_time_hierarchy",
        "stats_binned_quantiles",
        "streaming_interval_join",
        "stats_length_histogram",
        "stats_exact_median",
        "sample_stratified",
        "emb_quantize_int8",
        "scd2_user_state",
        "streaming_session_windows",
        "q13_customer_distribution",
        "q15_top_supplier",
        "q10_returned_items",
        "q14_promo_revenue",
        "q19_or_range_predicates",
        "q9_profit_by_nation_year",
        "q11_important_parts",
        "events_retention_cohorts",
        "streaming_tumbling_availablenow",
    ],
}


# Window slots deliberately spent on RE-checks of already-green queries
# (instead of never-checked ones) must be named here with a reason —
# tests/test_registry_order.py lets never-checked queries wait outside
# the window ONLY if every window slot is either never-checked or one
# of these. r04: the four dedup queries rewritten after their last
# driver row (_paired_shsets verify repartition — ADVICE r03 asked for
# containment/multisignal fresh rows — and the staged kill-list /
# iteration-bound rewrites of clusters/apply_survivors).
DELIBERATE_RECHECKS: set[str] = {
    "dedup_containment",
    "dedup_multisignal",
    "dedup_clusters",
    "dedup_apply_survivors",
}


def driver_green() -> set[str]:
    """Union of all queries ever green-checked by the driver gate."""
    out: set[str] = set()
    for names in DRIVER_CHECKED.values():
        out |= set(names)
    return out
