"""Family-group map for the driver-record ledger (VERDICT r7 ask #4b).

Every registry query is assigned to exactly ONE family group so the
ledger can show never-recorded counts PER GROUP (rotation pressure) and
assert the round-8 done-condition: every family group has >= 1
driver-recorded member. The map is explicit — a completeness check in
``tools/driver_ledger.py`` fails if a new registry query is added
without a group assignment here.

Groups follow COVERAGE.md's sectioning: SURVEY §2 core families first,
then the training-data-pipeline families from the build mandate.
"""

from __future__ import annotations

FAMILY_GROUPS: dict[str, list[str]] = {
    "tpch": [
        "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
        "q4_priority_exists", "q5_regional_revenue", "q6_forecast_revenue",
        "q7_nation_pair_revenue", "q8_market_share", "q9_product_type_profit",
        "q10_returned_revenue", "q11_important_parts", "q12_priority_case_sum",
        "q13_customer_distribution", "q14_promo_ratio", "q15_top_supplier",
        "q16_supplier_part_count", "q17_small_quantity_revenue",
        "q18_large_orders_having", "q19_or_of_ands", "q20_part_suppliers",
        "q21_waiting_suppliers", "q22_balance_subquery",
    ],
    "relational": [
        # round-10 additions
        "multiset_ops_quantity",
        "filter_project", "distinct_values", "dedup_full_rows",
        "dedup_keep_first", "union_pages", "except_set", "intersect_set",
        "unpivot_melt", "unpivot_measures", "posexplode_embeddings",
        "deterministic_sample", "range_lookup_order_tiers",
        "dictionary_encode_priority", "sql_in_subquery", "lateral_topk_orders",
        "zorder_locality_customers",
        "pareto_front_parts",
    ],
    "aggregation": [
        "discount_roi_brands", "loyalty_tier_mix",
        "top_customer_share_nations",
        "basket_size_histogram",
        # round-11 additions
        "cr4_brand_concentration",
        "brand_hhi_by_nation",
        "cube_status_priority_revenue",
        "new_vs_returning_monthly",
        "precision_at_k_value",

        "mode_priority_by_status", "count_distinct_agg", "rollup_agg", "cube_agg", "pivot_agg",
        "grouping_sets_sql", "conditional_agg_functions", "percentile_iqr",
        "histogram_bins", "value_histogram", "column_profile",
        "equi_depth_bins_price", "abc_classification_brands",
        "ratio_to_parent_revenue", "rfm_segments_customers",
        "xyz_volatility_brands",
        # round-12 wave 1
        "abc_xyz_matrix",
        "share_of_parent_regions",
        "aging_buckets_open_orders",
        "single_source_parts",
        "hoover_index_nations",
        "price_indices_yearly",
        "customer_migration_matrix",
    ],
    "join": [
        "join_inner_broadcast", "join_left_cast_keys", "join_anti_new_rows",
        "join_semi_exists", "bloom_prune_join", "salted_join_supplier_revenue",
    ],
    "window": [
        "window_rank_lag", "window_running_sum", "topk_per_group",
        "window_range_frame", "window_analytics_extended",
        "percent_of_total_window", "rolling_median_revenue",
        "topk_with_ties_quantity",
    ],
    "scalar-functions": [
        "scalar_functions", "date_functions", "string_functions",
        "null_conditional_functions", "math_functions", "array_functions",
        "json_extract_props", "json_struct_parse",
    ],
    "temporal": [
        "littles_law_sessions",
        "interarrival_median_by_type",
        "hourly_event_profile", "dow_revenue_mix",
        # round-10 wave 13
        "nrr_monthly_customers",
        "ohlc_monthly_orders", "cumulative_adopters_by_type",
        "events_tumbling_window", "events_sessionize", "events_hopping_window",
        "events_session_window_native", "events_resample_gapfill",
        "asof_join_events", "asof_join_forward_events", "asof_nearest_error_click", "range_join_events",
        "time_weighted_avg", "interarrival_percentiles",
        "interval_coverage_users", "allen_relations_sessions",
        "month_over_month_revenue", "cohort_retention",
        "dau_mau_stickiness_events",
    ],
    "sequence-analytics": [
        "next_event_gini",
        # round-11 additions
        "bounce_rate_sessions",
        "srm_check_events",
        "poisson_rate_halves_errors",
        "user_churn_daily",
        "dayk_retention_events",
        "u_shape_attribution_events",

        "view_purchase_within_hour", "time_to_convert_median", "lis_order_values_customers", "funnel_stages", "user_event_paths", "event_transition_matrix",
        "event_trigram_probs", "attribution_first_last",
        "markov_attribution_events", "shapley_attribution_events",
        "gsp_event_sequences", "low_value_runs", "smith_waterman_events",
        "markov_next_event_hitrate", "window_funnel_events",
    ],
    "text-quality-curation": [
        "token_length_stats_sources",
        # round-11 additions
        "dice_overlap_source_vocab",
        "hapax_ttr_sources",
        "term_fano_burstiness_docs",
        "bigram_novelty_halves",
        "p90_doclen_sources",

        "text_quality", "lang_id", "token_counts", "gopher_repetition",
        "quality_filter_heuristic", "decontaminate_overlap", "c4_line_filter",
        "html_strip_corpus", "flesch_readability_docs", "unigram_lm_quality",
        "hashed_classifier_gate", "curation_funnel_docs",
        "blocklist_phrase_match_docs", "distinct_n_docs", "vocab_growth_docs",
        "compression_ratio_docs", "coverage_select_docs", "text_clean_corpus",
        "chao1_vocab_richness", "yules_k_sources",
        "chunk_documents", "domain_document_stats",
    ],
    "dedup": [
        "dup_rate_sources",
        "doc_fingerprint", "dedup_exact_groups", "ngram_jaccard_pairs",
        "ngram_jaccard_capped", "embedding_near_dup", "minhash_lsh_pairs",
        "minhash_lsh_portable_pairs", "simhash_near_dups",
        "simhash_portable_near_dups", "dedup_clusters_cc",
        "cluster_canonical_survivors", "paragraph_dedup_corpus",
        "semantic_dedup_survivors", "url_canonical_dedup",
        "semantic_decontaminate_embeddings",
        "substring_dup_spans", "substring_dup_stats", "substring_dedup_clean",
        "winnow_fingerprints_docs", "winnow_match_pairs", "cdc_chunk_spans",
        "cdc_chunk_dedup", "bigram_containment_pairs", "setsim_prefix_pairs",
    ],
    "ann-similarity": [
        "label_centroid_separation_embeddings",
        # round-11 additions
        "paired_cosine_embeddings",

        "embedding_cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
        "ann_ivf_seeded_topk", "pq_adc_seeded_topk", "ivfpq_topk_embeddings",
        "sq8_recall_embeddings", "random_projection_compress",
        "hard_negative_mining", "item_item_cosine_sim",
    ],
    "retrieval": [
        # round-10 additions
        "jm_query_likelihood_docs",
        "tfidf_top_terms", "bm25_topk_docs", "inverted_index_postings",
        "phrase_search_docs", "rrf_hybrid_retrieval",
        "ranking_metrics_by_source", "rake_keywords_docs",
        "textrank_keywords_docs", "rbo_rankings_brands",
        "distinctive_terms_source", "source_overlap_matrix",
    ],
    "language-model": [
        "good_turing_docs", "ngram_counts_pruned", "kneser_ney_bigrams", "stupid_backoff_docs", "pmi_collocations_docs", "zipf_ratio_tokens",
        "vocab_coverage_curve", "negative_sampling_words",
        "walk_skipgram_pairs",
    ],
    "tokenizer": [
        # round-10 additions
        "tokenizer_fertility_sources",
        "wordpiece_tokens", "bpe_pair_stats", "bpe_learn_merges",
        "bpe_encode_pieces", "vocab_id_assignment",
    ],
    "packing-mixing-splits": [
        "sequence_pack_bins", "length_bucket_batches", "split_assign_docs",
        "stratified_sample_mix", "temperature_mixture_sample",
        "weighted_sample_docs", "group_sample_reservoir",
        "target_mixture_weights_docs", "fim_transform_docs",
        "preference_pairs_quality", "unimax_lang_budget",
        "time_embargo_split_events", "walk_forward_splits_orders",
        "dsir_importance_scores", "neyman_allocation_nations",
        "ess_length_weights_sources",
    ],
    "privacy": [
        "pseudonymize_pii", "pii_redact", "k_anonymity_customers",
        "k_anonymity_audit_customers", "l_diversity_customers",
        "t_closeness_customers", "dp_geometric_counts_nations",
        "randomized_response_returns",
    ],
    "entity-resolution": [
        "soundex_blocking_parts", "entity_match_ed1", "sorted_neighborhood_matches",
        "jaro_winkler_part_names", "record_linkage_fs", "fs_em_customers",
    ],
    "graph": [
        # round-11 additions
        "trade_reciprocity_nations",

        # round-10 additions
        "edge_embeddedness_parts",
        "closeness_centrality_landmarks",
        "diameter_two_sweep_parts",
        "pagerank_supplier_graph", "ppr_supplier_graph", "hits_supplier_graph",
        "kcore_membership", "ktruss_parts_graph",
        "label_propagation_communities", "landmark_bfs_parts",
        "bellman_ford_parts", "deterministic_walks_supplier",
        "link_prediction_parts", "triangle_count_parts",
        "clustering_coeff_parts", "degree_assortativity_trade",
        "community_modularity_nations", "mst_parts_forest",
        "densest_subgraph_parts", "single_linkage_parts", "rich_club_parts",
        "link_graph_domains", "url_path_rollup_docs",
    ],
    "clustering": [
        "ari_label_buckets_embeddings",
        "kmeans_lloyd_portable", "dbscan_customer_sites",
        "kmeans_validity_embeddings",
    ],
    "sketches": [
        # round-10 additions
        "hll_error_audit_tokens",
        "quantile_sketch_error_audit",
        "approx_distinct", "cms_token_frequency", "cms_join_size_estimate",
        "kmv_distinct_tokens", "kmv_overlap_docs", "hll_distinct_orders",
        "ams_f2_tokens", "heavy_hitters_tokens", "decayed_heavy_users",
        "iblt_set_reconcile", "histogram_quantiles_price",
        "kmv_source_overlap",
    ],
    "sharding": [
        "epoch_shard_assign", "rendezvous_shard_moves", "ring_shard_moves",
    ],
    "statistics": [
        "split_half_reliability_nations", "daily_error_autocorr_events",
        "repeat_interval_median_days", "ship_delay_percentiles_priority",
        # round-11 additions
        "somers_d_qty_returns",
        "gk_gamma_qty_priority",
        "cliffs_delta_returns_qty",
        "kendalls_w_nation_priority",
        "welch_t_returns_value",
        "cohens_d_urgent_value",
        "bhattacharyya_status_halves",
        "hellinger_priority_halves",
        "tv_distance_nation_halves",
        "chisq_homogeneity_priority_halves",
        "scotts_pi_orders",
        "gwets_ac1_orders",
        "mcc_discount_returns",
        "lins_ccc_order_qty_value",
        "odds_ratio_discount_returns",
        "jackknife_nation_mean",
        "two_proportion_z_returns",
        "kendall_tau_c_qty_priority",
        "assoc_suite_status_priority",
        "stuart_maxwell_first_last_priority",
        "cochran_c_hartley_nations",
        "median_ci_status",
        "wilcoxon_signed_rank_monthly",
        "yules_q_word_cooccurrence",
        "spend_gini_customers",
        "pareto_8020_customers",
        # round-12 wave 2
        "gk_tau_status_priority",
        "quartile_dispersion_brands",
        "lorenz_asymmetry_customers",

        # round-10 wave 14
        "anova_f_revenue_nations",
        "brown_forsythe_status",
        "icc1_orders_per_customer",
        # round-10 wave 13
        "blomqvist_beta_rev_qty",
        "gk_lambda_status_priority",
        # round-10 waves 11-12
        "gmd_dispersion_brands",
        "bowley_skewness_status",
        # round-10 additions
        "durbin_watson_revenue",
        "fleiss_kappa_orders",
        "anderson_darling_status",
        "page_trend_nations",
        "quade_test_nations",
        "chow_break_revenue",
        "hl_shift_monthly",
        "cucconi_status",
        "krippendorff_alpha_orders",
        "cochran_armitage_priority_returns",
        "jarque_bera_order_values",
        "brier_decomposition_orders",
        "median_polish_nation_priority",
        "ks_test_status_priority", "kruskal_wallis_status_priority", "wilson_return_rate_brands",
        "l_moments_price_flag", "stats_moments", "correlation_matrix_lineitem",
        "contingency_chi2_cells", "cramers_v_priority_status",
        "roc_auc_by_priority", "calibration_ece_orders", "ab_test_conversion", "cuped_adjusted_lift_events",
        "bootstrap_mean_ci", "mann_kendall_user_values",
        "mann_whitney_priority_nations", "cohens_kappa_raters",
        "benford_digit_audit", "key_skew_gini_partkey",
        "concentration_supplier_nations", "winsorize_acctbal",
        "robust_outliers_mad", "group_linregress_qty_disc",
        "fano_event_bursts", "lag_autocorr_revenue", "simpson_user_events",
        "category_drift_halves", "pass_at_k_customers",
        "quantile_normalize_doclen", "conformal_interval_orders", "did_priority_revenue",
        "weighted_median_price_brand", "cumulative_gains_priority",
        "trimmed_mean_price_brand",
        "grouped_stats_udaf", "pandas_udf_parity",
        # round-9 waves 9-13
        "jonckheere_u_status_priority", "spearman_qty_price_brands",
        "kendall_tau_qty_price_brands",
        "mcnemar_repeat_purchase", "hl_pseudomedian_revenue",
        "cvm_urgency_status", "friedman_nation_priority",
        "mantel_haenszel_qty_returns", "cochran_q_event_types",
        "mood_dispersion_urgency", "bowker_symmetry_events",
        "required_sample_size_brands", "partial_corr_rev_qty_disc",
        "moods_median_status",
    ],
    "ml": [
        # round-10 additions
        "youden_j_threshold",
        "average_precision_priority",
        "arc_elasticity_brands",
        "als_rank1_factors", "isotonic_urgent_rate", "naive_bayes_status_gate",
        "decision_stump_totalprice", "gini_stump_qty_returns", "ransac_line_custkeys",
        "principal_direction_power", "bradley_terry_events",
        "target_encode_loo_acctbal", "feature_hash_customers",
        "theil_sen_spend_trend", "quadratic_trend_nations", "jenks_breaks_totalprice",
        "copeland_brand_duels",
        "basket_cooccurrence_lift", "apriori_triples_brands",
        "ips_policy_value_events",
    ],
    "timeseries-forecast": [
        "run_rate_vs_trailing",
        "seasonal_index_monthly",
        # round-11 additions
        "theil_u2_monthly_revenue",
        "smape_wape_naive_monthly",
        "cox_stuart_trend_revenue",
        "tracking_signal_naive_monthly",
        "western_electric_revenue",
        "c_chart_monthly_returns",
        "page_hinkley_revenue",
        "ma_crossover_monthly",
        "segment_beta_monthly",

        # round-10 waves 11-12
        "var_es_monthly_revenue",
        # round-10 additions
        "variance_ratio_revenue",
        "kpss_level_revenue",
        "dominant_period_revenue",
        "engle_granger_rev_qty",
        "pacf_lag2_revenue",
        "seasonal_strength_revenue",
        "max_spend_drawdown_customers", "holt_linear_revenue", "holt_winters_revenue", "seasonal_naive_mase",
        "cusum_changepoint_revenue", "ewma_user_values",
        "moving_zscore_anomalies", "dtw_user_value_series", "emd_price_drift",
        "seasonal_decompose_revenue", "rolling_corr_revenue_qty", "croston_intermittent_parts",
        "bullwhip_ratio_monthly", "demand_classes_brands",
        "seasonal_outliers_revenue",
        "rsi_monthly_revenue", "matrix_profile_discord_revenue",
        "peaks_monthly_revenue", "ljung_box_revenue",
        "runs_test_revenue_deltas", "turning_points_revenue",
        "grubbs_outlier_month", "rescaled_range_revenue",
        "lead_lag_ccf_rev_qty", "haar_energy_revenue",
    ],
    "survival": [
        # round-11 additions
        "rmst_orders",

        "kaplan_meier_orders", "nelson_aalen_orders", "logrank_orders",
        "life_table_orders",
    ],
    "spatial": [
        "clark_evans_grid",
        # round-11 additions
        "geary_c_balance_grid",

        # round-10 additions
        "getis_ord_hotspots_grid",
        "spatial_radius_join", "geohash_cells_customers",
        "point_in_polygon_tags", "morans_i_balance_grid",
    ],
    "diff-scd-cdc": [
        "scd2_customer_segments", "cdc_apply_changelog",
        "snapshot_diff_orders", "incremental_agg_merge",
        "join_view_delta_orders", "join_view_delta_signed_orders",
    ],
    "quality-gates": [
        "round_number_bias_orders",
        # round-10 waves 11-12
        "p_chart_monthly_returns",
        "process_capability_quantity",
        "benford_second_digit_audit",
        "key_discovery_customer", "expectations_orders", "fd_violation_orders",
        "encoding_advisor_lineitem", "fd_discovery_customer",
        "ri_audit_star_schema",
    ],
    "multimodal": [
        "binary_metadata", "image_dhash_near_dups", "scene_cuts_rawvideo",
        "audio_fp_match_clip", "gif_compression_stats",
    ],
}


def group_of() -> dict[str, str]:
    """Invert FAMILY_GROUPS to query -> group (asserts no duplicates)."""
    out: dict[str, str] = {}
    for grp, names in FAMILY_GROUPS.items():
        for n in names:
            if n in out:
                raise AssertionError(f"{n} assigned to both {out[n]} and {grp}")
            out[n] = grp
    return out
