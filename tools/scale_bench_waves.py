"""Cold-cache scale table for the round-5 wave-8-15 operator
families (VERDICT r5 ask #2): sf0.1 / sf1 / sf5 with matched calib.

Discipline (NOTES round-4/5 lessons): `spark.catalog.clearCache()`
before every timed run (operators that return cached tables otherwise
time ~0 on repeats), min-of-2 cold runs per (query, sf), calib_sec
sampled once at start on an otherwise idle box.

Usage:
  python tools/make_sfN.py --factor 10 --out /tmp/sparkgraft_sf1
  python tools/make_sfN.py --factor 50 --out /tmp/sparkgraft_sf5
  python tools/scale_bench_waves.py [query ...]
"""

from __future__ import annotations

import json
import sys
import time

QUERIES_TO_SCALE = [
    "hits_supplier_graph",
    "ppr_supplier_graph",
    "bellman_ford_parts",
    "coverage_select_docs",
    "hll_distinct_orders",
    "ams_f2_tokens",
    "mann_kendall_user_values",
    "theil_sen_spend_trend",
    "cramers_v_priority_status",
    "kmeans_lloyd_portable",
    "decision_stump_totalprice",
    "sorted_neighborhood_matches",
    "image_dhash_near_dups",
    "scene_cuts_rawvideo",
    "audio_fp_match_clip",
    # round-6 families (NOTES round-6 scale tables)
    "iblt_set_reconcile",
    "ktruss_parts_graph",
    "gsp_event_sequences",
    "mst_parts_forest",
    "dbscan_customer_sites",
    "jaro_winkler_part_names",
    "als_rank1_factors",
    "single_linkage_parts",
    "ransac_line_custkeys",
    "markov_attribution_events",
    "jenks_breaks_totalprice",
    "textrank_keywords_docs",
    "dtw_user_value_series",
    "holt_linear_revenue",
    "ring_shard_moves",
    "allen_relations_sessions",
    # round-7 families
    "densest_subgraph_parts",
    "conformal_interval_orders",
    "smith_waterman_events",
    "bradley_terry_events",
    "holt_winters_revenue",
    "apriori_triples_brands",
    "fs_em_customers",
    "blocklist_phrase_match_docs",
    "rbo_rankings_brands",
    "quantile_normalize_doclen",
    "cms_join_size_estimate",
    "walk_forward_splits_orders",
    "k_anonymity_audit_customers",
    "mann_whitney_priority_nations",
    "concentration_supplier_nations",
    "shapley_attribution_events",
    # round-8 wave-1 families
    "pmi_collocations_docs",
    "fd_discovery_customer",
    "logrank_orders",
    "did_priority_revenue",
    "seasonal_decompose_revenue",
    "markov_next_event_hitrate",
    # round-8 wave-2 families
    "ips_policy_value_events",
    "ratio_to_parent_revenue",
    "rfm_segments_customers",
    "xyz_volatility_brands",
    "rolling_corr_revenue_qty",
    "seasonal_outliers_revenue",
    # round-8 wave-3 families
    "window_funnel_events",
    "weighted_median_price_brand",
    "croston_intermittent_parts",
    "cumulative_gains_priority",
    # round-9 families
    "ks_test_status_priority",
    "mode_priority_by_status",
    "ohlc_monthly_orders",
    "cumulative_adopters_by_type",
    "good_turing_docs",
    "key_discovery_customer",
    "max_spend_drawdown_customers",
    "view_purchase_within_hour",
    "soundex_blocking_parts",
    "kruskal_wallis_status_priority",
    "l_moments_price_flag",
    "time_to_convert_median",
    "lis_order_values_customers",
    "quadratic_trend_nations",
    "wilson_return_rate_brands",
    "diameter_two_sweep_parts",
    "cuped_adjusted_lift_events",
    "asof_nearest_error_click",
    # round-9 waves 9-10
    "jonckheere_u_status_priority",
    "spearman_qty_price_brands",
    "rsi_monthly_revenue",
    "copeland_brand_duels",
    "gini_stump_qty_returns",
    "mcnemar_repeat_purchase",
    # round-9 waves 11-13
    "hl_pseudomedian_revenue",
    "cvm_urgency_status",
    "morans_i_balance_grid",
    "friedman_nation_priority",
    "matrix_profile_discord_revenue",
    "mantel_haenszel_qty_returns",
    "cochran_q_event_types",
    "peaks_monthly_revenue",
    # round-9 wave 14
    "kmv_source_overlap",
    # round-9 waves 15-16
    "mood_dispersion_urgency",
    "ljung_box_revenue",
    "bowker_symmetry_events",
    "rich_club_parts",
    "runs_test_revenue_deltas",
    "turning_points_revenue",
    # round-9 wave 17
    "grubbs_outlier_month",
    "chao1_vocab_richness",
    "rescaled_range_revenue",
    # round-9 wave 18
    "neyman_allocation_nations",
    "required_sample_size_brands",
    # round-9 wave 19
    "kendall_tau_qty_price_brands",
    # round-9 wave 20
    "semantic_decontaminate_embeddings",
    "yules_k_sources",
    "ess_length_weights_sources",
    # round-9 wave 21
    "life_table_orders",
    # round-9 wave 22
    "partial_corr_rev_qty_disc",
    "lead_lag_ccf_rev_qty",
    "moods_median_status",
    # round-9 wave 23
    "dp_geometric_counts_nations",
    "randomized_response_returns",
    # round-9 wave 24
    "kmeans_validity_embeddings",
    # round-9 wave 25
    "haar_energy_revenue",
    # round-8 waves 4-6
    "dau_mau_stickiness_events",
    "zorder_locality_customers",
    "zipf_ratio_tokens",
    "trimmed_mean_price_brand",
    "topk_with_ties_quantity",
    "ri_audit_star_schema",
    # round-11 waves 1-7
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
    "cr4_brand_concentration",
    "dice_overlap_source_vocab",
    "theil_u2_monthly_revenue",
    "smape_wape_naive_monthly",
    "cox_stuart_trend_revenue",
    "tracking_signal_naive_monthly",
    "western_electric_revenue",
    "c_chart_monthly_returns",
    "scotts_pi_orders",
    "gwets_ac1_orders",
    "mcc_discount_returns",
    "precision_at_k_value",
    "lins_ccc_order_qty_value",
    "odds_ratio_discount_returns",
    "srm_check_events",
    "jackknife_nation_mean",
    "geary_c_balance_grid",
    "trade_reciprocity_nations",
    "page_hinkley_revenue",
    "poisson_rate_halves_errors",
    "hapax_ttr_sources",
    "term_fano_burstiness_docs",
    "bigram_novelty_halves",
    "cube_status_priority_revenue",
    "p90_doclen_sources",
    "u_shape_attribution_events",
    "spend_gini_customers",
    "two_proportion_z_returns",
    "brand_hhi_by_nation",
    "user_churn_daily",
    "new_vs_returning_monthly",
    "segment_beta_monthly",
    # round-11 wave 8
    "rmst_orders",
    "kendall_tau_c_qty_priority",
    "assoc_suite_status_priority",
    "stuart_maxwell_first_last_priority",
    "cochran_c_hartley_nations",
    "median_ci_status",
    # round-11 wave 9
    "wilcoxon_signed_rank_monthly",
    "ma_crossover_monthly",
    "pareto_8020_customers",
    "dayk_retention_events",
    "yules_q_word_cooccurrence",
    "paired_cosine_embeddings",
    # round-11 wave 10
    "bounce_rate_sessions",
    "basket_size_histogram",
    "ship_delay_percentiles_priority",
    "repeat_interval_median_days",
    "dow_revenue_mix",
    "hourly_event_profile",
    # round-11 wave 11
    "round_number_bias_orders",
    "split_half_reliability_nations",
    "seasonal_index_monthly",
    "label_centroid_separation_embeddings",
    "top_customer_share_nations",
    "daily_error_autocorr_events",
    # round-11 wave 12
    "discount_roi_brands",
    "loyalty_tier_mix",
    "dup_rate_sources",
    "interarrival_median_by_type",
    "run_rate_vs_trailing",
    "token_length_stats_sources",
    # round-12 wave 1
    "price_indices_yearly",
    "bullwhip_ratio_monthly",
    "hoover_index_nations",
    "abc_xyz_matrix",
    "share_of_parent_regions",
    "aging_buckets_open_orders",
    "demand_classes_brands",
    "single_source_parts",
    # round-12 wave 2
    "gk_tau_status_priority",
    "littles_law_sessions",
    "next_event_gini",
    "clark_evans_grid",
    "ari_label_buckets_embeddings",
    "quartile_dispersion_brands",
    "lorenz_asymmetry_customers",
    "customer_migration_matrix",
]

SF_DIRS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/tmp/sparkgraft_sf1"),
    ("sf5", "/tmp/sparkgraft_sf5"),
]

# Extra scale points (r11 verdict ask #2: prove the story past sf5):
# SPARK_GRAFT_EXTRA_SF="sf10=/tmp/sparkgraft_sf10,sf25=..." appends
# labeled dirs; SPARK_GRAFT_ONLY_SF="sf1,sf10" restricts the sweep to
# the named labels (heavy-family growth curves don't need sf0.1).
import os as _os

for _pair in filter(None, _os.environ.get("SPARK_GRAFT_EXTRA_SF", "").split(",")):
    _lbl, _dir = _pair.split("=", 1)
    SF_DIRS.append((_lbl, _dir))
_only = _os.environ.get("SPARK_GRAFT_ONLY_SF")
if _only:
    _keep = set(_only.split(","))
    SF_DIRS = [p for p in SF_DIRS if p[0] in _keep]

# Queries whose EMPTY output is a valid answer at some SF (ADVICE r7):
# the zero-row gate skips these by name instead of forcing a nonzero
# exit on legitimately-empty results. Keep this list justified — an
# entry needs a one-line reason.
ALLOW_EMPTY: dict[str, str] = {
    # r12 sf10 sweep finding, measured: the support>=2 co-purchase
    # part graph is a DATA property of the generator — sf0.01 has
    # 3638 support-2 edges and 1295 degree>=3 nodes (3-core: 1065
    # members, oracle-checked), but sf0.1 has only 3853 edges over
    # 6155 nodes with just 220 degree>=3 nodes pre-peel, and its
    # 3-core peels to EMPTY. Every sf>=1 dataset is FK-consistent
    # replication of sf0.1 (disjoint copies), so emptiness persists
    # by construction. The queries still execute their full peel /
    # wedge volume (kcore 21 s, link_prediction 33 s at sf10) — the
    # sweep measures the work; the sf0.01 oracle checks the values.
    "kcore_membership": "3-core of the sf0.1-derived support-2 graph is legitimately empty (220 deg>=3 nodes pre-peel; sf0.01 oracle keeps 1065 rows checked)",
    "link_prediction_parts": "distance-2 pairs with >=2 common neighbors on the same sparse sf0.1-derived graph are legitimately absent (sf0.01 oracle keeps non-trivial rows)",
}


def compute_flags(queries: dict[str, dict]) -> dict[str, str]:
    """Row-count assertion (round-7 verdict ask #4, generalizing the
    IBLT lesson from a habit into a gate): a scale entry whose output
    is EMPTY, or whose row count COLLAPSES as data grows (smaller at a
    larger SF than at sf0.1, beyond fixed-size outputs), is how silent
    decode/threshold failures hide behind green-looking seconds.

    Collapse rule (ADVICE r7 tightening): a big baseline (> 10 rows)
    flags on halving; a SMALL fixed-size baseline (<= 10 rows — model
    tables, top-k heads) flags on ANY shrink, since e.g. 5 -> 2 rows
    without hitting zero is the same silent-threshold class. Queries
    named in ALLOW_EMPTY are exempt from the zero-row rule only."""
    flags: dict[str, str] = {}
    for name, row in queries.items():
        counts = {
            lbl: cell["rows"]
            for lbl, cell in row.items()
            if isinstance(cell, dict) and "rows" in cell
        }
        if not counts:
            continue
        if any(c == 0 for c in counts.values()):
            if name not in ALLOW_EMPTY:
                flags[name] = f"empty output: {counts}"
            continue
        base = counts.get("sf0.1")
        if base:
            for lbl, c in counts.items():
                if lbl == "sf0.1":
                    continue
                if (base > 10 and c < base // 2) or (base <= 10 and c < base):
                    flags[name] = f"row-count collapse at {lbl}: {counts}"
    return flags


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from dpe_energy_performance_analysis_etl_spark import get_spark
    from dpe_energy_performance_analysis_etl_spark.plans import QUERIES

    only = sys.argv[1:]
    names = only or QUERIES_TO_SCALE
    spark = get_spark("scale_bench")
    spark.range(100_000_000).selectExpr("sum(id * 2 + 1)").collect()  # warm
    t0 = time.perf_counter()
    spark.range(100_000_000).selectExpr("sum(id * 2 + 1)").collect()
    calib = round(time.perf_counter() - t0, 3)

    out: dict = {"calib_sec": calib, "queries": {}}
    for name in names:
        row = {}
        for sf_label, sf_dir in SF_DIRS:
            times = []
            rows = None
            try:
                for _ in range(2):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    rows = QUERIES[name](spark, sf_dir).count()
                    times.append(time.perf_counter() - t0)
                row[sf_label] = {"sec": round(min(times), 2), "rows": rows}
            except Exception as exc:
                row[sf_label] = {"err": str(exc)[:200]}
        out["queries"][name] = row
        print(json.dumps({name: row}), flush=True)

    flags = compute_flags(out["queries"])
    if flags:
        out["flags"] = flags
        for name, why in flags.items():
            print(f"SCALE FLAG {name}: {why}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
