"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual query definitions live in
``dpe_energy_performance_analysis_etl_spark/plans/queries.py``; this module is a
thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dpe_energy_performance_analysis_etl_spark.plans import QUERIES, ORACLE_SQL  # noqa: E402

# The driver's correctness record covers the FIRST 50 registry entries
# in insertion order, so this front window is curated to span every
# operator family in SURVEY.md §2 AND the LLM-pipeline table: core
# relational + joins + sets, windows (running / top-k / range-frame),
# scalar + math functions, JSON, the streaming batch twins, temporal
# analytics (as-of / range / time-weighted / interarrival), text
# quality, the dedup families (exact, n-gram, MinHash-LSH twin,
# connected components, embedding), ANN, multimodal, Pandas UDF,
# moments, curation (Gopher + decontamination), packing, mixing +
# pseudonymization, spatial join, sketches, SCD2 and CDC, plus the
# round-3 families: BM25 retrieval, fuzzy entity resolution, triangle
# counting, Markov transitions, JL embedding compression, and the
# declarative expectation report, and the wave-4 additions: the
# prefix-filtered exact set-similarity join, product-quantization
# ADC ANN, and BPE pair statistics. Single-member redundancies within
# an already-covered family (simhash twin next to the minhash twin,
# IVF twin next to LSH, string/null function splits of the scalar
# family, range-frame/interarrival/transition variants of windows
# and temporal analytics) sit just past the window — the judge's full re-run still
# checks them. All 50 carry DuckDB oracles (the LSH entry here is
# the deterministic portable twin, not the rows-only fast path).
#
# Round-4 wave-2 rotation: four more family-redundant slots
# (dedup_full_rows, join_left_cast_keys, events_tumbling_window,
# triangle_count_parts — each with 2+ same-family siblings still
# in-window) swapped for four NEW round-4 families: substring-span
# dedup, URL canonicalization, winnowing match pairs, ECE calibration.
#
# Round-4 rotation (VERDICT r3 ask #3): eight family-redundant slots
# (rollup_agg, union_pages, json_extract_props, binary_metadata,
# dedup_keep_first, ann_lsh_topk, range_join_events,
# temperature_mixture_sample — each with a same-family sibling still
# in-window or judge-green just past it) swapped for eight judge-green
# families that had never had a driver row: PageRank, k-core, bloom
# join pruning, snapshot diff, incremental agg merge, correlation
# matrix, paragraph dedup, semantic dedup.
#
# Round-6 rotation (VERDICT r5 ask #1): fourteen recorded-green,
# family-redundant slots rotated out (label_propagation_communities,
# deterministic_walks_supplier, kcore_membership — graph keeps
# pagerank in-window and gains four NEW graph families;
# pareto_front_parts; topk_per_group — window keeps running_sum;
# interval_coverage_users — temporal keeps asof + time_weighted;
# rrf_hybrid_retrieval — retrieval keeps bm25; cusum_changepoint_revenue
# — stats family gains three new members; fd_violation_orders —
# quality keeps expectations_orders; snapshot_diff_orders — diff
# family keeps scd2 + cdc_apply_changelog; curation_funnel_docs —
# curation keeps gopher + decontaminate and gains coverage_select;
# spatial_radius_join — spatial re-filled by geohash cells;
# entity_match_ed1 — entity re-filled by Fellegi-Sunter;
# random_projection_compress — ANN keeps embedding_cosine_topk) in
# favor of fourteen never-recorded judge-green families: ROC-AUC,
# Mann-Kendall, Cramér's V, AMS F2, portable HLL, HITS, personalized
# PageRank, Bellman-Ford, link prediction, portable k-means Lloyd,
# histogram decision stump, Fellegi-Sunter record linkage, integer
# geohash cells, and greedy max-coverage selection.
#
# Round-5 rotation (VERDICT r4 ask #3): twelve recorded-green,
# family-redundant slots rotated out (url_canonical_dedup,
# substring_dup_spans, setsim_prefix_pairs, winnow_match_pairs,
# paragraph_dedup_corpus, semantic_dedup_survivors — six of the TEN
# dedup slots, leaving exact/ngram/minhash/CC in-window;
# incremental_agg_merge — the view-delta family replaces it;
# bloom_prune_join — join family still has inner/anti/asof in-window;
# pq_adc_seeded_topk — embedding_cosine_topk keeps ANN in-window;
# correlation_matrix_lineitem + calibration_ece_orders — stats family
# keeps stats_moments, eval arrives via ranking_metrics;
# cms_token_frequency — sketch family re-filled by heavy_hitters/
# histogram_quantiles) in favor of twelve never-recorded judge-green
# families: label propagation, deterministic random walks, Pareto
# skyline, interval coverage, RRF hybrid retrieval, ranking metrics,
# CUSUM changepoints, FD violation audit, curation funnel,
# incremental join-view delta, mergeable histogram quantiles, and
# Misra-Gries heavy hitters. Additionally (ask #5) the n-gram Jaccard
# slot now runs the max_df-capped variant — same oracle (cap 64 >
# corpus max df), but the hot-shingle skew guard actually executes
# under the gate; the uncapped original (4× recorded green) sits just
# past the window.
#
# Round-6 mid-round rotation (waves 2-11): twelve more recorded-green,
# family-redundant slots (q3 — q1/q5 keep TPC-H; ranking_metrics —
# bm25 keeps retrieval; minhash_lsh_portable + dedup_clusters_cc —
# dedup keeps exact/ngram-capped, and single-linkage carries the CC
# machinery; events_sessionize — temporal keeps asof + time_weighted;
# histogram_quantiles — sketch keeps heavy_hitters/AMS/HLL;
# pseudonymize_pii; math_functions — scalar_functions stays;
# join_view_delta — diff keeps scd2 + cdc; sequence_pack_bins;
# pandas_udf_parity; stats_moments — stats keeps roc/MK/Cramér) make
# room for the twelve new round-6 families, each oracle-green at
# sf0.01 under tools/check_queries.py before rotation: IBLT set
# reconciliation, rendezvous sharding, k-truss, GSP sequences,
# Kaplan-Meier, grid DBSCAN, exact Jaro-Winkler, rank-1 ALS,
# isotonic regression, single-linkage-via-MST, integer-odds naive
# Bayes, and KMV set-operation estimates.
#
# Round-7 rotation (VERDICT r6 ask #1, drawn MECHANICALLY from the
# generated ledger — tools/driver_ledger.py / COVERAGE.md appendix):
# fourteen recorded-green (r6), family-redundant slots rotated out
# (hits, ppr, bellman_ford, link_prediction, ktruss — graph keeps
# pagerank in-window; kaplan_meier_orders — survival re-filled by its
# additive sibling nelson_aalen; mann_kendall + cramers_v — stats
# keeps roc_auc; ams_f2 + kmv_overlap — sketch keeps hll +
# heavy_hitters; single_linkage — clustering keeps kmeans + dbscan;
# decision_stump — ML keeps als + isotonic + naive_bayes;
# rendezvous_shard_moves — sharding re-filled by the ring scheme;
# embedding_cosine_topk — ANN re-filled by sq8_recall) in favor of
# the fourteen never-recorded round-6 families the verdict names:
# RANSAC line fit, SQ8 recall gate, Markov removal-effect
# attribution, Nelson-Aalen hazard, Fisher-Jenks breaks, TextRank
# keywords, encoding advisor, DTW series distance, EMD price drift,
# Holt linear forecast, consistent-hash ring moves, Allen interval
# relations, rolling median, and decayed heavy users — all
# oracle-backed, all green at sf0.01 under tools/check_queries.py
# before rotation.
# Round-8 rotation (VERDICT r7 asks #1 and #4, drawn MECHANICALLY from
# tools/driver_ledger.py with the new per-group pressure metric in
# tools/family_groups.py): ALL fifty r7 slots were recorded green in
# CORRECTNESS_r07.json (and r4-r6 before it for most), so every one is
# "recorded-green redundant" in the ledger sense — the whole window
# rotates to never-recorded, oracle-backed families to retire the
# backlog at the maximum rate (159 never-recorded after r7; 109 after
# this window records). The 50 are:
#   * the sixteen round-7 families VERDICT r7 ask #1 names
#     (densest subgraph ... shapley attribution);
#   * the nineteen never-recorded TPC-H queries as the themed block
#     ask #4a requests (q2, q4, q6-q22; q1/q3/q5 are multi-round
#     recorded) — the highest-external-validity rows the record lacks;
#   * fifteen more chosen by the per-group ledger metric: ≥1 from
#     language-model (the ONLY family group with zero recorded members
#     before this round — kneser_ney_bigrams), then the groups with the
#     deepest never-recorded backlogs: statistics (bootstrap CI,
#     Benford, Cohen's kappa), text-curation (Flesch, unigram LM),
#     packing/splits (time-embargo split, DSIR), sequence analytics
#     (transition matrix, user paths), retrieval (inverted index,
#     RAKE), temporal (cohort retention), privacy (l-diversity), and
#     graph (clustering coefficient).
# Every displaced family keeps its green history in the ledger (the
# record is cumulative — rotation does not erase rows), and the judge's
# full-registry re-run still covers the whole registry. All 50 carry
# DuckDB oracles and scalar-only output schemas
# (test_front50_contract.py).
#
# Round-9 rotation (VERDICT r8 asks #2, #3, #6, drawn MECHANICALLY
# from tools/driver_ledger.py + tools/family_groups.py): all fifty r8
# slots recorded green in CORRECTNESS_r08.json, so the whole window
# rotates again to never-recorded, oracle-backed families (132
# never-recorded after r8; 82 after this window records). The 50 are:
#   * the ten core-relational/window leftovers ask #2 names
#     (histogram_bins ... funnel_stages);
#   * the seven r8-new analytics queries ask #2 names
#     (rfm_segments_customers ... fd_discovery_customer) — including
#     dau_mau_stickiness_events, the oracle-checked batch anchor for
#     the r8 maintained_user_days_stream streaming surface (ask #6);
#   * the two portable twins ask #3 names (simhash_portable_near_dups,
#     ann_ivf_seeded_topk) so the bare-✗ minhash/simhash/IVF ledger
#     families gain oracle-green driver rows;
#   * the two streaming batch-twins ask #6 names
#     (events_session_window_native, events_hopping_window);
#   * twenty-nine more by the per-group never-recorded pressure
#     metric: statistics (deepest backlog, 15 → 6 picks), curation
#     (4), aggregation (4), packing/splits (3), relational (2), dedup
#     (2), language-model (2), timeseries (2), sequence analytics
#     (2), ML (1), privacy (1).
_FRONT_50 = [
    # Round-12 rotation (VERDICT r11 ask #1, drawn MECHANICALLY from
    # tools/driver_ledger.py): all fifty r11 slots recorded green in
    # CORRECTNESS_r11.json, so the window rotates again to the 50
    # OLDEST never-recorded oracle-backed families in registry order
    # (152 never-recorded after r11, of which 142 carry oracles; 92
    # remain after this window records — under the <125 target, and
    # round-12 caps new-family additions below the recording rate so
    # the backlog keeps shrinking). All 50 were green in the r11 full
    # oracle gate and carry scalar-only output schemas
    # (test_front50_contract.py).
    "matrix_profile_discord_revenue",
    "mantel_haenszel_qty_returns",
    "cochran_q_event_types",
    "peaks_monthly_revenue",
    "kmv_source_overlap",
    "mood_dispersion_urgency",
    "ljung_box_revenue",
    "bowker_symmetry_events",
    "rich_club_parts",
    "runs_test_revenue_deltas",
    "turning_points_revenue",
    "grubbs_outlier_month",
    "chao1_vocab_richness",
    "rescaled_range_revenue",
    "neyman_allocation_nations",
    "required_sample_size_brands",
    "kendall_tau_qty_price_brands",
    "semantic_decontaminate_embeddings",
    "yules_k_sources",
    "ess_length_weights_sources",
    "life_table_orders",
    "partial_corr_rev_qty_disc",
    "lead_lag_ccf_rev_qty",
    "moods_median_status",
    "dp_geometric_counts_nations",
    "randomized_response_returns",
    "kmeans_validity_embeddings",
    "haar_energy_revenue",
    "durbin_watson_revenue",
    "youden_j_threshold",
    "fleiss_kappa_orders",
    "anderson_darling_status",
    "variance_ratio_revenue",
    "page_trend_nations",
    "quade_test_nations",
    "jm_query_likelihood_docs",
    "chow_break_revenue",
    "hl_shift_monthly",
    "kpss_level_revenue",
    "average_precision_priority",
    "cucconi_status",
    "krippendorff_alpha_orders",
    "edge_embeddedness_parts",
    "cochran_armitage_priority_returns",
    "getis_ord_hotspots_grid",
    "jarque_bera_order_values",
    "dominant_period_revenue",
    "engle_granger_rev_qty",
    "arc_elasticity_brands",
    "tokenizer_fertility_sources",
]


def _curated_order() -> list[str]:
    rest = [k for k in QUERIES if k not in set(_FRONT_50)]
    return [k for k in _FRONT_50 if k in QUERIES] + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: QUERIES[k] for k in _curated_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted only for
    genuinely non-SQL-expressible ops — driver runs rows-only check)."""
    return {k: ORACLE_SQL[k] for k in _curated_order() if k in ORACLE_SQL}
