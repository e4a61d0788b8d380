"""Unpartitioned-window-site audit (VERDICT r10 ask #1 — the class
rule, the window-shaped sibling of tools/broadcast_audit.py).

Any window spec with no PARTITION BY moves its ENTIRE input into one
task. That is benign only when the input is BOUNDED BY CONSTRUCTION —
a month/calendar-grain series, a fixed bin/bucket/grid table, a
domain-bounded aggregate (nations, priorities, event types), a
post-``limit(k)`` head, a per-shuffle-partition offsets table, or a
support-floored tail. It is a guaranteed scale-killer when the input
GROWS WITH THE DATA: full corpora, vocabularies, distinct-key
histograms, matched-document sets. Rounds 10 and 11 each found
surviving instances of this class (bm25/rrf/jm top-k, vocab id
assignment and coverage, BPE pair ranking — then the r11 sweep added
kmv_build, encode_dictionary, abc_classification, gini_concentration,
zorder_key, pareto_front_2d, ungrouped weighted_sample_topk), every
one of which passed the old COUNT-based gate because "small at
sf0.01" cannot distinguish bounded-by-construction from
small-because-the-test-is-small. This audit makes the class unable to
reappear silently.

Mechanism: extract every unpartitioned window-spec construction —
``Window.orderBy(...)``, ``Window.rowsBetween(...)``,
``Window.rangeBetween(...)``, and the empty ``Window.partitionBy()``
— keyed by ``(file, enclosing function)``, and require each key to
appear in ``ALLOWED`` with a one-line justification of WHY the
window's input is bounded by construction. A site in a function not
listed here fails the audit: the author must classify the new window
explicitly. Removing a window never fails. The scale-safe spellings
to reach for instead: ``operators/quantiles.take_ordered_ranked``
(global top-k: TakeOrderedAndProject + rank over the k-row head),
``global_rank_column`` / ``global_rank_and_prefix`` (exact global
rank / running total via range partition + bounded offset table).

Justification vocabulary: "series" = calendar/period grain (months,
days — bounded by the calendar, not the data volume); "bins" = fixed
bucket/bin/grid count from a constructor constant; "domain" = bounded
value domain (nation=25, priorities=5, event types, integer quantity
1..50); "partitions" = one row per shuffle partition (offset tables);
"post-limit" = runs over an orderBy().limit(k) head (k rows by
construction); "floored" = support/min_count-floored Zipf tail;
"sketch" = fixed sketch cells (d x w, k-min); "tiers" = per-distinct-
time aggregate at a caller-contracted bounded grain.

Run: python tools/window_audit.py        (exit 1 on violations)
Test: tests/test_window_audit.py runs it in-process.
"""

from __future__ import annotations

import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "dpe_energy_performance_analysis_etl_spark")

# Matches the construction of an unpartitioned window spec. A spec
# beginning with partitionBy(<args>) is partitioned (not matched); an
# EMPTY partitionBy() is unpartitioned (matched).
_SITE = re.compile(
    r"Window\.(?:orderBy|rowsBetween|rangeBetween)\(|Window\.partitionBy\(\)"
)

# (relative file, enclosing function) -> why the window input is
# bounded by construction.
ALLOWED: dict[tuple[str, str], str] = {
    # --- operators ---
    ("operators/aggregate.py", "ratio_to_parent"): "domain: parent-group aggregate",
    ("operators/ml.py", "decision_stump_binned"): "bins: fixed n_bins bucket table",
    ("operators/ml.py", "isotonic_fit_minimax"): "bins: fixed bucket table",
    ("operators/quality.py", "partition_skew_report"): "partitions: one row per partition",
    ("operators/quality.py", "calibration_report"): "bins: fixed probability bins",
    ("operators/quantiles.py", "cumulative_gains"): "partitions: offset table (recipe)",
    ("operators/quantiles.py", "equi_depth_bins"): "partitions: offset table (recipe)",
    ("operators/quantiles.py", "global_prefix_max"): "partitions: offset table (the scale-safe recipe itself)",
    ("operators/quantiles.py", "global_rank_and_prefix"): "partitions: offset table (the scale-safe recipe itself)",
    ("operators/quantiles.py", "global_rank_column"): "partitions: offset table (the scale-safe recipe itself)",
    ("operators/quantiles.py", "histogram_quantiles"): "bins: n_buckets table",
    ("operators/quantiles.py", "jenks_breaks_binned"): "bins: n_buckets table",
    ("operators/quantiles.py", "quantile_normalize"): "partitions: offset table (recipe)",
    ("operators/quantiles.py", "take_ordered_ranked"): "post-limit: k-row head (the scale-safe recipe itself)",
    ("operators/relational.py", "pareto_front_2d"): "partitions: offset table (prefix-max recipe)",
    ("operators/sketch.py", "ams_f2"): "sketch: d x w fixed cells",
    ("operators/spatial.py", "getis_ord_gi_grid"): "bins: bounded grid cells",
    ("operators/stats.py", "kaplan_meier"): "tiers: per-event-time aggregate, caller-bounded time grain",
    ("operators/stats.py", "lag_autocorrelation"): "series: caller-bounded period grain",
    ("operators/stats.py", "life_table_actuarial"): "tiers: per-age aggregate, bounded age grain",
    ("operators/stats.py", "logrank_test"): "tiers: per-event-time aggregate, caller-bounded time grain",
    ("operators/stats.py", "nelson_aalen"): "tiers: per-event-time aggregate, caller-bounded time grain",
    ("operators/temporal.py", "cusum_changepoint"): "series: period grain",
    ("operators/temporal.py", "holt_winters_fitted"): "series: period grain",
    ("operators/temporal.py", "rolling_corr"): "series: period grain",
    ("operators/temporal.py", "seasonal_decompose"): "series: period grain",
    ("operators/temporal.py", "sliding_distinct_from_user_days"): "series: calendar-day grain",
    # --- similarity / text ---
    ("similarity/ivf.py", "train_ivf_centroids"): "post-limit: k seed rows",
    ("text/analysis.py", "vocab_growth"): "bins: fixed n_buckets growth curve",
    ("text/mixing.py", "negative_sampling_table"): "post-limit: k-row head",
    ("text/mixing.py", "target_mixture_weights"): "domain: per-source size table",
    ("text/mixing.py", "unimax_budget_allocation"): "domain: per-source group table",
    ("text/packing.py", "sequence_pack"): "bins: bucket table (two-level prefix scan)",
    ("text/retrieval.py", "pmi_collocations"): "floored: min_count-floored pair table",
    # --- query registry (plans/families/* under the stable identity) ---
    ("plans/queries.py", "blomqvist_beta_rev_qty_q"): "series: month grain",
    ("plans/queries.py", "chow_break_revenue_q"): "series: month grain",
    ("plans/queries.py", "closeness_centrality_landmarks_q"): "post-limit: TakeOrdered k-row head",
    ("plans/queries.py", "dominant_period_revenue_q"): "series: month grain",
    ("plans/queries.py", "durbin_watson_revenue_q"): "series: month grain",
    ("plans/queries.py", "emd_price_drift_q"): "bins: fixed histogram",
    ("plans/queries.py", "engle_granger_rev_qty_q"): "series: month grain",
    ("plans/queries.py", "gini_stump_qty_returns_q"): "domain: integer quantity bins",
    ("plans/queries.py", "haar_energy_revenue_q"): "series: month grain",
    ("plans/queries.py", "hl_pseudomedian_revenue_q"): "series: month-pair grid",
    ("plans/queries.py", "hl_shift_monthly_q"): "series: month grain",
    ("plans/queries.py", "kpss_level_revenue_q"): "series: month grain",
    ("plans/queries.py", "lead_lag_ccf_rev_qty_q"): "series: month grain",
    ("plans/queries.py", "ljung_box_revenue_q"): "series: month grain",
    ("plans/queries.py", "matrix_profile_discord_revenue_q"): "series: month grain",
    ("plans/queries.py", "month_over_month_revenue_q"): "series: month grain",
    ("plans/queries.py", "neyman_allocation_nations_q"): "domain: nation (25)",
    ("plans/queries.py", "pacf_lag2_revenue_q"): "series: month grain",
    ("plans/queries.py", "peaks_monthly_revenue_q"): "series: month grain",
    ("plans/queries.py", "percent_of_total_window_q"): "domain: priority x cohort aggregate (5 x 10)",
    ("plans/queries.py", "quade_test_nations_q"): "domain: nation (25)",
    ("plans/queries.py", "rescaled_range_revenue_q"): "series: month grain",
    ("plans/queries.py", "rolling_median_revenue_q"): "series: month grain",
    ("plans/queries.py", "rsi_monthly_revenue_q"): "series: month grain",
    ("plans/queries.py", "runs_test_revenue_deltas_q"): "series: month grain",
    ("plans/queries.py", "smith_waterman_events_q"): "domain: event-type dense-rank dim",
    ("plans/queries.py", "turning_points_revenue_q"): "series: month grain",
    ("plans/queries.py", "var_es_monthly_revenue_q"): "series: month grain",
    ("plans/queries.py", "variance_ratio_revenue_q"): "series: month grain",
    ("plans/queries.py", "youden_j_threshold_q"): "domain: integer quantity thresholds",
    ("plans/queries.py", "zipf_ratio_tokens_q"): "post-limit: 128-row head",
    # --- round-11 additions ---
    ("plans/queries.py", "cliffs_delta_returns_qty_q"): "domain: integer quantity grid (<= 50 rows)",
    ("plans/queries.py", "theil_u2_monthly_revenue_q"): "series: month grain",
    ("plans/queries.py", "smape_wape_naive_monthly_q"): "series: month grain",
    ("plans/queries.py", "cox_stuart_trend_revenue_q"): "series: month grain",
    ("plans/queries.py", "tracking_signal_naive_monthly_q"): "series: month grain",
    ("plans/queries.py", "western_electric_revenue_q"): "series: month grain",
    ("plans/queries.py", "page_hinkley_revenue_q"): "series: month grain",
    ("plans/queries.py", "poisson_rate_halves_errors_q"): "series: calendar-day grain",
    ("plans/queries.py", "rmst_orders_q"): "tiers: month-grain event table",
    ("plans/queries.py", "wilcoxon_signed_rank_monthly_q"): "series: month grain (ranks over <= 80 diffs)",
    ("plans/queries.py", "ma_crossover_monthly_q"): "series: month grain",
    ("plans/queries.py", "daily_error_autocorr_events_q"): "series: calendar-day grain",
    ("plans/queries.py", "run_rate_vs_trailing_q"): "series: month grain",
    # --- round-12 additions ---
    ("plans/queries.py", "abc_xyz_matrix_q"): "domain: cum/total windows over the 25-brand aggregate",
    ("plans/queries.py", "share_of_parent_regions_q"): "domain: grand-total window over the 25-row (region, nation) aggregate",
}


def scan() -> list[tuple[str, str, int, str]]:
    """All (relfile, enclosing_def, lineno, stripped line) sites."""
    sites = []
    for path in sorted(glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True)):
        rel = os.path.relpath(path, PKG)
        # classify under the stable logical identity (same rule as
        # broadcast_audit): the registry is chunked into families
        if rel.startswith(os.path.join("plans", "families") + os.sep):
            rel = os.path.join("plans", "queries.py")
        curdef = "<module>"
        with open(path) as fh:
            for i, ln in enumerate(fh, 1):
                m = re.match(r"\s*def (\w+)", ln)
                if m:
                    curdef = m.group(1)
                if _SITE.search(ln) and not ln.lstrip().startswith("#"):
                    sites.append((rel, curdef, i, ln.strip()))
    return sites


def violations() -> list[str]:
    out = []
    for rel, fn, line, txt in scan():
        if (rel, fn) not in ALLOWED:
            out.append(
                f"{rel}:{line} [{fn}] unclassified unpartitioned-window site: {txt[:90]}\n"
                "  -> either rewrite with take_ordered_ranked /"
                " global_rank_column / global_rank_and_prefix"
                " (operators/quantiles.py), or classify it in"
                " tools/window_audit.py ALLOWED with a justification of"
                " why the window input is BOUNDED BY CONSTRUCTION"
                " (never a table that grows with the data)."
            )
    return out


def stale_entries() -> list[str]:
    """ALLOWED keys with no surviving site — prune so the map stays
    an honest inventory, not a graveyard of exemptions."""
    live = {(rel, fn) for rel, fn, _, _ in scan()}
    return [f"{rel} :: {fn}" for (rel, fn) in ALLOWED if (rel, fn) not in live]


def main() -> int:
    sites = scan()
    bad = violations()
    stale = stale_entries()
    print(f"{len(sites)} unpartitioned-window sites; {len(bad)} unclassified; {len(stale)} stale ALLOWED entries")
    for b in bad:
        print(b)
    for s in stale:
        print(f"stale ALLOWED entry (no surviving site): {s}")
    return 1 if bad or stale else 0


if __name__ == "__main__":
    sys.exit(main())
