"""Physical-plan audit over the query registry: join strategies,
exchange counts, pushed filters, codegen spans — the per-round check
that plans stay the ones you'd want at scale.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
Flags suspicious shapes: cartesian products, nested-loop joins on
non-broadcast sides, scans without pushed filters when the query
filters, >8 exchanges.
"""

from __future__ import annotations

import re
import sys


# Multi-stage algorithms whose STATIC plan legitimately exceeds the
# exchange budget: their hot intermediate (posting list / signature
# table / trained centroids) is .cache()'d, so at runtime the repeat
# subtrees read from memory (InMemoryTableScan) instead of re-running
# the printed Exchanges. Audited individually; everything else must
# stay under the budget.
EXPECTED_MULTISTAGE = {
    "ngram_jaccard_pairs": "cached posting list feeds self-join + 2 size joins",
    "minhash_lsh_pairs": "cached signatures feed band-join + verify join",
    "minhash_lsh_portable_pairs": "same pipeline, portable hashes",
    "ann_ivf_topk": "k-means training iterations baked into one lazy plan; centroids cached",
    # The static formatted plan duplicates shared subtrees that the
    # adaptive runtime merges — executedPlan() measured 7-8 exchanges
    # for all three (within budget), vs 9-10 in the static print.
    "tfidf_top_terms": "tf subtree feeds tf and df branches; 7 exchanges at runtime",
    "cms_token_frequency": "sketch + exact-count + probe branches share the token explode; 8 at runtime",
    "temperature_mixture_sample": "rate-table agg + decision branch share the scan; 8 at runtime",
    # round-3 additions (all with cached hot intermediates)
    "pagerank_supplier_graph": "3 fixed iterations; edge/deg/node tables cached (uncached 19.1 s -> 5.2 s at sf1)",
    "semantic_dedup_survivors": "cached cluster assignment feeds both pair sides + final join",
    "dsir_importance_scores": "cached vocab tables feed token join + grand totals",
    "basket_cooccurrence_lift": "cached item set feeds supports, pairs, and basket count",
    "histogram_quantiles_price": "cached <=n_buckets bucket table feeds cum-scan + total",
    "ann_ivf_seeded_topk": "centroid subtree (8-row pushed-filter scan) appears in assign + probe branches; corpus read once per consumer, both broadcast-joined",
    # round-9: the k_of_n ranking recipe pins its ranged table AND its
    # bounded sizes table eagerly (localCheckpoint at build) — the
    # static print still shows the pre-pin subtrees plus the bounded
    # offset/k-table windows; at runtime every consumer reads the two
    # checkpointed leaves and the conv feed executes exactly once.
    "time_to_convert_median": "k_of_n recipe leaves pinned; conv feed runs once; windows are over bounded (day) tables",
    # round-9 wave 9: two grouped_running_totals rank recipes (x and y
    # sides) each pin their ranged table; the lineitem x broadcast(part)
    # feed is consumed 3x BY DESIGN (parquet-scan feeds re-run cheaper
    # than a data-sized pin — the NOTES histprune measurement). Runtime
    # 14 exchanges vs 22 static; 1.9 s warm at sf0.1.
    "spearman_qty_price_brands": "two rank recipes + thrice-consumed cheap scan feed; 14 exchanges / 1.9 s warm at sf0.1",
    # round-9 wave 10: the bounded (b1, b2) duel aggregate is pinned
    # eagerly (≤ k + k(k−1)/2 rows); na/cells/k branches read the
    # checkpoint leaf at runtime — the static print re-expands the
    # basket-explode subtree per consumer. Runtime 7 exchanges.
    "copeland_brand_duels": "pinned bounded duel aggregate feeds na/cells/k branches; 7 exchanges at runtime",
    # round-9 wave 11: the ≤10⁴-row cell table is pinned eagerly (the
    # one customer scan runs once); tot/ctr/nbr/pairs/var are all
    # bounded-table algebra over the checkpoint leaf — exchange count
    # reflects breadth over tiny tables, not fact-table passes.
    # 2.5 s total at sf0.1 incl. the build-time pin.
    "morans_i_balance_grid": "pinned bounded cell grid feeds centering + 3 consumers; all post-pin exchanges are over ≤10k rows",
    # round-9 wave 14: per-source sketches (≤ 64·|sources| rows) and
    # the |sources|-row estimate table are both pinned eagerly; the
    # static print re-expands the distinct+threshold recipe per
    # consumer. Runtime 7 exchanges / 10.2 s at sf0.1 (the data-sized
    # cost is the one token-distinct pass at sketch build).
    # round-9 wave 16: the canonical support-2 edge table and the
    # degree table are both pinned (edge self-join runs once); the
    # static print re-expands the co-occurrence join per consumer.
    # Runtime 7 exchanges / 5.1 s at sf0.1.
    "rich_club_parts": "pinned edge + degree tables feed density probe and threshold counts; 7 exchanges at runtime",
    # round-9 wave 17: the pinned ≤|months| index table feeds the
    # three block-size layouts (one unionAll branch each); every
    # post-pin exchange shuffles ≤84 rows — breadth over a bounded
    # table, not fact-table passes (one orders scan at build).
    "rescaled_range_revenue": "pinned month index feeds 3 block-size branches; all post-pin exchanges over ≤|months| rows",
    # round-8 additions: static prints re-expand shared subtrees that
    # are pinned (localCheckpoint), cached, or recompute only bounded
    # aggregates at runtime — each audited individually
    "pmi_collocations_docs": "token stream feeds c1/c2/N/bigram aggregations; each is a pushdown-pruned re-scan of the small docs table (caching a corpus-sized token stream would be worse at scale)",
    "markov_next_event_hitrate": "per-user window subtree feeds train agg + test scorer; two passes over one user-keyed shuffle",
    "ips_policy_value_events": "flagged base feeds train aggregate + eval scorer; ctx/policy derive from the BOUNDED ctx_act table (broadcasts)",
    "rfm_segments_customers": "three independent exact-rank passes (recency/frequency/monetary) over the pinned per-customer table - inherent",
    "weighted_median_price_brand": "value-aggregated table pinned; one lineitem-part pass at runtime",
    "cumulative_gains_priority": "ranged intermediate pinned; remaining windows run over the 10-row bucket table",
    "dau_mau_stickiness_events": "(user, day) dedup cached (deterministic - cache is perf-only here); boundary windows over bounded tables",
    "trimmed_mean_price_brand": "ranged intermediate pinned; offsets/totals are bounded tables",
    "ri_audit_star_schema": "seven independent FK-edge audits unioned; each child table scanned once - inherent breadth, not a repeated subtree",
    "apriori_triples_brands": "basket-array replan: baskets cached, pairs/triples explode row-locally; broadcast semi-joins re-expand f2 in the static print",
    # round-5 additions (static prints duplicate cached subtrees; all
    # measured FLAT sf0.1 -> sf1 cold-cache, NOTES round-5 table)
    "ngram_jaccard_capped": "uncapped pipeline + the df-count/cap subtree over the same CACHED posting list; 1.7->? s flat (shares ngram_jaccard_pairs' shape)",
    "walk_skipgram_pairs": "walk corpus (6-join bounded chain, cached nbr/deg tables) feeds BOTH skipgram self-join sides via .cache(); 9.7 s -> 18.0 s at 10x data",
    "link_prediction_parts": "cached canonical edge table feeds adjacency, degrees and the anti-join; wedge volume support-2-bounded; 4.0 -> 4.9 s at 10x",
    "rake_keywords_docs": "cached phrase table feeds word stats + occurrence + scoring subtrees; 1.8 -> 1.3 s at 10x",
    # round-3 third wave (runtime InMemoryTableScan verified for each)
    "bm25_topk_docs": "cached tf feeds scoring join + df agg + corpus stats; 3 cache reads at runtime",
    "unigram_lm_quality": "cached tf feeds vocab agg + weighted join",
    "triangle_count_parts": "cached canonical edge table feeds degree/rank/wedge-close/corner subtrees (13 cache reads at runtime); static print re-expands it per consumer",
    "item_item_cosine_sim": "same cached item set as basket_cooccurrence_lift (cosine adds one column)",
    "contingency_chi2_cells": "cached cell table feeds marginals x2 + total + output join (4 cache reads)",
    # wave 4 (runtime cache reads verified for each)
    "robust_outliers_mad": "cached med/mad per-group tables feed dev + flag + output branches (10 cache reads; 3 scans by design — exact medians)",
    "setsim_prefix_pairs": "cached shingle-set table feeds both posting derivations + both verify sides (explodes re-run from memory, not from the corpus scan)",
    "pq_adc_seeded_topk": "cached seeded codebook feeds encode + query-LUT branches (2 cache reads)",
    "source_overlap_matrix": "cached (source, gram) distinct feeds sizes + both join sides (4 cache reads at runtime)",
    "distinctive_terms_source": "cached tf table feeds group totals, term totals, vocab scalars, output (4 cache reads at runtime)",
    # round 4
    "ivfpq_topk_embeddings": "cached residual/codebook tables feed coarse-assign + encode + LUT + refine branches; static print re-expands the composition (pq_adc pattern, one level deeper)",
    "substring_dup_stats": "cached position-gram table feeds df-agg + cover join; the 9th exchange is the separate per-doc size scan (a fresh parquet read, not a cached-subtree re-run)",
    "substring_dedup_clean": "same cached gram table; extra exchange is the token re-read for reconstruction",
    # round 6 triage of waves 8-15 (runtime executedPlan measured at
    # sf0.01: exchanges merge via per-round localCheckpoint/cache —
    # cachereads/reused counts recorded per query)
    # round-10: bounded-table algebra downstream of eagerly-pinned
    # leaves — the static print re-expands what the runtime reads
    # from localCheckpoint/cache; every exchange past the first
    # data-sized aggregation moves <=~85 month rows / <=125 grid
    # cells / <=|query terms| matched docs
    "variance_ratio_revenue": "pinned month-index leaf feeds the q-lag and 1-lag joins; all post-agg exchanges are <=85-row",
    "quade_test_nations": "pinned 125-cell grid feeds rank/range/qrank windows; post-agg exchanges are grid-sized",
    "jm_query_likelihood_docs": "cached tf feeds corpus scalars + matched-doc agg; 9 static vs bounded runtime",
    "kpss_level_revenue": "pinned centered-residual leaf feeds partial sums + 4 lag joins; all post-agg exchanges <=85-row",
    # r13: average_precision_priority dropped under the budget (one
    # global_rank_and_prefix pass instead of two rank recipes) — its
    # entry pruned per the stale-entry gate. The un-pinned LOCAL+CROSS
    # fold rewrites (r12 kendall, r13 ks/gmd/concentration) make the
    # WHOLE pipeline visible in the static print (no pinned leaf
    # truncates it), so their budget is the honest end-to-end count:
    # tier-agg hash + range + (_pid,g)-window exchange pairs + bounded
    # fold tables, with zero data-sized exchange repeated per branch.
    "kendall_tau_qty_price_brands": "r12 un-pinned local+cross pipeline end-to-end: tier-agg + range + (_pid,g)-window exchanges + bounded explode/fold aggs; 12 static, no repeated data-sized subtree",
    "ks_test_status_priority": "r13 un-pinned local+cross max fold end-to-end: tier agg (reduce side x2, map side reused) + range + window exchanges + bounded offset fold; 12 static",
    "gmd_dispersion_brands": "r13 un-pinned local+cross fold end-to-end: lineitem x part agg + tier range + window exchanges + bounded partials; 10 static",
    "concentration_supplier_nations": "r13 un-pinned local+cross fold end-to-end: (nation,supplier) revenue agg + tier range + window exchanges + bounded partials; 10 static",
    "anderson_darling_status": "with_totals recipe: the single pinned ranged leaf re-expands per consumer (per-row term + sizes/offsets + totals branches) in the static print; runtime reads one materialization",
    "bowley_skewness_status": "with_totals recipe (r13: second pin deleted): pinned ranged leaf re-expands per consumer (local window + sizes/offsets + totals) in the static print",
    "brown_forsythe_status": "with_totals recipe (r13: second pin deleted) + deviation scan re-reading the pinned vals leaf; static print re-expands the pinned subtrees per consumer",
    "edge_embeddedness_parts": "pinned support-floored edge leaf feeds the 3-way wedge join + credit join (triangle-count class)",
    "hll_error_audit_tokens": "cached token explode feeds exact-distinct AND the 64-register sketch; audit join is |sources| rows",
    "quantile_sketch_error_audit": "cached 1024-bucket histogram + grouped_kth_smallest rank recipe; static print re-expands both",
    "deterministic_walks_supplier": "8 fixed walk steps, cached nbr/deg tables; 108 cache reads + 52 reused exchanges at runtime, 5.3 s sf0.01",
    "ppr_supplier_graph": "fixed power-iteration rounds over cached edge/deg; 228 cache reads + 114 reused exchanges, each round |E|-bounded",
    "hits_supplier_graph": "per-half-round checkpointed scores; 15 cache reads, 0.35 s sf0.01",
    "clustering_coeff_parts": "cached canonical edge table feeds degree/wedge/close subtrees; 39 cache reads",
    "degree_assortativity_trade": "cached edge+degree tables feed joint/marginal moment branches; 12 cache reads",
    "community_modularity_nations": "cached edge/community tables feed intra-edge + degree-sum branches; 36 cache reads",
    "cramers_v_priority_status": "cached contingency cell table feeds marginals x2 + total (the chi2 pattern); 12 cache reads",
    "ams_f2_tokens": "sketch + exact-F2 + relative-error branches share the cached token explode",
    "decision_stump_totalprice": "bounds agg + bin table + cum/total branches; 11 runtime exchanges, all over <=256-row tables",
    "category_drift_halves": "cached per-half distribution tables feed both drift-term branches; 12 cache reads",
    "stupid_backoff_docs": "cached n-gram count tables (uni/bi/tri) feed backoff joins; 3 reused exchanges",
    "vocab_coverage_curve": "static 10, runtime 8 — rank table feeds cumulative + total branches",
    # round-6 wave 3/4 (runtime cache reads measured at sf0.01)
    "cohens_kappa_raters": "cached cell table feeds marginals x2 + agree/total branches (9 cache reads)",
    "kneser_ney_bigrams": "cached c12 table feeds context/fan-out/type-count aggs + output join (12 cache reads)",
    "gsp_event_sequences": "cached ev/occ/f1/f2 tables re-expand per level in the static print; 312 cache reads at runtime, 4.1 s sf0.01",
    # round-6 wave 10
    "kmv_overlap_docs": "three k-min sketches (distinct + top-k window each) + exact union/inter over the two CACHED vocab-bounded token sets; the static print re-expands both caches per consumer",
    # round-6 waves 13/17
    "sq8_recall_embeddings": "two deliberate scoring paths (quantized vs exact float brute force) — the query IS the comparison; each is broadcast+window over the 500-row embeddings table",
    "textrank_keywords_docs": "pagerank_fixed caches e/nodes/deg internally; the static print re-expands the cached word-graph subtree per round (runtime reads the cache)",
    # round-7 waves (runtime cache reads measured at sf0.01)
    "conformal_interval_orders": "cached base (3 split branches) + cal (count/rank passes) + ranged (grouped_kth_smallest two-pass rank) + 5-row qhat (coverage + output); 132 cache reads, 8.5 s sf0.01 incl. first materialization",
    "smith_waterman_events": "cached per-user series feeds both sides of the consecutive-user self-join (2 cache reads); the 9th static exchange is the bounded dense_rank dim",
    "holt_winters_revenue": "cached month-tier table feeds the fold array + the ranked fitted join; cached folded state feeds fitted + 3 forecast rows (7 cache reads)",
    "apriori_triples_brands": "cached b/occ/pr/f2/t3 re-expand per Apriori level in the static print (the gsp_event_sequences shape, unordered); 665 cache reads at runtime, 9.4 s sf0.01 incl. the floor_sup scalar action",
    # round-11 waves
    "somers_d_qty_returns": "cached 100-cell table feeds both pair-join sides + row totals + grand total; static print re-expands the cache per consumer",
    "kendall_tau_c_qty_priority": "cached 250-cell table feeds both pair-join sides + the dim-count total",
    "dice_overlap_source_vocab": "cached (source, term) vocab feeds per-source sizes + BOTH posting-join sides; static print re-expands 3x",
    "bigram_novelty_halves": "cached exploded-bigram table feeds the early and late distinct sets + the early-count scalar; fanout rebalance on the one-file docs scan",
    "user_churn_daily": "cached (day, user) activity feeds the max-day scalar, the shifted next-day probe side, and the probe left side",
    "median_ci_status": "grouped_kths_smallest multi-k recipe: ONE pinned ranged leaf feeds all three rank picks (lo/median/hi); static print re-expands the pinned subtrees",
    "pareto_8020_customers": "global_rank_and_prefix pinned ranged leaf + per-partition sizes/offsets + the (n, total) scalar join",
    "assoc_suite_status_priority": "cached 15-cell table feeds row/col margins + totals (bounded 4-way reuse)",
    "cochran_c_hartley_nations": "cached 25-row variance table feeds the aggregate + the argmax probe",
    "trade_reciprocity_nations": "cached <=600-edge list feeds both sides of the reverse-direction probe",
    "c_chart_monthly_returns": "cached month-count table feeds the (n, S) scalar + the violation scan",
    "page_hinkley_revenue": "cached 80-row PH table feeds the max scalar + the argmax scan",
    "dayk_retention_events": "distinct (day, user) feeds the day-0 cohort + the activity join; first-day and cohort-size scalars broadcast",
    # round-12 full-sweep triage: the late r11 waves were never run
    # through this audit as a set — each entry below verified
    # bounded-by-design (pinned rank-recipe leaves, bounded
    # contingency/grid/centroid tables, or an explicit sketch-vs-exact
    # comparison); the stale-entry gate now prunes any that drop back
    # under budget.
    "abc_classification_brands": "global_rank_and_prefix pinned ranged leaf over the 25-brand aggregate + offsets + boundary scalar join; one lineitem pass",
    "cms_join_size_estimate": "the query IS the sketch-vs-exact comparison: two CMS builds (one corpus pass each) + the exact join count; every post-agg table <= 3x65536 cells",
    "cuped_adjusted_lift_events": "one per-user aggregation; all downstream exchanges over bounded variant/scalar tables",
    "gk_lambda_status_priority": "bounded 15-cell contingency feeds row-mode + column-margin + total branches",
    "kendalls_w_nation_priority": "bounded 125-row (nation x judge) table feeds per-judge rank windows + rank-sum + judge-count branches",
    "geary_c_balance_grid": "pinned bounded cell grid feeds centering + neighbor-pair + variance branches (the morans_i pattern)",
    "term_fano_burstiness_docs": "per-term (tf, tf2) aggregate + TakeOrdered head + doc-count scalar; fanout rebalance on the one-file docs scan",
    "p90_doclen_sources": "grouped_kth_smallest pinned ranged leaf + bounded sizes/offsets/k tables",
    "ship_delay_percentiles_priority": "grouped_kths_smallest multi-k recipe: one pinned ranged leaf feeds both rank picks (was two full single-k recipes before r12)",
    "repeat_interval_median_days": "multi-k recipe on a constant group key: one pinned ranged leaf + bounded offsets; the gaps window is per-customer",
    "label_centroid_separation_embeddings": "per-(label, dim) integer sums onto a bounded centroid table; pair algebra over labels^2 rows; fanout rebalance on the one-file embeddings scan",
    "loyalty_tier_mix": "one per-customer aggregation onto a 3-tier rollup + grand-total scalar",
    "interarrival_median_by_type": "per-(type, user) lag window + grouped_kth_smallest pinned leaf; k table bounded by the event-type domain",
    # round-12 wave 1/2 (all cached/pinned bounded intermediates that
    # the static print re-expands per consumer)
    "price_indices_yearly": "cached per-(part, year) aggregate feeds both year self-join sides; bounds scalar broadcasts re-expand in the print",
    "hoover_index_nations": "cached 25-nation table feeds totals + deviation branches",
    "demand_classes_brands": "cached (brand, month) aggregate feeds the calendar scalar + per-brand stats",
    "single_source_parts": "cached per-part supplier-count table feeds histogram + traded-part total",
    "littles_law_sessions": "cached session table feeds the scalar aggregate + both sweep-delta arms; global_rank_and_prefix leaves pinned",
    "ari_label_buckets_embeddings": "cached <=40-cell contingency feeds pair-sum + both marginal branches",
    "quartile_dispersion_brands": "grouped_kths_smallest multi-k recipe: one pinned ranged leaf feeds both quartile picks",
    "customer_migration_matrix": "cached per-(customer, year) totals feed the multi-k threshold recipe AND both tier-join sides; bounds scalar broadcasts re-expand per consumer in the print",
}


# Any UNPARTITIONED window moves its whole input to one partition —
# benign only when that input is provably bounded (an aggregate /
# distinct-value / top-k table). The audit COUNTS each global
# window's child at the audit SF and fails past the bound, so a
# future unbounded one can't hide among the ~114 known-benign
# WindowExec warnings. Bound: 10^4 rows at sf0.01 (every legitimate
# case is a bucket/month/distinct-tier table well under it);
# exemptions must record their measured cardinality.
WINDOW_CHILD_BOUND = 10_000
WINDOW_BOUND_EXEMPT: dict[str, str] = {}

# The exchange budget a query's STATIC plan must stay under unless it
# carries an EXPECTED_MULTISTAGE justification.
EXCHANGE_BUDGET = 8


def stale_missing_entries(expected=None, registry=None):
    """EXPECTED_MULTISTAGE keys naming queries that no longer exist in
    the registry — a rotted exemption (r11 verdict ask #4: the map must
    stay an inventory, not a graveyard). Cheap: no SparkSession."""
    if expected is None:
        expected = EXPECTED_MULTISTAGE
    if registry is None:
        import os

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from dpe_energy_performance_analysis_etl_spark.plans import QUERIES

        registry = QUERIES
    return sorted(k for k in expected if k not in registry)


def stale_under_budget(counts, expected=None, budget=EXCHANGE_BUDGET):
    """EXPECTED_MULTISTAGE keys whose measured static exchange count
    dropped to or below the budget — the exemption no longer fires and
    must be pruned. ``counts`` maps query name -> static exchange
    count (only audited queries are judged)."""
    if expected is None:
        expected = EXPECTED_MULTISTAGE
    return sorted(
        k for k, n in counts.items() if k in expected and n <= budget
    )


def unpartitioned_window_children(df):
    """(child_jplan, pretty_name) per global-window node in the
    optimized logical plan."""
    out = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            out.append(node.child())
        kids = node.children()
        for i in range(kids.length()):
            stack.append(kids.apply(i))
    return out


def audit_global_windows(spark, df) -> list[int]:
    """Row count of every unpartitioned window's input (executes the
    child subtree — audit-time cost only)."""
    D = spark._jvm.org.apache.spark.sql.classic.Dataset
    counts = []
    for child in unpartitioned_window_children(df):
        counts.append(D.ofRows(spark._jsparkSession, child).count())
    return counts


def main() -> int:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dpe_energy_performance_analysis_etl_spark import get_spark
    from dpe_energy_performance_analysis_etl_spark.plans import QUERIES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    argv = [a for a in sys.argv[2:] if a != "--no-window-audit"]
    window_audit = "--no-window-audit" not in sys.argv
    only = set(argv)
    stale_missing = stale_missing_entries(registry=QUERIES)
    if stale_missing:
        print(f"STALE EXPECTED_MULTISTAGE entries (query gone): {stale_missing}")
        return 1

    spark = get_spark("explain_audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    suspicious = []
    exchange_counts = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:
            suspicious.append(name)
            print(f"{name:30s} PLAN ERROR: {exc}")
            continue
        joins = re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
            plan,
        )
        n_exchange_all = len(re.findall(r"\bExchange\b", plan))
        # RoundRobin exchanges are the scan_fanout parallelism guard
        # (operators/scaling.py) — a data REBALANCE, not a key
        # shuffle; they are a no-op on many-file inputs at scale and
        # don't count against the shuffle budget.
        n_roundrobin = len(re.findall(r"RoundRobinPartitioning", plan))
        n_exchange = n_exchange_all - n_roundrobin
        exchange_counts[name] = n_exchange
        # formatted mode annotates operators with "[codegen id : N]"
        n_codegen = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
        flags = []
        bad = []
        if "CartesianProduct" in joins:
            bad.append("CARTESIAN")
        if n_roundrobin:
            flags.append(f"fanout={n_roundrobin}")  # informational only
        if n_exchange > EXCHANGE_BUDGET:
            if name in EXPECTED_MULTISTAGE:
                flags.append(f"exchanges={n_exchange} expected: {EXPECTED_MULTISTAGE[name]}")
            else:
                bad.append(f"EXCHANGES={n_exchange}")
        if window_audit:
            try:
                gw = audit_global_windows(spark, df)
            except Exception as exc:  # audit must not crash the sweep
                gw = []
                flags.append(f"window-audit-error: {exc}")
            over = [c for c in gw if c > WINDOW_CHILD_BOUND]
            if over and name not in WINDOW_BOUND_EXEMPT:
                bad.append(f"GLOBAL_WINDOW_ROWS={max(over)}")
            elif gw:
                flags.append(f"gwin={len(gw)}x<=:{max(gw)}")
        flags = bad + flags
        if bad:
            suspicious.append(name)
        print(
            f"{name:30s} joins={len(joins):2d} exchanges={n_exchange:2d} "
            f"codegen_spans={n_codegen:2d} {' '.join(flags)}"
        )
    stale_under = stale_under_budget(exchange_counts)
    print(f"\nsuspicious: {suspicious if suspicious else 'none'}")
    if stale_under:
        print(
            "STALE EXPECTED_MULTISTAGE entries (static plan now within "
            f"the {EXCHANGE_BUDGET}-exchange budget; prune them): "
            f"{stale_under}"
        )
    spark.stop()
    return 1 if stale_under else 0


if __name__ == "__main__":
    raise SystemExit(main())
