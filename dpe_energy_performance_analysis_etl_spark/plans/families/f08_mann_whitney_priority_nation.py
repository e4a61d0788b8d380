"""Query-registry family chunk 8 (auto-split from the
historical plans/queries.py lines 14391-16142; registration
order preserved — see plans/queries.py facade)."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.plans._core import (  # noqa: F401
    Callable,
    DataFrame,
    SparkSession,
    Window,
    F,
    epoch_double,
    epoch_micros,
    epoch_seconds,
    exact_cents_sum,
    exact_sum_agg,
    from_cents,
    scaled_long,
    TABLES,
    load_tables,
    read_events,
    read_documents,
    read_embeddings,
    dsum,
    davg,
    dsum_fast,
    davg_fast,
    QUERIES,
    ORACLE_SQL,
    register,
)
from dpe_energy_performance_analysis_etl_spark.plans.families.f01_json_struct_parse import (  # noqa: F401
    register_tables,
)

@register(
    "mann_whitney_priority_nations",
    """
    WITH pool AS MATERIALIZED (
      SELECT c.c_nationkey AS g,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS s
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
    ), vals AS MATERIALIZED (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(s) AS BIGINT) AS cnt1
      FROM pool GROUP BY g, v
    ), pre AS MATERIALIZED (
      SELECT g, v, cnt, cnt1,
             CAST(COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cnt_before
      FROM vals
    ), per AS MATERIALIZED (
      SELECT g, CAST(SUM(cnt1) AS BIGINT) AS n1,
             CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(cnt1 * (2 * cnt_before + cnt + 1)) AS BIGINT) AS r1x2
      FROM pre GROUP BY g
    )
    SELECT CAST(g AS BIGINT) AS c_nationkey, n1, n - n1 AS n2,
           r1x2 - n1 * (n1 + 1) AS u1_x2,
           2 * n1 * (n - n1) - (r1x2 - n1 * (n1 + 1)) AS u2_x2,
           CASE WHEN n1 = 0 OR n = n1 THEN NULL
                ELSE CAST(r1x2 - n1 * (n1 + 1) - n1 * (n - n1) AS DOUBLE)
                     / sqrt(CAST(n1 * (n - n1) * (n + 1) AS DOUBLE) / 3.0e0)
           END AS z
    FROM per
    """,
)
def mann_whitney_priority_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U per customer nation (operators/stats.py
    mann_whitney_u): do URGENT orders run stochastically larger
    totals than LOW ones? The unpaired rank-sum counterpart of the
    grouped Wilcoxon UDAF — and unlike it, pure codegen with exact
    integer DOUBLED mid-ranks (2·cnt_before + cnt + 1 per tie
    block), so the statistic itself is oracle-hashable; only the
    final z is a fixed-order per-row double. The per-group prefix
    counts come from the grouped_running_totals range-partition
    recipe (the oracle's PARTITION BY window is the sf0.01
    shortcut); tie correction omitted, documented."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        mann_whitney_u,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pool = (
        o.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_nationkey"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
            (F.col("o_orderpriority") == "1-URGENT").alias("urgent"),
        )
    )
    out = mann_whitney_u(pool, "c_nationkey", "urgent", "cents")
    return out.select(
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        "n1",
        "n2",
        "u1_x2",
        "u2_x2",
        "z",
    )


# =====================================================================
# Round 7, wave 13: market concentration (Gini + Herfindahl)
# =====================================================================

@register(
    "concentration_supplier_nations",
    """
    WITH rev AS MATERIALIZED (
      SELECT s.s_nationkey AS g, l.l_suppkey AS sk,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS r
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), pre AS MATERIALIZED (
      SELECT g, r,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(COALESCE(SUM(COUNT(*)) OVER (PARTITION BY g ORDER BY r
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cnt_before,
             CAST(SUM(SUM(CAST(r AS HUGEINT) * r)) OVER (PARTITION BY g)
               AS HUGEINT) AS sum_r2,
             CAST(SUM(SUM(r)) OVER (PARTITION BY g) AS BIGINT) AS s_tot,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM rev GROUP BY g, r
    ), agg AS MATERIALIZED (
      SELECT g, MAX(n) AS n, MAX(s_tot) AS s_tot, MAX(sum_r2) AS sum_r2,
             CAST(SUM(CAST(r AS HUGEINT)
                      * (2 * cnt * cnt_before + cnt * cnt + cnt))
                  AS HUGEINT) AS two_sum_ix
      FROM pre GROUP BY g
    )
    SELECT CAST(g AS BIGINT) AS s_nationkey, CAST(n AS BIGINT) AS n_suppliers,
           s_tot AS total_cents,
           CAST((two_sum_ix - CAST(n + 1 AS HUGEINT) * s_tot) * 1000000
                // (CAST(n AS HUGEINT) * s_tot) AS BIGINT) AS gini_ppm,
           CAST(sum_r2 * 1000000
                // (CAST(s_tot AS HUGEINT) * s_tot) AS BIGINT) AS hhi_ppm
    FROM agg
    """,
)
def concentration_supplier_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration report per supplier nation: the Gini
    coefficient (Lorenz-curve inequality of supplier revenues, exact
    rational via G = (2Σᵢ i·xᵢ − (n+1)Σx)/(n·Σx) with the tie-block
    identity 2Σ i·xᵢ = Σ_v v·(2·cnt·cnt_before + cnt² + cnt) — rank
    order among equal values provably cancels) and the Herfindahl-
    Hirschman index (Σ shareᵢ² = Σ rᵢ²/(Σr)²), both in exact ppm.
    Squares of cent totals exceed int64, so the wide intermediates
    run in DECIMAL(38,0) on Spark and HUGEINT on DuckDB — both exact
    to 10³⁸. Prefix counts fold LOCAL+CROSS (grouped_local_prefix +
    partition_offsets, r13 — the aggregate is linear in the prefix,
    so no per-row global prefix, no pin, no offsets join; the old
    form rode the pinned two-pass recipe) (the oracle's PARTITION BY
    window is the sf0.01 shortcut); one (nation, supplier)
    aggregation is the data-sized pass."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_local_prefix,
        partition_offsets,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    rev = (
        li.join(su, li["l_suppkey"] == su["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("g"), F.col("l_suppkey").alias("sk"))
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(30,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("r")
        )
    )
    vals = rev.groupBy("g", "r").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    loc = grouped_local_prefix(vals, "g", "r", ["cnt"])
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    part = loc.groupBy("_pid", "g").agg(
        F.sum("cnt").cast("bigint").alias("cnt"),
        F.sum(F.col("r") * F.col("cnt")).cast("bigint").alias("s_tot"),
        F.sum(dec("r") * dec("r") * dec("cnt")).alias("sum_r2"),
        F.sum(
            dec("r")
            * (
                2 * dec("cnt") * dec("_l_cnt")
                + dec("cnt") * dec("cnt")
                + dec("cnt")
            )
        ).alias("tl"),
        F.sum(2 * dec("r") * dec("cnt")).alias("rc2"),
    )
    offs = partition_offsets(part, "g", ["cnt"])
    agg = offs.groupBy("g").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("s_tot").cast("bigint").alias("s_tot"),
        F.sum("sum_r2").alias("sum_r2"),
        F.sum(F.expr("tl + CAST(_o_cnt AS DECIMAL(38,0)) * rc2")).alias(
            "two_sum_ix"
        ),
    )
    return agg.select(
        F.col("g").cast("bigint").alias("s_nationkey"),
        F.col("n").alias("n_suppliers"),
        F.col("s_tot").alias("total_cents"),
        F.expr(
            "CAST((two_sum_ix - CAST(n + 1 AS DECIMAL(38,0))"
            " * CAST(s_tot AS DECIMAL(38,0))) * 1000000"
            " div (CAST(n AS DECIMAL(38,0)) * CAST(s_tot AS DECIMAL(38,0)))"
            " AS BIGINT)"
        ).alias("gini_ppm"),
        F.expr(
            "CAST(sum_r2 * 1000000 div (CAST(s_tot AS DECIMAL(38,0))"
            " * CAST(s_tot AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("hhi_ppm"),
    )


# =====================================================================
# Round 7, wave 14: exact Shapley attribution
# =====================================================================

@register(
    "shapley_attribution_events",
    """
    WITH r AS MATERIALIZED (
      SELECT user_id AS u, event_type AS et,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rk
      FROM events
    ), conv AS MATERIALIZED (
      SELECT u, MIN(rk) AS crk FROM r WHERE et = 'purchase' GROUP BY u
    ), ch AS MATERIALIZED (
      SELECT et, 1 << (CAST(dense_rank() OVER (ORDER BY et) AS INT) - 1)
               AS bit
      FROM (SELECT DISTINCT et FROM r WHERE et <> 'purchase')
    ), nch AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS INT) AS n FROM ch
    ), expo AS MATERIALIZED (
      SELECT conv.u, CAST(COALESCE(SUM(DISTINCT ch.bit), 0) AS BIGINT) AS mask
      FROM conv
      LEFT JOIN r ON r.u = conv.u AND r.rk < conv.crk AND r.et <> 'purchase'
      LEFT JOIN ch ON ch.et = r.et
      GROUP BY conv.u
    ), cnt AS MATERIALIZED (
      SELECT mask, CAST(COUNT(*) AS BIGINT) AS c FROM expo GROUP BY mask
    ), subsets AS MATERIALIZED (
      SELECT CAST(unnest(range(0, 1 << (SELECT n FROM nch))) AS BIGINT) AS s
    ), v AS MATERIALIZED (
      SELECT subsets.s, CAST(COALESCE(SUM(cnt.c), 0) AS BIGINT) AS v
      FROM subsets LEFT JOIN cnt ON (cnt.mask & subsets.s) = cnt.mask
      GROUP BY subsets.s
    ), fct AS MATERIALIZED (
      SELECT [1, 1, 2, 6, 24, 120, 720, 5040, 40320, 362880] AS f
    )
    SELECT ch.et AS channel,
           CAST(SUM(
             (SELECT f FROM fct)[bit_count(s0.s) + 1]
             * (SELECT f FROM fct)[(SELECT n FROM nch) - bit_count(s0.s)]
             * (s1.v - s0.v)
           ) AS BIGINT) AS phi_x_fact,
           CAST((SELECT f FROM fct)[(SELECT n FROM nch) + 1] AS BIGINT)
             AS fact_scale,
           CAST((SELECT v FROM v
                 WHERE s = (1 << (SELECT n FROM nch)) - 1) AS BIGINT)
             AS conversions
    FROM ch
    JOIN v s0 ON (s0.s & ch.bit) = 0
    JOIN v s1 ON s1.s = s0.s + ch.bit
    GROUP BY ch.et
    """,
)
def shapley_attribution_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value conversion attribution across the four
    non-purchase channels (operators/temporal.py shapley_attribution
    — Shapley 1953, the coalition-game complement of
    markov_attribution_events' removal effects): v(S) = converters
    whose pre-purchase exposure set fits inside coalition S; φ
    returned ×n! so the whole computation is division-free exact
    integers. One data-sized pass to ≤2ⁿ exposure-mask counts; the
    2ⁿ-coalition Shapley sum runs driver-side (Python ints) and the
    oracle replays it relationally — subsets as a bitmask range,
    containment as (mask & S) = mask, factorial weights from a
    literal array."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        shapley_attribution,
    )

    return shapley_attribution(read_events(spark, sf_dir))


# =====================================================================
# Round 8, wave 1: collocations, FD discovery, log-rank, DiD,
# seasonal decomposition, next-event backtest
# =====================================================================

@register(
    "pmi_collocations_docs",
    """
    WITH tok AS MATERIALIZED (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
             CAST(unnest(range(0, len(regexp_extract_all(lower(text), '[a-z0-9]+'))))
                  AS BIGINT) AS pos
      FROM documents
    ), uni AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1
    ), nt AS MATERIALIZED (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni
    ), c12 AS MATERIALIZED (
      SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    )
    SELECT w1, w2, c12, a.c AS c1, b.c AS c2,
           CAST((CAST(c12 - 5 AS HUGEINT) * nt.n * 1000000)
                // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS score_ppm
    FROM c12 JOIN uni a ON c12.w1 = a.w JOIN uni b ON c12.w2 = b.w, nt
    ORDER BY score_ppm DESC, w1, w2 LIMIT 50
    """,
)
def pmi_collocations_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec phrase-pass collocations (text/retrieval.py
    pmi_collocations — Mikolov et al. NeurIPS'13 section 4: discounted
    PMI score (c12 - 5)*N/(c1*c2), the preprocessing that promotes
    'new york'-class bigrams to vocabulary units before tokenizer /
    embedding training). Exact-integer score_ppm via DECIMAL(38,0) /
    HUGEINT cross-multiplication — no log anywhere; top-50 with
    deterministic (score, w1, w2) tie-break over the support-floored
    pair table."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        pmi_collocations,
    )

    return pmi_collocations(
        read_documents(spark, sf_dir), min_count=5, discount=5, top_k=50
    )


_FD_COLS = ["c_name", "c_nationkey", "c_mktsegment"]
# injective null encoding ('n' / 'v' || value) mirroring
# operators/quality.py fd_discovery — a bare sentinel would conflate a
# genuine value equal to the sentinel with NULL (ADVICE r8)
_FD_ARMS = "\n      UNION ALL\n".join(
    f"""      SELECT '{a}' AS lhs, '{b}' AS rhs,
             CASE WHEN {a} IS NULL THEN 'n'
                  ELSE 'v' || CAST({a} AS VARCHAR) END AS lv,
             CASE WHEN {b} IS NULL THEN 'n'
                  ELSE 'v' || CAST({b} AS VARCHAR) END AS rv
      FROM customer"""
    for a in _FD_COLS
    for b in _FD_COLS
    if a != b
)


@register(
    "fd_discovery_customer",
    f"""
    WITH stacked AS MATERIALIZED (
{_FD_ARMS}
    ), dv AS MATERIALIZED (
      SELECT DISTINCT lhs, rhs, lv, rv FROM stacked
    ), per_lv AS MATERIALIZED (
      SELECT lhs, rhs, lv, CAST(COUNT(*) AS BIGINT) AS n_rv
      FROM dv GROUP BY 1, 2, 3
    )
    SELECT lhs, rhs,
           CAST(COUNT(*) AS BIGINT) AS n_lhs_values,
           CAST(SUM(n_rv) AS BIGINT) AS n_lhs_rhs_pairs,
           CAST(count_if(n_rv > 1) AS BIGINT) AS n_violating_lhs,
           CAST(CASE WHEN MAX(n_rv) > 1 THEN 0 ELSE 1 END AS BIGINT) AS holds
    FROM per_lv GROUP BY 1, 2
    """,
)
def fd_discovery_customer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-1 functional-dependency discovery over the customer
    category columns (operators/quality.py fd_discovery — the TANE
    single-column lattice, Huhtala et al. 1999): all 6 ordered pairs
    of (name, nationkey, mktsegment) profiled in ONE exploded pass
    (the oracle rescans per pair — fine at sf0.01, exactly what the
    Spark plan avoids at scale). c_name is a key in disguise, so
    name -> nation and name -> segment HOLD (key discovery) while
    every reverse direction violates — both branches of the gate
    exercised."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import fd_discovery

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return fd_discovery(c, _FD_COLS)


@register(
    "logrank_orders",
    """
    WITH subj AS MATERIALIZED (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS g
      FROM orders
    ), tiers AS MATERIALIZED (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(ev * g) AS BIGINT) AS d1,
             CAST(COUNT(*) AS BIGINT) AS tot,
             CAST(SUM(g) AS BIGINT) AS tot1
      FROM subj GROUP BY 1
    ), ar AS MATERIALIZED (
      SELECT t, d, d1,
             CAST(SUM(tot) OVER () - COALESCE(SUM(tot) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n,
             CAST(SUM(tot1) OVER () - COALESCE(SUM(tot1) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n1,
             CAST(SUM(tot) OVER () AS BIGINT) AS n_subjects,
             CAST(SUM(tot1) OVER () AS BIGINT) AS n_group1
      FROM tiers
    ), contrib AS MATERIALIZED (
      SELECT n_subjects, n_group1, d1,
             CAST((CAST(d AS HUGEINT) * n1 * 1000000) // n AS BIGINT) AS e1_t,
             CAST(CASE WHEN n > 1 THEN
               (CAST(d AS HUGEINT) * n1 * (n - n1) * (n - d) * 1000000)
               // (CAST(n AS HUGEINT) * n * (n - 1))
             ELSE 0 END AS BIGINT) AS v_t
      FROM ar WHERE d > 0
    ), agg AS (
      SELECT n_subjects, n_group1,
             CAST(SUM(d1) AS BIGINT) AS o1_events,
             CAST(SUM(e1_t) AS BIGINT) AS e1_ppm,
             CAST(SUM(v_t) AS BIGINT) AS v_ppm
      FROM contrib GROUP BY 1, 2
    )
    SELECT n_subjects, n_group1, o1_events, e1_ppm, v_ppm,
           CAST(CASE WHEN v_ppm > 0 THEN
             (CAST(o1_events * 1000000 - e1_ppm AS HUGEINT)
              * (o1_events * 1000000 - e1_ppm) * 1000)
             // (CAST(v_ppm AS HUGEINT) * 1000000)
           ELSE 0 END AS BIGINT) AS chi2_milli
    FROM agg
    """,
)
def logrank_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test (operators/stats.py logrank_test —
    Mantel '66 / Peto & Peto '72): do URGENT/HIGH-priority orders
    finalize on a different survival curve than the rest? Month tiers
    since 1992-01 as in kaplan_meier_orders, status 'F' = event. The
    per-tier hypergeometric E1/V are floored at ppm and summed as
    exact integers (the KM fold discipline applied to inference);
    products run in DECIMAL(38,0) / HUGEINT."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import logrank_test

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    subj = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("t"),
        (F.col("o_orderstatus") == "F").cast("int").alias("ev"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("g"),
    )
    return logrank_test(subj, "t", "ev", "g")


@register(
    "did_priority_revenue",
    """
    WITH base AS MATERIALIZED (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS cents,
             CAST(date_diff('day', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS dd
      FROM orders
    ), bounds AS MATERIALIZED (
      SELECT MIN(dd) AS d0, MAX(dd) AS d1 FROM base
    ), cells AS (
      SELECT
        CAST(count_if(g = 1 AND (dd - d0) * 2 >= (d1 - d0)) AS BIGINT) AS n_tt,
        CAST(SUM(CASE WHEN g = 1 AND (dd - d0) * 2 >= (d1 - d0) THEN cents ELSE 0 END) AS BIGINT) AS sum_tt,
        CAST(count_if(g = 1 AND (dd - d0) * 2 < (d1 - d0)) AS BIGINT) AS n_tp,
        CAST(SUM(CASE WHEN g = 1 AND (dd - d0) * 2 < (d1 - d0) THEN cents ELSE 0 END) AS BIGINT) AS sum_tp,
        CAST(count_if(g = 0 AND (dd - d0) * 2 >= (d1 - d0)) AS BIGINT) AS n_ct,
        CAST(SUM(CASE WHEN g = 0 AND (dd - d0) * 2 >= (d1 - d0) THEN cents ELSE 0 END) AS BIGINT) AS sum_ct,
        CAST(count_if(g = 0 AND (dd - d0) * 2 < (d1 - d0)) AS BIGINT) AS n_cp,
        CAST(SUM(CASE WHEN g = 0 AND (dd - d0) * 2 < (d1 - d0) THEN cents ELSE 0 END) AS BIGINT) AS sum_cp
      FROM base, bounds
    )
    SELECT n_tt, sum_tt, n_tp, sum_tp, n_ct, sum_ct, n_cp, sum_cp,
           CAST((sum_tt * 1000) // greatest(n_tt, 1) AS BIGINT) AS mean_tt_scaled,
           CAST((sum_tp * 1000) // greatest(n_tp, 1) AS BIGINT) AS mean_tp_scaled,
           CAST((sum_ct * 1000) // greatest(n_ct, 1) AS BIGINT) AS mean_ct_scaled,
           CAST((sum_cp * 1000) // greatest(n_cp, 1) AS BIGINT) AS mean_cp_scaled,
           CAST(((sum_tt * 1000) // greatest(n_tt, 1)
                 - (sum_tp * 1000) // greatest(n_tp, 1))
                - ((sum_ct * 1000) // greatest(n_ct, 1)
                   - (sum_cp * 1000) // greatest(n_cp, 1)) AS BIGINT) AS did_scaled
    FROM cells
    """,
)
def did_priority_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (operators/stats.py
    diff_in_differences — the Card-Krueger 2x2): treated = URGENT/HIGH
    orders, pre/post split at the MIDPOINT OF THE OBSERVED date range
    (data-anchored, the r7 walk-forward lesson — never a schema
    epoch), outcome = order value in exact cents. One
    conditional-aggregate pass for all four cells; means floored once
    at milli-cents; DiD is arithmetic on the floored integers."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        diff_in_differences,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("g"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("dd"),
    )
    bounds = base.agg(
        F.min("dd").alias("d0"), F.max("dd").alias("d1")
    )
    flagged = base.crossJoin(F.broadcast(bounds)).withColumn(
        "post",
        ((F.col("dd") - F.col("d0")) * 2 >= (F.col("d1") - F.col("d0"))).cast("int"),
    )
    return diff_in_differences(flagged, "g", "post", "cents", scale=1000)


@register(
    "seasonal_decompose_revenue",
    """
    WITH tiers AS MATERIALIZED (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), ma AS MATERIALIZED (
      SELECT t, y,
             COUNT(*) OVER w AS wn,
             CAST(SUM(y) OVER w AS BIGINT) AS ws
      FROM tiers
      WINDOW w AS (ORDER BY t ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)
    ), detr AS MATERIALIZED (
      SELECT t, y, CAST((ws * 1000) // 12 AS BIGINT) AS trend_scaled,
             CAST(y * 1000 - (ws * 1000) // 12 AS BIGINT) AS detrended_scaled
      FROM ma WHERE wn = 12
    ), ranked AS MATERIALIZED (
      SELECT t, detrended_scaled,
             row_number() OVER (PARTITION BY t % 12
               ORDER BY detrended_scaled, t) AS rk,
             COUNT(*) OVER (PARTITION BY t % 12) AS cnt
      FROM detr
    ), med AS MATERIALIZED (
      SELECT t % 12 AS phase, detrended_scaled AS seasonal_scaled
      FROM ranked WHERE rk = (cnt + 1) // 2
    )
    SELECT d.t, d.y, d.trend_scaled, d.detrended_scaled, m.seasonal_scaled,
           CAST(d.detrended_scaled - m.seasonal_scaled AS BIGINT)
             AS remainder_scaled
    FROM detr d JOIN med m ON d.t % 12 = m.phase
    """,
)
def seasonal_decompose_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of monthly revenue
    (operators/temporal.py seasonal_decompose — Cleveland et al. 1990
    in exact-integer dialect): centered 12-month ROWS-window
    moving-average trend (interior months only), per-calendar-month
    LOW-MEDIAN seasonal (order statistic — engine-exact per the NOTES
    rule), integer remainder. Every window runs over the bounded
    month-tier table."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        seasonal_decompose,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("m"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    return seasonal_decompose(monthly, "m", "cents", period=12, scale=1000)


@register(
    "markov_next_event_hitrate",
    """
    WITH seq AS MATERIALIZED (
      SELECT user_id AS u, event_type AS et,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY user_id) AS n,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
      FROM events
    ), tr AS MATERIALIZED (
      SELECT * FROM seq WHERE prev_type IS NOT NULL
    ), model AS MATERIALIZED (
      SELECT prev_type, next_type AS predicted FROM (
        SELECT prev_type, et AS next_type,
               row_number() OVER (PARTITION BY prev_type
                 ORDER BY COUNT(*) DESC, et) AS r
        FROM tr WHERE rk <= (n * 4) // 5
        GROUP BY prev_type, et
      ) WHERE r = 1
    )
    SELECT t.prev_type,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(count_if(m.predicted = t.et) AS BIGINT) AS hits,
           CAST((count_if(m.predicted = t.et) * 1000000) // COUNT(*)
                AS BIGINT) AS hit_ppm
    FROM tr t LEFT JOIN model m ON t.prev_type = m.prev_type
    WHERE t.rk > (t.n * 4) // 5
    GROUP BY 1
    """,
)
def markov_next_event_hitrate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward backtest of the first-order Markov next-event
    predictor (operators/temporal.py next_event_hitrate): train on
    each user's first 80% of events (exact integer cutoff), evaluate
    top-1 accuracy on the rest — the eval loop that turns
    event_transition_matrix into a measured baseline, honest to time
    (no future leakage; the boundary transition is evaluated, never
    trained on). Argmax tie-break lexicographic via min-struct; one
    user-keyed shuffle; bounded model table broadcast."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        next_event_hitrate,
    )

    return next_event_hitrate(read_events(spark, sf_dir))


# =====================================================================
# Round 8, wave 2: off-policy evaluation, OLAP ratio-to-parent, RFM,
# XYZ volatility, rolling correlation, seasonal anomaly audit
# =====================================================================

@register(
    "ips_policy_value_events",
    """
    WITH base AS MATERIALIZED (
      SELECT (epoch_us(ts) // 86400000000) % 7 AS x,
             event_type AS a,
             CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT) AS r,
             epoch_us(ts) AS eus
      FROM events
    ), bounds AS MATERIALIZED (
      SELECT MIN(eus) AS e0, MAX(eus) AS e1 FROM base
    ), flagged AS MATERIALIZED (
      SELECT x, a, r,
             CASE WHEN (eus - e0) * 5 >= (e1 - e0) * 4 THEN 1 ELSE 0 END AS sp
      FROM base, bounds
    ), ctx_act AS MATERIALIZED (
      SELECT x, a, CAST(COUNT(*) AS BIGINT) AS n_xa,
             CAST(SUM(r) AS BIGINT) AS s_xa
      FROM flagged WHERE sp = 0 GROUP BY 1, 2
    ), ctx AS MATERIALIZED (
      SELECT x, CAST(SUM(n_xa) AS BIGINT) AS n_x FROM ctx_act GROUP BY 1
    ), pol AS MATERIALIZED (
      SELECT x, a AS pi_a FROM (
        SELECT x, a, row_number() OVER (PARTITION BY x
          ORDER BY (s_xa * 1000000) // n_xa DESC, a) AS rk
        FROM ctx_act
      ) WHERE rk = 1
    ), ev AS (
      SELECT f.x, f.a, f.r, c.n_x, p.pi_a, ca.n_xa
      FROM flagged f
      LEFT JOIN ctx c ON f.x = c.x
      LEFT JOIN pol p ON f.x = p.x
      LEFT JOIN ctx_act ca ON f.x = ca.x AND f.a = ca.a
      WHERE f.sp = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(count_if(n_xa IS NOT NULL AND a = pi_a) AS BIGINT) AS n_matched,
           CAST(count_if(n_xa IS NULL) AS BIGINT) AS n_unsupported,
           CAST(SUM(CASE WHEN n_xa IS NOT NULL AND a = pi_a
                    THEN (r * n_x * 1000000) // n_xa ELSE 0 END) AS BIGINT)
             AS ips_value_scaled,
           CAST(SUM(CASE WHEN n_xa IS NOT NULL AND a = pi_a
                    THEN r ELSE 0 END) AS BIGINT) AS matched_reward
    FROM ev
    """,
)
def ips_policy_value_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy IPS evaluation (operators/ml.py ips_policy_value —
    Horvitz-Thompson '52 / Li et al. WSDM'11): what would the
    argmax-mean-value policy (context = day-of-week) have earned on
    the logged event stream? Propensities and the target policy train
    on the first 80% of the OBSERVED time range (data-anchored
    bounds — the walk-forward rule), evaluation on the rest; per-row
    IPS terms floored at ppm then exactly summed; day-of-week via
    pure integer epoch arithmetic (epoch_us div 86.4e9 mod 7, the
    CLAUDE.md epoch rule — identical both engines)."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )
    from dpe_energy_performance_analysis_etl_spark.operators.ml import ips_policy_value

    ev = read_events(spark, sf_dir)
    base = ev.select(
        epoch_micros(F.col("ts")).alias("eus"),
        F.col("event_type").alias("a"),
        F.expr("CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT)").alias("r"),
    ).selectExpr("(eus div 86400000000) % 7 AS x", "a", "r", "eus")
    bounds = base.agg(F.min("eus").alias("e0"), F.max("eus").alias("e1"))
    flagged = base.crossJoin(F.broadcast(bounds)).withColumn(
        "sp",
        (
            (F.col("eus") - F.col("e0")) * 5 >= (F.col("e1") - F.col("e0")) * 4
        ).cast("int"),
    )
    return ips_policy_value(flagged, "x", "a", "r", "sp")


@register(
    "ratio_to_parent_revenue",
    """
    WITH leaf AS MATERIALIZED (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS total
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ), p AS MATERIALIZED (
      SELECT region, nation, total,
             CAST(SUM(total) OVER (PARTITION BY region) AS BIGINT) AS p1,
             CAST(SUM(total) OVER () AS BIGINT) AS pt
      FROM leaf
    )
    SELECT region, nation, total,
           CAST((total * 1000000) // p1 AS BIGINT) AS share_of_region_ppm,
           CAST((total * 1000000) // pt AS BIGINT) AS share_of_total_ppm
    FROM p
    """,
)
def ratio_to_parent_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent OLAP measure (operators/aggregate.py
    ratio_to_parent — the MDX RatioToParent): nation revenue (exact
    cents) as an integer-ppm share of its region and of the world.
    Leaf aggregation once; parent sums are windows over the BOUNDED
    leaf table (25 nations); dimension joins broadcast."""
    from dpe_energy_performance_analysis_etl_spark.operators.aggregate import (
        ratio_to_parent,
    )

    t = load_tables(spark, sf_dir, ["orders", "customer", "nation", "region"])
    base = (
        t["orders"]
        .join(t["customer"], t["orders"]["o_custkey"] == t["customer"]["c_custkey"])
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"]),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    return ratio_to_parent(base, ["region", "nation"], "cents")


@register(
    "rfm_segments_customers",
    """
    WITH per AS MATERIALIZED (
      SELECT o_custkey AS c_custkey,
             CAST(MAX(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000)
                  AS BIGINT) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS total_amount
      FROM orders GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT *,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(row_number() OVER (ORDER BY last_day, c_custkey) AS BIGINT) AS rr,
             CAST(row_number() OVER (ORDER BY n_orders, c_custkey) AS BIGINT) AS rf,
             CAST(row_number() OVER (ORDER BY total_amount, c_custkey) AS BIGINT) AS rm
      FROM per
    ), scored AS (
      SELECT c_custkey, last_day, n_orders, total_amount,
             CAST(((rr - 1) * 5) // n + 1 AS BIGINT) AS r_score,
             CAST(((rf - 1) * 5) // n + 1 AS BIGINT) AS f_score,
             CAST(((rm - 1) * 5) // n + 1 AS BIGINT) AS m_score
      FROM ranked
    )
    SELECT r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(total_amount) AS BIGINT) AS segment_amount
    FROM scored GROUP BY 1, 2, 3, 4
    """,
)
def rfm_segments_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation (operators/aggregate.py rfm_segments
    — Hughes '94), aggregated to segment counts and value so the
    output is bounded (<=125 rows at any SF): recency = last order
    day (integer epoch days — the CLAUDE.md epoch rule), scores via
    exact rank buckets ((rank-1)*5 div n + 1 under a deterministic
    (metric, key) order — NTILE's tie placement is not pinned by the
    standard). Per-customer table is the one data-sized aggregation;
    rank windows run over it once."""
    from dpe_energy_performance_analysis_etl_spark.operators.aggregate import (
        rfm_segments,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        "o_custkey",
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"
        ).alias("oday"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    seg = rfm_segments(base, "o_custkey", "oday", "cents", n_bins=5)
    return (
        seg.groupBy("r_score", "f_score", "m_score", "rfm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("total_amount").cast("bigint").alias("segment_amount"),
        )
    )


@register(
    "xyz_volatility_brands",
    """
    WITH per AS MATERIALIZED (
      SELECT p.p_brand AS k,
             date_diff('month', DATE '1992-01-01', CAST(l.l_shipdate AS DATE)) AS p,
             CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), stats AS MATERIALIZED (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s,
             SUM(CAST(y AS HUGEINT) * y) AS ss
      FROM per GROUP BY 1
    )
    SELECT k, n AS n_periods, s AS total_amount,
           CAST(CASE WHEN s > 0 THEN
             ((CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
              * 1000000000000) // (CAST(s AS HUGEINT) * s)
           ELSE -1 END AS BIGINT) AS cv2_ppm2,
           CASE WHEN (CASE WHEN s > 0 THEN
             ((CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
              * 1000000000000) // (CAST(s AS HUGEINT) * s)
           ELSE -1 END) < 0 THEN 'Z'
           WHEN (CASE WHEN s > 0 THEN
             ((CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
              * 1000000000000) // (CAST(s AS HUGEINT) * s)
           ELSE -1 END) < 250000000000 THEN 'X'
           WHEN (CASE WHEN s > 0 THEN
             ((CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
              * 1000000000000) // (CAST(s AS HUGEINT) * s)
           ELSE -1 END) <= 1000000000000 THEN 'Y'
           ELSE 'Z' END AS xyz
    FROM stats
    """,
)
def xyz_volatility_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-volatility classification per brand
    (operators/aggregate.py xyz_volatility — the forecastability
    companion to abc_classification_brands): coefficient of variation
    of monthly shipped quantity, compared CROSS-MULTIPLIED AND
    SQUARED so no sqrt or float division ever runs (cv2_ppm2 =
    exact (cv*10^6)^2 via DECIMAL(38)/HUGEINT). X < 0.5, Y <= 1.0,
    else Z."""
    from dpe_energy_performance_analysis_etl_spark.operators.aggregate import (
        xyz_volatility,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    base = li.join(pt, li["l_partkey"] == pt["p_partkey"]).select(
        F.col("p_brand").alias("b"),
        F.months_between(
            F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("m"),
        F.expr("CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "q"
        ),
    )
    return xyz_volatility(base, "b", "m", "q").withColumnRenamed("k", "k")


@register(
    "rolling_corr_revenue_qty",
    """
    WITH tiers AS MATERIALIZED (
      SELECT date_diff('month', DATE '1992-01-01',
                       CAST(l_shipdate AS DATE)) AS t,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS HUGEINT) AS x,
             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS HUGEINT) AS y
      FROM lineitem GROUP BY 1
    ), agg AS MATERIALIZED (
      SELECT t,
             COUNT(*) OVER w AS n,
             SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
             SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy,
             SUM(x * y) OVER w AS sxy
      FROM tiers
      WINDOW w AS (ORDER BY t ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(t AS BIGINT) AS t, CAST(12 AS BIGINT) AS n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           ELSE CAST(NULL AS DOUBLE) END AS corr
    FROM agg WHERE n = 12
    """,
)
def rolling_corr_revenue_qty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-month trailing Pearson correlation between monthly revenue
    and monthly shipped quantity (operators/temporal.py rolling_corr):
    co-moments as exact DECIMAL(38)/HUGEINT integers inside the ROWS
    window over the bounded month-tier table; corr is exactly three
    IEEE ops (divide, two correctly-rounded sqrts) from
    exactly-rounded casts of identical integers — the NOTES
    float-parity recipe."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import rolling_corr

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.select(
        F.months_between(
            F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("m"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "xc"
        ),
        F.expr("CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100 AS BIGINT)").alias("yc"),
    )
    return rolling_corr(base, "m", "xc", "yc", window=12)


@register(
    "seasonal_outliers_revenue",
    """
    WITH tiers AS MATERIALIZED (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), ma AS MATERIALIZED (
      SELECT t, y, COUNT(*) OVER w AS wn, CAST(SUM(y) OVER w AS BIGINT) AS ws
      FROM tiers
      WINDOW w AS (ORDER BY t ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)
    ), detr AS MATERIALIZED (
      SELECT t, y, CAST(y * 1000 - (ws * 1000) // 12 AS BIGINT)
               AS detrended_scaled
      FROM ma WHERE wn = 12
    ), seas_r AS MATERIALIZED (
      SELECT t, detrended_scaled,
             row_number() OVER (PARTITION BY t % 12
               ORDER BY detrended_scaled, t) AS rk,
             COUNT(*) OVER (PARTITION BY t % 12) AS cnt
      FROM detr
    ), med AS MATERIALIZED (
      SELECT t % 12 AS phase, detrended_scaled AS seasonal_scaled
      FROM seas_r WHERE rk = (cnt + 1) // 2
    ), rem AS MATERIALIZED (
      SELECT d.t, d.y,
             CAST(d.detrended_scaled - m.seasonal_scaled AS BIGINT)
               AS remainder_scaled
      FROM detr d JOIN med m ON d.t % 12 = m.phase
    ), c_r AS MATERIALIZED (
      SELECT *, row_number() OVER (ORDER BY remainder_scaled, t) AS rk,
             COUNT(*) OVER () AS cnt
      FROM rem
    ), center AS MATERIALIZED (
      SELECT remainder_scaled AS center_scaled FROM c_r
      WHERE rk = (cnt + 1) // 2
    ), devs AS MATERIALIZED (
      SELECT r.t, r.y, r.remainder_scaled, c.center_scaled,
             CAST(abs(r.remainder_scaled - c.center_scaled) AS BIGINT)
               AS dev_scaled
      FROM rem r, center c
    ), d_r AS MATERIALIZED (
      SELECT *, row_number() OVER (ORDER BY dev_scaled, t) AS rk,
             COUNT(*) OVER () AS cnt
      FROM devs
    ), mad AS MATERIALIZED (
      SELECT dev_scaled AS mad_scaled FROM d_r WHERE rk = (cnt + 1) // 2
    )
    SELECT d.t, d.y, d.remainder_scaled, d.center_scaled, m.mad_scaled,
           d.dev_scaled,
           CAST(CASE WHEN d.dev_scaled > 5 * m.mad_scaled THEN 1 ELSE 0 END
                AS BIGINT) AS is_outlier
    FROM devs d, mad m
    ORDER BY d.dev_scaled DESC, d.t LIMIT 5
    """,
)
def seasonal_outliers_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-adjusted anomaly audit of monthly revenue
    (operators/temporal.py seasonal_outliers): remove the 12-month MA
    trend and the per-calendar-month median seasonal, then rank
    months by |remainder - median| against a 5-MAD fence — top-5
    margins with an is_outlier flag (a bare violations filter is
    0-row on well-behaved data and checks nothing). Median and MAD
    are exact order statistics over the bounded interior-month
    table."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        seasonal_outliers,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("m"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    return seasonal_outliers(monthly, "m", "cents", period=12, k_mad=5, top_n=5)


# =====================================================================
# Round 8, wave 3: windowed funnel, SQL lateral top-k, weighted
# median, Croston intermittent demand, cumulative gains
# =====================================================================

@register(
    "window_funnel_events",
    """
    WITH base AS MATERIALIZED (
      SELECT user_id AS u, epoch_us(ts) AS t, event_id AS eid,
             CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2
                  WHEN 'purchase' THEN 3 END AS s
      FROM events
      WHERE event_type IN ('signup', 'view', 'purchase')
    ), arr AS MATERIALIZED (
      SELECT u, list([t, s] ORDER BY t, eid) AS seq FROM base GROUP BY u
    ), folded AS MATERIALIZED (
      SELECT u, list_reduce(
        list_prepend([CAST(-1 AS BIGINT), -1, -1],
                     list_transform(seq, e -> e)),
        (acc, el) -> list_transform(range(1, 4), k -> CASE
          WHEN k = 1 AND el[2] = 1 THEN greatest(acc[1], el[1])
          WHEN k > 1 AND el[2] = k AND acc[k - 1] >= 0
           AND el[1] - acc[k - 1] <= 2592000000000
          THEN greatest(acc[k], acc[k - 1])
          ELSE acc[k] END)
      ) AS anchors
      FROM arr
    ), depths AS MATERIALIZED (
      SELECT u, CAST(len(list_filter(anchors, a -> a >= 0)) AS BIGINT) AS depth
      FROM folded
    ), grid AS (SELECT unnest(range(0, 4)) AS depth)
    SELECT CAST(grid.depth AS BIGINT) AS depth,
           CAST(COALESCE(COUNT(depths.u), 0) AS BIGINT) AS n_users
    FROM grid LEFT JOIN depths ON grid.depth = depths.depth
    GROUP BY 1
    """,
)
def window_funnel_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-style windowed funnel (operators/temporal.py
    window_funnel): deepest signup -> view -> purchase prefix
    completed in order with every step within 30 days of the chain's
    first step — the time-bounded semantics funnel_stages' unordered
    min-ts cascade cannot express. Exact anchor DP folded over each
    user's sorted step events (state = latest feasible chain start
    per level, which dominates); one user-keyed shuffle; output is
    the bounded depth histogram with zero-fill."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        window_funnel,
    )

    return window_funnel(
        read_events(spark, sf_dir),
        steps=["signup", "view", "purchase"],
        window_us=2_592_000_000_000,
    )


@register(
    "lateral_topk_orders",
    """
    SELECT c.c_custkey,
           t.o_orderkey,
           CAST(CAST(t.o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
             AS price_cents
    FROM customer c,
         LATERAL (
           SELECT o_orderkey, o_totalprice
           FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           LIMIT 3
         ) t
    WHERE c.c_nationkey = 7
    """,
)
def lateral_topk_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery top-k — the SQL-surface twin of
    topk_per_group: for each nation-7 customer, their three largest
    orders, written as a lateral per-row subquery (the form BI tools
    emit) and executed through spark.sql. Catalyst decorrelates the
    limit-per-key subquery into the same window/rank plan the
    DataFrame topk uses — the point of the entry is that the SQL
    front door accepts and plans the idiom."""
    register_tables(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c.c_custkey,
               t.o_orderkey,
               CAST(CAST(t.o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
                 AS price_cents
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 3
        ) t
        WHERE c.c_nationkey = 7
        """
    )


@register(
    "weighted_median_price_brand",
    """
    WITH vals AS MATERIALIZED (
      SELECT p.p_brand AS g,
             CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS w
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), pre AS MATERIALIZED (
      SELECT g, v, w,
             CAST(COALESCE(SUM(w) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS w_before,
             CAST(SUM(w) OVER (PARTITION BY g) AS BIGINT) AS w_total
      FROM vals
    )
    SELECT g AS p_brand, w_total,
           CAST(MIN(v) AS BIGINT) AS weighted_median
    FROM pre WHERE (w_before + w) * 2 >= w_total
    GROUP BY 1, 2
    """,
)
def weighted_median_price_brand_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted low-median line price per brand
    (operators/quantiles.py grouped_weighted_median): smallest price
    whose inclusive cumulative quantity reaches half the brand's
    total — an exact order statistic, skew-safe via the
    grouped_running_totals range-partition recipe (the oracle's
    PARTITION BY window is fine at sf0.01; the Spark plan avoids the
    one-executor-per-group sort at scale)."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_weighted_median,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    base = li.join(pt, li["l_partkey"] == pt["p_partkey"]).select(
        F.col("p_brand").alias("b"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "price"
        ),
        F.expr("CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "qty"
        ),
    )
    return grouped_weighted_median(base, "b", "price", "qty").withColumnRenamed(
        "b", "p_brand"
    )


@register(
    "croston_intermittent_parts",
    """
    WITH tiers AS MATERIALIZED (
      SELECT l.l_partkey AS k,
             CAST(date_diff('month', DATE '1992-01-01',
                            CAST(l.l_shipdate AS DATE)) AS BIGINT) AS p,
             CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM lineitem l JOIN part pt ON l.l_partkey = pt.p_partkey
      WHERE pt.p_brand = 'Brand#13'
      GROUP BY 1, 2 HAVING SUM(CAST(CAST(l.l_quantity AS DECIMAL(30,2)) * 100
                                    AS BIGINT)) > 0
    ), arr AS MATERIALIZED (
      SELECT k, list([p, y] ORDER BY p) AS seq FROM tiers GROUP BY k
    ), folded AS MATERIALIZED (
      SELECT k, list_reduce(
        list_prepend([CAST(0 AS BIGINT), -1, 0, 0], seq),
        (acc, e) -> CASE
          WHEN acc[4] = 0 THEN [e[2], CAST(-1 AS BIGINT), e[1], CAST(1 AS BIGINT)]
          WHEN acc[4] = 1 THEN [(acc[1] + e[2]) // 2, e[1] - acc[3], e[1],
                                CAST(2 AS BIGINT)]
          ELSE [(acc[1] + e[2]) // 2, (acc[2] + (e[1] - acc[3])) // 2, e[1],
                acc[4] + 1] END
      ) AS st
      FROM arr
    )
    SELECT k AS l_partkey, CAST(st[4] AS BIGINT) AS n_demands,
           CAST(st[1] AS BIGINT) AS z_smoothed,
           CAST(st[2] AS BIGINT) AS p_smoothed,
           CAST((st[1] * 1000000) // greatest(st[2], 1) AS BIGINT) AS rate_ppm
    FROM folded WHERE st[4] >= 2
    """,
)
def croston_intermittent_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand forecast per Brand#13 part
    (operators/temporal.py croston_intermittent — Croston 1972, the
    standard for sparse/lumpy demand where zero-filled smoothing
    biases low): demand sizes and inter-demand intervals smoothed
    SEPARATELY with dyadic alpha = 1/2 (integer (a+x) div 2 folds —
    the holt discipline), rate = z/p as exact ppm. Fold over each
    part's bounded month-tier array; one (part, month) aggregation is
    the data-sized pass."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        croston_intermittent,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    base = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .where(F.col("p_brand") == "Brand#13")
        .select(
            F.col("l_partkey").alias("k"),
            F.months_between(
                F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            .cast("bigint")
            .alias("m"),
            F.expr("CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
                "q"
            ),
        )
    )
    return croston_intermittent(base, "k", "m", "q").withColumnRenamed(
        "k", "l_partkey"
    )


@register(
    "cumulative_gains_priority",
    """
    WITH ranked AS MATERIALIZED (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
               AS rn,
             COUNT(*) OVER () AS n
      FROM orders
    ), per AS MATERIALIZED (
      SELECT ((rn - 1) * 10) // n + 1 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(y) AS BIGINT) AS positives
      FROM ranked GROUP BY 1
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, n_rows, positives,
           CAST(SUM(positives) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_positives,
           CAST((SUM(positives) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000)
             // greatest(SUM(positives) OVER (), 1) AS BIGINT) AS gain_ppm
    FROM per
    """,
)
def cumulative_gains_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table (operators/quantiles.py
    cumulative_gains): rank orders by value descending, cut into ten
    exact rank buckets, report the cumulative share of URGENT/HIGH
    orders each prefix captures — the campaign-targeting eval chart.
    Global ranks via the two-pass repartitionByRange recipe (the
    oracle's unpartitioned window is fine at sf0.01; at scale it is
    the one-partition trap the recipe exists to avoid)."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        cumulative_gains,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "score"
        ),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("y"),
        F.col("o_orderkey").alias("tb"),
    )
    return cumulative_gains(base, "score", "y", "tb", n_buckets=10)


# =====================================================================
# Round 8, wave 4: exact sliding distinct (DAU/MAU), Z-order layout
# key, Zipf rank-ratio descriptor
# =====================================================================

@register(
    "dau_mau_stickiness_events",
    """
    WITH ud AS MATERIALIZED (
      SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS d
      FROM events
    ), dau AS MATERIALIZED (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1
    ), marked AS MATERIALIZED (
      SELECT u, d,
             CASE WHEN lag(d) OVER (PARTITION BY u ORDER BY d) IS NULL
                    OR d - lag(d) OVER (PARTITION BY u ORDER BY d) > 30
                  THEN 1 ELSE 0 END AS is_start
      FROM ud
    ), grp AS MATERIALIZED (
      SELECT u, d, SUM(is_start) OVER (PARTITION BY u ORDER BY d
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
      FROM marked
    ), intervals AS MATERIALIZED (
      SELECT u, g, MIN(d) AS s, MAX(d) + 30 AS e1 FROM grp GROUP BY 1, 2
    ), deltas AS MATERIALIZED (
      SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM (
        SELECT s AS d, 1 AS delta FROM intervals
        UNION ALL SELECT e1 AS d, -1 AS delta FROM intervals
      ) GROUP BY 1
    ), bounds AS MATERIALIZED (
      SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ud
    ), grid AS MATERIALIZED (
      SELECT unnest(range(d0, d1 + 1)) AS day FROM bounds
    ), mau AS MATERIALIZED (
      SELECT grid.day,
             CAST(SUM(COALESCE(deltas.net, 0)) OVER (ORDER BY grid.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS mau
      FROM grid LEFT JOIN deltas ON grid.day = deltas.d
    )
    SELECT CAST(mau.day AS BIGINT) AS day,
           CAST(COALESCE(dau.dau, 0) AS BIGINT) AS dau,
           mau.mau,
           CAST((COALESCE(dau.dau, 0) * 1000000) // greatest(mau.mau, 1)
                AS BIGINT) AS stickiness_ppm
    FROM mau LEFT JOIN dau ON mau.day = dau.d
    """,
)
def dau_mau_stickiness_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / exact 30-day trailing MAU / stickiness per day
    (operators/temporal.py sliding_distinct_daily): the boundary-diff
    algorithm — merge each user's active days into coverage
    intervals, emit +1/-1 boundary deltas, prefix-sum over the day
    grid — so the exact sliding DISTINCT never re-counts users per
    day (a naive exact MAU is 365 full-data distincts a year; this is
    one (user, day) dedup + one per-user lag pass + bounded-table
    arithmetic)."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        sliding_distinct_daily,
    )

    return sliding_distinct_daily(read_events(spark, sf_dir), window_days=30)


@register(
    "zorder_locality_customers",
    """
    WITH bal AS MATERIALIZED (
      SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS a,
             CAST(CAST(c_acctbal AS DECIMAL(30,2)) * 100 AS BIGINT) AS bal_c
      FROM customer
    ), bounds AS MATERIALIZED (
      SELECT MIN(bal_c) AS lo, MAX(bal_c) AS hi FROM bal
    ), coded AS MATERIALIZED (
      SELECT a, ((bal_c - lo) * 64) // (hi - lo + 1) AS b
      FROM bal, bounds
    ), zed AS MATERIALIZED (
      SELECT a, b,
        ((a >> 0) & 1) * 1 + ((b >> 0) & 1) * 2
        + ((a >> 1) & 1) * 4 + ((b >> 1) & 1) * 8
        + ((a >> 2) & 1) * 16 + ((b >> 2) & 1) * 32
        + ((a >> 3) & 1) * 64 + ((b >> 3) & 1) * 128
        + ((a >> 4) & 1) * 256 + ((b >> 4) & 1) * 512
        + ((a >> 5) & 1) * 1024 + ((b >> 5) & 1) * 2048 AS z
      FROM coded
    )
    SELECT CAST(z // 64 AS BIGINT) AS z_prefix,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(a) AS BIGINT) AS min_nation,
           CAST(MAX(a) AS BIGINT) AS max_nation,
           CAST(MIN(b) AS BIGINT) AS min_balbucket,
           CAST(MAX(b) AS BIGINT) AS max_balbucket
    FROM zed GROUP BY 1
    """,
)
def zorder_locality_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (nation, balance-bucket)
    (operators/temporal.py zorder_key — the Delta/Iceberg Z-ORDER BY
    primitive): interleave the bits of two 6-bit codes so a sort by z
    keeps rows adjacent in BOTH dimensions; each 64-row z-prefix's
    bounding box stays a small quadrant (the per-file min/max stats a
    multi-predicate scan prunes on). Balance bucketed equi-width over
    the OBSERVED range in exact cents (data-anchored); pure codegen
    bit arithmetic, identical in SQL."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import zorder_key

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    bal = c.select(
        F.col("c_nationkey").cast("bigint").alias("a"),
        F.expr("CAST(CAST(c_acctbal AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "bal_c"
        ),
    )
    bounds = bal.agg(F.min("bal_c").alias("lo"), F.max("bal_c").alias("hi"))
    coded = bal.crossJoin(F.broadcast(bounds)).selectExpr(
        "a", "((bal_c - lo) * 64) div (hi - lo + 1) AS b"
    )
    zed = coded.withColumn("z", zorder_key(F.col("a"), F.col("b"), bits=6))
    return zed.selectExpr(
        "z div 64 AS z_prefix", "a", "b"
    ).groupBy("z_prefix").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("a").cast("bigint").alias("min_nation"),
        F.max("a").cast("bigint").alias("max_nation"),
        F.min("b").cast("bigint").alias("min_balbucket"),
        F.max("b").cast("bigint").alias("max_balbucket"),
    ).withColumn("z_prefix", F.col("z_prefix").cast("bigint"))


@register(
    "zipf_ratio_tokens",
    """
    WITH vocab AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents
      ) GROUP BY 1
    ), top AS MATERIALIZED (
      SELECT w, freq, row_number() OVER (ORDER BY freq DESC, w) AS rank
      FROM vocab ORDER BY freq DESC, w LIMIT 128
    ), f1 AS (SELECT MAX(freq) AS f1 FROM top)
    SELECT CAST(rank AS BIGINT) AS rank, w AS token, freq,
           CAST((f1.f1 * 1000000) // freq AS BIGINT) AS f1_ratio_ppm
    FROM top, f1
    """,
)
def zipf_ratio_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency descriptor of the corpus vocabulary: the
    top-128 tokens with the exact integer ratio f(1)/f(rank) in ppm —
    the log-free diagnostic for "is this corpus Zipfian" (ratio ~rank
    means alpha ~1; ratios collapsing toward 1 flag boilerplate
    repetition). One vocabulary aggregation, one bounded top-k sort,
    windows over the 128-row head only."""
    docs = read_documents(spark, sf_dir)
    from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr

    vocab = (
        docs.select(F.explode(tokens_expr("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    top = vocab.orderBy(F.col("freq").desc(), F.col("w").asc()).limit(128)
    w = Window.orderBy(F.col("freq").desc(), F.col("w").asc())
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        F.col("w").alias("token"),
        "freq",
        F.max("freq").over(w_all).alias("_f1"),
    ).selectExpr(
        "rank", "token", "freq",
        "CAST((_f1 * 1000000) div freq AS BIGINT) AS f1_ratio_ppm",
    )


# =====================================================================
# Round 8, wave 5: trimmed mean, top-k WITH TIES
# =====================================================================

@register(
    "trimmed_mean_price_brand",
    """
    WITH ranked AS MATERIALIZED (
      SELECT p.p_brand AS g,
             CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             row_number() OVER (PARTITION BY p.p_brand
               ORDER BY CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                             AS BIGINT)) AS rk,
             COUNT(*) OVER (PARTITION BY p.p_brand) AS n
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT g AS p_brand, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX((n * 100000) // 1000000) AS BIGINT) AS n_trimmed_each_side,
           CAST((SUM(v) * 1000) // COUNT(*) AS BIGINT) AS trimmed_mean_scaled
    FROM ranked
    WHERE rk > (n * 100000) // 1000000
      AND rk <= n - (n * 100000) // 1000000
    GROUP BY 1
    """,
)
def trimmed_mean_price_brand_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean line price per brand
    (operators/quantiles.py grouped_trimmed_mean): drop the exact
    floor(n/10) lowest- and highest-ranked rows per brand and average
    the rest in exact cents — the robust center that still uses the
    retained mass. Ranks ride the range-partition recipe (the
    oracle's PARTITION BY window is the sf0.01 shortcut; the Spark
    plan never sorts a data-sized group on one executor); the mean
    floors once at milli-cents."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_trimmed_mean,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    # EXPLICIT broadcast of the 2-column dim projection: the trimmed
    # mean's histprune path re-scans its feed (by design — cheaper
    # than pinning, measured r9), so the feed must be a broadcast
    # probe, not a shuffle join re-executed per pass
    base = li.join(
        pt.select("p_partkey", "p_brand"),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(
        F.col("p_brand").alias("b"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "price"
        ),
    )
    return grouped_trimmed_mean(
        base, "b", "price", trim_ppm=100_000, scale=1000
    ).withColumnRenamed("b", "p_brand")


@register(
    "topk_with_ties_quantity",
    """
    WITH per AS MATERIALIZED (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), r AS (
      SELECT l_returnflag, qty, cnt,
             rank() OVER (PARTITION BY l_returnflag ORDER BY cnt DESC) AS rnk
      FROM per
    )
    SELECT l_returnflag, CAST(qty AS BIGINT) AS qty, cnt,
           CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 2
    """,
)
def topk_with_ties_quantity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES (the `FETCH FIRST k ROWS WITH TIES` / RANK()
    idiom the row_number-based topk_per_group cannot express): the
    two most frequent quantity values per return flag, keeping EVERY
    value tied with the k-th — RANK over the bounded (flag, quantity)
    aggregate (quantities are a small integer domain, so ties are
    real). Window runs over the aggregated table, never raw rows."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per = li.groupBy(
        "l_returnflag", F.expr("CAST(l_quantity AS BIGINT)").alias("qty")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(F.col("cnt").desc())
    return (
        per.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .where(F.col("rnk") <= 2)
        .select("l_returnflag", F.col("qty").cast("bigint").alias("qty"), "cnt", "rnk")
    )


# =====================================================================
# Round 8, wave 6: referential-integrity audit
# =====================================================================

_RI_ARMS = []
for _child, _fk, _parent, _pk, _name in [
    ("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem->orders"),
    ("lineitem", "l_partkey", "part", "p_partkey", "lineitem->part"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey", "lineitem->supplier"),
    ("orders", "o_custkey", "customer", "c_custkey", "orders->customer"),
    ("customer", "c_nationkey", "nation", "n_nationkey", "customer->nation"),
    ("supplier", "s_nationkey", "nation", "n_nationkey", "supplier->nation"),
    ("nation", "n_regionkey", "region", "r_regionkey", "nation->region"),
]:
    _RI_ARMS.append(f"""      SELECT '{_name}' AS edge,
        CAST((SELECT COUNT(*) FROM {_child}) AS BIGINT) AS n_child,
        CAST((SELECT count_if({_fk} IS NULL) FROM {_child}) AS BIGINT)
          AS n_null_fk,
        CAST((SELECT COUNT(*) FROM {_child} ch
              WHERE ch.{_fk} IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM {_parent} pa
                                WHERE pa.{_pk} = ch.{_fk})) AS BIGINT)
          AS n_orphans,
        CAST((SELECT COUNT(DISTINCT {_fk}) FROM {_child}) AS BIGINT)
          AS n_distinct_fk,
        CAST((SELECT COUNT(*) FROM {_parent}) AS BIGINT) AS n_parent""")
_RI_SQL = (
    "\n    WITH arms AS (\n"
    + "\n      UNION ALL\n".join(_RI_ARMS)
    + """
    )
    SELECT edge, n_child, n_null_fk, n_orphans,
           CAST((n_orphans * 1000000) // greatest(n_child - n_null_fk, 1)
                AS BIGINT) AS orphan_ppm,
           n_distinct_fk, n_parent,
           CAST((n_distinct_fk * 1000000) // greatest(n_parent, 1) AS BIGINT)
             AS fk_coverage_ppm
    FROM arms
    """
)


@register("ri_audit_star_schema", _RI_SQL)
def ri_audit_star_schema_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over all seven FK edges of the
    star schema (operators/quality.py referential_integrity_audit):
    orphan counts/rates via LEFT ANTI joins (the exact complement of
    the joins every TPC-H query assumes are lossless), NULL-fk
    excusal, and distinct-fk-to-parent coverage — the data contract
    that catches a broken ingest before a silent inner join drops
    rows. One bounded row per edge."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        referential_integrity_audit,
    )

    t = load_tables(
        spark, sf_dir,
        ["lineitem", "orders", "part", "supplier", "customer", "nation", "region"],
    )
    return referential_integrity_audit([
        (t["lineitem"], "l_orderkey", t["orders"], "o_orderkey", "lineitem->orders"),
        (t["lineitem"], "l_partkey", t["part"], "p_partkey", "lineitem->part"),
        (t["lineitem"], "l_suppkey", t["supplier"], "s_suppkey", "lineitem->supplier"),
        (t["orders"], "o_custkey", t["customer"], "c_custkey", "orders->customer"),
        (t["customer"], "c_nationkey", t["nation"], "n_nationkey", "customer->nation"),
        (t["supplier"], "s_nationkey", t["nation"], "n_nationkey", "supplier->nation"),
        (t["nation"], "n_regionkey", t["region"], "r_regionkey", "nation->region"),
    ])


# =====================================================================
# Round 9, wave 1: KS two-sample drift test, deterministic mode,
# OHLC candles, cumulative-unique curve, Good-Turing smoothing,
# candidate-key discovery, spend drawdown, view->purchase conversion
# window, soundex blocking
# =====================================================================

@register(
    "ks_test_status_priority",
    """
    WITH t AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(count_if(substr(o_orderpriority, 1, 1) IN ('1', '2'))
                  AS BIGINT) AS cnt1
      FROM orders GROUP BY 1, 2
    ), c AS MATERIALIZED (
      SELECT g,
             CAST(SUM(cnt) OVER w AS BIGINT) AS cum,
             CAST(SUM(cnt1) OVER w AS BIGINT) AS cum1
      FROM t
      WINDOW w AS (PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), tot AS MATERIALIZED (
      SELECT g, CAST(MAX(cum) AS BIGINT) AS n, CAST(MAX(cum1) AS BIGINT) AS n1
      FROM c GROUP BY 1
    )
    SELECT c.g AS o_orderstatus, tot.n1 AS n1,
           CAST(tot.n - tot.n1 AS BIGINT) AS n2,
           CASE WHEN tot.n1 > 0 AND tot.n > tot.n1 THEN
             CAST(MAX(abs(c.cum1 * tot.n - c.cum * tot.n1)) * 1000000
                  // (tot.n1 * (tot.n - tot.n1)) AS BIGINT)
           END AS d_scaled
    FROM c JOIN tot ON c.g = tot.g
    GROUP BY c.g, tot.n, tot.n1
    """,
)
def ks_test_status_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D per order status
    (operators/stats.py ks_two_sample — Smirnov 1948): does the
    order-value DISTRIBUTION differ between urgent/high-priority
    orders and the rest? The drift gate that sees shape changes a
    mean test misses. D is one exact cross-multiplied integer max
    (|cum1*n − cum*n1| over value tiers) and one truncating division
    — bit-portable; prefix sums ride the grouped_running_totals
    range-partition recipe (the oracle's PARTITION BY window is the
    sf0.01 shortcut)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        ks_two_sample,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        "o_orderstatus",
        F.substring("o_orderpriority", 1, 1).isin("1", "2").cast("int").alias(
            "urgent"
        ),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    return ks_two_sample(base, "o_orderstatus", "urgent", "cents")


@register(
    "mode_priority_by_status",
    """
    WITH c AS MATERIALIZED (
      SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    ), r AS MATERIALIZED (
      SELECT *,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY cnt DESC, o_orderpriority) AS rhi,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY cnt ASC, o_orderpriority) AS rlo
      FROM c
    )
    SELECT o_orderstatus,
           MAX(CASE WHEN rhi = 1 THEN o_orderpriority END) AS mode_priority,
           CAST(MAX(CASE WHEN rhi = 1 THEN cnt END) AS BIGINT) AS mode_count,
           MAX(CASE WHEN rlo = 1 THEN o_orderpriority END) AS least_priority,
           CAST(MAX(CASE WHEN rlo = 1 THEN cnt END) AS BIGINT) AS least_count
    FROM r GROUP BY 1
    """,
)
def mode_priority_by_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group MODE (and anti-mode): most/least common
    order priority per order status with a total (count DESC, value
    ASC) tie-break — the categorical summary statistic SQL lacks
    natively. Spark plans it as one (group, value) count plus a
    bounded min-of-struct aggregation — no window over data-sized
    partitions; the oracle's row_number windows run over the BOUNDED
    count table only."""
    li = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cnts = li.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # min of (−cnt, value) struct = (max count, then smallest value);
    # min of (cnt, value) struct = (min count, then smallest value)
    return (
        cnts.groupBy("o_orderstatus")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("nc"),
                    F.col("o_orderpriority").alias("m"),
                )
            ).alias("hi"),
            F.min(
                F.struct(
                    F.col("cnt").alias("c"),
                    F.col("o_orderpriority").alias("m"),
                )
            ).alias("lo"),
        )
        .select(
            "o_orderstatus",
            F.col("hi.m").alias("mode_priority"),
            (-F.col("hi.nc")).cast("bigint").alias("mode_count"),
            F.col("lo.m").alias("least_priority"),
            F.col("lo.c").cast("bigint").alias("least_count"),
        )
    )
