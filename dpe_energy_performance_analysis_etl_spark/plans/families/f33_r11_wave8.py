"""Round 11, wave 8: survival RMST + contingency/variance depth —
restricted mean survival time (quantized Kaplan-Meier fold), Kendall
tau-c, the chi-square association suite (bias-corrected Cramer's V /
Tschuprow's T / contingency C), Stuart-Maxwell marginal homogeneity,
Cochran's C + Hartley's Fmax variance-outlier pair, distribution-free
median CI.

Shared exactness recipe: the KM survival curve is an ORDERED integer
fold — per-step floor at ppm scale over the (t, n, d) event-tier
array, Spark ``aggregate`` and DuckDB ``list_reduce`` stepping the
same exact integers (DuckDB struct_pack lambdas evaluate fields
SEQUENTIALLY, so the area field must precede the survival update —
probed and pinned here); chi-square rides per-cell quantized integer
terms; variances are per-group quantized integers so max/sum/min
comparisons are exact; CI bounds are rank picks (order statistics,
no interpolation)."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.plans._core import (  # noqa: F401
    DataFrame,
    SparkSession,
    Window,
    F,
    QUERIES,
    ORACLE_SQL,
    register,
)


@register(
    "rmst_orders",
    """
    WITH subj AS MATERIALIZED (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
      FROM orders
    ), tiers AS MATERIALIZED (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS tot
      FROM subj GROUP BY 1
    ), ar AS MATERIALIZED (
      SELECT t, d,
             CAST(SUM(tot) OVER () - COALESCE(SUM(tot) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n,
             CAST(SUM(tot) OVER () AS BIGINT) AS n_subjects,
             CAST(MAX(t) OVER () AS BIGINT) AS tau
      FROM tiers
    ), folded AS MATERIALIZED (
      SELECT n_subjects, tau,
             list_reduce(
               list_prepend(
                 struct_pack(area := 0::BIGINT, s := 1000000::BIGINT,
                             prev := 0::BIGINT, n := 0::BIGINT,
                             d := 0::BIGINT, t := 0::BIGINT),
                 list(struct_pack(area := 0::BIGINT, s := 0::BIGINT,
                                  prev := 0::BIGINT, n := n, d := d, t := t)
                      ORDER BY t)
               ),
               (acc, x) -> struct_pack(
                 area := acc.area + acc.s * (x.t - acc.prev),
                 s := (acc.s * (x.n - x.d)) // x.n,
                 prev := x.t,
                 n := 0::BIGINT, d := 0::BIGINT, t := 0::BIGINT)
             ) AS st
      FROM ar WHERE d > 0
      GROUP BY n_subjects, tau
    )
    SELECT n_subjects, tau AS horizon_months,
           CAST(st.area + st.s * (tau - st.prev) AS BIGINT)
             AS rmst_micro_months
    FROM folded
    """,
)
def rmst_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time over the order cohort (Royston &
    Parmar 2013's model-free effect measure; same time/event coding
    as ``logrank_orders``/``life_table_orders``: t = months since
    1992-01, event = status F, others censored): RMST(tau) = the
    area under the Kaplan-Meier curve up to the last observed month —
    the "expected months open" number a duration analysis reports
    when medians are undefined.

    Exactness: S is an ordered integer fold with per-step flooring at
    ppm scale — s_k = (s_{k-1} * (n_k - d_k)) div n_k — and the area
    accumulates s * gap BEFORE each step's survival update; Spark
    ``aggregate`` and DuckDB ``list_reduce`` walk the same sorted
    (t, n, d) array (DuckDB struct lambdas evaluate fields in order,
    so area precedes s — probed). At-risk counts come from the
    logrank prefix recipe; all windows run over the month-grain tier
    table."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # exact month index since 1992-01 (months_between of
    # month-truncated dates is an exact integer — safe to cast;
    # mirrors DuckDB date_diff('month', ...))
    subj = o.selectExpr(
        "CAST(months_between(date_trunc('month', o_orderdate),"
        " DATE '1992-01-01') AS BIGINT) AS t",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev",
    )
    tiers = subj.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("tot"),
    )
    w = Window.orderBy("t")
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wpre = w.rowsBetween(Window.unboundedPreceding, -1)
    ar = tiers.select(
        "t",
        "d",
        (
            F.sum("tot").over(wall)
            - F.coalesce(F.sum("tot").over(wpre), F.lit(0))
        )
        .cast("bigint")
        .alias("n"),
        F.sum("tot").over(wall).cast("bigint").alias("n_subjects"),
        F.max("t").over(wall).cast("bigint").alias("tau"),
    )
    folded = (
        ar.where(F.col("d") > 0)
        .groupBy("n_subjects", "tau")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("t"), F.col("n"), F.col("d")))
            ).alias("steps")
        )
        .selectExpr(
            "n_subjects",
            "tau",
            "aggregate(steps,"
            " named_struct('area', 0L, 's', 1000000L, 'prev', 0L),"
            " (acc, x) -> named_struct("
            "   'area', acc.area + acc.s * (x.t - acc.prev),"
            "   's', (acc.s * (x.n - x.d)) div x.n,"
            "   'prev', x.t)) AS st",
        )
    )
    return folded.selectExpr(
        "n_subjects",
        "tau AS horizon_months",
        "CAST(st.area + st.s * (tau - st.prev) AS BIGINT) AS rmst_micro_months",
    )


@register(
    "kendall_tau_c_qty_priority",
    """
    WITH cells AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), pairs AS MATERIALIZED (
      SELECT
        SUM(CASE WHEN b.x > a.x AND b.y > a.y
                 THEN a.n::HUGEINT * b.n ELSE 0 END) AS c,
        SUM(CASE WHEN b.x > a.x AND b.y < a.y
                 THEN a.n::HUGEINT * b.n ELSE 0 END) AS d
      FROM cells a JOIN cells b ON (b.x > a.x)
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(LEAST(COUNT(DISTINCT x), COUNT(DISTINCT y)) AS BIGINT) AS m
      FROM cells
    )
    SELECT CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
           t.m AS m_min_dim,
           CAST(floor(1e6 *
             2e0 * CAST(t.m AS DOUBLE)
             * (CAST(p.c AS DOUBLE) - CAST(p.d AS DOUBLE))
             / (CAST(t.nn AS DOUBLE) * CAST(t.nn AS DOUBLE)
                * (CAST(t.m AS DOUBLE) - 1e0))) AS BIGINT) AS tau_c_ppm
    FROM pairs p, tot t
    """,
)
def kendall_tau_c_qty_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuart-Kendall tau-c between quantity and priority rank
    (Stuart 1953): the rectangular-table correction — tau-b
    (``kendall_tau_qty_price_brands``) under-ranges when the table is
    r x c with r != c; tau-c = 2m(C - D)/(n^2 (m-1)) rescales by the
    SMALLER dimension. Same bounded cell machinery as
    ``gk_gamma_qty_priority`` (integer cross-products over the
    50 x 5 table); one floored ppm expression."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cells = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .selectExpr(
            "CAST(l_quantity AS BIGINT) AS x",
            "CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS y",
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .cache()
    )
    a = cells.select(
        F.col("x").alias("x1"), F.col("y").alias("y1"), F.col("n").alias("n1")
    )
    b = cells.select(
        F.col("x").alias("x2"), F.col("y").alias("y2"), F.col("n").alias("n2")
    )
    pairs = a.join(F.broadcast(b), F.col("x2") > F.col("x1")).agg(
        F.sum(
            F.when(
                F.col("y2") > F.col("y1"),
                F.expr("CAST(n1 AS DECIMAL(38,0)) * n2"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("c"),
        F.sum(
            F.when(
                F.col("y2") < F.col("y1"),
                F.expr("CAST(n1 AS DECIMAL(38,0)) * n2"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("d"),
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.least(F.countDistinct("x"), F.countDistinct("y"))
        .cast("bigint")
        .alias("m"),
    )
    return pairs.crossJoin(F.broadcast(tot)).selectExpr(
        "CAST(c AS BIGINT) AS concordant",
        "CAST(d AS BIGINT) AS discordant",
        "m AS m_min_dim",
        "CAST(floor(1e6 *"
        " 2e0 * CAST(m AS DOUBLE)"
        " * (CAST(c AS DOUBLE) - CAST(d AS DOUBLE))"
        " / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)"
        "    * (CAST(m AS DOUBLE) - 1e0))) AS BIGINT) AS tau_c_ppm",
    )


@register(
    "assoc_suite_status_priority",
    """
    WITH cells AS MATERIALIZED (
      SELECT o_orderstatus AS r, o_orderpriority AS c,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ), margins AS MATERIALIZED (
      SELECT cl.r, cl.c, cl.n, rm.rn, cm.cn
      FROM cells cl
      JOIN (SELECT r, CAST(SUM(n) AS BIGINT) AS rn FROM cells GROUP BY 1) rm
        ON rm.r = cl.r
      JOIN (SELECT c, CAST(SUM(n) AS BIGINT) AS cn FROM cells GROUP BY 1) cm
        ON cm.c = cl.c
    ), agg AS MATERIALIZED (
      SELECT CAST(SUM((n::HUGEINT * n * 1000000
                       * (SELECT SUM(n) FROM cells))
                      // (rn::HUGEINT * cn)) AS BIGINT) AS term_sum,
             (SELECT CAST(SUM(n) AS BIGINT) FROM cells) AS nn,
             (SELECT CAST(COUNT(DISTINCT r) AS BIGINT) FROM cells) AS nr,
             (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) FROM cells) AS nc
      FROM margins
    )
    SELECT nn AS n_rows, nr AS n_statuses, nc AS n_priorities,
           term_sum - nn * 1000000 AS chi2_micro,
           CAST(floor(1e6 * sqrt(
             greatest(0e0,
               (CAST(term_sum - nn * 1000000 AS DOUBLE) / 1e6 / nn
                - CAST((nr - 1) * (nc - 1) AS DOUBLE) / (nn - 1)))
             / least(CAST(nr AS DOUBLE) - CAST(nr - 1 AS DOUBLE)
                       * (nr - 1) / (nn - 1) - 1e0,
                     CAST(nc AS DOUBLE) - CAST(nc - 1 AS DOUBLE)
                       * (nc - 1) / (nn - 1) - 1e0))) AS BIGINT)
             AS v_corrected_ppm,
           CAST(floor(1e6 * sqrt(
             CAST(term_sum - nn * 1000000 AS DOUBLE) / 1e6
             / (CAST(nn AS DOUBLE)
                * sqrt(CAST((nr - 1) * (nc - 1) AS DOUBLE))))) AS BIGINT)
             AS tschuprow_t_ppm,
           CAST(floor(1e6 * sqrt(
             CAST(term_sum - nn * 1000000 AS DOUBLE)
             / (CAST(term_sum - nn * 1000000 AS DOUBLE)
                + CAST(nn AS DOUBLE) * 1e6))) AS BIGINT)
             AS contingency_c_ppm
    FROM agg
    """,
)
def assoc_suite_status_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chi-square association suite for status x priority —
    bias-corrected Cramer's V (Bergsma 2013), Tschuprow's T, and
    Pearson's contingency coefficient C — the three normalizations
    ``cramers_v_priority_status``'s plain V omits (the corrected V
    removes the small-sample inflation; T handles r != c symmetry; C
    is the bounded legacy scale). chi^2 comes from the exact identity
    N (SUM n_ij^2/(r_i c_j) - 1), each cell term a NONNEGATIVE
    integer floored at micro scale and summed exactly (f25 contract);
    every coefficient is then a fixed double expression of that one
    quantized chi2."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cells = (
        o.groupBy(
            F.col("o_orderstatus").alias("r"), F.col("o_orderpriority").alias("c")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .cache()  # 15 cells; margins + totals
    )
    rm = cells.groupBy("r").agg(F.sum("n").cast("bigint").alias("rn"))
    cm = cells.groupBy("c").agg(F.sum("n").cast("bigint").alias("cn"))
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.countDistinct("r").cast("bigint").alias("nr"),
        F.countDistinct("c").cast("bigint").alias("nc"),
    )
    margins = (
        cells.join(F.broadcast(rm), "r")
        .join(F.broadcast(cm), "c")
        .crossJoin(F.broadcast(tot))
    )
    agg = margins.agg(
        F.sum(
            F.expr(
                "(CAST(n AS DECIMAL(38,0)) * n * 1000000 * nn)"
                " div (CAST(rn AS DECIMAL(38,0)) * cn)"
            )
        )
        .cast("bigint")
        .alias("term_sum"),
        F.max("nn").alias("nn"),
        F.max("nr").alias("nr"),
        F.max("nc").alias("nc"),
    )
    return agg.selectExpr(
        "nn AS n_rows",
        "nr AS n_statuses",
        "nc AS n_priorities",
        "term_sum - nn * 1000000 AS chi2_micro",
        "CAST(floor(1e6 * sqrt("
        " greatest(0e0,"
        "   (CAST(term_sum - nn * 1000000 AS DOUBLE) / 1e6 / nn"
        "    - CAST((nr - 1) * (nc - 1) AS DOUBLE) / (nn - 1)))"
        " / least(CAST(nr AS DOUBLE) - CAST(nr - 1 AS DOUBLE)"
        "           * (nr - 1) / (nn - 1) - 1e0,"
        "         CAST(nc AS DOUBLE) - CAST(nc - 1 AS DOUBLE)"
        "           * (nc - 1) / (nn - 1) - 1e0))) AS BIGINT)"
        " AS v_corrected_ppm",
        "CAST(floor(1e6 * sqrt("
        " CAST(term_sum - nn * 1000000 AS DOUBLE) / 1e6"
        " / (CAST(nn AS DOUBLE)"
        "    * sqrt(CAST((nr - 1) * (nc - 1) AS DOUBLE))))) AS BIGINT)"
        " AS tschuprow_t_ppm",
        "CAST(floor(1e6 * sqrt("
        " CAST(term_sum - nn * 1000000 AS DOUBLE)"
        " / (CAST(term_sum - nn * 1000000 AS DOUBLE)"
        "    + CAST(nn AS DOUBLE) * 1e6))) AS BIGINT)"
        " AS contingency_c_ppm",
    )


@register(
    "stuart_maxwell_first_last_priority",
    """
    WITH ranked AS MATERIALIZED (
      SELECT o_custkey,
             CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2') THEN 1
                  WHEN substr(o_orderpriority, 1, 1) = '3' THEN 2
                  ELSE 3 END AS tier,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rf,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC)
               AS rl
      FROM orders
    ), pairs AS MATERIALIZED (
      SELECT f.o_custkey, f.tier AS ft, l.tier AS lt
      FROM (SELECT o_custkey, tier FROM ranked WHERE rf = 1) f
      JOIN (SELECT o_custkey, tier FROM ranked WHERE rl = 1) l
        ON f.o_custkey = l.o_custkey
    ), tab AS MATERIALIZED (
      SELECT
        CAST(SUM(CASE WHEN ft=1 AND lt=1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        CAST(SUM(CASE WHEN ft=1 AND lt=2 THEN 1 ELSE 0 END) AS BIGINT) AS n12,
        CAST(SUM(CASE WHEN ft=1 AND lt=3 THEN 1 ELSE 0 END) AS BIGINT) AS n13,
        CAST(SUM(CASE WHEN ft=2 AND lt=1 THEN 1 ELSE 0 END) AS BIGINT) AS n21,
        CAST(SUM(CASE WHEN ft=2 AND lt=2 THEN 1 ELSE 0 END) AS BIGINT) AS n22,
        CAST(SUM(CASE WHEN ft=2 AND lt=3 THEN 1 ELSE 0 END) AS BIGINT) AS n23,
        CAST(SUM(CASE WHEN ft=3 AND lt=1 THEN 1 ELSE 0 END) AS BIGINT) AS n31,
        CAST(SUM(CASE WHEN ft=3 AND lt=2 THEN 1 ELSE 0 END) AS BIGINT) AS n32,
        CAST(SUM(CASE WHEN ft=3 AND lt=3 THEN 1 ELSE 0 END) AS BIGINT) AS n33
      FROM pairs
    )
    SELECT n11 + n12 + n13 + n21 + n22 + n23 + n31 + n32 + n33 AS n_customers,
           (n11 + n12 + n13) - (n11 + n21 + n31) AS d1,
           (n21 + n22 + n23) - (n12 + n22 + n32) AS d2,
           CAST(floor(1000e0 * (
             (CAST((n12+n22+n32) + (n21+n22+n23) AS DOUBLE)
                - 2e0 * n22)
               * CAST((n11+n12+n13) - (n11+n21+n31) AS DOUBLE)
               * CAST((n11+n12+n13) - (n11+n21+n31) AS DOUBLE)
             + 2e0 * (CAST(n12 + n21 AS DOUBLE))
               * CAST((n11+n12+n13) - (n11+n21+n31) AS DOUBLE)
               * CAST((n21+n22+n23) - (n12+n22+n32) AS DOUBLE)
             + (CAST((n11+n21+n31) + (n11+n12+n13) AS DOUBLE)
                - 2e0 * n11)
               * CAST((n21+n22+n23) - (n12+n22+n32) AS DOUBLE)
               * CAST((n21+n22+n23) - (n12+n22+n32) AS DOUBLE)
           ) / (
             (CAST((n11+n12+n13) + (n11+n21+n31) AS DOUBLE) - 2e0 * n11)
             * (CAST((n12+n22+n32) + (n21+n22+n23) AS DOUBLE) - 2e0 * n22)
             - CAST(n12 + n21 AS DOUBLE) * CAST(n12 + n21 AS DOUBLE)
           )) AS BIGINT) AS chi2_milli
    FROM tab
    """,
)
def stuart_maxwell_first_last_priority_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stuart-Maxwell marginal-homogeneity test between each
    customer's FIRST and LAST order priority tier (urgent-high /
    medium / other — Stuart 1955, Maxwell 1970): did the priority mix
    shift within customers over their lifetime? The k=3
    generalization of McNemar (``mcnemar_repeat_purchase``) /
    Bowker (``bowker_symmetry_events``): chi2 = d' V^-1 d over any
    two marginal differences, with the 2x2 V inverted in closed form
    — V_hh = r_h + c_h - 2 n_hh, V_12 = -(n_12 + n_21). First/last
    picks are per-customer row_number windows (hash-partitioned);
    the 3x3 table is exact; one floored milli expression."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    tiered = o.selectExpr(
        "o_custkey",
        "CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2') THEN 1"
        " WHEN substr(o_orderpriority, 1, 1) = '3' THEN 2"
        " ELSE 3 END AS tier",
        "o_orderdate",
        "o_orderkey",
    )
    wf = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wl = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    ranked = tiered.select(
        "o_custkey",
        "tier",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    f_t = ranked.where(F.col("rf") == 1).select(
        "o_custkey", F.col("tier").alias("ft")
    )
    l_t = ranked.where(F.col("rl") == 1).select(
        "o_custkey", F.col("tier").alias("lt")
    )
    pairs = f_t.join(l_t, "o_custkey")
    cols = []
    for i in (1, 2, 3):
        for j in (1, 2, 3):
            cols.append(
                F.sum(
                    F.expr(f"CASE WHEN ft={i} AND lt={j} THEN 1 ELSE 0 END")
                )
                .cast("bigint")
                .alias(f"n{i}{j}")
            )
    tab = pairs.agg(*cols)
    return tab.selectExpr(
        "n11 + n12 + n13 + n21 + n22 + n23 + n31 + n32 + n33 AS n_customers",
        "(n11 + n12 + n13) - (n11 + n21 + n31) AS d1",
        "(n21 + n22 + n23) - (n12 + n22 + n32) AS d2",
        "CAST(floor(1000e0 * ("
        " (CAST((n12+n22+n32) + (n21+n22+n23) AS DOUBLE)"
        "    - 2e0 * n22)"
        "   * CAST((n11+n12+n13) - (n11+n21+n31) AS DOUBLE)"
        "   * CAST((n11+n12+n13) - (n11+n21+n31) AS DOUBLE)"
        " + 2e0 * (CAST(n12 + n21 AS DOUBLE))"
        "   * CAST((n11+n12+n13) - (n11+n21+n31) AS DOUBLE)"
        "   * CAST((n21+n22+n23) - (n12+n22+n32) AS DOUBLE)"
        " + (CAST((n11+n21+n31) + (n11+n12+n13) AS DOUBLE)"
        "    - 2e0 * n11)"
        "   * CAST((n21+n22+n23) - (n12+n22+n32) AS DOUBLE)"
        "   * CAST((n21+n22+n23) - (n12+n22+n32) AS DOUBLE)"
        ") / ("
        " (CAST((n11+n12+n13) + (n11+n21+n31) AS DOUBLE) - 2e0 * n11)"
        " * (CAST((n12+n22+n32) + (n21+n22+n23) AS DOUBLE) - 2e0 * n22)"
        " - CAST(n12 + n21 AS DOUBLE) * CAST(n12 + n21 AS DOUBLE)"
        ")) AS BIGINT) AS chi2_milli",
    )


@register(
    "cochran_c_hartley_nations",
    """
    WITH vals AS MATERIALIZED (
      SELECT c.c_nationkey AS nk,
             CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
               // 100 AS x
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), grp AS MATERIALIZED (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(x) AS BIGINT) AS s_g,
             SUM(x::HUGEINT * x) AS q_g
      FROM vals GROUP BY 1
    ), vv AS MATERIALIZED (
      SELECT nk,
             CAST(((n_g::HUGEINT * q_g - s_g::HUGEINT * s_g) * 1000)
                  // (n_g::HUGEINT * (n_g - 1)) AS BIGINT) AS v_milli
      FROM grp WHERE n_g > 1
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(MAX(v_milli) AS BIGINT) AS vmax,
             CAST(MIN(v_milli) AS BIGINT) AS vmin,
             CAST(SUM(v_milli) AS BIGINT) AS vsum
      FROM vv
    )
    SELECT k AS n_groups,
           (SELECT MIN(nk) FROM vv WHERE v_milli =
              (SELECT MAX(v_milli) FROM vv)) AS max_var_nationkey,
           CAST(floor(1000e0 * CAST(vmax AS DOUBLE) / vsum) AS BIGINT)
             AS cochran_c_milli,
           CAST(floor(1000e0 * CAST(vmax AS DOUBLE) / vmin) AS BIGINT)
             AS hartley_fmax_milli
    FROM agg
    """,
)
def cochran_c_hartley_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's C and Hartley's Fmax variance-outlier pair over
    per-nation order-value variances (Cochran 1941, Hartley 1950):
    C = max s^2 / SUM s^2 flags ONE dominant variance,
    Fmax = max/min flags the spread — the screening duo before
    pooling (``brown_forsythe_status`` is the formal k-group test).
    Each group variance is QUANTIZED to an exact milli integer
    ((nQ - S^2)*1000 div n(n-1), nonnegative) so max/min/sum
    comparisons are exact integer ops; two floored milli ratios."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    grp = (
        o.join(c.select("c_custkey", "c_nationkey"), o["o_custkey"] == F.col("c_custkey"))
        .selectExpr(
            "c_nationkey AS nk",
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
            " div 100 AS x",
        )
        .groupBy("nk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum("x").cast("bigint").alias("s_g"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("q_g"),
        )
    )
    vv = grp.where(F.col("n_g") > 1).selectExpr(
        "nk",
        "CAST(((CAST(n_g AS DECIMAL(38,0)) * q_g"
        " - CAST(s_g AS DECIMAL(38,0)) * s_g) * 1000)"
        " div (CAST(n_g AS DECIMAL(38,0)) * (n_g - 1)) AS BIGINT) AS v_milli",
    ).cache()  # 25 rows; aggregate + argmax
    agg = vv.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("v_milli").cast("bigint").alias("vmax"),
        F.min("v_milli").cast("bigint").alias("vmin"),
        F.sum("v_milli").cast("bigint").alias("vsum"),
    )
    argmax = (
        vv.crossJoin(F.broadcast(agg.select("vmax")))
        .where(F.col("v_milli") == F.col("vmax"))
        .agg(F.min("nk").cast("bigint").alias("max_var_nationkey"))
    )
    return agg.crossJoin(F.broadcast(argmax)).selectExpr(
        "k AS n_groups",
        "max_var_nationkey",
        "CAST(floor(1000e0 * CAST(vmax AS DOUBLE) / vsum) AS BIGINT)"
        " AS cochran_c_milli",
        "CAST(floor(1000e0 * CAST(vmax AS DOUBLE) / vmin) AS BIGINT)"
        " AS hartley_fmax_milli",
    )


@register(
    "median_ci_status",
    """
    WITH vals AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS x
      FROM orders
    ), ranked AS MATERIALIZED (
      SELECT g, x,
             row_number() OVER (PARTITION BY g ORDER BY x) AS r,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM vals
    ), ks AS MATERIALIZED (
      SELECT g, CAST(MAX(n) AS BIGINT) AS n,
             greatest(1, CAST(floor((CAST(MAX(n) AS DOUBLE)
               - 1.96e0 * sqrt(CAST(MAX(n) AS DOUBLE))) / 2e0) AS BIGINT))
               AS lo_k,
             (CAST(MAX(n) AS BIGINT) + 1) // 2 AS med_k
      FROM ranked GROUP BY g
    )
    SELECT k.g AS status, k.n,
           CAST(MAX(CASE WHEN r.r = k.lo_k THEN r.x END) AS BIGINT)
             AS ci_lo_cents,
           CAST(MAX(CASE WHEN r.r = k.med_k THEN r.x END) AS BIGINT)
             AS median_cents,
           CAST(MAX(CASE WHEN r.r = k.n + 1 - k.lo_k THEN r.x END) AS BIGINT)
             AS ci_hi_cents
    FROM ks k JOIN ranked r ON r.g = k.g
    GROUP BY k.g, k.n
    ORDER BY status
    """,
)
def median_ci_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median order
    value per status (the sign-test/order-statistic CI: ranks
    (n - 1.96 sqrt(n))/2 and n+1-that bracket the median with ~95%
    coverage — no normality, no bootstrap): all three bounds are RANK
    PICKS via ``grouped_kth_smallest`` (order statistics are
    engine-exact; interpolated percentiles are not), and the rank
    arithmetic (floor of a double on exact integers) is identical in
    both engines. The two-pass recipe never sorts a data-sized group
    on one executor."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_kths_smallest,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    vals = o.selectExpr(
        "o_orderstatus AS g",
        "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS x",
    )
    k_lo = (
        "greatest(1, CAST(floor((CAST(n AS DOUBLE)"
        " - 1.96e0 * sqrt(CAST(n AS DOUBLE))) / 2e0) AS BIGINT))"
    )
    return (
        grouped_kths_smallest(
            vals,
            "g",
            "x",
            {
                "ci_lo_cents": k_lo,
                "median_cents": "(n + 1) div 2",
                "ci_hi_cents": f"n + 1 - {k_lo}",
            },
        )
        .selectExpr(
            "g AS status",
            "CAST(n AS BIGINT) AS n",
            "CAST(ci_lo_cents AS BIGINT) AS ci_lo_cents",
            "CAST(median_cents AS BIGINT) AS median_cents",
            "CAST(ci_hi_cents AS BIGINT) AS ci_hi_cents",
        )
        .orderBy("status")
    )
