"""Round 10, wave 13: Blomqvist quadrant dependence, net revenue
retention, Goodman-Kruskal lambda."""

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


# =====================================================================
# Round 10, wave 13: Blomqvist beta, NRR, GK lambda
# =====================================================================

@register(
    "blomqvist_beta_rev_qty",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', l_shipdate) AS month,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
      FROM lineitem GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT x, y, CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS t
      FROM monthly
    ), medx AS MATERIALIZED (
      SELECT x AS mx FROM (
        SELECT x, row_number() OVER (ORDER BY x, t) AS rk,
               COUNT(*) OVER () AS n
        FROM idx
      ) WHERE rk = (n + 1) // 2
    ), medy AS MATERIALIZED (
      SELECT y AS my FROM (
        SELECT y, row_number() OVER (ORDER BY y, t) AS rk,
               COUNT(*) OVER () AS n
        FROM idx
      ) WHERE rk = (n + 1) // 2
    ), quads AS MATERIALIZED (
      SELECT CAST(count_if((x > mx AND y > my) OR (x < mx AND y < my))
                  AS BIGINT) AS conc,
             CAST(count_if((x > mx AND y < my) OR (x < mx AND y > my))
                  AS BIGINT) AS disc,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM idx, medx, medy
    )
    SELECT n AS n_months, conc, disc,
           CASE WHEN conc + disc > 0 THEN CAST(
             (CASE WHEN conc >= disc THEN 1 ELSE -1 END)
             * ((abs(conc - disc) * 1000000) // (conc + disc)) AS BIGINT)
           END AS beta_ppm
    FROM quads
    """,
)
def blomqvist_beta_rev_qty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blomqvist's beta (medial correlation, Annals 1950) between
    monthly revenue and quantity: the sign-quadrant dependence
    measure — split the plane at the two medians, count concordant vs
    discordant quadrants — the cheapest member of the rank-dependence
    family (Spearman integrates ranks, Kendall integrates pairs;
    Blomqvist reads ONE bit per point), and the one that survives any
    monotone transformation of either margin.

    Exactness: both medians are deterministic LOW-median order
    statistics (exact cents/counts, (value, t) tie-break); the
    quadrant counts are one conditional aggregation (points ON a
    median line are excluded — the classical treatment); beta is one
    sign-factored integer division.

    Scale shape: one data-sized month aggregation; median picks and
    the quadrant count run on the bounded month table."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    monthly = (
        li.groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("month"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100"
                    " AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("x"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    idx = monthly.select(
        "x",
        "y",
        F.row_number().over(Window.orderBy("month")).cast("bigint").alias("t"),
    ).localCheckpoint(eager=True)  # bounded; feeds both medians + quads
    medx = (
        idx.select(
            "x",
            F.row_number().over(Window.orderBy("x", "t")).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        .filter(F.expr("rk = (n + 1) div 2"))
        .select(F.col("x").alias("mx"))
    )
    medy = (
        idx.select(
            "y",
            F.row_number().over(Window.orderBy("y", "t")).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        .filter(F.expr("rk = (n + 1) div 2"))
        .select(F.col("y").alias("my"))
    )
    quads = (
        idx.crossJoin(F.broadcast(medx))
        .crossJoin(F.broadcast(medy))
        .agg(
            F.count_if(
                F.expr("(x > mx AND y > my) OR (x < mx AND y < my)")
            )
            .cast("bigint")
            .alias("conc"),
            F.count_if(
                F.expr("(x > mx AND y < my) OR (x < mx AND y > my)")
            )
            .cast("bigint")
            .alias("disc"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    return quads.selectExpr(
        "n AS n_months",
        "conc",
        "disc",
        "CASE WHEN conc + disc > 0 THEN CAST("
        " (CASE WHEN conc >= disc THEN 1 ELSE -1 END)"
        " * ((abs(conc - disc) * 1000000) div (conc + disc)) AS BIGINT)"
        " END AS beta_ppm",
    )


@register(
    "nrr_monthly_customers",
    """
    WITH cm AS MATERIALIZED (
      SELECT o_custkey AS cust,
             CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2
    ), paired AS MATERIALIZED (
      SELECT a.m AS m, CAST(SUM(a.rev) AS BIGINT) AS base_rev,
             CAST(SUM(COALESCE(b.rev, 0)) AS BIGINT) AS retained_rev,
             CAST(count_if(b.rev IS NOT NULL) AS BIGINT) AS n_retained,
             CAST(COUNT(*) AS BIGINT) AS n_base
      FROM cm a LEFT JOIN cm b ON b.cust = a.cust AND b.m = a.m + 1
      GROUP BY 1
    )
    SELECT m AS month_index, n_base, n_retained, base_rev, retained_rev,
           CASE WHEN base_rev > 0 THEN CAST(
             (retained_rev * 1000000) // base_rev AS BIGINT)
           END AS nrr_ppm,
           CASE WHEN n_base > 0 THEN CAST(
             (n_retained * 1000000) // n_base AS BIGINT)
           END AS logo_retention_ppm
    FROM paired ORDER BY month_index
    """,
)
def nrr_monthly_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net revenue retention by month (the SaaS board metric, here on
    order revenue): for the customers who bought in month m, the
    fraction of that revenue they spent again in m+1 (NRR — revenue
    retention including expansion/contraction) plus plain logo
    retention — the revenue-weighted companion to
    ``cohort_retention`` (which counts users from their FIRST month;
    NRR re-bases every month).

    Exactness: exact cents per (customer, month); the m→m+1 link is
    one equi-keyed self left-join; both ratios are single truncating
    divisions of non-negative integers.

    Scale shape: one (customer, month) aggregation, one equi-keyed
    self-join on (customer, month+1), a bounded per-month aggregate."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cm = (
        o.groupBy(
            F.col("o_custkey").alias("cust"),
            F.months_between(
                F.col("o_orderdate").cast("date"),
                F.lit("1992-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("m"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("rev")
        )
        .localCheckpoint(eager=True)  # feeds both sides of the link
    )
    a = cm.alias("a")
    b = cm.alias("b")
    paired = (
        a.join(b, F.expr("b.cust = a.cust AND b.m = a.m + 1"), "left")
        .groupBy(F.expr("a.m").alias("m"))
        .agg(
            F.sum("a.rev").cast("bigint").alias("base_rev"),
            F.sum(F.expr("COALESCE(b.rev, 0)")).cast("bigint").alias(
                "retained_rev"
            ),
            F.count_if(F.expr("b.rev IS NOT NULL"))
            .cast("bigint")
            .alias("n_retained"),
            F.count(F.lit(1)).cast("bigint").alias("n_base"),
        )
    )
    return paired.selectExpr(
        "m AS month_index",
        "n_base",
        "n_retained",
        "base_rev",
        "retained_rev",
        "CASE WHEN base_rev > 0 THEN CAST("
        " (retained_rev * 1000000) div base_rev AS BIGINT) END AS nrr_ppm",
        "CASE WHEN n_base > 0 THEN CAST("
        " (n_retained * 1000000) div n_base AS BIGINT)"
        " END AS logo_retention_ppm",
    ).orderBy("month_index")


@register(
    "gk_lambda_status_priority",
    """
    WITH cells AS MATERIALIZED (
      SELECT o_orderstatus AS r, o_orderpriority AS c,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    ), rowmax AS MATERIALIZED (
      SELECT r, CAST(MAX(cnt) AS BIGINT) AS mx FROM cells GROUP BY 1
    ), colsum AS MATERIALIZED (
      SELECT c, CAST(SUM(cnt) AS BIGINT) AS s FROM cells GROUP BY 1
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST((SELECT MAX(s) FROM colsum) AS BIGINT) AS maxcol,
             CAST((SELECT SUM(mx) FROM rowmax) AS BIGINT) AS summax
      FROM cells
    )
    SELECT n, summax AS sum_row_modes, maxcol AS marginal_mode,
           CASE WHEN n > maxcol THEN CAST(
             ((summax - maxcol) * 1000000) // (n - maxcol) AS BIGINT)
           END AS lambda_ppm
    FROM tot
    """,
)
def gk_lambda_status_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal lambda (JASA 1954): the proportional reduction
    in error when predicting order PRIORITY from order STATUS —
    "knowing the row, how much better is your modal guess of the
    column?" λ = (Σᵣ max_c n_rc − max_c n_+c)/(n − max_c n_+c). The
    PREDICTIVE association measure the chi-square family
    (``contingency_chi2_cells``/``cramers_v_priority_status``) cannot
    give: chi-square detects ANY dependence, lambda says whether it
    helps a classifier (λ = 0 exactly when every row shares the same
    modal column — possible even under strong chi-square dependence).

    Exactness: pure integer counts from one contingency aggregation;
    λ is one truncating division. The numerator is ≥ 0 because
    Σᵣ maxᶜ n_rc ≥ Σᵣ n_r,c* = n_+c* = maxcol (each row's maximum
    dominates that row's contribution to the modal column).
    Degenerate single-column data (n = maxcol) emits NULL.

    Scale shape: one grouped count onto the ≤15-cell grid, then
    bounded algebra."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cells = (
        o.groupBy(
            F.col("o_orderstatus").alias("r"),
            F.col("o_orderpriority").alias("c"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=True)  # bounded grid; feeds 3 branches
    )
    rowmax = cells.groupBy("r").agg(F.max("cnt").cast("bigint").alias("mx"))
    colsum = cells.groupBy("c").agg(F.sum("cnt").cast("bigint").alias("s"))
    tot = (
        cells.agg(F.sum("cnt").cast("bigint").alias("n"))
        .crossJoin(
            F.broadcast(colsum.agg(F.max("s").cast("bigint").alias("maxcol")))
        )
        .crossJoin(
            F.broadcast(rowmax.agg(F.sum("mx").cast("bigint").alias("summax")))
        )
    )
    return tot.selectExpr(
        "n",
        "summax AS sum_row_modes",
        "maxcol AS marginal_mode",
        "CASE WHEN n > maxcol THEN CAST("
        " ((summax - maxcol) * 1000000) div (n - maxcol) AS BIGINT)"
        " END AS lambda_ppm",
    )
