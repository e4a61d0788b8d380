"""Round 10, wave 1: regression/agreement/threshold diagnostics —
Durbin-Watson residual autocorrelation, Youden-J operating point,
Fleiss' multi-rater kappa. All integer/rational-exact (no libm in
checked outputs), all over bounded tier/month/category tables after
one data-sized aggregation."""

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
# Round 10, wave 1: Durbin-Watson, Youden-J threshold, Fleiss' kappa
# =====================================================================

@register(
    "durbin_watson_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) // 100 AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT y, CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS t
      FROM monthly
    ), s AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(t * t) AS BIGINT) AS st2,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(t::HUGEINT * y) AS sty
      FROM idx
    ), coef AS MATERIALIZED (
      SELECT n, (n * sty - st::HUGEINT * sy) AS nb,
             (sy::HUGEINT * st2 - st::HUGEINT * sty) AS anum
      FROM s
    ), resid AS MATERIALIZED (
      SELECT t,
             ((SELECT n::HUGEINT * st2 - st::HUGEINT * st FROM s) * y
              - coef.anum - coef.nb * t) AS e
      FROM idx, coef
    ), lagd AS MATERIALIZED (
      SELECT e, lag(e) OVER (ORDER BY t) AS ep FROM resid
    )
    SELECT (SELECT n FROM s) AS n_months,
           CAST(SUM(e * e) AS HUGEINT) > 0 AS has_variance,
           CASE WHEN SUM(e * e) > 0 THEN CAST(floor(
             CAST(SUM(CASE WHEN ep IS NULL THEN 0
                           ELSE (e - ep) * (e - ep) END) AS DOUBLE)
             * 1000000e0 / CAST(SUM(e * e) AS DOUBLE))
             AS BIGINT) END AS dw_ppm
    FROM lagd
    """,
)
def durbin_watson_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic (Biometrika 1950/51) of the residuals
    from the OLS linear trend of monthly revenue — THE classic
    "are my regression errors autocorrelated" diagnostic (DW ≈ 2 ·
    (1 − ρ₁); < 2 positive autocorrelation).

    Exactness: the OLS residual e_t = y_t − a − b·t is scaled by the
    positive constant D = n·Σt² − (Σt)² (a = (Σy·Σt² − Σt·Σty)/D,
    b = Nb/D) so ẽ_t = D·y_t − (Σy·Σt² − Σt·Σty) − Nb·t is an exact
    integer (monthly revenue in whole dollars — cents div 100,
    positive so both engines truncate identically), and DW is the
    RATIO of two exact ẽ sums-of-squares (the D² factor cancels).
    The final ppm is floor(num·10⁶/den) evaluated in DOUBLE — both
    operands are single correctly-rounded conversions of exact
    DECIMAL(38)/HUGEINT sums and the multiply/divide/floor sequence
    is the identical IEEE expression on both engines (the z_milli
    class) — an integer ·10⁶ would overflow DECIMAL(38) right where
    the sums are still exact. Σẽ² stays exact to ~sf1000 monthly
    dollar volumes; ANSI aborts loudly past it.

    Scale shape: ONE data-sized month aggregation; everything after
    is bounded month-grain algebra (windows over ≤ ~85 rows)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100"
                " AS BIGINT)) div 100 AS BIGINT)"
            ).alias("y")
        )
        .localCheckpoint(eager=True)  # bounded; feeds sums + residuals
    )
    idx = monthly.select(
        "y",
        F.row_number().over(Window.orderBy("month")).cast("bigint").alias("t"),
    ).localCheckpoint(eager=True)  # bounded month grain
    s = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.expr("t * t")).cast("bigint").alias("st2"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * y")).alias("sty"),
    )
    coef = s.selectExpr(
        "n",
        "CAST(n * sty - CAST(st AS DECIMAL(38,0)) * sy AS DECIMAL(38,0)) AS nb",
        "CAST(CAST(sy AS DECIMAL(38,0)) * st2"
        " - CAST(st AS DECIMAL(38,0)) * sty AS DECIMAL(38,0)) AS anum",
        "CAST(CAST(n AS DECIMAL(38,0)) * st2"
        " - CAST(st AS DECIMAL(38,0)) * st AS DECIMAL(38,0)) AS d",
    )
    resid = idx.crossJoin(F.broadcast(coef)).selectExpr(
        "t",
        "n",
        "CAST(d * y - anum - nb * t AS DECIMAL(38,0)) AS e",
    )
    lagd = resid.select(
        "n", "e", F.lag("e").over(Window.orderBy("t")).alias("ep")
    )
    return lagd.groupBy("n").agg(
        F.sum(F.expr("e * e")).alias("__den"),
        F.sum(
            F.expr("CASE WHEN ep IS NULL THEN 0 ELSE (e - ep) * (e - ep) END")
        ).alias("__num"),
    ).selectExpr(
        "n AS n_months",
        "__den > 0 AS has_variance",
        "CASE WHEN __den > 0 THEN CAST(floor("
        " CAST(__num AS DOUBLE) * 1000000e0 / CAST(__den AS DOUBLE))"
        " AS BIGINT) END AS dw_ppm",
    )


@register(
    "youden_j_threshold",
    """
    WITH tiers AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS threshold,
             CAST(count_if(l_returnflag = 'R') AS BIGINT) AS pos_c,
             CAST(count_if(l_returnflag <> 'R') AS BIGINT) AS neg_c
      FROM lineitem GROUP BY 1
    ), cum AS MATERIALIZED (
      SELECT threshold,
             CAST(SUM(pos_c) OVER (ORDER BY threshold DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS tp,
             CAST(SUM(neg_c) OVER (ORDER BY threshold DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS fp
      FROM tiers
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(pos_c) AS BIGINT) AS p, CAST(SUM(neg_c) AS BIGINT) AS n
      FROM tiers
    ), scored AS MATERIALIZED (
      SELECT threshold, tp, fp,
             (tp::HUGEINT * tot.n - fp::HUGEINT * tot.p) AS j_scaled,
             tot.p AS p, tot.n AS n
      FROM cum, tot
    )
    SELECT threshold, tp, fp,
           CASE WHEN p > 0 AND n > 0 THEN CAST(
             (CASE WHEN j_scaled >= 0 THEN 1 ELSE -1 END)
             * ((abs(j_scaled) * 1000000) // (p::HUGEINT * n)) AS BIGINT)
           END AS j_ppm,
           CAST(row_number() OVER (ORDER BY j_scaled DESC, threshold)
                AS BIGINT) AS j_rank
    FROM scored
    """,
)
def youden_j_threshold_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Youden's J operating-point selection (Cancer 1950): for every
    candidate threshold θ on quantity, J(θ) = TPR − FPR for the rule
    "predict returned when quantity ≥ θ" — the standard way to pick a
    classifier cutoff from a score column, complementing
    ``roc_auc_by_priority`` (which integrates the same curve).

    Exactness: the argmax of J is the argmax of the INTEGER
    j_scaled = tp·N − fp·P (cross-multiplied, one shared denominator
    P·N), emitted ppm-scaled with the sign factored out of the
    truncating division. Ranking ties break on the smaller threshold.

    Scale shape: one conditional aggregation over lineitem onto the
    ≤50-row quantity tier table; cumulative sums and the rank ride
    bounded windows."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    tiers = (
        li.groupBy(F.col("l_quantity").cast("bigint").alias("threshold"))
        .agg(
            F.count_if(F.col("l_returnflag") == "R").cast("bigint").alias("pos_c"),
            F.count_if(F.col("l_returnflag") != "R").cast("bigint").alias("neg_c"),
        )
        .localCheckpoint(eager=True)  # bounded; feeds cum + totals
    )
    w = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = tiers.select(
        "threshold",
        F.sum("pos_c").over(w).cast("bigint").alias("tp"),
        F.sum("neg_c").over(w).cast("bigint").alias("fp"),
    )
    tot = tiers.agg(
        F.sum("pos_c").cast("bigint").alias("p"),
        F.sum("neg_c").cast("bigint").alias("n"),
    )
    scored = cum.crossJoin(F.broadcast(tot)).selectExpr(
        "threshold",
        "tp",
        "fp",
        "CAST(CAST(tp AS DECIMAL(38,0)) * n"
        " - CAST(fp AS DECIMAL(38,0)) * p AS DECIMAL(38,0)) AS j_scaled",
        "p",
        "n",
    )
    rk = Window.orderBy(F.col("j_scaled").desc(), F.col("threshold").asc())
    return scored.select(
        "threshold",
        "tp",
        "fp",
        F.expr(
            "CASE WHEN p > 0 AND n > 0 THEN CAST("
            " (CASE WHEN j_scaled >= 0 THEN 1 ELSE -1 END)"
            " * ((abs(j_scaled) * 1000000)"
            "    div (CAST(p AS DECIMAL(38,0)) * n)) AS BIGINT) END"
        ).alias("j_ppm"),
        F.row_number().over(rk).cast("bigint").alias("j_rank"),
    )


@register(
    "fleiss_kappa_orders",
    """
    WITH items AS MATERIALIZED (
      SELECT l_orderkey,
             CAST(count_if(l_returnflag = 'R') AS BIGINT) AS n_r,
             CAST(count_if(l_returnflag = 'A') AS BIGINT) AS n_a,
             CAST(count_if(l_returnflag = 'N') AS BIGINT) AS n_n
      FROM lineitem WHERE l_linenumber <= 3
      GROUP BY 1 HAVING COUNT(*) = 3
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_r * n_r + n_a * n_a + n_n * n_n) AS BIGINT) AS a,
             CAST(SUM(n_r) AS BIGINT) AS c_r,
             CAST(SUM(n_a) AS BIGINT) AS c_a,
             CAST(SUM(n_n) AS BIGINT) AS c_n
      FROM items
    ), parts AS MATERIALIZED (
      SELECT n, a, (3 * n)::HUGEINT AS t,
             (c_r::HUGEINT * c_r + c_a::HUGEINT * c_a
              + c_n::HUGEINT * c_n) AS s
      FROM agg
    )
    SELECT n AS n_items, a AS a_sum, CAST(s AS BIGINT) AS s_sum,
           CASE WHEN t > 0 THEN CAST(((a - t) * 1000000) // (2 * t)
             AS BIGINT) END AS pbar_ppm,
           CASE WHEN t > 0 THEN CAST((s * 1000000) // (t * t) AS BIGINT)
             END AS pe_ppm,
           CASE WHEN (t * t - s) > 0 THEN CAST(
             (CASE WHEN t * (a - t) >= 2 * s THEN 1 ELSE -1 END)
             * ((abs(t * (a - t) - 2 * s) * 1000000)
                // (2 * (t * t - s))) AS BIGINT) END AS kappa_ppm
    FROM parts
    """,
)
def fleiss_kappa_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa (Psych. Bulletin 1971) — chance-corrected
    agreement among a FIXED panel of m raters per item, generalizing
    ``cohens_kappa_raters`` beyond two raters: items are orders with
    ≥3 lineitems, the three raters are lineitems 1-3 (by linenumber,
    no window needed — linenumber is unique per order), each "rating"
    the order with its returnflag category (R/A/N).

    Exactness: with A = Σᵢⱼ nᵢⱼ², T = n·m, S = Σⱼ cⱼ², the identity
    κ = (T(A−T) − (m−1)S) / ((m−1)(T² − S)) clears every fraction at
    m = 3 (m−1 = 2), so κ_ppm is one sign-factored integer division;
    P̄ = (A−T)/(T(m−1)) and P̄ₑ = S/T² emit alongside. Degenerate
    all-one-category data (S = T²) yields NULL, not a divide abort.

    Scale shape: one filtered aggregation over lineitem (conditional
    counts, HAVING m = 3) then scalar algebra — no windows, no joins."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    items = (
        li.filter(F.col("l_linenumber") <= 3)
        .groupBy("l_orderkey")
        .agg(
            F.count_if(F.col("l_returnflag") == "R").cast("bigint").alias("n_r"),
            F.count_if(F.col("l_returnflag") == "A").cast("bigint").alias("n_a"),
            F.count_if(F.col("l_returnflag") == "N").cast("bigint").alias("n_n"),
            F.count(F.lit(1)).alias("__m"),
        )
        .filter(F.col("__m") == 3)
    )
    agg = items.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("n_r * n_r + n_a * n_a + n_n * n_n"))
        .cast("bigint")
        .alias("a"),
        F.sum("n_r").cast("bigint").alias("c_r"),
        F.sum("n_a").cast("bigint").alias("c_a"),
        F.sum("n_n").cast("bigint").alias("c_n"),
    )
    parts = agg.selectExpr(
        "n",
        "a",
        "CAST(3 * n AS DECIMAL(38,0)) AS t",
        "CAST(CAST(c_r AS DECIMAL(38,0)) * c_r"
        " + CAST(c_a AS DECIMAL(38,0)) * c_a"
        " + CAST(c_n AS DECIMAL(38,0)) * c_n AS DECIMAL(38,0)) AS s",
    )
    return parts.selectExpr(
        "n AS n_items",
        "a AS a_sum",
        "CAST(s AS BIGINT) AS s_sum",
        "CASE WHEN t > 0 THEN CAST(((a - t) * 1000000) div (2 * t)"
        " AS BIGINT) END AS pbar_ppm",
        "CASE WHEN t > 0 THEN CAST((s * 1000000) div (t * t) AS BIGINT)"
        " END AS pe_ppm",
        "CASE WHEN (t * t - s) > 0 THEN CAST("
        " (CASE WHEN t * (a - t) >= 2 * s THEN 1 ELSE -1 END)"
        " * ((abs(t * (a - t) - 2 * s) * 1000000)"
        "    div (2 * (t * t - s))) AS BIGINT) END AS kappa_ppm",
    )
