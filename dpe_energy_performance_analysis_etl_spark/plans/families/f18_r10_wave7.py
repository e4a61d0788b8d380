"""Round 10, wave 7: dominant seasonality period (ACF argmax),
Engle-Granger cointegration, arc price elasticity."""

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
# Round 10, wave 7: dominant period, Engle-Granger, arc elasticity
# =====================================================================

@register(
    "dominant_period_revenue",
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
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
      FROM idx
    ), e AS MATERIALIZED (
      SELECT t, (s.n::HUGEINT * y - s.sy) AS e FROM idx, s
    ), g0 AS MATERIALIZED (
      SELECT SUM(e * e) AS g FROM e
    ), gj AS MATERIALIZED (
      SELECT js.j, CAST(SUM(a.e * b.e) AS HUGEINT) AS g
      FROM (SELECT unnest(range(2, 13)) AS j) js
      JOIN e a ON TRUE JOIN e b ON b.t = a.t - js.j
      GROUP BY 1
    ), best AS MATERIALIZED (
      SELECT j, g, row_number() OVER (ORDER BY g DESC, j) AS rk
      FROM gj
    )
    SELECT (SELECT n FROM s) AS n_months,
           CAST(best.j AS BIGINT) AS dominant_lag,
           CASE WHEN g0.g > 0 THEN CAST(
             (CASE WHEN best.g >= 0 THEN 1 ELSE -1 END)
             * ((abs(best.g) * 1000000) // g0.g) AS BIGINT)
           END AS acf_ppm
    FROM best, g0 WHERE best.rk = 1
    """,
)
def dominant_period_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant seasonality period of monthly revenue: the lag
    j ∈ 2..12 maximizing the autocorrelation γⱼ/γ₀ — the seasonality
    FINDER that tells ``seasonal_decompose_revenue`` (which assumes a
    period) what period to use, and the argmax view of the fixed-lag
    ``lag_autocorr_revenue`` family.

    Exactness: ACF at every lag shares the denominator γ₀ (the
    standard n-divisor form), so the ARGMAX is the argmax of the
    exact integer γ̃ⱼ = Σ ẽ_t·ẽ_{t−j} over n-scaled centered months —
    no division until the single reported ratio (sign-factored ppm).
    Ties break on the smaller lag.

    Scale shape: one data-sized month aggregation; the 11 lag joins
    and the argmax window run on the bounded month table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100"
                " AS BIGINT)) div 100 AS BIGINT)"
            ).alias("y")
        )
        .localCheckpoint(eager=True)
    )
    idx = monthly.select(
        "y",
        F.row_number().over(Window.orderBy("month")).cast("bigint").alias("t"),
    ).localCheckpoint(eager=True)
    s = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    e = idx.crossJoin(F.broadcast(s)).selectExpr(
        "t", "CAST(n AS DECIMAL(38,0)) * y - sy AS e", "n"
    ).localCheckpoint(eager=True)  # bounded; feeds g0 + 11 lag joins
    g0 = e.agg(F.sum(F.expr("e * e")).alias("g"))
    js = (
        spark.range(2, 13)
        .select(F.col("id").cast("bigint").alias("j"))
    )
    gj = (
        e.alias("a")
        .join(F.broadcast(js), F.expr("true"))
        .join(e.alias("b"), F.expr("b.t = a.t - j"))
        .selectExpr("j", "a.e * b.e AS p")
        .groupBy("j")
        .agg(F.sum("p").alias("g"))
    )
    best = gj.select(
        "j",
        "g",
        F.row_number()
        .over(Window.orderBy(F.col("g").desc(), F.col("j").asc()))
        .alias("rk"),
    ).filter(F.col("rk") == 1)
    n_row = s.select("n")
    return (
        best.crossJoin(F.broadcast(g0.withColumnRenamed("g", "g0")))
        .crossJoin(F.broadcast(n_row))
        .selectExpr(
            "n AS n_months",
            "CAST(j AS BIGINT) AS dominant_lag",
            "CASE WHEN g0 > 0 THEN CAST("
            " (CASE WHEN g >= 0 THEN 1 ELSE -1 END)"
            " * ((abs(g) * 1000000) div g0) AS BIGINT) END AS acf_ppm",
        )
    )


@register(
    "engle_granger_rev_qty",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', l_shipdate) AS month,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) // 100 AS BIGINT) AS x,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT x, q, CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS t
      FROM monthly
    ), s AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sq, SUM(q::HUGEINT * q) AS sq2,
             CAST(SUM(x) AS BIGINT) AS sx, SUM(q::HUGEINT * x) AS sqx
      FROM idx
    ), coef AS MATERIALIZED (
      SELECT n, (n * sqx - sq::HUGEINT * sx) AS nb,
             (sx::HUGEINT * sq2 - sq::HUGEINT * sqx) AS anum,
             (n::HUGEINT * sq2 - sq::HUGEINT * sq) AS d
      FROM s
    ), resid AS MATERIALIZED (
      -- residual rescaled to whole dollars: the D-scaled integer
      -- overflows HUGEINT once quantities grow, so divide back by D
      -- with the sign factored out (both engines floor abs//pos
      -- identically)
      SELECT t,
             (CASE WHEN (coef.d * x - coef.anum - coef.nb * q) >= 0
                   THEN 1 ELSE -1 END)
             * (abs(coef.d * x - coef.anum - coef.nb * q) // coef.d) AS e
      FROM idx, coef WHERE coef.d > 0
    ), adf AS MATERIALIZED (
      SELECT SUM(b.e * (a.e - b.e)) AS sxy,
             SUM(b.e * b.e) AS sxx,
             SUM((a.e - b.e)::HUGEINT * (a.e - b.e)) AS sdd,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM resid a JOIN resid b ON b.t = a.t - 1
    )
    SELECT (SELECT n FROM s) AS n_months, adf.m AS n_diffs,
           CASE WHEN adf.sxx > 0 AND adf.m > 1
                 AND CAST(adf.sdd AS DOUBLE)
                     - CAST(adf.sxy AS DOUBLE) * CAST(adf.sxy AS DOUBLE)
                       / CAST(adf.sxx AS DOUBLE) > 0e0
           THEN CAST(floor(
             CAST(adf.sxy AS DOUBLE) / CAST(adf.sxx AS DOUBLE)
             / sqrt((CAST(adf.sdd AS DOUBLE)
                     - CAST(adf.sxy AS DOUBLE) * CAST(adf.sxy AS DOUBLE)
                       / CAST(adf.sxx AS DOUBLE))
                    / (CAST(adf.m AS DOUBLE) - 1e0)
                    / CAST(adf.sxx AS DOUBLE))
             * 1000e0) AS BIGINT) END AS adf_t_milli
    FROM adf
    """,
)
def engle_granger_rev_qty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger cointegration check (Econometrica 1987) between
    monthly revenue and monthly quantity: OLS of revenue on quantity,
    then a Dickey-Fuller t-statistic on the RESIDUALS (no constant,
    no lags: Δe_t = ρ·e_{t−1} + u) — strongly negative t means the
    residual mean-reverts, i.e. the two series share a long-run
    relation the individual trends hide.

    Determinism: stage-1 residuals come from the exact D-scaled
    integers ẽ = D·x − (Σx·Σq² − Σq·Σqx) − Nb·q, rescaled to WHOLE
    DOLLARS by a sign-factored exact division by D (the raw ẽ is
    quantity-scaled and would overflow 128-bit at large SF; both
    engines floor abs//positive identically); the DF regression then
    reduces to three exact sums over the bounded month table
    (Σe₋Δe, Σe₋², ΣΔe²) and
    the t-statistic t = ρ̂/se(ρ̂) evaluates in DOUBLE with one fixed
    IEEE expression (z_milli class; ρ̂ = Σe₋Δe/Σe₋²,
    se² = (ΣΔe² − ρ̂·Σe₋Δe)/((m−1)·Σe₋²)). Degenerate inputs (zero
    variance, perfect fit) emit NULL.

    Scale shape: one data-sized month aggregation over lineitem;
    everything after runs on the bounded month table."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    monthly = (
        li.groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("month"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100"
                " AS BIGINT)) div 100 AS BIGINT)"
            ).alias("x"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"),
        )
        .localCheckpoint(eager=True)
    )
    idx = monthly.select(
        "x",
        "q",
        F.row_number().over(Window.orderBy("month")).cast("bigint").alias("t"),
    ).localCheckpoint(eager=True)
    s = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum(F.expr("CAST(q AS DECIMAL(38,0)) * q")).alias("sq2"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.expr("CAST(q AS DECIMAL(38,0)) * x")).alias("sqx"),
    )
    coef = s.selectExpr(
        "n",
        "CAST(n * sqx - CAST(sq AS DECIMAL(38,0)) * sx AS DECIMAL(38,0)) AS nb",
        "CAST(CAST(sx AS DECIMAL(38,0)) * sq2"
        " - CAST(sq AS DECIMAL(38,0)) * sqx AS DECIMAL(38,0)) AS anum",
        "CAST(CAST(n AS DECIMAL(38,0)) * sq2"
        " - CAST(sq AS DECIMAL(38,0)) * sq AS DECIMAL(38,0)) AS d",
    )
    resid = (
        idx.crossJoin(F.broadcast(coef))
        .filter(F.expr("d > 0"))
        .selectExpr(
            "t",
            # whole-dollar residual, sign-factored exact division
            "CAST((CASE WHEN (d * x - anum - nb * q) >= 0 THEN 1 ELSE -1 END)"
            " * (abs(d * x - anum - nb * q) div d) AS DECIMAL(38,0)) AS e",
        )
        .localCheckpoint(eager=True)  # bounded; feeds the lag join
    )
    adf = (
        resid.alias("a")
        .join(resid.alias("b"), F.expr("b.t = a.t - 1"))
        .selectExpr(
            "b.e AS ep",
            "a.e - b.e AS de",
        )
        .agg(
            F.sum(F.expr("ep * de")).alias("sxy"),
            F.sum(F.expr("ep * ep")).alias("sxx"),
            F.sum(F.expr("de * de")).alias("sdd"),
            F.count(F.lit(1)).cast("bigint").alias("m"),
        )
    )
    n_row = s.select("n")
    return adf.crossJoin(F.broadcast(n_row)).selectExpr(
        "n AS n_months",
        "m AS n_diffs",
        "CASE WHEN sxx > 0 AND m > 1"
        " AND CAST(sdd AS DOUBLE)"
        "     - CAST(sxy AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "       / CAST(sxx AS DOUBLE) > 0e0"
        " THEN CAST(floor("
        " CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE)"
        " / sqrt((CAST(sdd AS DOUBLE)"
        "         - CAST(sxy AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "           / CAST(sxx AS DOUBLE))"
        "        / (CAST(m AS DOUBLE) - 1e0)"
        "        / CAST(sxx AS DOUBLE))"
        " * 1000e0) AS BIGINT) END AS adf_t_milli",
    )


@register(
    "arc_elasticity_brands",
    """
    WITH bounds AS MATERIALIZED (
      SELECT CAST(min(epoch_us(l_shipdate)) AS BIGINT) AS t0,
             CAST(max(epoch_us(l_shipdate)) AS BIGINT) AS t1
      FROM lineitem
    ), halves AS MATERIALIZED (
      SELECT p.p_brand AS brand,
             CASE WHEN epoch_us(l.l_shipdate) * 2 < bounds.t0 + bounds.t1
                  THEN 0 ELSE 1 END AS h,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey, bounds
      GROUP BY 1, 2
    ), wide AS MATERIALIZED (
      SELECT brand,
             CAST(MAX(CASE WHEN h = 0 THEN qty END) AS BIGINT) AS q1,
             CAST(MAX(CASE WHEN h = 1 THEN qty END) AS BIGINT) AS q2,
             CAST(MAX(CASE WHEN h = 0 THEN rev_cents END) AS BIGINT) AS r1,
             CAST(MAX(CASE WHEN h = 1 THEN rev_cents END) AS BIGINT) AS r2
      FROM halves GROUP BY 1
    )
    SELECT brand AS p_brand, q1, q2,
           CASE WHEN q1 > 0 AND q2 > 0 AND q1 + q2 > 0
                 AND (r2::HUGEINT * q1 - r1::HUGEINT * q2) <> 0
           THEN CAST(
             (CASE WHEN (q2 - q1)::HUGEINT
                        * (r1::HUGEINT * q2 + r2::HUGEINT * q1)
                        * (r2::HUGEINT * q1 - r1::HUGEINT * q2) >= 0
                   THEN 1 ELSE -1 END)
             * ((abs((q2 - q1)::HUGEINT
                     * (r1::HUGEINT * q2 + r2::HUGEINT * q1)) * 1000000)
                // (abs(r2::HUGEINT * q1 - r1::HUGEINT * q2)
                    * (q1 + q2))) AS BIGINT)
           END AS arc_elasticity_ppm
    FROM wide
    ORDER BY p_brand
    """,
)
def arc_elasticity_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arc (midpoint) price elasticity of demand per brand (Allen &
    Lerner's midpoint formula) between the first and second halves of
    the shipping window: E = (ΔQ/Q̄)/(ΔP/P̄) with average unit price
    P = revenue/quantity — the log-free elasticity every pricing
    analysis starts with, complementing ``group_linregress_qty_disc``
    (within-period slope) with a between-period response.

    Exactness: substituting P_i = r_i/q_i and clearing fractions
    gives E = ((q2−q1)·(r1·q2 + r2·q1)) / ((r2·q1 − r1·q2)·(q1+q2))
    — pure exact cents/count integers, ONE sign-factored truncating
    division (sign = product of the two factors' signs). Brands
    missing a half or with zero price change emit NULL.

    Scale shape: one equi-keyed lineitem x part join into the
    brand x half grid (<= 50 rows); the epoch midpoint split uses the
    DATA's observed range, never a schema epoch (CLAUDE.md rule)."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    bounds = li.agg(
        F.min(epoch_micros(F.col("l_shipdate"))).cast("bigint").alias("t0"),
        F.max(epoch_micros(F.col("l_shipdate"))).cast("bigint").alias("t1"),
    )
    halves = (
        li.join(
            pt.select("p_partkey", "p_brand"),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "h",
            (
                epoch_micros(F.col("l_shipdate")) * 2
                >= F.col("t0") + F.col("t1")
            ).cast("int"),
        )
        .groupBy(F.col("p_brand").alias("brand"), "h")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
            F.sum(
                F.expr(
                    "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100"
                    " AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("rev_cents"),
        )
    )
    wide = halves.groupBy("brand").agg(
        F.max(F.expr("CASE WHEN h = 0 THEN qty END")).cast("bigint").alias("q1"),
        F.max(F.expr("CASE WHEN h = 1 THEN qty END")).cast("bigint").alias("q2"),
        F.max(F.expr("CASE WHEN h = 0 THEN rev_cents END"))
        .cast("bigint")
        .alias("r1"),
        F.max(F.expr("CASE WHEN h = 1 THEN rev_cents END"))
        .cast("bigint")
        .alias("r2"),
    )
    return wide.selectExpr(
        "brand AS p_brand",
        "q1",
        "q2",
        "CASE WHEN q1 > 0 AND q2 > 0 AND q1 + q2 > 0"
        " AND (CAST(r2 AS DECIMAL(38,0)) * q1"
        "      - CAST(r1 AS DECIMAL(38,0)) * q2) <> 0"
        " THEN CAST("
        " (CASE WHEN (q2 - q1)"
        "            * (CAST(r1 AS DECIMAL(38,0)) * q2"
        "               + CAST(r2 AS DECIMAL(38,0)) * q1)"
        "            * (CAST(r2 AS DECIMAL(38,0)) * q1"
        "               - CAST(r1 AS DECIMAL(38,0)) * q2) >= 0"
        "       THEN 1 ELSE -1 END)"
        " * ((abs(CAST(q2 - q1 AS DECIMAL(38,0))"
        "         * (CAST(r1 AS DECIMAL(38,0)) * q2"
        "            + CAST(r2 AS DECIMAL(38,0)) * q1)) * 1000000)"
        "    div (abs(CAST(r2 AS DECIMAL(38,0)) * q1"
        "             - CAST(r1 AS DECIMAL(38,0)) * q2)"
        "         * (q1 + q2))) AS BIGINT)"
        " END AS arc_elasticity_ppm",
    ).orderBy("p_brand")
