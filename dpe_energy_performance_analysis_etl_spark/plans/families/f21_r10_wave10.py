"""Round 10, wave 10: PACF lag-2, seasonal/trend strength, Tukey
median polish."""

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
# Round 10, wave 10: PACF, seasonal strength, median polish
# =====================================================================

@register(
    "pacf_lag2_revenue",
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
    ), g AS MATERIALIZED (
      SELECT CAST(SUM(e * e) AS HUGEINT) AS g0,
             (SELECT SUM(a.e * b.e) FROM e a JOIN e b ON b.t = a.t - 1)
               AS g1,
             (SELECT SUM(a.e * b.e) FROM e a JOIN e b ON b.t = a.t - 2)
               AS g2
      FROM e
    )
    SELECT (SELECT n FROM s) AS n_months,
           CASE WHEN g0 > 0 THEN CAST(
             (CASE WHEN g1 >= 0 THEN 1 ELSE -1 END)
             * ((abs(g1) * 1000000) // g0) AS BIGINT) END AS phi11_ppm,
           CASE WHEN CAST(g0 AS DOUBLE) * CAST(g0 AS DOUBLE)
                     - CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE) > 0e0
           THEN CAST(floor(
             (CAST(g2 AS DOUBLE) * CAST(g0 AS DOUBLE)
              - CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE))
             / (CAST(g0 AS DOUBLE) * CAST(g0 AS DOUBLE)
                - CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE))
             * 1000000e0) AS BIGINT) END AS phi22_ppm
    FROM g
    """,
)
def pacf_lag2_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation at lag 2 via one Durbin-Levinson step
    (Box-Jenkins model identification: ACF tails off for AR, PACF
    CUTS OFF at the AR order — the companion diagnostic to
    ``lag_autocorr_revenue``/``dominant_period_revenue`` that tells
    an AR(1) from an AR(2)): φ₁₁ = γ₁/γ₀ and
    φ₂₂ = (γ₂γ₀ − γ₁²)/(γ₀² − γ₁²) on monthly revenue.

    Determinism: the autocovariances are exact integers (n-scaled
    centered whole-dollar months, shared denominators); φ₁₁ is one
    sign-factored integer division; φ₂₂'s γ₀² would overflow 128-bit
    where the γ's are still exact, so it evaluates in DOUBLE with
    the fixed IEEE expression (double-floor class).

    Scale shape: one data-sized month aggregation; two lag joins on
    the bounded month table."""
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
    ).localCheckpoint(eager=True)  # bounded; feeds g0/g1/g2
    g0 = e.agg(F.sum(F.expr("e * e")).alias("g0"))
    g1 = (
        e.alias("a")
        .join(e.alias("b"), F.expr("b.t = a.t - 1"))
        .selectExpr("a.e * b.e AS p")
        .agg(F.sum("p").alias("g1"))
    )
    g2 = (
        e.alias("a")
        .join(e.alias("b"), F.expr("b.t = a.t - 2"))
        .selectExpr("a.e * b.e AS p")
        .agg(F.sum("p").alias("g2"))
    )
    n_row = s.select("n")
    return (
        g0.crossJoin(F.broadcast(g1))
        .crossJoin(F.broadcast(g2))
        .crossJoin(F.broadcast(n_row))
        .selectExpr(
            "n AS n_months",
            "CASE WHEN g0 > 0 THEN CAST("
            " (CASE WHEN g1 >= 0 THEN 1 ELSE -1 END)"
            " * ((abs(g1) * 1000000) div g0) AS BIGINT) END AS phi11_ppm",
            "CASE WHEN CAST(g0 AS DOUBLE) * CAST(g0 AS DOUBLE)"
            "      - CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE) > 0e0"
            " THEN CAST(floor("
            " (CAST(g2 AS DOUBLE) * CAST(g0 AS DOUBLE)"
            "  - CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE))"
            " / (CAST(g0 AS DOUBLE) * CAST(g0 AS DOUBLE)"
            "    - CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE))"
            " * 1000000e0) AS BIGINT) END AS phi22_ppm",
        )
    )


_STRENGTH_HEAD = """
    , comp AS MATERIALIZED (
      SELECT d.detrended_scaled AS dd,
             CAST(d.detrended_scaled - m.seasonal_scaled AS BIGINT) AS rr,
             CAST(d.trend_scaled + d.detrended_scaled - m.seasonal_scaled
                  AS BIGINT) AS ds
      FROM detr d JOIN med m ON d.t % 12 = m.phase
    ), v AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             (COUNT(*)::HUGEINT * SUM(dd::HUGEINT * dd)
              - SUM(dd)::HUGEINT * SUM(dd)) AS vd,
             (COUNT(*)::HUGEINT * SUM(rr::HUGEINT * rr)
              - SUM(rr)::HUGEINT * SUM(rr)) AS vr,
             (COUNT(*)::HUGEINT * SUM(ds::HUGEINT * ds)
              - SUM(ds)::HUGEINT * SUM(ds)) AS vds
      FROM comp
    )
    SELECT n AS n_months,
           CASE WHEN vd > 0 THEN CAST(
             (CASE WHEN vd >= vr THEN 1 ELSE -1 END)
             * ((abs(vd - vr) * 1000000) // vd) AS BIGINT)
           END AS seasonal_strength_ppm,
           CASE WHEN vds > 0 THEN CAST(
             (CASE WHEN vds >= vr THEN 1 ELSE -1 END)
             * ((abs(vds - vr) * 1000000) // vds) AS BIGINT)
           END AS trend_strength_ppm
    FROM v
"""


@register(
    "seasonal_strength_revenue",
    ORACLE_SQL["seasonal_decompose_revenue"].replace(
        """
    SELECT d.t, d.y, d.trend_scaled, d.detrended_scaled, m.seasonal_scaled,
           CAST(d.detrended_scaled - m.seasonal_scaled AS BIGINT)
             AS remainder_scaled
    FROM detr d JOIN med m ON d.t % 12 = m.phase
    """,
        _STRENGTH_HEAD,
    ),
)
def seasonal_strength_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal and trend STRENGTH of monthly revenue (Hyndman &
    Athanasopoulos, FPP3 §4.3): F_s = max-ish(1 − Var(remainder)/
    Var(seasonal+remainder)) and F_t = 1 − Var(remainder)/
    Var(trend+remainder), computed from the exact integer components
    of ``seasonal_decompose_revenue`` — the one-number summaries that
    say whether the decomposition's season/trend are real or noise.

    Exactness: every component is an exact BIGINT from the
    decomposition; the variances are n-scaled integer forms
    (n·Σx² − (Σx)², the common n² factor cancels in the ratio), and
    each strength is one sign-factored truncating division (the
    textbook max(0, ·) clamp is NOT applied — a negative value is
    honest evidence the component is noise; documented).

    Scale shape: the decomposition's one data-sized aggregation, then
    scalar algebra over the bounded interior-month table."""
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
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    dec = seasonal_decompose(monthly, "m", "cents", period=12, scale=1000)
    comp = dec.selectExpr(
        "detrended_scaled AS dd",
        "remainder_scaled AS rr",
        "CAST(trend_scaled + remainder_scaled AS BIGINT) AS ds",
    )
    v = comp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(
            "CAST(COUNT(*) AS DECIMAL(38,0))"
            " * SUM(CAST(dd AS DECIMAL(38,0)) * dd)"
            " - CAST(SUM(dd) AS DECIMAL(38,0)) * SUM(dd)"
        ).alias("vd"),
        F.expr(
            "CAST(COUNT(*) AS DECIMAL(38,0))"
            " * SUM(CAST(rr AS DECIMAL(38,0)) * rr)"
            " - CAST(SUM(rr) AS DECIMAL(38,0)) * SUM(rr)"
        ).alias("vr"),
        F.expr(
            "CAST(COUNT(*) AS DECIMAL(38,0))"
            " * SUM(CAST(ds AS DECIMAL(38,0)) * ds)"
            " - CAST(SUM(ds) AS DECIMAL(38,0)) * SUM(ds)"
        ).alias("vds"),
    )
    return v.selectExpr(
        "n AS n_months",
        "CASE WHEN vd > 0 THEN CAST("
        " (CASE WHEN vd >= vr THEN 1 ELSE -1 END)"
        " * ((abs(vd - vr) * 1000000) div vd) AS BIGINT)"
        " END AS seasonal_strength_ppm",
        "CASE WHEN vds > 0 THEN CAST("
        " (CASE WHEN vds >= vr THEN 1 ELSE -1 END)"
        " * ((abs(vds - vr) * 1000000) div vds) AS BIGINT)"
        " END AS trend_strength_ppm",
    )


@register(
    "median_polish_nation_priority",
    """
    WITH cells AS MATERIALIZED (
      SELECT n.n_name AS block,
             CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS trt,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS v
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), rmed AS MATERIALIZED (
      SELECT block, v AS row_eff FROM (
        SELECT block, v,
               row_number() OVER (PARTITION BY block ORDER BY v, trt) AS rk,
               COUNT(*) OVER (PARTITION BY block) AS cnt
        FROM cells
      ) WHERE rk = (cnt + 1) // 2
    ), r1 AS MATERIALIZED (
      SELECT c.block, c.trt, CAST(c.v - r.row_eff AS BIGINT) AS v1,
             r.row_eff
      FROM cells c JOIN rmed r ON c.block = r.block
    ), cmed AS MATERIALIZED (
      SELECT trt, v1 AS col_eff FROM (
        SELECT trt, v1,
               row_number() OVER (PARTITION BY trt ORDER BY v1, block) AS rk,
               COUNT(*) OVER (PARTITION BY trt) AS cnt
        FROM r1
      ) WHERE rk = (cnt + 1) // 2
    )
    SELECT r1.block AS n_name, r1.trt AS priority,
           CAST(r1.row_eff AS BIGINT) AS row_effect_cents,
           CAST(cmed.col_eff AS BIGINT) AS col_effect_cents,
           CAST(r1.v1 - cmed.col_eff AS BIGINT) AS resid_cents
    FROM r1 JOIN cmed ON r1.trt = cmed.trt
    """,
)
def median_polish_nation_priority_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One sweep of Tukey's median polish (EDA 1977) on the nation x
    priority revenue table: row effects = within-nation LOW medians,
    column effects = low medians of the row-centered residuals,
    residual = cell − row − column — the ROBUST two-way decomposition
    (Friedman/Page/Quade TEST the same grid; median polish DESCRIBES
    it, outlier-proof where a two-way mean ANOVA is not).

    Exactness: exact cents everywhere; both median passes are
    deterministic LOW-median order statistics (rank (cnt+1) div 2
    under (value, index) ordering — the NOTES order-statistics rule);
    subtraction is integer. One sweep (not iterated to convergence)
    is pinned as the contract — deterministic and already
    outlier-robust; further sweeps change effects by low-order terms.

    Scale shape: one equi-keyed orders x customer x nation join into
    the ≤125-cell grid; all windows run on the bounded grid."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cells = (
        o.join(
            c.select("c_custkey", "c_nationkey"),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("block"),
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("trt"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("v")
        )
        .localCheckpoint(eager=True)  # bounded grid; feeds both sweeps
    )
    wr = Window.partitionBy("block").orderBy("v", "trt")
    wrc = Window.partitionBy("block")
    rmed = (
        cells.select(
            "block",
            "v",
            F.row_number().over(wr).alias("rk"),
            F.count(F.lit(1)).over(wrc).alias("cnt"),
        )
        .filter(F.expr("rk = (cnt + 1) div 2"))
        .select("block", F.col("v").alias("row_eff"))
    )
    r1 = cells.join(rmed, "block").select(
        "block",
        "trt",
        (F.col("v") - F.col("row_eff")).cast("bigint").alias("v1"),
        "row_eff",
    ).localCheckpoint(eager=True)  # bounded; feeds col sweep + output
    wc = Window.partitionBy("trt").orderBy("v1", "block")
    wcc = Window.partitionBy("trt")
    cmed = (
        r1.select(
            "trt",
            "v1",
            F.row_number().over(wc).alias("rk"),
            F.count(F.lit(1)).over(wcc).alias("cnt"),
        )
        .filter(F.expr("rk = (cnt + 1) div 2"))
        .select("trt", F.col("v1").alias("col_eff"))
    )
    return r1.join(cmed, "trt").select(
        F.col("block").alias("n_name"),
        F.col("trt").alias("priority"),
        F.col("row_eff").cast("bigint").alias("row_effect_cents"),
        F.col("col_eff").cast("bigint").alias("col_effect_cents"),
        (F.col("v1") - F.col("col_eff")).cast("bigint").alias("resid_cents"),
    )
