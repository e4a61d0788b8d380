"""Round 11, wave 3: forecast-accuracy + statistical-process-control
suite over the monthly revenue series — Theil's U2, sMAPE/WAPE,
Cox-Stuart trend, tracking signal, Western Electric run rules,
c-chart.

Shared exactness recipe: the series is the ~80-row month-grain
aggregate in exact whole dollars; errors of lag-based forecasts are
exact integers; ratios go through one floored double expression
(sqrt allowed — IEEE correctly rounded), and any per-period
fractional term is floored at a declared integer scale FIRST and the
floors summed exactly (the f25 quantized-sum contract). All windows
run over the calendar-bounded month table.
"""

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

_MONTHLY_SQL = """
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) // 100 AS BIGINT) AS y
      FROM orders GROUP BY 1
"""


def _monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100"
            " AS BIGINT)) div 100 AS BIGINT)"
        ).alias("y")
    )


@register(
    "theil_u2_monthly_revenue",
    f"""
    WITH monthly AS MATERIALIZED ({_MONTHLY_SQL}
    ), lagged AS MATERIALIZED (
      SELECT y,
             lag(y, 12) OVER (ORDER BY month) AS f,
             lag(y, 1) OVER (ORDER BY month) AS prev
      FROM monthly
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM((y::HUGEINT - f) * (y::HUGEINT - f)) AS se_f,
             SUM((y::HUGEINT - prev) * (y::HUGEINT - prev)) AS se_n
      FROM lagged WHERE f IS NOT NULL AND prev IS NOT NULL
    )
    SELECT n AS n_months,
           CAST(floor(1000e0 * sqrt(CAST(se_f AS DOUBLE)
                                    / CAST(se_n AS DOUBLE))) AS BIGINT)
             AS theil_u2_milli
    FROM agg
    """,
)
def theil_u2_monthly_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U2 for the seasonal-naive (lag-12) forecast of monthly
    revenue against the naive (lag-1) baseline (Theil 1966): U2 < 1
    means seasonality carries real signal beyond persistence — the
    ratio companion of ``seasonal_naive_mase``. Squared errors of
    both forecasts are exact integers summed in HUGEINT/DECIMAL; one
    sqrt ratio, floored milli. Windows run over the ~80-row month
    table."""
    monthly = _monthly(spark, sf_dir)
    w = Window.orderBy("month")
    lagged = monthly.select(
        "y",
        F.lag("y", 12).over(w).alias("f"),
        F.lag("y", 1).over(w).alias("prev"),
    ).where(F.col("f").isNotNull() & F.col("prev").isNotNull())
    agg = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("CAST(y - f AS DECIMAL(38,0)) * (y - f)")).alias("se_f"),
        F.sum(F.expr("CAST(y - prev AS DECIMAL(38,0)) * (y - prev)")).alias("se_n"),
    )
    return agg.selectExpr(
        "n AS n_months",
        "CAST(floor(1000e0 * sqrt(CAST(se_f AS DOUBLE)"
        " / CAST(se_n AS DOUBLE))) AS BIGINT) AS theil_u2_milli",
    )


@register(
    "smape_wape_naive_monthly",
    f"""
    WITH monthly AS MATERIALIZED ({_MONTHLY_SQL}
    ), lagged AS MATERIALIZED (
      SELECT y, lag(y, 1) OVER (ORDER BY month) AS f
      FROM monthly
    ), terms AS MATERIALIZED (
      SELECT y, f, abs(y::HUGEINT - f) AS ae,
             (2000000 * abs(y::HUGEINT - f)) // (y::HUGEINT + f) AS smape_micro
      FROM lagged WHERE f IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
           CAST(floor(1e6 * CAST(SUM(ae) AS DOUBLE)
                      / CAST(SUM(y::HUGEINT) AS DOUBLE)) AS BIGINT) AS wape_ppm,
           CAST(SUM(smape_micro) // COUNT(*) AS BIGINT) AS smape_mean_micro
    FROM terms
    """,
)
def smape_wape_naive_monthly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAPE and sMAPE of the naive (lag-1) forecast on monthly
    revenue — the two denominators that matter in practice: WAPE
    aggregates |error| over aggregate volume (robust to near-zero
    months); sMAPE bounds each month's term at 200%. WAPE is one
    floored ratio of exact integer sums; each sMAPE term is floored
    at micro scale on NONNEGATIVE integers (Spark div == DuckDB //)
    and the floors average exactly (f25 quantized-sum contract)."""
    monthly = _monthly(spark, sf_dir)
    w = Window.orderBy("month")
    lagged = monthly.select(
        "y", F.lag("y", 1).over(w).alias("f")
    ).where(F.col("f").isNotNull())
    terms = lagged.selectExpr(
        "y",
        "f",
        "abs(CAST(y AS DECIMAL(38,0)) - f) AS ae",
        "(2000000 * abs(CAST(y AS DECIMAL(38,0)) - f))"
        " div (CAST(y AS DECIMAL(38,0)) + f) AS smape_micro",
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.expr(
            "CAST(floor(1e6 * CAST(SUM(ae) AS DOUBLE)"
            " / CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE)) AS BIGINT)"
        ).alias("wape_ppm"),
        F.expr(
            "CAST(SUM(smape_micro) div COUNT(*) AS BIGINT)"
        ).alias("smape_mean_micro"),
    )


@register(
    "cox_stuart_trend_revenue",
    f"""
    WITH monthly AS MATERIALIZED ({_MONTHLY_SQL}
    ), idx AS MATERIALIZED (
      SELECT y, CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS t,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM monthly
    ), pairs AS MATERIALIZED (
      SELECT a.y AS y1, b.y AS y2
      FROM idx a JOIN idx b ON b.t = a.t + (a.n // 2)
      WHERE a.t <= a.n // 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN y2 > y1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN y2 < y1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
           CAST(floor(1000e0 *
             (CAST(SUM(CASE WHEN y2 > y1 THEN 1 ELSE 0 END) AS DOUBLE)
              - CAST(SUM(CASE WHEN y2 <> y1 THEN 1 ELSE 0 END) AS DOUBLE) / 2e0)
             / sqrt(CAST(SUM(CASE WHEN y2 <> y1 THEN 1 ELSE 0 END) AS DOUBLE)
                    / 4e0)) AS BIGINT) AS z_milli
    FROM pairs
    """,
)
def cox_stuart_trend_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox-Stuart trend test on monthly revenue (Cox & Stuart 1955):
    pair month t with month t + n/2 and sign-test the differences —
    the distribution-free trend check that needs no rank machinery
    (``mann_kendall_user_values`` is the all-pairs version). Counts
    are exact; z uses the untied-pair count m: z = (pos - m/2) /
    sqrt(m/4), floored milli. The pairing join is equi on the month
    index over the ~80-row table."""
    monthly = _monthly(spark, sf_dir)
    w = Window.orderBy("month")
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    idx = monthly.select(
        "y",
        F.row_number().over(w).cast("bigint").alias("t"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
    )
    a = idx.selectExpr("y AS y1", "t AS t1", "n")
    b = idx.selectExpr("y AS y2", "t AS t2")
    pairs = a.join(b, F.col("t2") == F.col("t1") + F.expr("n div 2")).where(
        F.col("t1") <= F.expr("n div 2")
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.expr("CASE WHEN y2 > y1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.expr("CASE WHEN y2 < y1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_neg"),
        F.expr(
            "CAST(floor(1000e0 *"
            " (CAST(SUM(CASE WHEN y2 > y1 THEN 1 ELSE 0 END) AS DOUBLE)"
            "  - CAST(SUM(CASE WHEN y2 <> y1 THEN 1 ELSE 0 END) AS DOUBLE) / 2e0)"
            " / sqrt(CAST(SUM(CASE WHEN y2 <> y1 THEN 1 ELSE 0 END) AS DOUBLE)"
            "        / 4e0)) AS BIGINT)"
        ).alias("z_milli"),
    )


@register(
    "tracking_signal_naive_monthly",
    f"""
    WITH monthly AS MATERIALIZED ({_MONTHLY_SQL}
    ), lagged AS MATERIALIZED (
      SELECT y::HUGEINT - lag(y, 1) OVER (ORDER BY month) AS e
      FROM monthly
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(e) AS BIGINT) AS se,
             CAST(SUM(abs(e)) AS BIGINT) AS sae
      FROM lagged WHERE e IS NOT NULL
    )
    SELECT n AS n_months, se AS sum_error, sae AS sum_abs_error,
           CAST(floor(1000e0 * CAST(se AS DOUBLE) * CAST(n AS DOUBLE)
                      / CAST(sae AS DOUBLE)) AS BIGINT) AS tracking_milli
    FROM agg
    """,
)
def tracking_signal_naive_monthly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast tracking signal for the naive lag-1 forecast of
    monthly revenue (Trigg 1964): TS = cumulative error / MAD =
    n * SUM(e) / SUM(|e|) — the bias alarm a demand-planning monitor
    trips at |TS| > 4-6. Integer error sums, one floored (possibly
    negative — floor in DOUBLE, identical both engines) milli
    ratio."""
    monthly = _monthly(spark, sf_dir)
    w = Window.orderBy("month")
    lagged = monthly.select(
        F.expr("CAST(y AS DECIMAL(38,0))").alias("yc"),
        F.lag("y", 1).over(w).alias("prev"),
    ).where(F.col("prev").isNotNull())
    agg = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("yc - prev")).cast("bigint").alias("se"),
        F.sum(F.expr("abs(yc - prev)")).cast("bigint").alias("sae"),
    )
    return agg.selectExpr(
        "n AS n_months",
        "se AS sum_error",
        "sae AS sum_abs_error",
        "CAST(floor(1000e0 * CAST(se AS DOUBLE) * CAST(n AS DOUBLE)"
        " / CAST(sae AS DOUBLE)) AS BIGINT) AS tracking_milli",
    )


@register(
    "western_electric_revenue",
    f"""
    WITH monthly AS MATERIALIZED ({_MONTHLY_SQL}
    ), stats AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s,
             SUM(y::HUGEINT * y) AS q
      FROM monthly
    ), z AS MATERIALIZED (
      SELECT month,
             (CAST(y AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / sqrt((CAST(q AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1e0)) AS zv
      FROM monthly, stats
    ), flags AS MATERIALIZED (
      SELECT month, zv,
        CASE WHEN abs(zv) > 3e0 THEN 1 ELSE 0 END AS r1,
        CASE WHEN (CASE WHEN zv > 2e0 THEN 1 ELSE 0 END)
             + (CASE WHEN lag(zv, 1) OVER (ORDER BY month) > 2e0 THEN 1 ELSE 0 END)
             + (CASE WHEN lag(zv, 2) OVER (ORDER BY month) > 2e0 THEN 1 ELSE 0 END)
             >= 2 OR
             (CASE WHEN zv < -2e0 THEN 1 ELSE 0 END)
             + (CASE WHEN lag(zv, 1) OVER (ORDER BY month) < -2e0 THEN 1 ELSE 0 END)
             + (CASE WHEN lag(zv, 2) OVER (ORDER BY month) < -2e0 THEN 1 ELSE 0 END)
             >= 2 THEN 1 ELSE 0 END AS r2,
        CASE WHEN SUM(CASE WHEN zv > 1e0 THEN 1 ELSE 0 END)
               OVER (ORDER BY month ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) >= 4
             OR SUM(CASE WHEN zv < -1e0 THEN 1 ELSE 0 END)
               OVER (ORDER BY month ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) >= 4
             THEN 1 ELSE 0 END AS r3,
        CASE WHEN SUM(CASE WHEN zv > 0e0 THEN 1 ELSE 0 END)
               OVER (ORDER BY month ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) = 8
             OR SUM(CASE WHEN zv < 0e0 THEN 1 ELSE 0 END)
               OVER (ORDER BY month ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) = 8
             THEN 1 ELSE 0 END AS r4
      FROM z
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
           CAST(SUM(r1) AS BIGINT) AS rule1_hits,
           CAST(SUM(r2) AS BIGINT) AS rule2_hits,
           CAST(SUM(r3) AS BIGINT) AS rule3_hits,
           CAST(SUM(r4) AS BIGINT) AS rule4_hits
    FROM flags
    """,
)
def western_electric_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Western Electric run rules on the monthly revenue control
    chart (WECO 1956): months flagged by rule 1 (|z| > 3), rule 2
    (2 of 3 consecutive beyond 2 sigma, same side), rule 3 (4 of 5
    beyond 1 sigma, same side), rule 4 (8 consecutive same side) —
    the pattern alarms a plain 3-sigma chart misses. z from exact
    (n, S, Q); rule windows are lag/rolling counts over the
    calendar-bounded month table; identical double comparisons both
    engines."""
    monthly = _monthly(spark, sf_dir).cache()  # ~80 rows; stats + z
    stats = monthly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("q"),
    )
    z = monthly.crossJoin(F.broadcast(stats)).selectExpr(
        "month",
        "(CAST(y AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
        " / sqrt((CAST(q AS DOUBLE)"
        "         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
        "        / (CAST(n AS DOUBLE) - 1e0)) AS zv",
    )
    w = Window.orderBy("month")
    w5 = w.rowsBetween(-4, 0)
    w8 = w.rowsBetween(-7, 0)
    gt = lambda thr: F.when(F.col("zv") > thr, 1).otherwise(0)  # noqa: E731
    lt = lambda thr: F.when(F.col("zv") < thr, 1).otherwise(0)  # noqa: E731
    flags = z.select(
        "month",
        F.when(F.abs(F.col("zv")) > 3.0, 1).otherwise(0).alias("r1"),
        # lagged indicators COALESCE to 0 at the series head — the
        # oracle's CASE-wrapped lags yield 0 there, not NULL
        F.when(
            (
                gt(2.0)
                + F.coalesce(F.lag(gt(2.0), 1).over(w), F.lit(0))
                + F.coalesce(F.lag(gt(2.0), 2).over(w), F.lit(0))
                >= 2
            )
            | (
                lt(-2.0)
                + F.coalesce(F.lag(lt(-2.0), 1).over(w), F.lit(0))
                + F.coalesce(F.lag(lt(-2.0), 2).over(w), F.lit(0))
                >= 2
            ),
            1,
        )
        .otherwise(0)
        .alias("r2"),
        F.when(
            (F.sum(gt(1.0)).over(w5) >= 4) | (F.sum(lt(-1.0)).over(w5) >= 4), 1
        )
        .otherwise(0)
        .alias("r3"),
        F.when(
            (F.sum(gt(0.0)).over(w8) == 8) | (F.sum(lt(0.0)).over(w8) == 8), 1
        )
        .otherwise(0)
        .alias("r4"),
    )
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum("r1").cast("bigint").alias("rule1_hits"),
        F.sum("r2").cast("bigint").alias("rule2_hits"),
        F.sum("r3").cast("bigint").alias("rule3_hits"),
        F.sum("r4").cast("bigint").alias("rule4_hits"),
    )


@register(
    "c_chart_monthly_returns",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o.o_orderdate) AS month,
             CAST(COUNT(DISTINCT CASE WHEN l.l_returnflag = 'R'
                                      THEN o.o_orderkey END) AS BIGINT) AS c
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ), stats AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      FROM monthly
    )
    SELECT n AS n_months, s AS total_returned,
           CAST(floor(1000e0 * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                AS BIGINT) AS cbar_milli,
           CAST(SUM(CASE WHEN CAST(c AS DOUBLE) >
                  CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                  + 3e0 * sqrt(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_above_ucl,
           CAST(SUM(CASE WHEN CAST(c AS DOUBLE) <
                  CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                  - 3e0 * sqrt(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_below_lcl
    FROM monthly, stats
    GROUP BY n, s
    """,
)
def c_chart_monthly_returns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c-chart for the monthly count of orders with returned lines
    (Shewhart 1931): Poisson control limits cbar +/- 3 sqrt(cbar) on
    raw event COUNTS — the count sibling of
    ``p_chart_monthly_returns``' proportion chart. Counts exact
    (distinct orderkeys per month); limits and comparisons are
    identical double expressions both engines; one grouped pass plus
    a 2-row scalar join."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    monthly = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.countDistinct(
                F.when(F.col("l_returnflag") == "R", F.col("o_orderkey"))
            )
            .cast("bigint")
            .alias("c")
        )
        .cache()  # ~80 rows; stats + violation scan
    )
    stats = monthly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
    )
    return (
        monthly.crossJoin(F.broadcast(stats))
        .groupBy("n", "s")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN CAST(c AS DOUBLE) >"
                    " CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
                    " + 3e0 * sqrt(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_above_ucl"),
            F.sum(
                F.expr(
                    "CASE WHEN CAST(c AS DOUBLE) <"
                    " CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
                    " - 3e0 * sqrt(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_below_lcl"),
        )
        .selectExpr(
            "n AS n_months",
            "s AS total_returned",
            "CAST(floor(1000e0 * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
            " AS BIGINT) AS cbar_milli",
            "n_above_ucl",
            "n_below_lcl",
        )
    )
