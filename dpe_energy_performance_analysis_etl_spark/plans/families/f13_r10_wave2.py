"""Round 10, wave 2: distribution-shape and trend diagnostics —
two-sample Anderson-Darling (tail-weighted KS companion), Lo-MacKinlay
variance-ratio, Page's trend test for ordered alternatives."""

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
# Round 10, wave 2: Anderson-Darling, variance ratio, Page's trend
# =====================================================================

@register(
    "anderson_darling_status",
    """
    WITH t AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(count_if(substr(o_orderpriority, 1, 1) IN ('1', '2'))
                  AS BIGINT) AS cnt1
      FROM orders GROUP BY 1, 2
    ), c AS MATERIALIZED (
      SELECT g, cnt,
             CAST(SUM(cnt) OVER w AS BIGINT) AS cum,
             CAST(SUM(cnt1) OVER w AS BIGINT) AS cum1
      FROM t
      WINDOW w AS (PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), tot AS MATERIALIZED (
      SELECT g, CAST(MAX(cum) AS BIGINT) AS n, CAST(MAX(cum1) AS BIGINT) AS n1
      FROM c GROUP BY 1
    ), terms AS MATERIALIZED (
      SELECT c.g,
             CAST((cnt::HUGEINT
                   * (cum1::HUGEINT * tot.n - cum::HUGEINT * tot.n1)
                   * (cum1::HUGEINT * tot.n - cum::HUGEINT * tot.n1)
                   * 1000000)
                  // (cum::HUGEINT * (tot.n - cum)
                      * tot.n1 * (tot.n - tot.n1)) AS BIGINT) AS trm
      FROM c JOIN tot ON c.g = tot.g
      WHERE c.cum < tot.n AND tot.n1 > 0 AND tot.n > tot.n1
    ), per AS MATERIALIZED (
      SELECT g, CAST(SUM(trm) AS BIGINT) AS a2 FROM terms GROUP BY 1
    ), base AS MATERIALIZED (
      SELECT g, CAST(SUM(cnt) AS BIGINT) AS nb, CAST(SUM(cnt1) AS BIGINT) AS n1b
      FROM t GROUP BY 1
    )
    SELECT base.g AS o_orderstatus, base.n1b AS n1,
           CAST(base.nb - base.n1b AS BIGINT) AS n2,
           per.a2 AS a2_qscaled
    FROM base LEFT JOIN per ON base.g = per.g
    """,
)
def anderson_darling_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling per order status
    (operators/stats.py anderson_darling_two_sample — Scholz &
    Stephens 1987): does the order-value distribution differ between
    urgent/high-priority orders and the rest, WEIGHTING THE TAILS —
    the companion gate to ``ks_test_status_priority`` (same grouping,
    same sides, same tier recipe) for shape changes KS's single max
    misses. Quantized-sum exact: per-tier floors summed as BIGINT,
    bit-portable (the oracle's PARTITION BY window is the sf0.01
    shortcut; Spark rides grouped_running_totals)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        anderson_darling_two_sample,
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
    return anderson_darling_two_sample(base, "o_orderstatus", "urgent", "cents")


@register(
    "variance_ratio_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) // 100 AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT y, CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS t
      FROM monthly
    ), ends AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(CASE WHEN t = 1 THEN y END) AS BIGINT) AS y1,
             CAST(MAX(t) AS BIGINT) AS tn
      FROM idx
    ), lastv AS MATERIALIZED (
      SELECT CAST(MAX(CASE WHEN idx.t = ends.tn THEN y END) AS BIGINT) AS yn
      FROM idx, ends
    ), qs AS MATERIALIZED (SELECT unnest([2, 4]) AS q),
    diffs AS MATERIALIZED (
      SELECT qs.q, a.t,
             ((ends.n - 1)::HUGEINT * (a.y - b.y)
              - qs.q * (lastv.yn::HUGEINT - ends.y1)) AS cd
      FROM idx a JOIN qs ON TRUE
      JOIN idx b ON b.t = a.t - qs.q, ends, lastv
    ), oned AS MATERIALIZED (
      SELECT ((ends.n - 1)::HUGEINT * (a.y - b.y)
              - (lastv.yn::HUGEINT - ends.y1)) AS cd
      FROM idx a JOIN idx b ON b.t = a.t - 1, ends, lastv
    ), onea AS MATERIALIZED (
      SELECT SUM(cd * cd) AS ss1, CAST(COUNT(*) AS BIGINT) AS c1 FROM oned
    ), qagg AS MATERIALIZED (
      SELECT q, SUM(cd * cd) AS ssq, CAST(COUNT(*) AS BIGINT) AS cq
      FROM diffs GROUP BY 1
    )
    SELECT qagg.q, qagg.cq AS n_qdiffs,
           CASE WHEN onea.ss1 > 0 AND qagg.cq > 0 THEN CAST(floor(
             CAST(qagg.ssq AS DOUBLE) * CAST(onea.c1 AS DOUBLE) * 1000000e0
             / (CAST(qagg.q AS DOUBLE) * CAST(qagg.cq AS DOUBLE)
                * CAST(onea.ss1 AS DOUBLE))) AS BIGINT)
           END AS vr_ppm
    FROM qagg, onea
    ORDER BY q
    """,
)
def variance_ratio_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test statistic (RFS 1988) on the
    monthly revenue series, q ∈ {2, 4}: VR(q) = Var(q-period
    increment)/(q·Var(1-period increment)) — ≈1 for a random walk,
    <1 mean-reverting, >1 trending. The drift companion to
    ``rescaled_range_revenue`` (Hurst) built from pure increments.

    Exactness: increments of monthly whole-dollar revenue (cents div
    100, positive → identical truncation) with the drift mean
    μ̂ = (y_n − y_1)/(n−1) cleared by (n−1)-scaling:
    c̃d_t = (n−1)(y_t − y_{t−q}) − q(y_n − y_1) is an exact integer,
    and VR(q) = (SSq·c1) / (q·cq·SS1) — the (n−1)² factors cancel.
    The SSq/SS1 sums stay exact DECIMAL(38)/HUGEINT; the final ppm is
    floor(double) on the identical IEEE expression both engines (the
    z_milli class — an integer ·10⁶ overflows DECIMAL(38) first).

    Scale shape: ONE data-sized month aggregation; the q-lag self-
    joins run on the bounded (~85-row) month-index table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100"
                " AS BIGINT)) div 100 AS BIGINT)"
            ).alias("y")
        )
        .localCheckpoint(eager=True)  # bounded month grain
    )
    idx = monthly.select(
        "y",
        F.row_number().over(Window.orderBy("month")).cast("bigint").alias("t"),
    ).localCheckpoint(eager=True)  # feeds ends + both lag joins
    ends = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max(F.expr("CASE WHEN t = 1 THEN y END")).cast("bigint").alias("y1"),
        F.max_by(F.col("y"), F.col("t")).cast("bigint").alias("yn"),
    )
    qs = (
        spark.range(1)
        .select(F.explode(F.array(F.lit(2), F.lit(4))).alias("q0"))
        .select(F.col("q0").cast("bigint").alias("q"))
    )
    a = idx.alias("a")
    b = idx.alias("b")
    diffs = (
        a.join(F.broadcast(qs), F.expr("true"))
        .join(b, F.expr("b.t = a.t - q"))
        .crossJoin(F.broadcast(ends))
        .selectExpr(
            "q",
            "CAST((n - 1) AS DECIMAL(38,0)) * (a.y - b.y)"
            " - q * (CAST(yn AS DECIMAL(38,0)) - y1) AS cd",
        )
    )
    oned = (
        a.join(b, F.expr("b.t = a.t - 1"))
        .crossJoin(F.broadcast(ends))
        .selectExpr(
            "CAST((n - 1) AS DECIMAL(38,0)) * (a.y - b.y)"
            " - (CAST(yn AS DECIMAL(38,0)) - y1) AS cd"
        )
    )
    onea = oned.agg(
        F.sum(F.expr("cd * cd")).alias("ss1"),
        F.count(F.lit(1)).cast("bigint").alias("c1"),
    )
    qagg = diffs.groupBy("q").agg(
        F.sum(F.expr("cd * cd")).alias("ssq"),
        F.count(F.lit(1)).cast("bigint").alias("cq"),
    )
    return (
        qagg.crossJoin(F.broadcast(onea))
        .selectExpr(
            "q",
            "cq AS n_qdiffs",
            "CASE WHEN ss1 > 0 AND cq > 0 THEN CAST(floor("
            " CAST(ssq AS DOUBLE) * CAST(c1 AS DOUBLE) * 1000000e0"
            " / (CAST(q AS DOUBLE) * CAST(cq AS DOUBLE)"
            "    * CAST(ss1 AS DOUBLE))) AS BIGINT)"
            " END AS vr_ppm",
        )
        .orderBy("q")
    )


@register(
    "page_trend_nations",
    """
    WITH cells AS MATERIALIZED (
      SELECT n.n_name AS block,
             CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS trt,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), ranked AS MATERIALIZED (
      SELECT block, trt,
             CAST(row_number() OVER (PARTITION BY block
                                     ORDER BY rev, trt) AS BIGINT) AS rk
      FROM cells
    ), ls AS MATERIALIZED (
      SELECT CAST(SUM(trt * rk) AS BIGINT) AS l_stat,
             CAST(COUNT(DISTINCT block) AS BIGINT) AS b,
             CAST(MAX(trt) AS BIGINT) AS k
      FROM ranked
    )
    SELECT b AS n_blocks, k AS n_treatments, l_stat,
           CAST(b * k * (k + 1) * (k + 1) // 4 AS BIGINT) AS e_l,
           CASE WHEN b > 0 AND k > 1 THEN CAST(
             (CASE WHEN 4 * l_stat >= b * k * (k + 1) * (k + 1)
                   THEN 1 ELSE -1 END)
             * floor(abs(CAST(l_stat AS DOUBLE)
                         - CAST(b * k * (k + 1) * (k + 1) AS DOUBLE) / 4e0)
                     * 1000e0
                     / sqrt(CAST(b AS DOUBLE) * k * k * (k + 1)
                            * (k * k - 1) / 144e0))
           AS BIGINT) END AS z_milli
    FROM ls
    """,
)
def page_trend_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's trend test (Page, JASA 1963) for ORDERED alternatives
    on the nation x order-priority revenue grid — "does revenue rise
    monotonically with priority within each nation?" — the
    trend-sensitive companion to ``friedman_nation_priority`` (same
    blocks, same treatments, same exact-cents cells): Friedman asks
    "any difference?", Page asks "THIS ordering?".

    L = Σ_blocks Σ_j j·R_bj with treatment index j = priority digit
    and within-block ranks over exact cents totals (row_number with
    the (rev, trt) tie-break — cents ties are possible in principle
    and break deterministically). L and E[L] = b·k(k+1)²/4 are exact
    integers; only the z-score divides by the closed-form sd (sqrt is
    IEEE-exact), floored to milli with the sign factored out.

    Scale shape: one equi-keyed orders x customer x nation join into
    a ≤125-cell grid; ranking windows run on the bounded grid only."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cells = (
        o.join(c.select("c_custkey", "c_nationkey"), o["o_custkey"] == F.col("c_custkey"))
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
            .alias("rev")
        )
        .localCheckpoint(eager=True)  # bounded grid
    )
    w = Window.partitionBy("block").orderBy("rev", "trt")
    ranked = cells.select(
        "block", "trt", F.row_number().over(w).cast("bigint").alias("rk")
    )
    ls = ranked.agg(
        F.sum(F.expr("trt * rk")).cast("bigint").alias("l_stat"),
        F.countDistinct("block").cast("bigint").alias("b"),
        F.max("trt").cast("bigint").alias("k"),
    )
    return ls.selectExpr(
        "b AS n_blocks",
        "k AS n_treatments",
        "l_stat",
        "CAST((b * k * (k + 1) * (k + 1)) div 4 AS BIGINT) AS e_l",
        "CASE WHEN b > 0 AND k > 1 THEN CAST("
        " (CASE WHEN 4 * l_stat >= b * k * (k + 1) * (k + 1)"
        "       THEN 1 ELSE -1 END)"
        " * floor(abs(CAST(l_stat AS DOUBLE)"
        "             - CAST(b * k * (k + 1) * (k + 1) AS DOUBLE) / 4e0)"
        "         * 1000e0"
        "         / sqrt(CAST(b AS DOUBLE) * k * k * (k + 1)"
        "                * (k * k - 1) / 144e0))"
        " AS BIGINT) END AS z_milli",
    )
