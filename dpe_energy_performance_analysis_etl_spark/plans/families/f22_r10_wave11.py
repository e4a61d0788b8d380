"""Round 10, wave 11: Gini mean difference, historical VaR/expected
shortfall, Bowley quartile skewness — the robust-dispersion /
tail-risk / robust-shape corner of the statistics suite."""

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
# Round 10, wave 11: GMD, VaR/ES, Bowley skewness
# =====================================================================

@register(
    "gmd_dispersion_brands",
    """
    WITH vals AS MATERIALIZED (
      SELECT p.p_brand AS g,
             CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)
               AS v
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), ranked AS MATERIALIZED (
      SELECT g, v,
             CAST(row_number() OVER (PARTITION BY g ORDER BY v) AS BIGINT)
               AS rk,
             CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM vals
    ), agg AS MATERIALIZED (
      SELECT g, CAST(MAX(n) AS BIGINT) AS n,
             SUM((2 * rk - n - 1)::HUGEINT * v) AS s,
             CAST(SUM(v) AS BIGINT) AS sv
      FROM ranked GROUP BY 1
    )
    SELECT g AS p_brand, n,
           CASE WHEN n > 1 THEN CAST((2 * s) // (n::HUGEINT * (n - 1))
             AS BIGINT) END AS gmd_cents,
           CASE WHEN sv > 0 AND n > 1 THEN CAST(
             (s * 1000000) // (sv::HUGEINT * (n - 1)) AS BIGINT)
           END AS gini_ppm
    FROM agg ORDER BY p_brand
    """,
)
def gmd_dispersion_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini mean difference per brand (Gini 1912; Yitzhaki's survey
    of GMD as THE robust dispersion measure): the mean absolute
    difference between two random prices, E|X−X'| — more efficient
    than MAD under near-normal tails and defined without a center,
    plus the derived Gini coefficient GMD/(2μ) of price
    concentration (the VALUE-side companion to
    ``key_skew_gini_partkey``'s count-side Lorenz).

    Exactness: the pairwise definition collapses to the order-
    statistics identity Σ|xᵢ−xⱼ| = 2·Σᵢ(2i−n−1)·x₍ᵢ₎, so one rank
    pass gives the exact integer S and GMD = 2S/(n(n−1)) /
    Gini = S·10⁶/(Σx·(n−1)) are single truncating divisions
    (S ≥ 0 by construction). Spark never assigns per-row ranks at
    all: values aggregate into (group, value) TIERS and a tier of
    size l after c predecessors contributes the arithmetic-series
    closed form l·(2c + l − n)·v — tie handling is exact by
    construction and the prefix c folds LOCAL+CROSS
    (grouped_local_prefix + partition_offsets, r13 — degree-2
    polynomial in the prefix, so no per-row global prefix is ever
    built) (the oracle's per-row PARTITION BY window
    is the sf0.01 shortcut; equal values contribute symmetrically,
    so both formulations agree exactly).

    Scale shape: one equi-keyed lineitem x part join, one tier
    aggregation + prefix pass, one bounded per-brand aggregate."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_local_prefix,
        partition_offsets,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    vals = (
        li.join(
            pt.select("p_partkey", "p_brand"),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("g"),
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
            ).alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # tier-grouped rank identity: values in a tier of size l starting
    # after c predecessors contribute Σ_{i=c+1..c+l}(2i−n−1)·v
    # = l·(2c + l − n)·v exactly (arithmetic series) — no per-row rank
    # r13: the tier contrib 2·l·c·v + l²·v − n·l·v is a degree-2
    # polynomial in the prefix c, so with c = c_local + O_p (offset
    # constant per range partition) it folds LOCAL+CROSS at the
    # bounded (partition × group) level: Σ l·c·v = Σ l·c_loc·v +
    # Σ_p O_p·(Σ_p l·v). One pass over the ranged tier table, no pin
    # (single consumer), no per-row offsets join, no totals broadcast
    # — the old form pinned TWICE (the recipe's internal pin + a
    # second pin of the prefix stream to split totals from contribs).
    loc = grouped_local_prefix(vals, "g", "v", ["cnt"])
    part = loc.groupBy("_pid", "g").agg(
        F.sum("cnt").cast("bigint").alias("cnt"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * v")).alias("slv"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * cnt * v")).alias("sl2v"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * _l_cnt * v")).alias("slcv"),
    )
    offs = partition_offsets(part, "g", ["cnt"])
    agg = offs.groupBy("g").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("slv").alias("sv"),
        F.sum(F.expr("slcv + CAST(_o_cnt AS DECIMAL(38,0)) * slv")).alias("scv"),
        F.sum("sl2v").alias("sl2v"),
    )
    return agg.selectExpr(
        "g AS p_brand",
        "n",
        "CASE WHEN n > 1 THEN CAST((2 * (2 * scv + sl2v"
        " - CAST(n AS DECIMAL(38,0)) * sv)) div (CAST(n AS DECIMAL(38,0))"
        " * (n - 1)) AS BIGINT) END AS gmd_cents",
        "CASE WHEN sv > 0 AND n > 1 THEN CAST("
        " ((2 * scv + sl2v - CAST(n AS DECIMAL(38,0)) * sv) * 1000000)"
        " div (CAST(sv AS DECIMAL(38,0)) * (n - 1))"
        " AS BIGINT) END AS gini_ppm",
    ).orderBy("p_brand")


@register(
    "var_es_monthly_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), deltas AS MATERIALIZED (
      SELECT rev - lag(rev) OVER (ORDER BY month) AS d,
             CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS t
      FROM monthly
    ), dd AS MATERIALIZED (
      SELECT d, CAST(row_number() OVER (ORDER BY d, t) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM deltas WHERE d IS NOT NULL
    ), var AS MATERIALIZED (
      SELECT d AS var_cents, rk AS k, m FROM dd
      WHERE rk = greatest((m + 9) // 10, 1)
    )
    , tail AS MATERIALIZED (
      SELECT CAST(SUM(dd.d) AS BIGINT) AS tail_sum
      FROM dd, var WHERE dd.rk <= var.k
    )
    SELECT var.m AS n_deltas, CAST(var.var_cents AS BIGINT) AS var10_cents,
           CAST((CASE WHEN tail.tail_sum >= 0 THEN 1 ELSE -1 END)
                * (abs(tail.tail_sum) // var.k) AS BIGINT) AS es10_cents,
           CAST(var.k AS BIGINT) AS n_tail
    FROM var, tail
    """,
)
def var_es_monthly_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical Value-at-Risk and Expected Shortfall (the Basel /
    McNeil-Frey-Embrechts empirical-quantile estimators) of monthly
    revenue CHANGES at the 10% level: VaR = the ceil(m/10)-th worst
    month-over-month delta (an exact order statistic), ES = the mean
    of the deltas at or below it — the coherent tail-risk companion
    to ``max_spend_drawdown_customers`` (drawdown is path risk; ES is
    distribution tail risk).

    Exactness: exact cents deltas; VaR is a deterministic rank pick
    ((d, t) tie-break); ES sums exact integers over the k tail rows
    and divides ONCE with the sign factored out (the tail sum is
    usually negative, and Spark's `div` truncates toward zero while
    DuckDB's `//` floors — the sign-factored abs form makes both
    engines compute the identical quotient)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("rev")
        )
        .localCheckpoint(eager=True)
    )
    w = Window.orderBy("month")
    deltas = monthly.select(
        (F.col("rev") - F.lag("rev").over(w)).alias("d"),
        F.row_number().over(w).cast("bigint").alias("t"),
    ).filter(F.col("d").isNotNull())
    dd = deltas.select(
        "d",
        F.row_number().over(Window.orderBy("d", "t")).cast("bigint").alias("rk"),
    ).localCheckpoint(eager=True)  # bounded; feeds m + var pick + tail
    m_row = dd.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    var = (
        dd.crossJoin(F.broadcast(m_row))
        .filter(F.expr("rk = greatest((m + 9) div 10, 1)"))
        .selectExpr("d AS var_cents", "rk AS k", "m")
    )
    tail = (
        dd.join(F.broadcast(var.select("k")), F.expr("rk <= k"))
        .agg(F.sum("d").cast("bigint").alias("tail_sum"))
    )
    return var.crossJoin(F.broadcast(tail)).selectExpr(
        "m AS n_deltas",
        "CAST(var_cents AS BIGINT) AS var10_cents",
        # sign-factored division: the tail sum is usually negative and
        # Spark div truncates toward zero while DuckDB // floors
        "CAST((CASE WHEN tail_sum >= 0 THEN 1 ELSE -1 END)"
        " * (abs(tail_sum) div k) AS BIGINT) AS es10_cents",
        "CAST(k AS BIGINT) AS n_tail",
    )


@register(
    "bowley_skewness_status",
    """
    WITH v AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v
      FROM orders
    ), ranked AS MATERIALIZED (
      SELECT g, v,
             CAST(row_number() OVER (PARTITION BY g ORDER BY v) AS BIGINT)
               AS rk,
             CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM v
    ), qs AS MATERIALIZED (
      SELECT g,
             CAST(MAX(CASE WHEN rk = (n + 3) // 4 THEN v END) AS BIGINT)
               AS q1,
             CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN v END) AS BIGINT)
               AS q2,
             CAST(MAX(CASE WHEN rk = (3 * n + 1) // 4 THEN v END) AS BIGINT)
               AS q3,
             CAST(MAX(n) AS BIGINT) AS n
      FROM ranked GROUP BY 1
    )
    SELECT g AS o_orderstatus, n, q1, q2, q3,
           CASE WHEN q3 > q1 THEN CAST(
             (CASE WHEN q3 + q1 >= 2 * q2 THEN 1 ELSE -1 END)
             * ((abs(q3 + q1 - 2 * q2) * 1000000) // (q3 - q1)) AS BIGINT)
           END AS bowley_ppm
    FROM qs ORDER BY o_orderstatus
    """,
)
def bowley_skewness_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley's quartile skewness per order status (Bowley 1901):
    (Q3 + Q1 − 2·Q2)/(Q3 − Q1) — the ROBUST skewness that ignores
    tails entirely, complementing the moment-based skew in
    ``stats_moments``/``jarque_bera_order_values`` (one extreme order
    moves the moment skew arbitrarily; Bowley's needs a quarter of
    the data to move).

    Exactness: the three quartiles are deterministic LOW-median-style
    order statistics at ranks (n+3) div 4, (n+1) div 2, (3n+1) div 4
    (exact cents, engine-identical rank picks per the NOTES rule);
    the statistic is one sign-factored integer division. Degenerate
    Q3 = Q1 emits NULL.

    Scale shape: ONE (group, value) tier aggregation + the
    grouped_running_totals prefix recipe — all three quartiles come
    out of a single pass as conditional first-crossing minima
    (q = MIN(v) over tiers whose cumulative count reaches k; values
    ascend with the cumulative, so the min IS the crossing tier) —
    never three separate rank recipes over the same scan. The
    oracle's PARTITION BY window is the sf0.01 shortcut."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_running_totals,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    vals = o.groupBy(
        F.col("o_orderstatus").alias("g"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("v"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    # r13: per-group totals ride the recipe's with_totals side table
    # (max inclusive prefix == Σcnt), so the prefix stream has ONE
    # consumer and the old second eager pin is deleted
    pre, tot = grouped_running_totals(
        vals, "g", "v", ["cnt"], with_totals=True
    )
    tiers = pre.select(
        "g", "v", (F.col("cnt_before") + F.col("cnt")).alias("cum")
    )
    totals = tot.select("g", F.col("_n_cnt").alias("n"))
    qs = (
        tiers.join(F.broadcast(totals), "g")
        .groupBy("g", "n")
        .agg(
            F.min(F.expr("CASE WHEN cum >= (n + 3) div 4 THEN v END"))
            .cast("bigint")
            .alias("q1"),
            F.min(F.expr("CASE WHEN cum >= (n + 1) div 2 THEN v END"))
            .cast("bigint")
            .alias("q2"),
            F.min(F.expr("CASE WHEN cum >= (3 * n + 1) div 4 THEN v END"))
            .cast("bigint")
            .alias("q3"),
        )
    )
    return (
        qs.selectExpr(
            "g AS o_orderstatus",
            "n",
            "q1",
            "q2",
            "q3",
            "CASE WHEN q3 > q1 THEN CAST("
            " (CASE WHEN q3 + q1 >= 2 * q2 THEN 1 ELSE -1 END)"
            " * ((abs(q3 + q1 - 2 * q2) * 1000000) div (q3 - q1))"
            " AS BIGINT) END AS bowley_ppm",
        )
        .orderBy("o_orderstatus")
    )
