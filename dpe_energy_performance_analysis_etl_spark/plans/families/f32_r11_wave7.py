"""Round 11, wave 7: business/inequality analytics — spend Gini via
the distributed Lorenz primitive, two-proportion z, per-nation brand
HHI, daily user churn, new-vs-returning revenue split, segment
revenue beta.

Shared exactness recipe: inequality/association statistics come from
exact integer (rank, value) products — the Gini rides
``global_rank_and_prefix`` (the r11 partition-offset Lorenz recipe),
the beta is an integer-moment OLS slope; rates and shares are single
floored double ratios of exact counts; cohort/churn classifications
are per-user windows (hash-partitioned) or month-grain anti-joins."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.plans._core import (  # noqa: F401
    DataFrame,
    SparkSession,
    Window,
    F,
    QUERIES,
    ORACLE_SQL,
    read_events,
    register,
)


@register(
    "spend_gini_customers",
    """
    WITH per AS MATERIALIZED (
      SELECT o_custkey AS k,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT x, CAST(row_number() OVER (ORDER BY x, k) AS BIGINT) AS r
      FROM per
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
             SUM(r::HUGEINT * x) AS w
      FROM ranked
    )
    SELECT n AS n_customers, s AS total_cents,
           CAST(floor(1e6 *
             (2e0 * CAST(w AS DOUBLE) - (CAST(n AS DOUBLE) + 1e0)
              * CAST(s AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))) AS BIGINT)
             AS gini_ppm
    FROM agg
    """,
)
def spend_gini_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer total spend (the
    value-weighted Lorenz inequality — ``key_skew_gini_partkey``
    reads COUNT skew; this reads the revenue distribution a CLV/
    whale analysis starts from): G = (2 SUM r x - (n+1) S)/(n S)
    over spend ranked ascending. The rank comes from
    ``global_rank_and_prefix``'s partition-offset two-pass — the
    customer table grows with the data, so never a single-partition
    window (the r11 window-class rule; the DuckDB oracle may sort
    freely). Exact integer (r, x) products; one floored ppm."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        global_rank_and_prefix,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("x")
    )
    ranked = global_rank_and_prefix(
        per, [F.col("x").asc(), F.col("k").asc()], "x", rank_col="r", cum_col="_c"
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.expr("CAST(r AS DECIMAL(38,0)) * x")).alias("w"),
    )
    return agg.selectExpr(
        "n AS n_customers",
        "s AS total_cents",
        "CAST(floor(1e6 *"
        " (2e0 * CAST(w AS DOUBLE) - (CAST(n AS DOUBLE) + 1e0)"
        "  * CAST(s AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))) AS BIGINT) AS gini_ppm",
    )


@register(
    "two_proportion_z_returns",
    """
    WITH halves AS MATERIALIZED (
      SELECT
        CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
                       AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS x1,
        CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
                      THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                       AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS x2,
        CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                      THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM lineitem
    )
    SELECT x1 AS returns_early, n1 AS lines_early,
           x2 AS returns_late, n2 AS lines_late,
           CAST(floor(1000e0 *
             (CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1e0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1e0 / n1 + 1e0 / n2))) AS BIGINT) AS z_milli
    FROM halves
    """,
)
def two_proportion_z_returns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for the return rate before vs after the
    1996-01 boundary (pooled-variance form — the A/B primitive for
    binary outcomes; ``mcnemar_repeat_purchase`` handles the PAIRED
    case): z = (p1 - p2)/sqrt(p(1-p)(1/n1 + 1/n2)). Exact 2x2
    counts from one pass; one floored milli expression."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    halves = li.agg(
        F.sum(
            F.expr(
                "CASE WHEN l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"
                " AND l_returnflag = 'R' THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("x1"),
        F.sum(
            F.expr(
                "CASE WHEN l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("n1"),
        F.sum(
            F.expr(
                "CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
                " AND l_returnflag = 'R' THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("x2"),
        F.sum(
            F.expr(
                "CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("n2"),
    )
    return halves.selectExpr(
        "x1 AS returns_early",
        "n1 AS lines_early",
        "x2 AS returns_late",
        "n2 AS lines_late",
        "CAST(floor(1000e0 *"
        " (CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)"
        " / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
        "        * (1e0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
        "        * (1e0 / n1 + 1e0 / n2))) AS BIGINT) AS z_milli",
    )


@register(
    "brand_hhi_by_nation",
    """
    WITH cells AS MATERIALIZED (
      SELECT s.s_nationkey AS nk, p.p_brand AS brand,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) // 100 AS BIGINT) AS v
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), agg AS MATERIALIZED (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_brands,
             CAST(SUM(v) AS BIGINT) AS s, SUM(v::HUGEINT * v) AS q
      FROM cells GROUP BY 1
    )
    SELECT n.n_name AS nation, a.n_brands,
           CAST((a.q * 1000000) // (a.s::HUGEINT * a.s) AS BIGINT) AS hhi_ppm
    FROM agg a JOIN nation n ON a.nk = n.n_nationkey
    ORDER BY nation
    """,
)
def brand_hhi_by_nation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of brand revenue WITHIN
    each supplier nation (the per-group sibling of the global
    ``concentration_supplier_nations``): HHI = SUM(share_i^2) =
    SUM(v_i^2)/S^2 per nation — which brands dominate which market.
    Whole-dollar values keep v^2 sums in DECIMAL(38,0) at swept SFs;
    one truncating div per nation on NONNEGATIVE integers."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cells = (
        li.join(p.select("p_partkey", "p_brand"), li["l_partkey"] == F.col("p_partkey"))
        .join(
            s.select("s_suppkey", "s_nationkey"),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .groupBy(F.col("s_nationkey").alias("nk"), F.col("p_brand").alias("brand"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100"
                " AS BIGINT)) div 100 AS BIGINT)"
            ).alias("v")
        )
    )
    agg = cells.groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("q"),
    )
    return (
        agg.join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("nk") == F.col("n_nationkey"),
        )
        .selectExpr(
            "n_name AS nation",
            "n_brands",
            "CAST((q * 1000000) div (CAST(s AS DECIMAL(38,0)) * s) AS BIGINT)"
            " AS hhi_ppm",
        )
        .orderBy("nation")
    )


@register(
    "user_churn_daily",
    """
    WITH active AS MATERIALIZED (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id
      FROM events
    ), days AS MATERIALIZED (
      SELECT DISTINCT day FROM active
    ), flagged AS MATERIALIZED (
      SELECT a.day, a.user_id,
             CASE WHEN nxt.user_id IS NULL THEN 1 ELSE 0 END AS churned
      FROM active a
      LEFT JOIN active nxt
        ON nxt.user_id = a.user_id
       AND nxt.day = a.day + INTERVAL 1 DAY
      WHERE a.day < (SELECT MAX(day) FROM days)
    )
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(churned) AS BIGINT) AS n_churned,
           CAST(floor(1e6 * CAST(SUM(churned) AS DOUBLE) / COUNT(*))
                AS BIGINT) AS churn_ppm
    FROM flagged GROUP BY 1 ORDER BY 1
    """,
)
def user_churn_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user churn from the events stream: a user active on
    day d churns if absent on d+1 (the events table spans one dense
    month, so day is the natural activity grain) (the complement of
    ``dau_mau_stickiness_events``' engagement ratio; the last
    observed day is excluded — churn there is right-censored, the
    survival families' territory). The next-day probe is an
    equi-keyed self-join on (user, day+1); exact counts; one
    floored ppm per day row."""
    ev = read_events(spark, sf_dir)
    active = (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
        )
        .distinct()
        .cache()  # both sides of the next-day probe + max day
    )
    mx = active.agg(F.max("day").alias("max_day"))
    nxt = active.select(
        (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day"),
        F.col("user_id"),
        F.lit(1).alias("seen_next"),
    )
    flagged = (
        active.crossJoin(F.broadcast(mx))
        .where(F.col("day") < F.col("max_day"))
        .join(nxt, ["day", "user_id"], "left")
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.sum(F.expr("CASE WHEN seen_next IS NULL THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_churned"),
        )
        .selectExpr(
            "day",
            "n_active",
            "n_churned",
            "CAST(floor(1e6 * CAST(n_churned AS DOUBLE) / n_active)"
            " AS BIGINT) AS churn_ppm",
        )
        .orderBy("day")
    )


@register(
    "new_vs_returning_monthly",
    """
    WITH firsts AS MATERIALIZED (
      SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS first_month
      FROM orders GROUP BY 1
    ), classified AS MATERIALIZED (
      SELECT date_trunc('month', o.o_orderdate) AS month,
             CASE WHEN date_trunc('month', o.o_orderdate) = f.first_month
                  THEN 1 ELSE 0 END AS is_new,
             CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT month,
           CAST(SUM(is_new) AS BIGINT) AS n_new_orders,
           CAST(SUM(1 - is_new) AS BIGINT) AS n_returning_orders,
           CAST(SUM(CASE WHEN is_new = 1 THEN cents ELSE 0 END) AS BIGINT)
             AS new_revenue_cents,
           CAST(SUM(CASE WHEN is_new = 0 THEN cents ELSE 0 END) AS BIGINT)
             AS returning_revenue_cents
    FROM classified GROUP BY 1 ORDER BY 1
    """,
)
def new_vs_returning_monthly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning revenue split by month (the growth-accounting
    decomposition next to ``nrr_monthly_customers``' retention view):
    an order is "new" iff its month IS the customer's first order
    month. First months come from one per-customer aggregation
    (never a per-customer sort window); the classification is an
    equi-join back on custkey. Exact cents throughout — no floats
    anywhere."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("first_month")
    )
    classified = o.join(firsts, "o_custkey").select(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        F.when(
            F.date_trunc("month", F.col("o_orderdate")) == F.col("first_month"), 1
        )
        .otherwise(0)
        .alias("is_new"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    return (
        classified.groupBy("month")
        .agg(
            F.sum("is_new").cast("bigint").alias("n_new_orders"),
            F.sum(F.expr("1 - is_new")).cast("bigint").alias("n_returning_orders"),
            F.sum(F.expr("CASE WHEN is_new = 1 THEN cents ELSE 0 END"))
            .cast("bigint")
            .alias("new_revenue_cents"),
            F.sum(F.expr("CASE WHEN is_new = 0 THEN cents ELSE 0 END"))
            .cast("bigint")
            .alias("returning_revenue_cents"),
        )
        .orderBy("month")
    )


@register(
    "segment_beta_monthly",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) // 100 AS BIGINT) AS y_all,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                                     AS BIGINT) ELSE 0 END) // 100 AS BIGINT)
               AS y_seg
      FROM orders GROUP BY 1
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y_all) AS BIGINT) AS sx, CAST(SUM(y_seg) AS BIGINT) AS sy,
             SUM(y_all::HUGEINT * y_all) AS qx,
             SUM(y_all::HUGEINT * y_seg) AS sxy
      FROM monthly
    )
    SELECT n AS n_months,
           CAST(floor(1e6 *
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(qx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT)
             AS beta_ppm
    FROM agg
    """,
)
def segment_beta_monthly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue beta of the urgent-priority segment against total
    monthly revenue (the CAPM-style sensitivity: beta > share means
    the segment amplifies aggregate swings): OLS slope beta =
    (n Sxy - Sx Sy)/(n Qx - Sx^2) from exact whole-dollar integer
    moments over the month table; one floored ppm expression."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100"
            " AS BIGINT)) div 100 AS BIGINT)"
        ).alias("y_all"),
        F.expr(
            "CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'"
            " THEN CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
            " ELSE 0 END) div 100 AS BIGINT)"
        ).alias("y_seg"),
    )
    agg = monthly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y_all").cast("bigint").alias("sx"),
        F.sum("y_seg").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(y_all AS DECIMAL(38,0)) * y_all")).alias("qx"),
        F.sum(F.expr("CAST(y_all AS DECIMAL(38,0)) * y_seg")).alias("sxy"),
    )
    return agg.selectExpr(
        "n AS n_months",
        "CAST(floor(1e6 *"
        " (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(qx AS DOUBLE)"
        "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT)"
        " AS beta_ppm",
    )
