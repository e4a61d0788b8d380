"""Round 11, wave 10: product/operations analytics — session bounce
rate + duration, basket-size histogram, shipping-delay percentiles,
repeat-purchase interval median, day-of-week revenue mix, hourly
event profile.

Shared exactness recipe: session boundaries reuse the
gaps-and-islands recipe (per-user hash-partitioned windows); all
durations are whole epoch seconds via ``epoch_us // 1e6`` on the
DuckDB side and the truncating timestamp cast on the Spark side (the
CLAUDE.md epoch rule); percentiles/medians are RANK PICKS through the
two-pass grouped_kth_smallest recipe; calendar keys (day-of-week,
hour) are extracted under the UTC-pinned session so both engines
bucket identically."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.plans._core import (  # noqa: F401
    DataFrame,
    SparkSession,
    Window,
    F,
    QUERIES,
    ORACLE_SQL,
    epoch_seconds,
    read_events,
    register,
)


@register(
    "bounce_rate_sessions",
    """
    WITH flagged AS MATERIALIZED (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS MATERIALIZED (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
             ts
      FROM flagged
    ), per AS MATERIALIZED (
      SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(epoch_us(MAX(ts)) // 1000000
                  - epoch_us(MIN(ts)) // 1000000 AS BIGINT) AS dur_sec
      FROM sessions GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(floor(1e6 * CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                                 AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS bounce_ppm,
           CAST(SUM(dur_sec) AS BIGINT) AS total_duration_sec,
           CAST(SUM(dur_sec) // COUNT(*) AS BIGINT) AS mean_duration_sec
    FROM per
    """,
)
def bounce_rate_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session bounce rate and duration over 30-minute-gap sessions
    (the first two numbers on any web-analytics dashboard;
    ``events_sessionize`` builds the sessions — this reads their
    quality): bounce = single-event session. Same gaps-and-islands
    recipe (per-user hash-partitioned windows); durations in whole
    epoch seconds (epoch_us // 1e6 — the r6 epoch rule); exact
    counts, one floored ppm, one nonnegative truncating mean."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(w)
    flagged = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    )
    sessions = flagged.withColumn(
        "sid",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per = sessions.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (epoch_seconds(F.max("ts")) - epoch_seconds(F.min("ts")))
        .cast("bigint")
        .alias("dur_sec"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.expr("CASE WHEN n_events = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_bounces"),
        F.expr(
            "CAST(floor(1e6 * CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)"
            " AS DOUBLE) / COUNT(*)) AS BIGINT)"
        ).alias("bounce_ppm"),
        F.sum("dur_sec").cast("bigint").alias("total_duration_sec"),
        F.expr("CAST(SUM(dur_sec) div COUNT(*) AS BIGINT)").alias(
            "mean_duration_sec"
        ),
    )


@register(
    "basket_size_histogram",
    """
    WITH per AS MATERIALIZED (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    )
    SELECT n_items AS basket_size, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           CAST(SUM(cents) // COUNT(*) AS BIGINT) AS avg_order_cents
    FROM per GROUP BY 1 ORDER BY 1
    """,
)
def basket_size_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size histogram: orders by line count, with revenue and
    average order value per size (the merchandising view
    ``basket_cooccurrence_lift`` starts from — lineitem counts bound
    basket_size at the TPC-H 7 lines). One per-order aggregation,
    one bounded-domain rollup; exact cents; truncating mean on
    nonnegative integers."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(
            F.expr("CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("cents"),
    )
    return (
        per.groupBy(F.col("n_items").alias("basket_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.expr("CAST(SUM(cents) div COUNT(*) AS BIGINT)").alias(
                "avg_order_cents"
            ),
        )
        .orderBy("basket_size")
    )


@register(
    "ship_delay_percentiles_priority",
    """
    WITH delays AS MATERIALIZED (
      SELECT o.o_orderpriority AS g,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) AS BIGINT) AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), ranked AS MATERIALIZED (
      SELECT g, d, row_number() OVER (PARTITION BY g ORDER BY d) AS r,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM delays
    )
    SELECT g AS priority, CAST(MAX(n) AS BIGINT) AS n_lines,
           CAST(MAX(CASE WHEN r = (n + 1) // 2 THEN d END) AS BIGINT)
             AS p50_days,
           CAST(MAX(CASE WHEN r = (n * 9 + 9) // 10 THEN d END) AS BIGINT)
             AS p90_days
    FROM ranked GROUP BY g ORDER BY priority
    """,
)
def ship_delay_percentiles_priority_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact P50/P90 shipping delay (ship date - order date, days)
    per order priority — the SLA check a fulfillment dashboard runs
    (do urgent orders actually ship faster, and how bad is the
    tail?). Both percentiles are rank picks via
    ``grouped_kths_smallest``'s multi-k two-pass recipe (order
    statistics, engine-exact; ONE pinned ranged subtree feeds both
    picks — the single-k recipe rebuilt the corpus join per
    percentile); day differences are exact integers on DATE-cast
    timestamps."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_kths_smallest,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    delays = li.join(o, li["l_orderkey"] == o["o_orderkey"]).selectExpr(
        "o_orderpriority AS g",
        "CAST(datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE))"
        " AS BIGINT) AS d",
    )
    return (
        grouped_kths_smallest(
            delays,
            "g",
            "d",
            {
                "p50_days": "(n + 1) div 2",
                "p90_days": "(n * 9 + 9) div 10",
            },
        )
        .selectExpr(
            "g AS priority",
            "CAST(n AS BIGINT) AS n_lines",
            "CAST(p50_days AS BIGINT) AS p50_days",
            "CAST(p90_days AS BIGINT) AS p90_days",
        )
        .orderBy("priority")
    )


@register(
    "repeat_interval_median_days",
    """
    WITH gaps AS MATERIALIZED (
      SELECT CAST(date_diff('day',
               CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey) AS DATE),
               CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
      FROM orders
    ), nz AS MATERIALIZED (
      SELECT gap_days FROM gaps WHERE gap_days IS NOT NULL
    ), ranked AS MATERIALIZED (
      SELECT gap_days, row_number() OVER (ORDER BY gap_days) AS r,
             COUNT(*) OVER () AS n
      FROM nz
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_intervals,
           CAST(MAX(CASE WHEN r = (n + 1) // 2 THEN gap_days END) AS BIGINT)
             AS median_gap_days,
           CAST(MAX(CASE WHEN r = (n * 9 + 9) // 10 THEN gap_days END)
                AS BIGINT) AS p90_gap_days
    FROM ranked
    """,
)
def repeat_interval_median_days_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and P90 days between a customer's consecutive orders
    (the repeat-purchase cadence a replenishment/CRM model is built
    on; ``time_to_convert_median`` reads the event funnel — this
    reads the order ledger). Per-customer gaps come from a
    hash-partitioned lag window; the GLOBAL median/P90 are rank picks
    through the multi-k two-pass recipe on a constant group key
    (range partitioning on (group, value) still spreads one group
    across partitions — no single-executor sort; one pinned ranged
    subtree feeds both picks)."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_kths_smallest,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        )
        .cast("bigint")
        .alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    tagged = gaps.withColumn("g", F.lit("all"))
    return grouped_kths_smallest(
        tagged,
        "g",
        "gap_days",
        {
            "median_gap_days": "(n + 1) div 2",
            "p90_gap_days": "(n * 9 + 9) div 10",
        },
    ).selectExpr(
        "CAST(n AS BIGINT) AS n_intervals",
        "CAST(median_gap_days AS BIGINT) AS median_gap_days",
        "CAST(p90_gap_days AS BIGINT) AS p90_gap_days",
    )


@register(
    "dow_revenue_mix",
    """
    SELECT CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
)
def dow_revenue_mix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order count and revenue by day of week (the staffing/campaign
    calendar view): Spark ``dayofweek`` is 1=Sunday..7=Saturday;
    DuckDB ``dayofweek`` is 0=Sunday..6 — the oracle adds 1 so both
    engines emit the same 1-based key (a documented cross-engine
    calendar trap). Exact cents, pure codegen."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.groupBy(
            F.dayofweek(F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("dow")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .orderBy("dow")
    )


@register(
    "hourly_event_profile",
    """
    SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour_utc,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def hourly_event_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly traffic profile with purchase and error counts (the
    diurnal load curve capacity planning and alert baselining read;
    hours are UTC — the session timezone is pinned, so both engines
    bucket identically). One grouped pass onto 24 rows."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(F.hour("ts").cast("bigint").alias("hour_utc"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_purchases"),
            F.sum(F.expr("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_errors"),
        )
        .orderBy("hour_utc")
    )
