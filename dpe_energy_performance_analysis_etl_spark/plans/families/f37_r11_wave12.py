"""Round 11, wave 12: commercial-efficiency analytics — discount
ROI per brand, loyalty-tier mix, per-source duplicate rate,
inter-event median by type, run-rate vs trailing revenue, token
length profile per source.

Shared exactness recipe: money stays in exact cents; discount cost
rides the integer (cents x basis-points) product; duplicate
detection hashes with md5 (byte-identical both engines); medians are
rank picks via the two-pass recipe; every ratio is one floored
double or a nonnegative cross-multiplied truncating div."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.plans._core import (  # noqa: F401
    DataFrame,
    SparkSession,
    Window,
    F,
    QUERIES,
    ORACLE_SQL,
    read_documents,
    read_events,
    register,
)


@register(
    "discount_roi_brands",
    """
    WITH per AS MATERIALIZED (
      SELECT p.p_brand AS brand,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)
                      * CAST(CAST(l.l_discount AS DECIMAL(10,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cost_cbp
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    )
    SELECT brand, cents AS revenue_cents,
           CAST(cost_cbp // 100 AS BIGINT) AS discount_cost_cents,
           CASE WHEN cost_cbp > 0 THEN
             CAST(floor(1e5 * CAST(cents AS DOUBLE) / cost_cbp) AS BIGINT)
           END AS roi_milli
    FROM per ORDER BY brand
    """,
)
def discount_roi_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount ROI per brand: gross line revenue per dollar of
    discount given (the promo-efficiency ranking a trade-spend
    review runs; ``arc_elasticity_brands`` estimates the demand
    response — this reads the realized cost side). Discount cost is
    the exact integer product cents x discount-basis-points
    (cost/10000 dollars); ROI = revenue/(cost/100) via one floored
    milli expression; NULL where a brand gave no discounts."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    per = (
        li.join(p.select("p_partkey", "p_brand"), li["l_partkey"] == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("cents"),
            F.sum(
                F.expr(
                    "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                    " * CAST(CAST(l_discount AS DECIMAL(10,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("cost_cbp"),
        )
    )
    return per.selectExpr(
        "brand",
        "cents AS revenue_cents",
        "CAST(cost_cbp div 100 AS BIGINT) AS discount_cost_cents",
        "CASE WHEN cost_cbp > 0 THEN"
        " CAST(floor(1e5 * CAST(cents AS DOUBLE) / cost_cbp) AS BIGINT)"
        " END AS roi_milli",
    ).orderBy("brand")


@register(
    "loyalty_tier_mix",
    """
    WITH per AS MATERIALIZED (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), tiered AS MATERIALIZED (
      SELECT CASE WHEN n_orders = 1 THEN 'one-time'
                  WHEN n_orders <= 5 THEN 'repeat'
                  ELSE 'loyal' END AS tier,
             n_orders, cents
      FROM per
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(cents) AS BIGINT) AS s FROM tiered
    )
    SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           CAST(floor(1e6 * CAST(SUM(cents) AS DOUBLE) / t.s) AS BIGINT)
             AS revenue_share_ppm
    FROM tiered, tot t
    GROUP BY tier, t.s ORDER BY tier
    """,
)
def loyalty_tier_mix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loyalty-tier mix: customers bucketed by lifetime order count
    (one-time / repeat / loyal) with their revenue share — the
    top-of-deck slide of any retention business case (``rfm_segments``
    is the fine-grained version; this is the executive rollup). One
    per-customer aggregation, a CASE bucket, exact cents, one
    floored ppm share per tier."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("cents"),
    )
    tiered = per.selectExpr(
        "CASE WHEN n_orders = 1 THEN 'one-time'"
        " WHEN n_orders <= 5 THEN 'repeat'"
        " ELSE 'loyal' END AS tier",
        "n_orders",
        "cents",
    ).cache()  # 3-tier rollup + grand total
    tot = tiered.agg(F.sum("cents").cast("bigint").alias("s"))
    return (
        tiered.crossJoin(F.broadcast(tot))
        .groupBy("tier", "s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .selectExpr(
            "tier",
            "n_customers",
            "n_orders",
            "revenue_cents",
            "CAST(floor(1e6 * CAST(revenue_cents AS DOUBLE) / s) AS BIGINT)"
            " AS revenue_share_ppm",
        )
        .orderBy("tier")
    )


@register(
    "dup_rate_sources",
    """
    WITH hashed AS MATERIALIZED (
      SELECT source, md5(text) AS h FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_dup_docs,
           CAST(floor(1e6 * CAST(COUNT(*) - COUNT(DISTINCT h) AS DOUBLE)
                      / COUNT(*)) AS BIGINT) AS dup_ppm
    FROM hashed GROUP BY 1 ORDER BY 1
    """,
)
def dup_rate_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate rate per source (the per-provider quality
    scorecard a data-acquisition review reads; ``dedup_exact_groups``
    finds the duplicates corpus-wide — this attributes the rate to
    sources): md5 text hashes (byte-identical across engines),
    distinct-vs-total per source, one floored ppm."""
    docs = read_documents(spark, sf_dir)
    hashed = docs.select("source", F.md5(F.col("text")).alias("h"))
    return (
        hashed.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("h").cast("bigint").alias("n_distinct"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_distinct",
            "n_docs - n_distinct AS n_dup_docs",
            "CAST(floor(1e6 * CAST(n_docs - n_distinct AS DOUBLE) / n_docs)"
            " AS BIGINT) AS dup_ppm",
        )
        .orderBy("source")
    )


@register(
    "interarrival_median_by_type",
    """
    WITH gaps AS MATERIALIZED (
      SELECT event_type AS g,
             epoch_us(ts) // 1000000
               - epoch_us(lag(ts) OVER (PARTITION BY event_type, user_id
                                        ORDER BY ts, event_id)) // 1000000
               AS gap_sec
      FROM events
    ), nz AS MATERIALIZED (
      SELECT g, CAST(gap_sec AS BIGINT) AS gap_sec FROM gaps
      WHERE gap_sec IS NOT NULL
    ), ranked AS MATERIALIZED (
      SELECT g, gap_sec,
             row_number() OVER (PARTITION BY g ORDER BY gap_sec) AS r,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM nz
    )
    SELECT g AS event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(MAX(CASE WHEN r = (n + 1) // 2 THEN gap_sec END) AS BIGINT)
             AS median_gap_sec
    FROM ranked GROUP BY g ORDER BY event_type
    """,
)
def interarrival_median_by_type_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median per-user inter-arrival time per event type (the
    cadence fingerprint that separates heartbeat-like types from
    bursty ones; ``interarrival_percentiles`` reads the global
    stream — this conditions on type and user). Gaps in whole epoch
    seconds (epoch_us // 1e6 — the r6 rule) from per-(type, user)
    lag windows; the per-type median is a rank pick via the
    two-pass recipe."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_seconds,
    )
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_kth_smallest,
    )

    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        F.col("event_type").alias("g"),
        (epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(w))
        .cast("bigint")
        .alias("gap_sec"),
    ).where(F.col("gap_sec").isNotNull())
    med = grouped_kth_smallest(gaps, "g", "gap_sec", k_of_n="(n + 1) div 2")
    return med.selectExpr(
        "g AS event_type",
        "CAST(n AS BIGINT) AS n_gaps",
        "CAST(kth_value AS BIGINT) AS median_gap_sec",
    ).orderBy("event_type")


@register(
    "run_rate_vs_trailing",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT cents,
             CAST(row_number() OVER (ORDER BY month DESC) AS BIGINT) AS rdesc
      FROM monthly
    ), agg AS MATERIALIZED (
      SELECT
        CAST(SUM(CASE WHEN rdesc <= 3 THEN cents ELSE 0 END) AS BIGINT) AS l3,
        CAST(SUM(CASE WHEN rdesc <= 12 THEN cents ELSE 0 END) AS BIGINT) AS l12
      FROM idx
    )
    SELECT l3 AS last3_cents, l12 AS trailing12_cents,
           CAST(l3 * 4 AS BIGINT) AS run_rate_annualized_cents,
           CAST(floor(1000e0 * (CAST(l3 AS DOUBLE) * 4e0) / l12) AS BIGINT)
             AS run_rate_vs_trailing_milli
    FROM agg
    """,
)
def run_rate_vs_trailing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annualized run-rate (last 3 months x 4) against the trailing
    12 months — the board-deck momentum ratio (> 1000 milli = the
    business is accelerating vs its own year). Anchored to the
    DATA's last observed month (rank from the month table's tail,
    never a wall-clock date). Exact cents; one floored milli
    ratio."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy(F.col("month").desc())
    idx = monthly.select(
        "cents", F.row_number().over(w).cast("bigint").alias("rdesc")
    )
    agg = idx.agg(
        F.sum(F.expr("CASE WHEN rdesc <= 3 THEN cents ELSE 0 END"))
        .cast("bigint")
        .alias("l3"),
        F.sum(F.expr("CASE WHEN rdesc <= 12 THEN cents ELSE 0 END"))
        .cast("bigint")
        .alias("l12"),
    )
    return agg.selectExpr(
        "l3 AS last3_cents",
        "l12 AS trailing12_cents",
        "CAST(l3 * 4 AS BIGINT) AS run_rate_annualized_cents",
        "CAST(floor(1000e0 * (CAST(l3 AS DOUBLE) * 4e0) / l12) AS BIGINT)"
        " AS run_rate_vs_trailing_milli",
    )


@register(
    "token_length_stats_sources",
    """
    WITH toks AS MATERIALIZED (
      SELECT source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(length(w)) AS BIGINT) AS n_chars,
           CAST((SUM(length(w)::HUGEINT) * 1000) // COUNT(*) AS BIGINT)
             AS mean_len_milli,
           CAST(SUM(CASE WHEN length(w) >= 8 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_long,
           CAST(floor(1e6 * CAST(SUM(CASE WHEN length(w) >= 8
                                          THEN 1 ELSE 0 END) AS DOUBLE)
                      / COUNT(*)) AS BIGINT) AS long_share_ppm
    FROM toks GROUP BY 1 ORDER BY 1
    """,
)
def token_length_stats_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length profile per source: mean token length and the
    long-token (>= 8 chars) share — the cheap OCR-garbage /
    concatenation-artifact tripwire (corrupted extractions skew long;
    ``text_quality`` scores documents, this scores PROVIDERS). One
    explode + grouped integer sums; a cross-multiplied truncating
    mean and one floored ppm."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr

    docs = read_documents(spark, sf_dir)
    toks = docs.select("source", F.explode(tokens_expr("text")).alias("w"))
    return (
        toks.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
            F.sum(F.expr("CASE WHEN length(w) >= 8 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_long"),
        )
        .selectExpr(
            "source",
            "n_tokens",
            "n_chars",
            "CAST((CAST(n_chars AS DECIMAL(38,0)) * 1000) div n_tokens"
            " AS BIGINT) AS mean_len_milli",
            "n_long",
            "CAST(floor(1e6 * CAST(n_long AS DOUBLE) / n_tokens) AS BIGINT)"
            " AS long_share_ppm",
        )
        .orderBy("source")
    )
