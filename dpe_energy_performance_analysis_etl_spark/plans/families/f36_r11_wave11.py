"""Round 11, wave 11: forensic / psychometric / embedding-geometry
analytics — round-number bias, split-half reliability, seasonal
index table, label-centroid separation, top-customer concentration,
daily error autocorrelation.

Shared exactness recipe: forensic shares and seasonal indices are
cross-multiplied integer ratios; the reliability correlation is an
integer-moment Pearson pushed through Spearman-Brown in one double
expression; embedding centroids are INTEGER-SCALED per-dimension
sums (floats quantized to 2^20ths before any shuffle-order
aggregation — float sums would be partition-order-dependent);
autocorrelation uses exact day-grain count moments."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.plans._core import (  # noqa: F401
    DataFrame,
    SparkSession,
    Window,
    F,
    QUERIES,
    ORACLE_SQL,
    read_embeddings,
    read_events,
    register,
)


@register(
    "round_number_bias_orders",
    """
    WITH coded AS MATERIALIZED (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS c
      FROM orders
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN c % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_round
      FROM coded
    )
    SELECT n AS n_orders, n_round AS n_round_dollar,
           CAST(floor(1e6 * CAST(n_round AS DOUBLE) / n) AS BIGINT)
             AS round_share_ppm,
           CAST(((100 * n_round::HUGEINT - n) * (100 * n_round::HUGEINT - n)
                 * 10000) // (n::HUGEINT * 99) AS BIGINT) AS chi2_e4
    FROM agg
    """,
)
def round_number_bias_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-dollar bias screen on order totals (the forensic
    companion of the Benford digit batteries: fabricated or
    hand-keyed amounts over-select .00 cents): observed share of
    whole-dollar totals vs the 1/100 uniform-cents null, with the
    1-df chi-square in EXACT integers — chi2 = (100 x - n)^2 /
    (99 n) scaled by 1e4, a nonnegative truncating div identical in
    both engines."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    agg = o.selectExpr(
        "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS c"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("CASE WHEN c % 100 = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_round"),
    )
    return agg.selectExpr(
        "n AS n_orders",
        "n_round AS n_round_dollar",
        "CAST(floor(1e6 * CAST(n_round AS DOUBLE) / n) AS BIGINT)"
        " AS round_share_ppm",
        "CAST(((100 * CAST(n_round AS DECIMAL(38,0)) - n)"
        " * (100 * CAST(n_round AS DECIMAL(38,0)) - n) * 10000)"
        " div (CAST(n AS DECIMAL(38,0)) * 99) AS BIGINT) AS chi2_e4",
    )


@register(
    "split_half_reliability_nations",
    """
    WITH cells AS MATERIALIZED (
      SELECT c.c_nationkey AS nk,
             CAST(SUM(CASE WHEN CAST(date_part('month', o.o_orderdate)
                                 AS BIGINT) % 2 = 1
                           THEN CAST(CAST(o.o_totalprice AS DECIMAL(30,2))
                                     * 100 AS BIGINT) ELSE 0 END) // 100
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN CAST(date_part('month', o.o_orderdate)
                                 AS BIGINT) % 2 = 0
                           THEN CAST(CAST(o.o_totalprice AS DECIMAL(30,2))
                                     * 100 AS BIGINT) ELSE 0 END) // 100
                  AS BIGINT) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(x::HUGEINT * x) AS qx, SUM(y::HUGEINT * y) AS qy,
             SUM(x::HUGEINT * y) AS sxy
      FROM cells
    )
    SELECT n AS n_nations,
           CAST(floor(1e6 *
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(qx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(qy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
             AS BIGINT) AS half_r_ppm,
           CAST(floor(1e6 *
             2e0 * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / sqrt((CAST(n AS DOUBLE) * CAST(qx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (CAST(n AS DOUBLE) * CAST(qy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
             / (1e0 + (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / sqrt((CAST(n AS DOUBLE) * CAST(qx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(qy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))))
             AS BIGINT) AS spearman_brown_ppm
    FROM agg
    """,
)
def split_half_reliability_nations_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-half reliability of per-nation revenue (odd vs even
    calendar months) with the Spearman-Brown step-up (Brown 1910,
    Spearman 1910): is a nation's revenue level a STABLE trait of
    the nation or month-to-month noise? r between the halves from
    exact whole-dollar integer moments over 25 nation cells;
    Spearman-Brown 2r/(1+r) in the same fixed double expression;
    both floored ppm."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cells = (
        o.join(c.select("c_custkey", "c_nationkey"), o["o_custkey"] == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN CAST(month(o_orderdate) AS BIGINT) % 2 = 1"
                " THEN CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100"
                " AS BIGINT) ELSE 0 END) div 100 AS BIGINT)"
            ).alias("x"),
            F.expr(
                "CAST(SUM(CASE WHEN CAST(month(o_orderdate) AS BIGINT) % 2 = 0"
                " THEN CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100"
                " AS BIGINT) ELSE 0 END) div 100 AS BIGINT)"
            ).alias("y"),
        )
    )
    agg = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("qx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("qy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
    )
    r_expr = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / sqrt((CAST(n AS DOUBLE) * CAST(qx AS DOUBLE)"
        "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        "        * (CAST(n AS DOUBLE) * CAST(qy AS DOUBLE)"
        "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
    )
    return agg.selectExpr(
        "n AS n_nations",
        f"CAST(floor(1e6 * {r_expr}) AS BIGINT) AS half_r_ppm",
        f"CAST(floor(1e6 * 2e0 * ({r_expr}) / (1e0 + {r_expr})) AS BIGINT)"
        " AS spearman_brown_ppm",
    )


@register(
    "seasonal_index_monthly",
    """
    WITH monthly AS MATERIALIZED (
      SELECT CAST(date_part('month', o_orderdate) AS BIGINT) AS moy,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(n_orders) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
      FROM monthly
    )
    SELECT moy AS month_of_year, n_orders, cents AS revenue_cents,
           CAST((cents::HUGEINT * t.n * 1000) // (n_orders::HUGEINT * t.s)
                AS BIGINT) AS seasonal_index_milli
    FROM monthly, tot t
    ORDER BY moy
    """,
)
def seasonal_index_monthly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical month-of-year seasonal index table: each month's
    average order value relative to the overall average (index 1000
    = neutral; the multiplicative seasonal profile
    ``seasonal_decompose_revenue`` estimates is read directly here
    at calendar grain). Fully integer: index = (cents_m * N_total *
    1000) div (n_m * S_total) — a nonnegative cross-multiplied
    truncating div, identical in both engines. 12 rows."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = (
        o.groupBy(F.month("o_orderdate").cast("bigint").alias("moy"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("cents"),
        )
        .cache()  # 12 rows; totals + index
    )
    tot = monthly.agg(
        F.sum("n_orders").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    return (
        monthly.crossJoin(F.broadcast(tot))
        .selectExpr(
            "moy AS month_of_year",
            "n_orders",
            "cents AS revenue_cents",
            "CAST((CAST(cents AS DECIMAL(38,0)) * n * 1000)"
            " div (CAST(n_orders AS DECIMAL(38,0)) * s) AS BIGINT)"
            " AS seasonal_index_milli",
        )
        .orderBy("month_of_year")
    )


@register(
    "label_centroid_separation_embeddings",
    """
    WITH dims AS MATERIALIZED (
      SELECT label, u.pos AS pos,
             CAST(floor(CAST(u.v AS DOUBLE) * 1048576e0) AS BIGINT) AS q
      FROM (
        SELECT label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
      ) u(label, v, pos)
    ), cents AS MATERIALIZED (
      SELECT label, pos, CAST(SUM(q) AS BIGINT) AS sq,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM dims GROUP BY 1, 2
    ), pairs AS MATERIALIZED (
      SELECT a.label AS l1, b.label AS l2,
             SUM((a.sq::HUGEINT * b.n - b.sq::HUGEINT * a.n)
                 * (a.sq::HUGEINT * b.n - b.sq::HUGEINT * a.n)) AS d2,
             CAST(MAX(a.n) AS BIGINT) AS n1, CAST(MAX(b.n) AS BIGINT) AS n2
      FROM cents a JOIN cents b ON a.pos = b.pos AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT CAST(l1 AS BIGINT) AS label1, CAST(l2 AS BIGINT) AS label2,
           CAST(floor(sqrt(CAST(d2 AS DOUBLE))
                      / (CAST(n1 AS DOUBLE) * n2)
                      / 1048576e0 * 1000e0) AS BIGINT)
             AS centroid_dist_milli
    FROM pairs ORDER BY l1, l2
    """,
)
def label_centroid_separation_embeddings_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Euclidean separation between label centroids in the
    embedding space — the one-table sanity check before trusting the
    labels for hard-negative mining (collapsed centroids = labels
    carry no geometry; ``kmeans_validity_embeddings`` scores LEARNED
    clusters, this scores the GIVEN labels).

    Exactness: every float is quantized to an exact 2^20ths integer
    BEFORE any aggregation (floor in double — identical both
    engines), so per-(label, dim) sums are order-independent
    BIGINTs; the centroid difference uses the COMMON-DENOMINATOR
    form d = sq1*n2 - sq2*n1 (exact DECIMAL), so the per-pair
    d2 = SUM(d^2) is an exact integer sum (order-independent — a
    double mean-difference sum here would be shuffle-order-
    dependent); one sqrt + rescale by n1*n2*2^20 at the end."""
    emb = read_embeddings(spark, sf_dir)
    dims = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "v")
    ).selectExpr(
        "label",
        "pos0 + 1 AS pos",
        "CAST(floor(CAST(v AS DOUBLE) * 1048576e0) AS BIGINT) AS q",
    )
    cents = dims.groupBy("label", "pos").agg(
        F.sum("q").cast("bigint").alias("sq"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    a = cents.selectExpr("label AS l1", "pos", "sq AS sq1", "n AS n1")
    b = cents.selectExpr("label AS l2", "pos AS pos2", "sq AS sq2", "n AS n2")
    pairs = (
        a.join(b, (F.col("pos") == F.col("pos2")) & (F.col("l1") < F.col("l2")))
        .selectExpr(
            "l1",
            "l2",
            "n1",
            "n2",
            "(CAST(sq1 AS DECIMAL(38,0)) * n2 - CAST(sq2 AS DECIMAL(38,0)) * n1)"
            " * (CAST(sq1 AS DECIMAL(38,0)) * n2"
            "    - CAST(sq2 AS DECIMAL(38,0)) * n1) AS dd",
        )
        .groupBy("l1", "l2")
        .agg(
            F.sum("dd").alias("d2"),
            F.max("n1").cast("bigint").alias("n1"),
            F.max("n2").cast("bigint").alias("n2"),
        )
    )
    return pairs.selectExpr(
        "CAST(l1 AS BIGINT) AS label1",
        "CAST(l2 AS BIGINT) AS label2",
        "CAST(floor(sqrt(CAST(d2 AS DOUBLE))"
        " / (CAST(n1 AS DOUBLE) * n2) / 1048576e0 * 1000e0) AS BIGINT)"
        " AS centroid_dist_milli",
    ).orderBy("label1", "label2")


@register(
    "top_customer_share_nations",
    """
    WITH per AS MATERIALIZED (
      SELECT c.c_nationkey AS nk, o.o_custkey AS k,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), agg AS MATERIALIZED (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(MAX(cents) AS BIGINT) AS top_cents,
             CAST(SUM(cents) AS BIGINT) AS total_cents
      FROM per GROUP BY 1
    )
    SELECT n.n_name AS nation, a.n_customers, a.top_cents, a.total_cents,
           CAST(floor(1e6 * CAST(a.top_cents AS DOUBLE) / a.total_cents)
                AS BIGINT) AS top_share_ppm
    FROM agg a JOIN nation n ON a.nk = n.n_nationkey
    ORDER BY nation
    """,
)
def top_customer_share_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-customer revenue concentration per nation (the
    key-account dependency risk each regional P&L owner tracks;
    ``brand_hhi_by_nation`` reads the product axis — this reads the
    customer axis with the max-share single number): largest
    customer's share of nation revenue. One (nation, customer)
    aggregation, one per-nation max/total, one floored ppm."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    per = (
        o.join(c.select("c_custkey", "c_nationkey"), o["o_custkey"] == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nk"), F.col("o_custkey").alias("k"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    agg = per.groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.max("cents").cast("bigint").alias("top_cents"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )
    return (
        agg.join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("nk") == F.col("n_nationkey"),
        )
        .selectExpr(
            "n_name AS nation",
            "n_customers",
            "top_cents",
            "total_cents",
            "CAST(floor(1e6 * CAST(top_cents AS DOUBLE) / total_cents)"
            " AS BIGINT) AS top_share_ppm",
        )
        .orderBy("nation")
    )


@register(
    "daily_error_autocorr_events",
    """
    WITH daily AS MATERIALIZED (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM events GROUP BY 1
    ), lagged AS MATERIALIZED (
      SELECT c, lag(c) OVER (ORDER BY day) AS prev
      FROM daily
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS sx, CAST(SUM(prev) AS BIGINT) AS sy,
             SUM(c::HUGEINT * c) AS qx, SUM(prev::HUGEINT * prev) AS qy,
             SUM(c::HUGEINT * prev) AS sxy
      FROM lagged WHERE prev IS NOT NULL
    )
    SELECT n AS n_pairs,
           CAST(floor(1e6 *
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(qx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(qy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
             AS BIGINT) AS lag1_r_ppm
    FROM agg
    """,
)
def daily_error_autocorr_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily error-event count (the
    incident-clustering signal an SRE baseline needs: r near 0 means
    error days are memoryless; high r means bad days cluster —
    ``fano_event_bursts`` reads within-day burstiness, this reads
    day-to-day persistence). Exact integer moments over the
    day-grain table; one floored ppm Pearson."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(F.expr("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("c")
    )
    w = Window.orderBy("day")
    lagged = daily.select("c", F.lag("c").over(w).alias("prev")).where(
        F.col("prev").isNotNull()
    )
    agg = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sx"),
        F.sum("prev").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("qx"),
        F.sum(F.expr("CAST(prev AS DECIMAL(38,0)) * prev")).alias("qy"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * prev")).alias("sxy"),
    )
    return agg.selectExpr(
        "n AS n_pairs",
        "CAST(floor(1e6 *"
        " (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / sqrt((CAST(n AS DOUBLE) * CAST(qx AS DOUBLE)"
        "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        "        * (CAST(n AS DOUBLE) * CAST(qy AS DOUBLE)"
        "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"
        " AS BIGINT) AS lag1_r_ppm",
    )
