"""Query-registry family chunk 10 (auto-split from the
historical plans/queries.py lines 17844-19618; registration
order preserved — see plans/queries.py facade)."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.plans._core import (  # noqa: F401
    Callable,
    DataFrame,
    SparkSession,
    Window,
    F,
    epoch_double,
    epoch_micros,
    epoch_seconds,
    exact_cents_sum,
    exact_sum_agg,
    from_cents,
    scaled_long,
    TABLES,
    load_tables,
    read_events,
    read_documents,
    read_embeddings,
    dsum,
    davg,
    dsum_fast,
    davg_fast,
    QUERIES,
    ORACLE_SQL,
    register,
)

@register(
    "mcnemar_repeat_purchase",
    """
    WITH base AS MATERIALIZED (
      SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS d
      FROM events
    ), bounds AS MATERIALIZED (
      SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM base
    ), u AS MATERIALIZED (
      SELECT user_id,
             count_if(event_type = 'purchase'
                      AND d < (dmin + dmax + 1) // 2) > 0 AS p1,
             count_if(event_type = 'purchase'
                      AND d >= (dmin + dmax + 1) // 2) > 0 AS p2
      FROM base, bounds GROUP BY 1
    ), m AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(count_if(p1 AND p2) AS BIGINT) AS n_both,
             CAST(count_if(NOT p1 AND NOT p2) AS BIGINT) AS n_neither,
             CAST(count_if(p1 AND NOT p2) AS BIGINT) AS b_lapsed,
             CAST(count_if(p2 AND NOT p1) AS BIGINT) AS c_adopted
      FROM u
    )
    SELECT n_users, n_both, n_neither, b_lapsed, c_adopted,
           CASE WHEN b_lapsed + c_adopted > 0 THEN
             CAST(((b_lapsed - c_adopted) * (b_lapsed - c_adopted)
                   * 1000000) // (b_lapsed + c_adopted) AS BIGINT)
           END AS mcnemar_ppm,
           CASE WHEN b_lapsed + c_adopted > 0 THEN
             CAST((greatest(abs(b_lapsed - c_adopted) - 1, 0)
                   * greatest(abs(b_lapsed - c_adopted) - 1, 0)
                   * 1000000) // (b_lapsed + c_adopted) AS BIGINT)
           END AS mcnemar_cc_ppm
    FROM m
    """,
)
def mcnemar_repeat_purchase_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test (McNemar 1947) on purchase behavior
    across the two halves of the observed window: each user is their
    own pair (purchased in H1? in H2?), the statistic lives on the
    DISCORDANT counts only — χ² = (b−c)²/(b+c), emitted ppm-scaled
    with one truncating division, plus the continuity-corrected
    (|b−c|−1)² variant. The half boundary anchors to the DATA's
    observed day range (CLAUDE.md: never a schema epoch), attached
    as a broadcast scalar row; one user-keyed aggregation, one
    bounded fold — zero float ops."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )

    ev = read_events(spark, sf_dir)
    base = ev.select(
        "user_id",
        "event_type",
        (epoch_micros("ts") / F.lit(86400000000)).cast("bigint").alias("d"),
    )
    bounds = base.agg(
        F.min("d").alias("dmin"), F.max("d").alias("dmax")
    )
    u = (
        base.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            (
                F.count_if(
                    (F.col("event_type") == "purchase")
                    & F.expr("d < (dmin + dmax + 1) div 2")
                )
                > 0
            ).alias("p1"),
            (
                F.count_if(
                    (F.col("event_type") == "purchase")
                    & F.expr("d >= (dmin + dmax + 1) div 2")
                )
                > 0
            ).alias("p2"),
        )
    )
    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count_if(F.col("p1") & F.col("p2")).cast("bigint").alias("n_both"),
        F.count_if(~F.col("p1") & ~F.col("p2"))
        .cast("bigint")
        .alias("n_neither"),
        F.count_if(F.col("p1") & ~F.col("p2")).cast("bigint").alias("b_lapsed"),
        F.count_if(F.col("p2") & ~F.col("p1"))
        .cast("bigint")
        .alias("c_adopted"),
    )
    return m.selectExpr(
        "n_users",
        "n_both",
        "n_neither",
        "b_lapsed",
        "c_adopted",
        "CASE WHEN b_lapsed + c_adopted > 0 THEN"
        " CAST(((b_lapsed - c_adopted) * (b_lapsed - c_adopted) * 1000000)"
        " div (b_lapsed + c_adopted) AS BIGINT) END AS mcnemar_ppm",
        "CASE WHEN b_lapsed + c_adopted > 0 THEN"
        " CAST((greatest(abs(b_lapsed - c_adopted) - 1, 0)"
        "       * greatest(abs(b_lapsed - c_adopted) - 1, 0) * 1000000)"
        " div (b_lapsed + c_adopted) AS BIGINT) END AS mcnemar_cc_ppm",
    )


# =====================================================================
# Round 9, wave 11: Hodges-Lehmann pseudo-median, Cramér-von Mises
# two-sample, Moran's I grid autocorrelation
# =====================================================================

@register(
    "hl_pseudomedian_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), w AS MATERIALIZED (
      SELECT a.rev + b.rev AS walsh2
      FROM monthly a JOIN monthly b ON a.month <= b.month
    ), r AS MATERIALIZED (
      SELECT walsh2, row_number() OVER (ORDER BY walsh2) AS rk,
             COUNT(*) OVER () AS n
      FROM w
    )
    SELECT CAST((SELECT COUNT(*) FROM monthly) AS BIGINT) AS n_months,
           CAST(MAX(n) AS BIGINT) AS n_walsh_pairs,
           CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN walsh2 END)
                AS BIGINT) AS pseudo_median_2x_cents,
           CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN walsh2 END) // 2
                AS BIGINT) AS pseudo_median_cents
    FROM r
    """,
)
def hl_pseudomedian_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann one-sample pseudo-median of monthly revenue
    (Hodges & Lehmann 1963): the exact LOW median of all n(n+1)/2
    Walsh averages (x_i + x_j)/2 over i ≤ j — the location estimator
    with 0.955 Gaussian efficiency AND a 29% breakdown point, where
    the plain median wastes efficiency and the mean has no
    robustness. Walsh averages are carried DOUBLED (x_i + x_j stays
    exact integer cents); the pair table is bounded by |months|², so
    the self-join is a broadcast of an eagerly-pinned ≤|months|-row
    aggregate (the fact scan runs ONCE) and the rank window runs
    over ≤ |months|² rows — never the fact table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month")
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
        .localCheckpoint(eager=True)  # three consumers of a tiny table
    )
    w = (
        monthly.alias("a")
        .join(F.broadcast(monthly.alias("b")), F.expr("a.month <= b.month"))
        .selectExpr("a.rev + b.rev AS walsh2")
    )
    wr = Window.orderBy("walsh2")
    wa = Window.orderBy("walsh2").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = w.select(
        "walsh2",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wa).alias("n"),
    )
    nm = monthly.agg(F.count(F.lit(1)).cast("bigint").alias("n_months"))
    return (
        r.agg(
            F.max("n").cast("bigint").alias("n_walsh_pairs"),
            F.max(F.expr("CASE WHEN rk = (n + 1) div 2 THEN walsh2 END"))
            .cast("bigint")
            .alias("pseudo_median_2x_cents"),
        )
        .crossJoin(F.broadcast(nm))
        .selectExpr(
            "n_months",
            "n_walsh_pairs",
            "pseudo_median_2x_cents",
            "CAST(pseudo_median_2x_cents div 2 AS BIGINT)"
            " AS pseudo_median_cents",
        )
    )


@register(
    "cvm_urgency_status",
    """
    WITH tiers AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             CAST(count_if(o_orderpriority IN ('1-URGENT', '2-HIGH'))
                  AS BIGINT) AS c1,
             CAST(count_if(o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                  AS BIGINT) AS c2
      FROM orders GROUP BY 1, 2
    ), pre AS MATERIALIZED (
      SELECT g, c1 + c2 AS c,
             CAST(COALESCE(SUM(c1) OVER win, 0) + c1 AS BIGINT) AS a,
             CAST(COALESCE(SUM(c2) OVER win, 0) + c2 AS BIGINT) AS b
      FROM tiers
      WINDOW win AS (PARTITION BY g ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), agg AS MATERIALIZED (
      SELECT g, CAST(MAX(a) AS BIGINT) AS n1, CAST(MAX(b) AS BIGINT) AS n2,
             SUM(c::HUGEINT * a * a) AS sa2,
             SUM(c::HUGEINT * a * b) AS sab,
             SUM(c::HUGEINT * b * b) AS sb2
      FROM pre GROUP BY 1
    )
    SELECT g AS o_orderstatus, n1, n2,
           CASE WHEN n1 > 0 AND n2 > 0 THEN CAST(
             (((n2::HUGEINT * n2 * sa2 - 2 * n1::HUGEINT * n2 * sab
                + n1::HUGEINT * n1 * sb2)
               // ((n1 + n2)::HUGEINT * (n1 + n2))) * 1000000)
             // (n1::HUGEINT * n2) AS BIGINT) END AS cvm_ppm
    FROM agg
    """,
)
def cvm_urgency_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér-von Mises two-sample test per order status
    (operators/stats.py cramer_von_mises_2samp): urgent (priority
    1-2) vs normal order values compared across the WHOLE ECDF —
    the integrated-squared-distance alternative where KS sees only
    the worst single gap. The expanded-square identity makes it one
    pass over the (status, price) tier table (sample sizes fall out
    of the same aggregation as max inclusive prefixes), exact
    DECIMAL(38,0) throughout, two fixed-order truncating divisions;
    prefixes ride the grouped_running_totals range-partition recipe
    (the oracle's PARTITION BY window is the sf0.01 shortcut)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        cramer_von_mises_2samp,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("urgent"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("v"),
    )
    return cramer_von_mises_2samp(base, "st", "urgent", "v").withColumnRenamed(
        "st", "o_orderstatus"
    )


@register(
    "morans_i_balance_grid",
    """
    WITH cells AS MATERIALIZED (
      SELECT (c_custkey // 100) % 100 AS cx, c_custkey % 100 AS cy,
             CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS val
      FROM customer GROUP BY 1, 2
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(val) AS BIGINT) AS s
      FROM cells
    ), ctr AS MATERIALIZED (
      SELECT cx, cy, (n::HUGEINT * val - s) AS d FROM cells, tot
    ), nbr AS MATERIALIZED (
      SELECT cx + 1 AS cx, cy, d AS d_nbr FROM ctr
      UNION ALL SELECT cx - 1, cy, d FROM ctr
      UNION ALL SELECT cx, cy + 1, d FROM ctr
      UNION ALL SELECT cx, cy - 1, d FROM ctr
    ), pairs AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS w, SUM(c.d * nbr.d_nbr) AS cross_sum
      FROM ctr c JOIN nbr ON c.cx = nbr.cx AND c.cy = nbr.cy
    ), var AS MATERIALIZED (
      SELECT SUM(d * d) AS var_sum FROM ctr
    )
    SELECT tot.n AS n_cells, pairs.w AS w_pairs,
           CASE WHEN pairs.w > 0 AND var.var_sum > 0 THEN CAST(
             (CASE WHEN pairs.cross_sum >= 0 THEN 1 ELSE -1 END)
             * ((abs(pairs.cross_sum) * tot.n * 1000000)
                // (var.var_sum * pairs.w))
           AS BIGINT) END AS morans_i_scaled
    FROM tot, pairs, var
    """,
)
def morans_i_balance_grid_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I spatial autocorrelation (operators/spatial.py
    morans_i_grid) of aggregate account balance over the synthesized
    100×100 customer site grid (same coordinate derivation as
    point_in_polygon_tags / dbscan_customer_sites), rook adjacency:
    do neighboring cells hold similar wealth? The n-scaled centering
    (n·x − S) keeps every term an exact integer, neighbor candidates
    are equi-keyed (each cell explodes its 4 rook keys — never a
    distance cross join), and the single division is sign-factored.
    Near 0 here by construction — custkey-derived values are
    spatially unstructured, which is exactly the null a detector
    must not reject."""
    from dpe_energy_performance_analysis_etl_spark.operators.spatial import (
        morans_i_grid,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cells = c.groupBy(
        F.expr("(c_custkey div 100) % 100").alias("cx"),
        (F.col("c_custkey") % 100).alias("cy"),
    ).agg(
        F.sum(
            F.expr("CAST(CAST(c_acctbal AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("val")
    )
    return morans_i_grid(cells, "cx", "cy", "val")


# =====================================================================
# Round 9, wave 12: Friedman rank test, matrix-profile discord,
# Mantel-Haenszel common odds ratio
# =====================================================================

_FR_R2 = ",\n             ".join(
    f"CAST(SUM(CASE WHEN pr = '{s}' THEN mr2 ELSE 0 END) AS BIGINT) AS r2_p{s}"
    for s in ["1", "2", "3", "4", "5"]
)
_FR_SUMSQ = " + ".join(f"r2_p{s} * r2_p{s}" for s in ["1", "2", "3", "4", "5"])


@register(
    "friedman_nation_priority",
    f"""
    WITH cell AS MATERIALIZED (
      SELECT n.n_name AS blk, substr(o.o_orderpriority, 1, 1) AS pr,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), rk AS MATERIALIZED (
      SELECT blk, pr,
             2 * (rank() OVER (PARTITION BY blk ORDER BY rev) - 1)
               + COUNT(*) OVER (PARTITION BY blk, rev) + 1 AS mr2,
             COUNT(*) OVER (PARTITION BY blk) AS k_in_block
      FROM cell
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(DISTINCT blk) AS BIGINT) AS b,
             {_FR_R2}
      FROM rk WHERE k_in_block = 5
    )
    SELECT b AS b_blocks, r2_p1, r2_p2, r2_p3, r2_p4, r2_p5,
           CASE WHEN b > 0 THEN
             CAST((3 * ({_FR_SUMSQ}) * 1000000) // (b * 5 * 6)
                  - 3000000 * b * 6 AS BIGINT) END AS chi2_ppm
    FROM agg
    """,
)
def friedman_nation_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test (Friedman 1937): blocks = nations,
    treatments = the 5 order priorities, value = total revenue cents
    per cell — does any priority class systematically out-earn the
    others once nation-level scale is blocked out? Ranks live WITHIN
    each 5-cell block (doubled mid-ranks for exact ties), only
    complete blocks count (the classic Friedman requirement), and
    χ²_F = 3·Σ_j R2_j²/(b·k(k+1)) − 3b(k+1) is emitted ppm-scaled
    with one truncating division — the doubled-rank absorption of
    the 12/(bk(k+1)) constant, tie-correction omitted (documented;
    cents totals tie with probability ~0). The rank windows run over
    5-row blocks, never the fact table."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cell = (
        o.join(c.select("c_custkey", "c_nationkey"), o["o_custkey"] == F.col("c_custkey"))
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("blk"),
            F.substring("o_orderpriority", 1, 1).alias("pr"),
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
    )
    w_rank = Window.partitionBy("blk").orderBy("rev")
    w_tie = Window.partitionBy("blk", "rev")
    w_blk = Window.partitionBy("blk")
    rk = cell.select(
        "blk",
        "pr",
        (
            2 * (F.rank().over(w_rank) - 1)
            + F.count(F.lit(1)).over(w_tie)
            + 1
        ).alias("mr2"),
        F.count(F.lit(1)).over(w_blk).alias("k_in_block"),
    )
    agg = rk.where(F.col("k_in_block") == 5).agg(
        F.countDistinct("blk").cast("bigint").alias("b"),
        *[
            F.sum(F.expr(f"CASE WHEN pr = '{s}' THEN mr2 ELSE 0 END"))
            .cast("bigint")
            .alias(f"r2_p{s}")
            for s in ["1", "2", "3", "4", "5"]
        ],
    )
    return agg.selectExpr(
        "b AS b_blocks",
        "r2_p1",
        "r2_p2",
        "r2_p3",
        "r2_p4",
        "r2_p5",
        f"CASE WHEN b > 0 THEN CAST((3 * ({_FR_SUMSQ}) * 1000000)"
        " div (b * 5 * 6) - 3000000 * b * 6 AS BIGINT) END AS chi2_ppm",
    )


@register(
    "matrix_profile_discord_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT month, rev, row_number() OVER (ORDER BY month) AS i FROM monthly
    ), win AS MATERIALIZED (
      SELECT i, month,
             rev AS v0,
             lead(rev, 1) OVER (ORDER BY i) AS v1,
             lead(rev, 2) OVER (ORDER BY i) AS v2,
             lead(rev, 3) OVER (ORDER BY i) AS v3,
             lead(rev, 4) OVER (ORDER BY i) AS v4,
             lead(rev, 5) OVER (ORDER BY i) AS v5
      FROM idx
    ), w AS MATERIALIZED (
      SELECT * FROM win WHERE v5 IS NOT NULL
    ), dist AS MATERIALIZED (
      SELECT a.i AS ia, b.i AS ib,
             (a.v0 - b.v0)::HUGEINT * (a.v0 - b.v0)
             + (a.v1 - b.v1)::HUGEINT * (a.v1 - b.v1)
             + (a.v2 - b.v2)::HUGEINT * (a.v2 - b.v2)
             + (a.v3 - b.v3)::HUGEINT * (a.v3 - b.v3)
             + (a.v4 - b.v4)::HUGEINT * (a.v4 - b.v4)
             + (a.v5 - b.v5)::HUGEINT * (a.v5 - b.v5) AS d2
      FROM w a JOIN w b ON a.i + 6 <= b.i
    ), both_dir AS MATERIALIZED (
      SELECT ia AS i, d2 FROM dist UNION ALL SELECT ib AS i, d2 FROM dist
    ), prof AS MATERIALIZED (
      SELECT i, MIN(d2) AS p FROM both_dir GROUP BY 1
    )
    SELECT w.i AS win_start, w.month,
           CAST(prof.p AS DOUBLE) AS profile_dist2,
           prof.p = (SELECT MAX(p) FROM prof) AS is_discord
    FROM prof JOIN w ON w.i = prof.i
    """,
)
def matrix_profile_discord_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix-profile discord discovery (Yeh et al., ICDM 2016 —
    un-normalized Euclidean variant) on the monthly revenue series:
    for every length-6 subsequence, the distance to its nearest
    NON-OVERLAPPING neighbor (exclusion zone |i−j| ≥ 6); the window
    whose nearest neighbor is farthest is the discord — the most
    anomalous stretch of months. Subsequences come off lead()
    windows over the bounded month table, pair distances are exact
    HUGEINT/DECIMAL(38,0) squares over the ≤|months|² bounded pair
    join, and the only double appears at output (scale-0 int→double,
    one identical rounding in both engines). The discord flag
    compares EXACT integers. At 100 TB the monthly table is still
    ≤ |calendar| rows — the fact scan is the only data-sized pass."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    )
    wi = Window.orderBy("month")
    idx = monthly.select(
        "month", "rev", F.row_number().over(wi).alias("i")
    )
    wl = Window.orderBy("i")
    win = idx.select(
        "i",
        "month",
        F.col("rev").alias("v0"),
        *[F.lead("rev", t).over(wl).alias(f"v{t}") for t in range(1, 6)],
    )
    # bounded (≤|months| rows) multi-consumer table: both pair sides +
    # the output join — pinned eagerly so the fact scan runs once
    w = win.where(F.col("v5").isNotNull()).localCheckpoint(eager=True)
    d2_expr = " + ".join(
        f"CAST(a.v{t} - b.v{t} AS DECIMAL(38,0)) * (a.v{t} - b.v{t})"
        for t in range(6)
    )
    dist = (
        w.alias("a")
        .join(F.broadcast(w.alias("b")), F.expr("a.i + 6 <= b.i"))
        .selectExpr("a.i AS ia", "b.i AS ib", f"{d2_expr} AS d2")
    )
    both_dir = dist.selectExpr(
        "explode(array(struct(ia AS i, d2 AS d2),"
        " struct(ib AS i, d2 AS d2))) AS e"
    ).select("e.i", "e.d2")
    prof = both_dir.groupBy("i").agg(F.min("d2").alias("p"))
    w_max = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        prof.withColumn("pmax", F.max("p").over(w_max))
        .join(w.select("i", "month"), "i")
        .selectExpr(
            "i AS win_start",
            "month",
            "CAST(p AS DOUBLE) AS profile_dist2",
            "p = pmax AS is_discord",
        )
    )


@register(
    "mantel_haenszel_qty_returns",
    """
    WITH strata AS MATERIALIZED (
      SELECT substr(o.o_orderpriority, 1, 1) AS pr,
             CAST(count_if(l.l_quantity > 25 AND l.l_returnflag = 'R')
                  AS BIGINT) AS a,
             CAST(count_if(l.l_quantity > 25 AND l.l_returnflag <> 'R')
                  AS BIGINT) AS b,
             CAST(count_if(l.l_quantity <= 25 AND l.l_returnflag = 'R')
                  AS BIGINT) AS c,
             CAST(count_if(l.l_quantity <= 25 AND l.l_returnflag <> 'R')
                  AS BIGINT) AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ), scaled AS MATERIALIZED (
      SELECT pr, a, b, c, d,
             (a::HUGEINT * d * 1000000) // (a + b + c + d) AS ad_n,
             (b::HUGEINT * c * 1000000) // (a + b + c + d) AS bc_n
      FROM strata
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(ad_n) AS BIGINT) AS sum_ad_scaled,
           CAST(SUM(bc_n) AS BIGINT) AS sum_bc_scaled,
           CASE WHEN SUM(bc_n) > 0 THEN
             CAST((SUM(ad_n) * 1000000) // SUM(bc_n) AS BIGINT)
           END AS mh_or_ppm,
           CASE WHEN SUM(b::HUGEINT * c) > 0 THEN
             CAST((SUM(a::HUGEINT * d) * 1000000) // SUM(b::HUGEINT * c)
                  AS BIGINT)
           END AS pooled_or_ppm
    FROM scaled
    """,
)
def mantel_haenszel_qty_returns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel common odds ratio (Mantel & Haenszel 1959)
    for "high quantity → return" stratified by order priority — the
    confounder-adjusted 2×2 pooling that Simpson's paradox breaks
    naive pooling on (the pooled OR is emitted alongside for the
    contrast). Per-stratum terms a·d/n and b·c/n are each ONE
    truncating division at ppm scale (a defined, documented variant:
    per-stratum floor error ≤ 10⁻⁶ relative, identical in both
    engines), summed exactly; the final ratio is one more truncating
    division. One fact-table pass to the 5-row strata table; all
    arithmetic DECIMAL(38,0)/HUGEINT."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    strata = (
        li.select("l_orderkey", "l_quantity", "l_returnflag")
        .join(
            o.select("o_orderkey", "o_orderpriority"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy(F.substring("o_orderpriority", 1, 1).alias("pr"))
        .agg(
            F.count_if(
                (F.col("l_quantity") > 25) & (F.col("l_returnflag") == "R")
            ).cast("bigint").alias("a"),
            F.count_if(
                (F.col("l_quantity") > 25) & (F.col("l_returnflag") != "R")
            ).cast("bigint").alias("b"),
            F.count_if(
                (F.col("l_quantity") <= 25) & (F.col("l_returnflag") == "R")
            ).cast("bigint").alias("c"),
            F.count_if(
                (F.col("l_quantity") <= 25) & (F.col("l_returnflag") != "R")
            ).cast("bigint").alias("d"),
        )
    )
    scaled = strata.selectExpr(
        "pr",
        "a", "b", "c", "d",
        "(CAST(a AS DECIMAL(38,0)) * d * 1000000) div (a + b + c + d) AS ad_n",
        "(CAST(b AS DECIMAL(38,0)) * c * 1000000) div (a + b + c + d) AS bc_n",
    )
    return scaled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("ad_n").cast("bigint").alias("sum_ad_scaled"),
        F.sum("bc_n").cast("bigint").alias("sum_bc_scaled"),
        F.expr(
            "CASE WHEN SUM(bc_n) > 0 THEN"
            " CAST((SUM(ad_n) * 1000000) div SUM(bc_n) AS BIGINT) END"
        ).alias("mh_or_ppm"),
        F.expr(
            "CASE WHEN SUM(CAST(b AS DECIMAL(38,0)) * c) > 0 THEN"
            " CAST((SUM(CAST(a AS DECIMAL(38,0)) * d) * 1000000)"
            " div SUM(CAST(b AS DECIMAL(38,0)) * c) AS BIGINT) END"
        ).alias("pooled_or_ppm"),
    )


# =====================================================================
# Round 9, wave 13: Cochran's Q, peak detection with prominence
# =====================================================================

_CQ_TYPES = ["view", "click", "purchase", "signup", "error"]
_CQ_K = len(_CQ_TYPES)
_CQ_T = ",\n             ".join(
    f"CAST(SUM(x_{t}) AS BIGINT) AS t_{t}" for t in _CQ_TYPES
)
_CQ_SUMSQ = " + ".join(
    f"({_CQ_K} * t_{t} - n_total) * ({_CQ_K} * t_{t} - n_total)"
    for t in _CQ_TYPES
)


@register(
    "cochran_q_event_types",
    f"""
    WITH u AS MATERIALIZED (
      SELECT user_id,
             {",".join(f"CASE WHEN count_if(event_type = '{t}') > 0 THEN 1 ELSE 0 END AS x_{t}" for t in _CQ_TYPES)}
      FROM events GROUP BY 1
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             {_CQ_T},
             CAST(SUM({" + ".join(f"x_{t}" for t in _CQ_TYPES)}) AS BIGINT)
               AS su,
             CAST(SUM(({" + ".join(f"x_{t}" for t in _CQ_TYPES)})
                      * ({" + ".join(f"x_{t}" for t in _CQ_TYPES)}))
                  AS BIGINT) AS su2
      FROM u
    )
    SELECT n_users, {", ".join(f"t_{t}" for t in _CQ_TYPES)},
           CASE WHEN {_CQ_K} * su - su2 > 0 THEN CAST(
             (({_CQ_K} - 1) * (
               {_CQ_SUMSQ.replace("n_total", f"({' + '.join(f't_{t}' for t in _CQ_TYPES)})")}
             ) * 1000000)
             // ({_CQ_K} * ({_CQ_K} * su - su2)) AS BIGINT)
           END AS q_ppm
    FROM agg
    """,
)
def cochran_q_event_types_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test (Cochran 1950) — the k-treatment
    generalization of McNemar: do the five event types reach
    DIFFERENT fractions of users, treating each user as their own
    block of five binary outcomes?  With T_j = users reaching type j,
    N = ΣT_j and U_i = types user i reached,

        Q = (k−1)·Σ_j (k·T_j − N)² / (k·(k·ΣU_i − ΣU_i²))

    — the k²-scaled centering keeps everything exact integer, one
    ppm truncating division at the end. All-types and no-types users
    drop out of the denominator by algebra, exactly as the statistic
    requires. One user-keyed aggregation, one bounded fold; the type
    list is the bounded known domain (conditional aggregation, never
    a data-derived pivot)."""
    ev = read_events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        *[
            F.when(F.count_if(F.col("event_type") == t) > 0, 1)
            .otherwise(0)
            .alias(f"x_{t}")
            for t in _CQ_TYPES
        ]
    )
    usum = " + ".join(f"x_{t}" for t in _CQ_TYPES)
    agg = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        *[F.sum(f"x_{t}").cast("bigint").alias(f"t_{t}") for t in _CQ_TYPES],
        F.sum(F.expr(usum)).cast("bigint").alias("su"),
        F.sum(F.expr(f"({usum}) * ({usum})")).cast("bigint").alias("su2"),
    )
    ntot = "(" + " + ".join(f"t_{t}" for t in _CQ_TYPES) + ")"
    sumsq = " + ".join(
        f"({_CQ_K} * t_{t} - {ntot}) * ({_CQ_K} * t_{t} - {ntot})"
        for t in _CQ_TYPES
    )
    return agg.selectExpr(
        "n_users",
        *[f"t_{t}" for t in _CQ_TYPES],
        f"CASE WHEN {_CQ_K} * su - su2 > 0 THEN CAST("
        f" (({_CQ_K} - 1) * ({sumsq}) * 1000000)"
        f" div ({_CQ_K} * ({_CQ_K} * su - su2)) AS BIGINT)"
        " END AS q_ppm",
    )


@register(
    "peaks_monthly_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), m AS MATERIALIZED (
      SELECT month, rev, row_number() OVER (ORDER BY month) AS i FROM monthly
    ), pk AS MATERIALIZED (
      SELECT i, month, rev FROM (
        SELECT *, lag(rev) OVER (ORDER BY i) AS pv,
               lead(rev) OVER (ORDER BY i) AS nx
        FROM m
      ) WHERE pv IS NOT NULL AND nx IS NOT NULL AND rev > pv AND rev > nx
    ), lh AS MATERIALIZED (
      SELECT pk.i, MAX(m.i) AS lj FROM pk
      JOIN m ON m.i < pk.i AND m.rev > pk.rev GROUP BY 1
    ), rh AS MATERIALIZED (
      SELECT pk.i, MIN(m.i) AS rj FROM pk
      JOIN m ON m.i > pk.i AND m.rev > pk.rev GROUP BY 1
    ), lb AS MATERIALIZED (
      SELECT pk.i, MIN(m.rev) AS left_base
      FROM pk LEFT JOIN lh ON lh.i = pk.i
      JOIN m ON m.i >= COALESCE(lh.lj + 1, 1) AND m.i < pk.i
      GROUP BY 1
    ), rb AS MATERIALIZED (
      SELECT pk.i, MIN(m.rev) AS right_base
      FROM pk LEFT JOIN rh ON rh.i = pk.i
      JOIN m ON m.i <= COALESCE(rh.rj - 1, 2147483647) AND m.i > pk.i
      GROUP BY 1
    )
    SELECT pk.month, pk.rev AS rev_cents,
           CAST(pk.rev - greatest(lb.left_base, rb.right_base) AS BIGINT)
             AS prominence_cents
    FROM pk JOIN lb ON lb.i = pk.i JOIN rb ON rb.i = pk.i
    """,
)
def peaks_monthly_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak detection with topographic prominence (the scipy
    find_peaks/peak_prominences semantics): strict local maxima of
    monthly revenue, each scored by how far it rises above the higher
    of its two key saddles — the min of the series between the peak
    and the nearest STRICTLY higher point on each side (whole side
    when no higher point exists). Prominence separates real seasonal
    peaks from ripples in a way raw height can't. Exact integer
    cents; every join and window runs over the bounded pinned month
    table (≤|calendar|² pairs), the fact scan once."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    )
    wi = Window.orderBy("month")
    # bounded month table with index: five consumers (peaks + two
    # higher-scans + two base-scans) — pinned eagerly
    m = monthly.select(
        "month", "rev", F.row_number().over(wi).alias("i")
    ).localCheckpoint(eager=True)
    wl = Window.orderBy("i")
    pk = (
        m.withColumn("pv", F.lag("rev").over(wl))
        .withColumn("nx", F.lead("rev").over(wl))
        .where(
            F.col("pv").isNotNull()
            & F.col("nx").isNotNull()
            & (F.col("rev") > F.col("pv"))
            & (F.col("rev") > F.col("nx"))
        )
        .select("i", "month", "rev")
        .localCheckpoint(eager=True)
    )
    lh = (
        pk.alias("p")
        .join(F.broadcast(m.alias("q")), F.expr("q.i < p.i AND q.rev > p.rev"))
        .groupBy(F.col("p.i").alias("i"))
        .agg(F.max("q.i").alias("lj"))
    )
    rh = (
        pk.alias("p")
        .join(F.broadcast(m.alias("q")), F.expr("q.i > p.i AND q.rev > p.rev"))
        .groupBy(F.col("p.i").alias("i"))
        .agg(F.min("q.i").alias("rj"))
    )
    lb = (
        pk.alias("p")
        .join(lh, "i", "left")
        .join(
            F.broadcast(m.alias("q")),
            F.expr("q.i >= COALESCE(lj + 1, 1) AND q.i < p.i"),
        )
        .groupBy(F.col("p.i").alias("i"))
        .agg(F.min("q.rev").alias("left_base"))
    )
    rb = (
        pk.alias("p")
        .join(rh, "i", "left")
        .join(
            F.broadcast(m.alias("q")),
            F.expr("q.i <= COALESCE(rj - 1, 2147483647) AND q.i > p.i"),
        )
        .groupBy(F.col("p.i").alias("i"))
        .agg(F.min("q.rev").alias("right_base"))
    )
    return (
        pk.join(lb, "i")
        .join(rb, "i")
        .selectExpr(
            "month",
            "rev AS rev_cents",
            "CAST(rev - greatest(left_base, right_base) AS BIGINT)"
            " AS prominence_cents",
        )
    )


# =====================================================================
# Round 9, wave 14: KMV pairwise set-operation estimates
# =====================================================================

_KMV_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(regexp_extract_all(rpad(term, 16, '#'), '.'),"
    " c -> CAST(ascii(c) AS BIGINT))),"
    " (acc, x) -> (acc * 131 + x) % 1000000000000000)"
)
_KMV_EST = (
    "CASE WHEN {held} < 64 THEN CAST({held} AS DOUBLE)"
    " ELSE CAST(6.3e+16 AS DOUBLE) / CAST({hk} AS DOUBLE) END"
)


@register(
    "kmv_source_overlap",
    f"""
    WITH tok AS MATERIALIZED (
      SELECT DISTINCT source AS g,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), h AS MATERIALIZED (
      SELECT DISTINCT g, {_KMV_HASH} AS h FROM tok
    ), sk AS MATERIALIZED (
      SELECT g, h FROM (
        SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS pos
        FROM h
      ) WHERE pos <= 64
    ), est AS MATERIALIZED (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS held, MAX(h) AS hk
      FROM sk GROUP BY 1
    ), srcs AS MATERIALIZED (
      SELECT DISTINCT g FROM sk
    ), pairs AS MATERIALIZED (
      SELECT a.g AS ga, b.g AS gb FROM srcs a JOIN srcs b ON a.g < b.g
    ), ph AS MATERIALIZED (
      SELECT p.ga, p.gb, s.h, COUNT(*) AS n_sides
      FROM pairs p JOIN sk s ON s.g = p.ga OR s.g = p.gb
      GROUP BY 1, 2, 3
    ), um AS MATERIALIZED (
      SELECT ga, gb, CAST(COUNT(*) AS BIGINT) AS u_held, MAX(h) AS hu_k,
             CAST(count_if(n_sides = 2) AS BIGINT) AS n_both
      FROM (
        SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS pos
        FROM ph
      ) WHERE pos <= 64 GROUP BY 1, 2
    )
    SELECT um.ga AS src_a, um.gb AS src_b,
           {_KMV_EST.format(held="ea.held", hk="ea.hk")} AS est_a,
           {_KMV_EST.format(held="eb.held", hk="eb.hk")} AS est_b,
           {_KMV_EST.format(held="um.u_held", hk="um.hu_k")} AS est_union,
           CAST((um.n_both * 1000000) // um.u_held AS BIGINT) AS jaccard_ppm,
           CAST(um.n_both AS DOUBLE) / um.u_held *
             ({_KMV_EST.format(held="um.u_held", hk="um.hu_k")})
             AS est_intersection
    FROM um JOIN est ea ON ea.g = um.ga JOIN est eb ON eb.g = um.gb
    """,
)
def kmv_source_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise corpus-overlap estimates between document sources
    (operators/sketch.py kmv_pairwise_setops — Beyer et al., SIGMOD
    2007): per source a 64-min-hash KMV vocabulary sketch, per source
    pair the union / Jaccard / intersection estimates computed from
    the sketches ALONE — the planning query for "is corpus B worth
    adding or is it a rehash of A" at 100 TB, where the exact answer
    needs a full vocabulary join. Thresholds ride the
    grouped_kth_smallest range-partition recipe (the oracle's
    PARTITION BY window is the sf0.01 shortcut); sketches pin at
    ≤ 64·|sources| rows and every pair op is bounded-table algebra.
    Same rolling hash and estimator as kmv_distinct_tokens — exact
    below k, one double division above."""
    from dpe_energy_performance_analysis_etl_spark.operators.sketch import (
        kmv_pairwise_setops,
    )
    from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr

    docs = read_documents(spark, sf_dir)
    items = docs.select(
        F.col("source"), F.explode(tokens_expr("text")).alias("term")
    )
    return kmv_pairwise_setops(items, "source", "term", k=64)


# =====================================================================
# Round 9, wave 15: Mood dispersion, Ljung-Box, Bowker symmetry
# =====================================================================

@register(
    "mood_dispersion_urgency",
    """
    WITH tiers AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             CAST(count_if(o_orderpriority IN ('1-URGENT', '2-HIGH'))
                  AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ), mr AS MATERIALIZED (
      SELECT g, c1, c,
             2 * CAST(COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) + c + 1 AS mr2
      FROM tiers
    ), agg AS MATERIALIZED (
      SELECT g, CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c) AS BIGINT) AS n,
             SUM(c1::HUGEINT * mr2 * mr2) AS s1a,
             SUM(c1::HUGEINT * mr2) AS s1b,
             SUM(c::HUGEINT * mr2 * mr2) AS sta,
             SUM(c::HUGEINT * mr2) AS stb
      FROM mr GROUP BY 1
    )
    SELECT g AS o_orderstatus, n1, CAST(n - n1 AS BIGINT) AS n2,
           CASE WHEN (sta - 2 * (n + 1) * stb
                      + (n + 1)::HUGEINT * (n + 1) * n) > 0 THEN
             CAST(((s1a - 2 * (n + 1) * s1b
                    + (n + 1)::HUGEINT * (n + 1) * n1) * 1000000)
                  // (sta - 2 * (n + 1) * stb
                      + (n + 1)::HUGEINT * (n + 1) * n) AS BIGINT)
           END AS mood_ppm,
           CAST((n1 * 1000000) // n AS BIGINT) AS expect_ppm
    FROM agg
    """,
)
def mood_dispersion_urgency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's squared-rank dispersion test per order status
    (operators/stats.py mood_dispersion_2samp): do urgent orders'
    values SPREAD differently from normal ones, location aside? The
    scale-test sibling of cvm_urgency_status (which sees any
    difference) and mann_whitney (which sees location): squared
    centered doubled mid-ranks, expanded-square one-pass identity,
    the urgent sample's score share vs its n1/N null expectation —
    two ppm truncating divisions, zero floats. Prefixes ride the
    grouped_running_totals range-partition recipe (the oracle's
    PARTITION BY window is the sf0.01 shortcut)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        mood_dispersion_2samp,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("urgent"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("v"),
    )
    return mood_dispersion_2samp(base, "st", "urgent", "v").withColumnRenamed(
        "st", "o_orderstatus"
    )


_LB_LAGS = list(range(1, 13))
_LB_LEADS = ",\n             ".join(
    f"lead(d, {k}) OVER (ORDER BY i) AS d{k}" for k in _LB_LAGS
)
_LB_CK = ",\n             ".join(
    f"CAST(SUM(d * d{k}) AS HUGEINT) AS c{k}" for k in _LB_LAGS
)
_LB_STRUCTS = ", ".join(
    f"struct({k} AS lag, c{k} AS ck)" for k in _LB_LAGS
)
_LB_LAG_UNION = "\n      UNION ALL ".join(
    f"SELECT {k} AS lag, c{k} AS ck FROM mom" for k in _LB_LAGS
)


@register(
    "ljung_box_revenue",
    f"""
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY month) AS i, rev FROM monthly
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS nm, CAST(SUM(rev) AS BIGINT) AS s
      FROM idx
    ), ctr AS MATERIALIZED (
      SELECT i, (nm::HUGEINT * rev - s) AS d FROM idx, tot
    ), led AS MATERIALIZED (
      SELECT i, d,
             {_LB_LEADS}
      FROM ctr
    ), mom AS MATERIALIZED (
      SELECT CAST(SUM(d * d) AS HUGEINT) AS c0,
             {_LB_CK}
      FROM led
    ), lagrows AS MATERIALIZED (
      {_LB_LAG_UNION}
    ), lags AS MATERIALIZED (
      SELECT lagrows.lag, lagrows.ck, mom.c0, tot.nm FROM lagrows, mom, tot
    ), rr AS MATERIALIZED (
      SELECT lag, nm,
             (CASE WHEN ck >= 0 THEN 1 ELSE -1 END)
             * floor(CAST(abs(ck) AS DOUBLE) * 1000000e0
                     / CAST(c0 AS DOUBLE)) AS r_ppm_raw,
             (CAST(ck AS DOUBLE) / CAST(c0 AS DOUBLE))
             * (CAST(ck AS DOUBLE) / CAST(c0 AS DOUBLE))
             / CAST(nm - lag AS DOUBLE) AS term
      FROM lags
    )
    SELECT lag, CAST(r_ppm_raw AS BIGINT) AS r_ppm,
           CAST(floor(CAST(nm AS DOUBLE) * (nm + 2) * 1000e0
                      * SUM(term) OVER (ORDER BY lag
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                AS BIGINT) AS q_milli
    FROM rr
    """,
)
def ljung_box_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau autocorrelation test on monthly revenue
    (Ljung & Box, Biometrika 1978): per lag k = 1..12 the sample
    autocorrelation r_k (ppm, exact-integer covariances via n-scaled
    centering, sign factored out of the floor) and the cumulative
    Q(k) = N(N+2)·Σ_{{j≤k}} r_j²/(N−j) — the "is this series white
    noise" gate that should FIRE on seasonal revenue. Covariances
    stay exact HUGEINT/DECIMAL(38,0); r and Q move to doubles only
    through scale-0 int→double conversions and an identical
    fixed-order windowed fold in both engines. Everything after the
    one fact scan runs over the bounded month table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    )
    wi = Window.orderBy("month")
    idx = monthly.select(
        F.row_number().over(wi).alias("i"), "rev"
    ).localCheckpoint(eager=True)  # feeds totals + centered leads
    tot = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("nm"),
        F.sum("rev").cast("bigint").alias("s"),
    )
    ctr = idx.crossJoin(F.broadcast(tot)).selectExpr(
        "i", "nm", "CAST(nm * rev - s AS DECIMAL(38,0)) AS d"
    )
    wl = Window.orderBy("i")
    led = ctr.select(
        "nm",
        "d",
        *[F.lead("d", k).over(wl).alias(f"d{k}") for k in _LB_LAGS],
    )
    mom = led.agg(
        F.max("nm").alias("nm"),
        F.sum(F.expr("d * d")).alias("c0"),
        *[F.sum(F.expr(f"d * d{k}")).alias(f"c{k}") for k in _LB_LAGS],
    )
    lags = mom.selectExpr(
        "nm", "c0", f"explode(array({_LB_STRUCTS})) AS e"
    ).select("nm", "c0", "e.lag", "e.ck")
    rr = lags.selectExpr(
        "lag",
        "nm",
        "(CASE WHEN ck >= 0 THEN 1 ELSE -1 END)"
        " * floor(CAST(abs(ck) AS DOUBLE) * 1000000e0"
        "         / CAST(c0 AS DOUBLE)) AS r_ppm_raw",
        "(CAST(ck AS DOUBLE) / CAST(c0 AS DOUBLE))"
        " * (CAST(ck AS DOUBLE) / CAST(c0 AS DOUBLE))"
        " / CAST(nm - lag AS DOUBLE) AS term",
    )
    wq = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return rr.select(
        "lag",
        F.expr("CAST(r_ppm_raw AS BIGINT)").alias("r_ppm"),
        F.floor(
            F.expr("CAST(nm AS DOUBLE) * (nm + 2) * 1000e0")
            * F.sum("term").over(wq)
        )
        .cast("bigint")
        .alias("q_milli"),
    )


_BW_TYPES = ["click", "error", "purchase", "signup", "view"]
_BW_CELLS = ",\n             ".join(
    f"CAST(count_if(prev_type = '{a}' AND next_type = '{b}') AS BIGINT)"
    f" AS n_{i}_{j}"
    for i, a in enumerate(_BW_TYPES)
    for j, b in enumerate(_BW_TYPES)
    if i != j
)
_BW_UNION = "\n    UNION ALL\n".join(
    f"""    SELECT '{_BW_TYPES[i]}' AS t_lo, '{_BW_TYPES[j]}' AS t_hi,
           n_{i}_{j} AS n_lo_hi, n_{j}_{i} AS n_hi_lo,
           CASE WHEN n_{i}_{j} + n_{j}_{i} > 0 THEN
             CAST(((n_{i}_{j} - n_{j}_{i}) * (n_{i}_{j} - n_{j}_{i})
                   * 1000000) // (n_{i}_{j} + n_{j}_{i}) AS BIGINT)
           END AS chi2_ppm FROM cells"""
    for i in range(5)
    for j in range(5)
    if i < j
)


@register(
    "bowker_symmetry_events",
    f"""
    WITH ordered AS MATERIALIZED (
      SELECT user_id, event_type AS next_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
      FROM events
    ), cells AS MATERIALIZED (
      SELECT {_BW_CELLS}
      FROM ordered WHERE prev_type IS NOT NULL
    )
{_BW_UNION}
    """,
)
def bowker_symmetry_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowker's symmetry test (Bowker, JASA 1948) on the event
    transition matrix — the k×k generalization of McNemar: for every
    unordered type pair, is traffic i→j balanced against j→i? Each
    pair contributes (n_ij − n_ji)²/(n_ij + n_ji), emitted ppm-scaled
    per pair (sum the column for the full statistic, df = pairs with
    discordant traffic). The 20 off-diagonal cells come out of ONE
    conditional aggregation over the lag-window pair stream (the
    bounded known type domain — no data-derived pivot), and the 10
    pair rows off one explode."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    cells = ordered.agg(
        *[
            F.count_if(
                (F.col("prev_type") == a) & (F.col("next_type") == b)
            )
            .cast("bigint")
            .alias(f"n_{i}_{j}")
            for i, a in enumerate(_BW_TYPES)
            for j, b in enumerate(_BW_TYPES)
            if i != j
        ]
    )
    pair_structs = ", ".join(
        f"struct('{_BW_TYPES[i]}' AS t_lo, '{_BW_TYPES[j]}' AS t_hi,"
        f" n_{i}_{j} AS n_lo_hi, n_{j}_{i} AS n_hi_lo,"
        f" CASE WHEN n_{i}_{j} + n_{j}_{i} > 0 THEN"
        f" CAST(((n_{i}_{j} - n_{j}_{i}) * (n_{i}_{j} - n_{j}_{i})"
        f" * 1000000) div (n_{i}_{j} + n_{j}_{i}) AS BIGINT)"
        f" END AS chi2_ppm)"
        for i in range(5)
        for j in range(5)
        if i < j
    )
    return cells.selectExpr(f"explode(array({pair_structs})) AS e").select(
        "e.t_lo", "e.t_hi", "e.n_lo_hi", "e.n_hi_lo", "e.chi2_ppm"
    )


# =====================================================================
# Round 9, wave 16: rich-club coefficient, runs test, turning points
# =====================================================================

_RC_KS = [2, 4, 8, 16]
_RC_N = ",\n             ".join(
    f"CAST(count_if(d > {k}) AS BIGINT) AS n{k}" for k in _RC_KS
)
_RC_E = ",\n             ".join(
    f"CAST(count_if(da > {k} AND db > {k}) AS BIGINT) AS e{k}" for k in _RC_KS
)
_RC_UNION = "\n    UNION ALL\n".join(
    f"""    SELECT {k} AS k_min_degree, n{k} AS n_nodes, e{k} AS n_edges,
           CASE WHEN n{k} >= 2 THEN
             CAST((2 * e{k} * 1000000) // (n{k} * (n{k} - 1)) AS BIGINT)
           END AS phi_ppm FROM nn, ee"""
    for k in _RC_KS
)


@register(
    "rich_club_parts",
    f"""
    WITH co AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ), e AS MATERIALIZED (
      SELECT a, b FROM co WHERE n >= 2
    ), adj AS MATERIALIZED (
      SELECT a AS z FROM e UNION ALL SELECT b FROM e
    ), deg AS MATERIALIZED (
      SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1
    ), ed AS MATERIALIZED (
      SELECT da.d AS da, db.d AS db
      FROM e JOIN deg da ON da.z = e.a JOIN deg db ON db.z = e.b
    ), nn AS MATERIALIZED (
      SELECT {_RC_N} FROM deg
    ), ee AS MATERIALIZED (
      SELECT {_RC_E} FROM ed
    )
{_RC_UNION}
    """,
)
def rich_club_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient (Zhou & Mondragón 2004) of the parts
    co-occurrence graph: for each degree threshold k, the edge
    density φ(k) = 2E_k / (N_k(N_k−1)) among nodes of degree > k —
    do the hubs preferentially trade with each other? Same
    support-≥2 canonical edge set as the other graph families; the
    edge table pins eagerly (it feeds the degree aggregation AND the
    density probe), degrees attach by two equi-joins, and ALL
    thresholds come out of one conditional aggregation each over
    edges and degrees — k is the bounded known list, one explode for
    the output rows, one ppm division per row."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lk = li.select("l_orderkey", "l_partkey")
    e = (
        lk.alias("x")
        .join(
            lk.alias("y"),
            F.expr(
                "x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey"
            ),
        )
        .groupBy(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("a", "b")
        .localCheckpoint(eager=True)  # feeds degrees + the density probe
    )
    adj = e.selectExpr("explode(array(a, b)) AS z")
    deg = (
        adj.groupBy("z")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .localCheckpoint(eager=True)  # feeds two edge joins + node counts
    )
    ed = (
        e.join(deg.selectExpr("z AS a", "d AS da"), "a")
        .join(deg.selectExpr("z AS b", "d AS db"), "b")
        .select("da", "db")
    )
    nn = deg.agg(
        *[
            F.count_if(F.col("d") > k).cast("bigint").alias(f"n{k}")
            for k in _RC_KS
        ]
    )
    ee = ed.agg(
        *[
            F.count_if((F.col("da") > k) & (F.col("db") > k))
            .cast("bigint")
            .alias(f"e{k}")
            for k in _RC_KS
        ]
    )
    structs = ", ".join(
        f"struct({k} AS k_min_degree, n{k} AS n_nodes, e{k} AS n_edges,"
        f" CASE WHEN n{k} >= 2 THEN"
        f" CAST((2 * e{k} * 1000000) div (n{k} * (n{k} - 1)) AS BIGINT)"
        f" END AS phi_ppm)"
        for k in _RC_KS
    )
    return (
        nn.crossJoin(F.broadcast(ee))
        .selectExpr(f"explode(array({structs})) AS e")
        .select("e.k_min_degree", "e.n_nodes", "e.n_edges", "e.phi_ppm")
    )


@register(
    "runs_test_revenue_deltas",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), d AS MATERIALIZED (
      SELECT month,
             CASE WHEN rev > lag(rev) OVER (ORDER BY month) THEN 1
                  WHEN rev < lag(rev) OVER (ORDER BY month) THEN -1 END AS sg
      FROM monthly
    ), s AS MATERIALIZED (
      SELECT sg, lag(sg) OVER (ORDER BY month) AS prev_sg
      FROM d WHERE sg IS NOT NULL
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(count_if(sg = 1) AS BIGINT) AS n_up,
             CAST(count_if(sg = -1) AS BIGINT) AS n_down,
             CAST(1 + count_if(prev_sg IS NOT NULL AND sg <> prev_sg)
                  AS BIGINT) AS n_runs
      FROM s
    )
    SELECT n AS n_deltas, n_up, n_down, n_runs,
           CASE WHEN n > 0 THEN
             CAST(1000 + (2000 * n_up * n_down) // n AS BIGINT)
           END AS e_runs_milli,
           CASE WHEN n > 1 AND 2 * n_up * n_down > n THEN CAST(
             (CASE WHEN CAST(n_runs AS DOUBLE)
                        >= 1e0 + 2e0 * n_up * n_down / n THEN 1 ELSE -1 END)
             * floor(abs(CAST(n_runs AS DOUBLE)
                         - (1e0 + 2e0 * n_up * n_down / n)) * 1000e0
                     / sqrt(2e0 * n_up * n_down
                            * (2e0 * n_up * n_down - n)
                            / (CAST(n AS DOUBLE) * n * (n - 1))))
           AS BIGINT) END AS z_milli
    FROM agg
    """,
)
def runs_test_revenue_deltas_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test (1940) on the SIGNS of month-over-
    month revenue deltas: too few runs means momentum/trend, too many
    means oscillation — the classic "is this sequence random"
    diagnostic (flat months drop out, documented). Counts are exact
    integers off two lag windows over the bounded month table;
    E[R] = 1 + 2·n₊·n₋/n is emitted milli-scaled with one truncating
    division, and z moves to doubles only through int→double
    conversions and the IDENTICAL expression text in both engines
    (sign factored out of the floor)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    )
    wm = Window.orderBy("month")
    d = monthly.select(
        "month",
        F.expr(
            "CASE WHEN rev > lag(rev) OVER (ORDER BY month) THEN 1"
            " WHEN rev < lag(rev) OVER (ORDER BY month) THEN -1 END"
        ).alias("sg"),
    )
    s = d.where(F.col("sg").isNotNull()).select(
        "sg", F.lag("sg").over(wm).alias("prev_sg")
    )
    agg = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count_if(F.col("sg") == 1).cast("bigint").alias("n_up"),
        F.count_if(F.col("sg") == -1).cast("bigint").alias("n_down"),
        (
            1
            + F.count_if(
                F.col("prev_sg").isNotNull()
                & (F.col("sg") != F.col("prev_sg"))
            )
        )
        .cast("bigint")
        .alias("n_runs"),
    )
    return agg.selectExpr(
        "n AS n_deltas",
        "n_up",
        "n_down",
        "n_runs",
        "CASE WHEN n > 0 THEN"
        " CAST(1000 + (2000 * n_up * n_down) div n AS BIGINT)"
        " END AS e_runs_milli",
        "CASE WHEN n > 1 AND 2 * n_up * n_down > n THEN CAST("
        " (CASE WHEN CAST(n_runs AS DOUBLE)"
        "            >= 1e0 + 2e0 * n_up * n_down / n THEN 1 ELSE -1 END)"
        " * floor(abs(CAST(n_runs AS DOUBLE)"
        "             - (1e0 + 2e0 * n_up * n_down / n)) * 1000e0"
        "         / sqrt(2e0 * n_up * n_down"
        "                * (2e0 * n_up * n_down - n)"
        "                / (CAST(n AS DOUBLE) * n * (n - 1))))"
        " AS BIGINT) END AS z_milli",
    )


@register(
    "turning_points_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), w AS MATERIALIZED (
      SELECT rev,
             lag(rev) OVER (ORDER BY month) AS pv,
             lead(rev) OVER (ORDER BY month) AS nx
      FROM monthly
    ), agg AS MATERIALIZED (
      SELECT CAST((SELECT COUNT(*) FROM monthly) AS BIGINT) AS n,
             CAST(count_if(pv IS NOT NULL AND nx IS NOT NULL
                           AND ((rev > pv AND rev > nx)
                                OR (rev < pv AND rev < nx)))
                  AS BIGINT) AS t
      FROM w
    )
    SELECT n AS n_months, t AS turning_points,
           CAST((2000 * (n - 2)) // 3 AS BIGINT) AS e_milli,
           CASE WHEN 16 * n > 29 THEN CAST(
             (CASE WHEN CAST(t AS DOUBLE) >= 2e0 * (n - 2) / 3e0
                   THEN 1 ELSE -1 END)
             * floor(abs(CAST(t AS DOUBLE) - 2e0 * (n - 2) / 3e0) * 1000e0
                     / sqrt((16e0 * n - 29) / 90e0))
           AS BIGINT) END AS z_milli
    FROM agg
    """,
)
def turning_points_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point test of series randomness (Kendall's classic
    diagnostic): count STRICT local extrema of monthly revenue and
    compare to the i.i.d. expectation 2(n−2)/3 with variance
    (16n−29)/90 — a trending or seasonal series turns too rarely or
    too often. The count and expectation are exact integers (one
    milli-scaled truncating division); z moves to doubles through
    identical expression text in both engines, sign factored out of
    the floor. Two windows over the bounded month table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    ).localCheckpoint(eager=True)  # feeds the window scan + the count
    wm = Window.orderBy("month")
    w = monthly.select(
        "rev",
        F.lag("rev").over(wm).alias("pv"),
        F.lead("rev").over(wm).alias("nx"),
    )
    nm = monthly.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    agg = (
        w.agg(
            F.count_if(
                F.col("pv").isNotNull()
                & F.col("nx").isNotNull()
                & (
                    ((F.col("rev") > F.col("pv")) & (F.col("rev") > F.col("nx")))
                    | ((F.col("rev") < F.col("pv")) & (F.col("rev") < F.col("nx")))
                )
            )
            .cast("bigint")
            .alias("t")
        )
        .crossJoin(F.broadcast(nm))
    )
    return agg.selectExpr(
        "n AS n_months",
        "t AS turning_points",
        "CAST((2000 * (n - 2)) div 3 AS BIGINT) AS e_milli",
        "CASE WHEN 16 * n > 29 THEN CAST("
        " (CASE WHEN CAST(t AS DOUBLE) >= 2e0 * (n - 2) / 3e0"
        "       THEN 1 ELSE -1 END)"
        " * floor(abs(CAST(t AS DOUBLE) - 2e0 * (n - 2) / 3e0) * 1000e0"
        "         / sqrt((16e0 * n - 29) / 90e0))"
        " AS BIGINT) END AS z_milli",
    )


# =====================================================================
# Round 9, wave 17: Grubbs outlier, Chao1 richness, rescaled range
# =====================================================================

@register(
    "grubbs_outlier_month",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rev) AS BIGINT) AS s
      FROM monthly
    ), ctr AS MATERIALIZED (
      SELECT month, rev, (n::HUGEINT * rev - s) AS d, n
      FROM monthly, tot
    ), var AS MATERIALIZED (
      SELECT SUM(d * d) AS ss FROM ctr
    ), pick AS MATERIALIZED (
      SELECT month, rev, d, n FROM ctr
      ORDER BY abs(d) DESC, month LIMIT 1
    )
    SELECT pick.month, pick.rev AS rev_cents, pick.n AS n_months,
           CASE WHEN var.ss > 0 THEN CAST(
             floor(CAST(abs(pick.d) AS DOUBLE) * 1000e0
                   / sqrt(CAST(var.ss AS DOUBLE) / (pick.n - 1)))
           AS BIGINT) END AS g_milli
    FROM pick, var
    """,
)
def grubbs_outlier_month_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' outlier statistic (Grubbs 1950) on monthly revenue:
    G = max|x − x̄| / s for the single most deviant month — the "is
    my worst point an outlier" screen. n-scaled centering keeps the
    deviations and the sum of squares exact integers (the n factors
    cancel: G = |n·x − S| / √(Σ(n·x−S)²/(n−1)) ); doubles appear only
    through scale-0 conversions, one sqrt, one division, floor. The
    argmax rides a deterministic ORDER BY abs(d), month LIMIT 1 over
    the bounded pinned month table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    ).localCheckpoint(eager=True)  # feeds totals + centering
    tot = monthly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rev").cast("bigint").alias("s"),
    )
    ctr = monthly.crossJoin(F.broadcast(tot)).selectExpr(
        "month", "rev", "CAST(n * rev - s AS DECIMAL(38,0)) AS d", "n"
    ).localCheckpoint(eager=True)  # feeds variance + argmax pick
    var = ctr.agg(F.sum(F.expr("d * d")).alias("ss"))
    pick = ctr.orderBy(F.abs(F.col("d")).desc(), F.col("month")).limit(1)
    return pick.crossJoin(F.broadcast(var)).selectExpr(
        "month",
        "rev AS rev_cents",
        "n AS n_months",
        "CASE WHEN ss > 0 THEN CAST("
        " floor(CAST(abs(d) AS DOUBLE) * 1000e0"
        "       / sqrt(CAST(ss AS DOUBLE) / (n - 1)))"
        " AS BIGINT) END AS g_milli",
    )


@register(
    "chao1_vocab_richness",
    """
    WITH tf AS MATERIALIZED (
      SELECT source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), counts AS MATERIALIZED (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM tf GROUP BY 1, 2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS d_observed,
           CAST(count_if(c = 1) AS BIGINT) AS f1,
           CAST(count_if(c = 2) AS BIGINT) AS f2,
           CASE WHEN count_if(c = 2) > 0 THEN
             CAST(COUNT(*) + (count_if(c = 1) * count_if(c = 1))
                  // (2 * count_if(c = 2)) AS BIGINT)
           ELSE
             CAST(COUNT(*) + (count_if(c = 1) * (count_if(c = 1) - 1)) // 2
                  AS BIGINT)
           END AS chao1_estimate
    FROM counts GROUP BY 1
    """,
)
def chao1_vocab_richness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimate of each source's UNSEEN
    vocabulary (Chao 1984): D + f1²/(2·f2) from the singleton and
    doubleton counts — how many more distinct terms would this
    corpus surface if we kept sampling? The capture-recapture
    counterpart of good_turing_docs' mass estimates, with the
    bias-corrected f1(f1−1)/2 form when no doubletons exist. One
    token aggregation to (source, term) counts, one bounded fold —
    exact integers end to end, one truncating division."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr

    docs = read_documents(spark, sf_dir)
    counts = (
        docs.select("source", F.explode(tokens_expr("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return counts.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("d_observed"),
        F.count_if(F.col("c") == 1).cast("bigint").alias("f1"),
        F.count_if(F.col("c") == 2).cast("bigint").alias("f2"),
        F.expr(
            "CASE WHEN count_if(c = 2) > 0 THEN"
            " CAST(count(1) + (count_if(c = 1) * count_if(c = 1))"
            "      div (2 * count_if(c = 2)) AS BIGINT)"
            " ELSE CAST(count(1) + (count_if(c = 1) * (count_if(c = 1) - 1))"
            "           div 2 AS BIGINT) END"
        ).alias("chao1_estimate"),
    )


_RS_SIZES = [8, 16, 32]
_RS_UNION_TMPL = (
    "    SELECT {w} AS window_size, n_blocks,\n"
    "           CASE WHEN n_blocks > 0\n"
    "                THEN CAST(sum_rs_milli // n_blocks AS BIGINT)\n"
    "           END AS mean_rs_milli FROM rs{w}"
)


def _rs_oracle_block(w: int) -> str:
    return f"""
    , blk{w} AS MATERIALIZED (
      SELECT (i - 1) // {w} AS b, i, rev,
             SUM(rev) OVER (PARTITION BY (i - 1) // {w}) AS bs,
             COUNT(*) OVER (PARTITION BY (i - 1) // {w}) AS bn
      FROM idx
    ), dev{w} AS MATERIALIZED (
      SELECT b,
             CAST(SUM({w}::HUGEINT * rev - bs)
                  OVER (PARTITION BY b ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS HUGEINT) AS cum,
             ({w}::HUGEINT * rev - bs) AS d
      FROM blk{w} WHERE bn = {w}
    ), rs{w} AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(rs_milli) AS BIGINT) AS sum_rs_milli
      FROM (
        SELECT b,
               CAST(floor((CAST(MAX(cum) - MIN(LEAST(cum, 0)) AS DOUBLE))
                          * 1000e0
                          / sqrt(CAST(SUM(d * d) AS DOUBLE) / {w}))
                    AS BIGINT) AS rs_milli
        FROM dev{w} GROUP BY b HAVING SUM(d * d) > 0
      )
    )"""


_RS_BLOCKS = "".join(_rs_oracle_block(w) for w in _RS_SIZES)
_RS_UNION = "\n    UNION ALL\n".join(
    _RS_UNION_TMPL.format(w=w) for w in _RS_SIZES
)


@register(
    "rescaled_range_revenue",
    f"""
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY month) AS i, rev FROM monthly
    ){_RS_BLOCKS}
{_RS_UNION}
    """,
)
def rescaled_range_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) analysis of monthly revenue (Hurst 1951;
    Mandelbrot's long-memory diagnostic): for block sizes 8/16/32,
    split the series into full non-overlapping blocks, compute each
    block's range of cumulative mean-deviations over its (biased)
    std — R/S — and average across blocks. Growing mean R/S steeper
    than √w signals long-range dependence (the Hurst slope, left to
    the analyst — no logs in checked outputs). Deviations are exact
    w-scaled integers (w·x − blocksum; the w factors cancel in R/S);
    R uses MAX(cum) − MIN(least(cum, 0)) — the running minimum
    clamped at the block start, Hurst's original convention; doubles
    appear only via scale-0 conversions, one sqrt, one floor per
    block, one truncating mean division per window size. All windows
    run over the bounded month table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    )
    wi = Window.orderBy("month")
    idx = monthly.select(
        F.row_number().over(wi).alias("i"), "rev"
    ).localCheckpoint(eager=True)  # feeds the three block layouts
    outs = []
    for w in _RS_SIZES:
        wb = Window.partitionBy("b")
        blk = idx.selectExpr(f"CAST((i - 1) div {w} AS BIGINT) AS b", "i", "rev")
        blk = blk.select(
            "b",
            "i",
            "rev",
            F.sum("rev").over(wb).cast("bigint").alias("bs"),
            F.count(F.lit(1)).over(wb).alias("bn"),
        ).where(F.col("bn") == w)
        wcum = Window.partitionBy("b").orderBy("i").rowsBetween(
            Window.unboundedPreceding, 0
        )
        dev = blk.select(
            "b",
            F.sum(F.expr(f"CAST({w} AS DECIMAL(38,0)) * rev - bs"))
            .over(wcum)
            .alias("cum"),
            F.expr(f"CAST({w} AS DECIMAL(38,0)) * rev - bs").alias("d"),
        )
        per_block = (
            dev.groupBy("b")
            .agg(
                F.max("cum").alias("mx"),
                F.min(F.expr("least(cum, CAST(0 AS DECIMAL(38,0)))")).alias("mn"),
                F.sum(F.expr("d * d")).alias("ss"),
            )
            .where(F.col("ss") > 0)
            .selectExpr(
                "CAST(floor(CAST(mx - mn AS DOUBLE) * 1000e0"
                f" / sqrt(CAST(ss AS DOUBLE) / {w})) AS BIGINT) AS rs_milli"
            )
        )
        outs.append(
            per_block.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                F.sum("rs_milli").cast("bigint").alias("sum_rs_milli"),
            ).selectExpr(
                f"{w} AS window_size",
                "n_blocks",
                "CASE WHEN n_blocks > 0 THEN"
                " CAST(sum_rs_milli div n_blocks AS BIGINT)"
                " END AS mean_rs_milli",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


# =====================================================================
# Round 9, wave 18: Neyman allocation, required sample size
# =====================================================================

_NEY_B = 10_000
