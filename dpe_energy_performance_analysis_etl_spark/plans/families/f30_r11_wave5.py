"""Round 11, wave 5: experiment-infrastructure + spatial + drift —
sample-ratio-mismatch check, jackknife leave-one-group-out means,
Geary's C, nation trade reciprocity, Page-Hinkley drift, two-sample
Poisson rate test.

Shared exactness recipe: assignments and splits are portable integer
hashes or data-anchored day/month ranks (never RNG, never a schema
epoch); every statistic reduces to exact integer counts/sums with one
floored double (or sign-safe truncating integer) ratio at the end;
sequential drift terms are quantized to integers per period FIRST
(floor in DOUBLE — identical both engines) so cumulative mins/maxes
run on exact integers."""

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
    "srm_check_events",
    """
    WITH assigned AS MATERIALIZED (
      SELECT CASE WHEN
        ((xor(user_id % 4294967296, (user_id % 4294967296) >> 16)
          * 73244475) % 4294967296) % 2 = 0 THEN 0 ELSE 1 END AS arm
      FROM events
    ), counts AS MATERIALIZED (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM assigned
    )
    SELECT n0 AS n_arm0, n1 AS n_arm1,
           CAST(((n0::HUGEINT - n1) * (n0::HUGEINT - n1) * 1000000)
                // (n0::HUGEINT + n1) AS BIGINT) AS chi2_micro
    FROM counts
    """,
)
def srm_check_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for a 50/50 experiment assignment
    (the first thing any A/B platform validates — a biased splitter
    invalidates every downstream lift number, CUPED included): arm =
    portable xor-shift-multiply hash of user_id mod 2; chi-square
    (1 df) against the 50/50 design collapses to (n0-n1)^2/(n0+n1) —
    an exact NONNEGATIVE integer ratio, truncated at micro scale
    identically by Spark div and DuckDB //."""
    ev = read_events(spark, sf_dir)
    counts = ev.selectExpr(
        "CASE WHEN (((user_id % 4294967296)"
        " ^ ((user_id % 4294967296) >> 16)) * 73244475)"
        " % 4294967296 % 2 = 0 THEN 0 ELSE 1 END AS arm"
    ).agg(
        F.sum(F.expr("CASE WHEN arm = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n1"),
    )
    return counts.selectExpr(
        "n0 AS n_arm0",
        "n1 AS n_arm1",
        "CAST(((CAST(n0 AS DECIMAL(38,0)) - n1)"
        " * (CAST(n0 AS DECIMAL(38,0)) - n1) * 1000000)"
        " div (CAST(n0 AS DECIMAL(38,0)) + n1) AS BIGINT) AS chi2_micro",
    )


@register(
    "jackknife_nation_mean",
    """
    WITH per AS MATERIALIZED (
      SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS s_i
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(n_i) AS BIGINT) AS n, CAST(SUM(s_i) AS BIGINT) AS s
      FROM per
    )
    SELECT nation, n_i AS n_orders,
           CAST(floor(CAST(s - s_i AS DOUBLE)
                      / (CAST(n AS DOUBLE) - n_i)) AS BIGINT)
             AS loo_mean_cents
    FROM per, tot
    ORDER BY nation
    """,
)
def jackknife_nation_mean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-nation-out jackknife of the mean order value (the
    grouped delete-a-block jackknife — ``bootstrap_mean_ci`` is the
    resampling sibling): each nation's row answers "what would the
    global mean be WITHOUT this nation's orders" — the influence
    audit for segment-skew. (S - S_i)/(N - n_i) from exact cents; one
    floored double per row, rows independent (no cross-row float
    combine). One grouped pass + a broadcast scalar."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    per = (
        o.join(c.select("c_custkey", "c_nationkey"), o["o_custkey"] == F.col("c_custkey"))
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
            F.sum(
                F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
            )
            .cast("bigint")
            .alias("s_i"),
        )
        .cache()  # 25 rows; totals + output
    )
    tot = per.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("s_i").cast("bigint").alias("s"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "nation",
            "n_i AS n_orders",
            "CAST(floor(CAST(s - s_i AS DOUBLE)"
            " / (CAST(n AS DOUBLE) - n_i)) AS BIGINT) AS loo_mean_cents",
        )
        .orderBy("nation")
    )


@register(
    "geary_c_balance_grid",
    """
    WITH cells AS MATERIALIZED (
      SELECT (c_custkey // 100) % 100 AS cx, c_custkey % 100 AS cy,
             CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(30,2)) * 100
                           AS BIGINT)) // 100 AS BIGINT) AS val
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
      SELECT CAST(COUNT(*) AS BIGINT) AS w,
             SUM((c.d - nbr.d_nbr) * (c.d - nbr.d_nbr)) AS diff_sq
      FROM ctr c JOIN nbr ON c.cx = nbr.cx AND c.cy = nbr.cy
    ), var AS MATERIALIZED (
      SELECT SUM(d * d) AS var_sum FROM ctr
    )
    SELECT tot.n AS n_cells, pairs.w AS w_pairs,
           CASE WHEN pairs.w > 0 AND var.var_sum > 0 THEN CAST(
             ((tot.n - 1) * pairs.diff_sq * 1000000)
             // (2 * pairs.w * var.var_sum)
           AS BIGINT) END AS geary_c_scaled
    FROM tot, pairs, var
    """,
)
def geary_c_balance_grid_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Geary's C (operators/spatial.py geary_c_grid) of
    aggregate account balance over the same 100x100 customer site
    grid as ``morans_i_balance_grid``, rook adjacency: the
    local-difference complement of Moran's I (C near 1 = no
    structure, matching the null this synthetic grid encodes by
    construction). Values in WHOLE DOLLARS — the documented magnitude
    bound for the (n-1)·W·(d_i-d_j)² numerator at swept SFs. Exact
    integers throughout; one truncating div on a nonnegative
    numerator."""
    from dpe_energy_performance_analysis_etl_spark.operators.spatial import (
        geary_c_grid,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cells = c.groupBy(
        F.expr("(c_custkey div 100) % 100").alias("cx"),
        (F.col("c_custkey") % 100).alias("cy"),
    ).agg(
        F.expr(
            "CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(30,2)) * 100 AS BIGINT))"
            " div 100 AS BIGINT)"
        ).alias("val")
    )
    return geary_c_grid(cells, "cx", "cy", "val")


@register(
    "trade_reciprocity_nations",
    """
    WITH edges AS MATERIALIZED (
      SELECT DISTINCT cn.n_nationkey AS src, sn.n_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE cn.n_nationkey <> sn.n_nationkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(CASE WHEN EXISTS (
             SELECT 1 FROM edges r WHERE r.src = edges.dst
                                     AND r.dst = edges.src
           ) THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocated,
           CAST(floor(1e6 * CAST(SUM(CASE WHEN EXISTS (
             SELECT 1 FROM edges r WHERE r.src = edges.dst
                                     AND r.dst = edges.src
           ) THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS reciprocity_ppm
    FROM edges
    """,
)
def trade_reciprocity_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity of the directed nation-level trade graph (edge
    u -> v when a customer in u buys from a supplier in v): the
    fraction of directed edges whose reverse also exists — the
    directed-graph statistic the undirected families (assortativity,
    modularity, rich club) can't express. The edge list is one
    distinct over <= 25 x 24 nation pairs; the reverse check is an
    equi-keyed self-join on the swapped key. Exact counts, one
    floored ppm ratio."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    edges = (
        li.select("l_orderkey", "l_suppkey")
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s.select("s_suppkey", F.col("s_nationkey").alias("dst")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .selectExpr("c_nationkey AS src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .cache()  # <= 600 rows; both sides of the reverse join
    )
    rev = edges.selectExpr("dst AS src", "src AS dst", "1 AS has_rev").distinct()
    marked = edges.join(rev, ["src", "dst"], "left")
    return marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.sum(F.expr("CASE WHEN has_rev IS NOT NULL THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_reciprocated"),
    ).selectExpr(
        "n_edges",
        "n_reciprocated",
        "CAST(floor(1e6 * CAST(n_reciprocated AS DOUBLE) / n_edges)"
        " AS BIGINT) AS reciprocity_ppm",
    )


@register(
    "page_hinkley_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) // 100 AS BIGINT) AS y
      FROM monthly_src GROUP BY 1
    ), run AS MATERIALIZED (
      SELECT month, y,
             CAST(SUM(y) OVER (ORDER BY month
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS s_t,
             CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS t
      FROM monthly
    ), terms AS MATERIALIZED (
      SELECT month, t,
             CAST(floor(1000e0 * (CAST(y AS DOUBLE)
                        - CAST(s_t AS DOUBLE) / CAST(t AS DOUBLE)))
                  AS BIGINT) AS term_milli
      FROM run
    ), cum AS MATERIALIZED (
      SELECT t,
             CAST(SUM(term_milli) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS m_t
      FROM terms
    ), ph AS MATERIALIZED (
      SELECT t, m_t,
             CAST(MIN(m_t) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS min_m
      FROM cum
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
           CAST(MAX(m_t - min_m) AS BIGINT) AS ph_stat_milli,
           CAST(MAX(CASE WHEN m_t - min_m =
             (SELECT MAX(m_t - min_m) FROM ph) THEN t END) AS BIGINT)
             AS argmax_month_idx
    FROM ph
    """.replace("monthly_src", "orders"),
)
def page_hinkley_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward-drift statistic on monthly revenue (Page
    1954, Hinkley 1971 — the sequential mean-shift detector a
    streaming drift monitor runs): PH_T = max_t (M_t - min_s<=t M_s)
    with M_t = SUM_s<=t (y_s - mean_1..s). Each deviation term uses
    the EXACT running mean S_t/t (integer prefix sums), is quantized
    to milli by floor-in-double (identical both engines, sign-safe),
    and all cumulative sums/mins/maxes run on exact integers over the
    calendar-bounded month table."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100"
            " AS BIGINT)) div 100 AS BIGINT)"
        ).alias("y")
    )
    w = Window.orderBy("month")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    run = monthly.select(
        "month",
        "y",
        F.sum("y").over(wc).cast("bigint").alias("s_t"),
        F.row_number().over(w).cast("bigint").alias("t"),
    )
    terms = run.selectExpr(
        "t",
        "CAST(floor(1000e0 * (CAST(y AS DOUBLE)"
        " - CAST(s_t AS DOUBLE) / CAST(t AS DOUBLE))) AS BIGINT) AS term_milli",
    )
    wt = Window.orderBy("t")
    wtc = wt.rowsBetween(Window.unboundedPreceding, 0)
    cum = terms.select(
        "t", F.sum("term_milli").over(wtc).cast("bigint").alias("m_t")
    )
    ph = cum.select(
        "t",
        "m_t",
        F.min("m_t").over(wtc).cast("bigint").alias("min_m"),
    ).cache()  # ~80 rows; max + argmax scan
    mx = ph.agg(F.max(F.expr("m_t - min_m")).cast("bigint").alias("ph_max"))
    return (
        ph.crossJoin(F.broadcast(mx))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_months"),
            F.max("ph_max").cast("bigint").alias("ph_stat_milli"),
            F.max(
                F.expr("CASE WHEN m_t - min_m = ph_max THEN t END")
            )
            .cast("bigint")
            .alias("argmax_month_idx"),
        )
    )


@register(
    "poisson_rate_halves_errors",
    """
    WITH daily AS MATERIALIZED (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM events GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily
    ), halves AS MATERIALIZED (
      SELECT
        CAST(SUM(CASE WHEN t <= n // 2 THEN c ELSE 0 END) AS BIGINT) AS c1,
        CAST(SUM(CASE WHEN t > n // 2 THEN c ELSE 0 END) AS BIGINT) AS c2,
        CAST(MAX(n // 2) AS BIGINT) AS d1,
        CAST(MAX(n - n // 2) AS BIGINT) AS d2
      FROM idx
    )
    SELECT c1 AS errors_first_half, c2 AS errors_second_half,
           d1 AS days_first_half, d2 AS days_second_half,
           CAST(floor(1000e0 * (CAST(c1 AS DOUBLE) / d1)
                      / (CAST(c2 AS DOUBLE) / d2)) AS BIGINT)
             AS rate_ratio_milli,
           CAST(floor(1000e0 *
             (CAST(c1 AS DOUBLE) - (c1 + c2)
              * (CAST(d1 AS DOUBLE) / (d1 + d2)))
             / sqrt((c1 + c2) * (CAST(d1 AS DOUBLE) / (d1 + d2))
                    * (1e0 - CAST(d1 AS DOUBLE) / (d1 + d2))))
             AS BIGINT) AS z_milli
    FROM halves
    """,
)
def poisson_rate_halves_errors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate test for the error-event rate between
    the first and second halves of the observed day range (the
    conditional/binomial form: given C = c1 + c2, c1 ~ Bin(C,
    d1/(d1+d2)) under equal rates): the alarm an SRE burn-rate
    monitor wants for "did the error rate change". The split is
    anchored to the DATA's observed day sequence (rank over the
    day-grain table — never a schema epoch); exact counts; rate
    ratio + conditional z, each one floored double expression."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(F.expr("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("c")
    )
    w = Window.orderBy("day")
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    idx = daily.select(
        "c",
        F.row_number().over(w).cast("bigint").alias("t"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
    )
    halves = idx.agg(
        F.sum(F.expr("CASE WHEN t <= n div 2 THEN c ELSE 0 END"))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.expr("CASE WHEN t > n div 2 THEN c ELSE 0 END"))
        .cast("bigint")
        .alias("c2"),
        F.max(F.expr("n div 2")).cast("bigint").alias("d1"),
        F.max(F.expr("n - n div 2")).cast("bigint").alias("d2"),
    )
    return halves.selectExpr(
        "c1 AS errors_first_half",
        "c2 AS errors_second_half",
        "d1 AS days_first_half",
        "d2 AS days_second_half",
        "CAST(floor(1000e0 * (CAST(c1 AS DOUBLE) / d1)"
        " / (CAST(c2 AS DOUBLE) / d2)) AS BIGINT) AS rate_ratio_milli",
        "CAST(floor(1000e0 *"
        " (CAST(c1 AS DOUBLE) - (c1 + c2)"
        "  * (CAST(d1 AS DOUBLE) / (d1 + d2)))"
        " / sqrt((c1 + c2) * (CAST(d1 AS DOUBLE) / (d1 + d2))"
        "        * (1e0 - CAST(d1 AS DOUBLE) / (d1 + d2))))"
        " AS BIGINT) AS z_milli",
    )
