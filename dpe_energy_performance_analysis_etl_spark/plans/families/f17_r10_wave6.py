"""Round 10, wave 6: Cochran-Armitage trend, Getis-Ord Gi* hotspots,
Jarque-Bera normality."""

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
# Round 10, wave 6: Cochran-Armitage, Getis-Ord Gi*, Jarque-Bera
# =====================================================================

@register(
    "cochran_armitage_priority_returns",
    """
    WITH cells AS MATERIALIZED (
      SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS w,
             CAST(COUNT(*) AS BIGINT) AS n_j,
             CAST(count_if(l.l_returnflag = 'R') AS BIGINT) AS r_j
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ), sums AS MATERIALIZED (
      SELECT CAST(SUM(n_j) AS BIGINT) AS n, CAST(SUM(r_j) AS BIGINT) AS r,
             CAST(SUM(w * n_j) AS BIGINT) AS swn,
             CAST(SUM(w * w * n_j) AS BIGINT) AS sw2n,
             SUM(w::HUGEINT * r_j) AS swr
      FROM cells
    )
    SELECT n AS n_total, r AS n_returned,
           CASE WHEN r > 0 AND r < n
                 AND (n::HUGEINT * sw2n - swn::HUGEINT * swn) > 0
           THEN CAST(floor(
             CAST(n * swr - swn::HUGEINT * r AS DOUBLE)
             / sqrt(CAST(r::HUGEINT * (n - r) AS DOUBLE)
                    * CAST(n::HUGEINT * sw2n - swn::HUGEINT * swn AS DOUBLE)
                    / CAST(n AS DOUBLE))
             * 1000e0) AS BIGINT) END AS ca_z_milli
    FROM sums
    """,
)
def cochran_armitage_priority_returns_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cochran-Armitage trend test (Biometrics 1954/55) for a
    monotone trend in the RETURN RATE across the ordered priority
    classes (scores w = priority digit 1..5) — the 2xk ordered-
    proportions test: Mantel-Haenszel asks "association after
    stratification?", Jonckheere asks about ordered LOCATIONS; CA
    asks "does a binary rate trend with an ordered dose?".

    Determinism: the numerator A = N·Σw·r − Σw·n·R and the variance
    core B = N·Σw²n − (Σwn)² are exact integers from one grouped
    aggregation; z = A / sqrt(R(N−R)·B/N) evaluates in DOUBLE with
    the fixed IEEE expression (z_milli class, floor — sign rides the
    numerator). Degenerate all/none-returned or single-class data
    emits NULL.

    Scale shape: one equi-keyed lineitem x orders join into a 5-row
    class table; everything after is scalar algebra."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cells = (
        li.join(
            o.select("o_orderkey", "o_orderpriority"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy(
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("w")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_j"),
            F.count_if(F.col("l_returnflag") == "R").cast("bigint").alias(
                "r_j"
            ),
        )
    )
    sums = cells.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.sum("r_j").cast("bigint").alias("r"),
        F.sum(F.expr("w * n_j")).cast("bigint").alias("swn"),
        F.sum(F.expr("w * w * n_j")).cast("bigint").alias("sw2n"),
        F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * r_j")).alias("swr"),
    )
    return sums.selectExpr(
        "n AS n_total",
        "r AS n_returned",
        "CASE WHEN r > 0 AND r < n"
        " AND (CAST(n AS DECIMAL(38,0)) * sw2n"
        "      - CAST(swn AS DECIMAL(38,0)) * swn) > 0"
        " THEN CAST(floor("
        " CAST(n * swr - CAST(swn AS DECIMAL(38,0)) * r AS DOUBLE)"
        " / sqrt(CAST(CAST(r AS DECIMAL(38,0)) * (n - r) AS DOUBLE)"
        "        * CAST(CAST(n AS DECIMAL(38,0)) * sw2n"
        "               - CAST(swn AS DECIMAL(38,0)) * swn AS DOUBLE)"
        "        / CAST(n AS DOUBLE))"
        " * 1000e0) AS BIGINT) END AS ca_z_milli",
    )


@register(
    "getis_ord_hotspots_grid",
    """
    WITH cells AS MATERIALIZED (
      SELECT (c_custkey // 100) % 100 AS cx, c_custkey % 100 AS cy,
             CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS val
      FROM customer GROUP BY 1, 2
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(val) AS BIGINT) AS s,
             SUM(val::HUGEINT * val) AS s2
      FROM cells
    ), nbr AS MATERIALIZED (
      SELECT cx, cy, val AS v_nbr FROM cells
      UNION ALL SELECT cx + 1, cy, val FROM cells
      UNION ALL SELECT cx - 1, cy, val FROM cells
      UNION ALL SELECT cx, cy + 1, val FROM cells
      UNION ALL SELECT cx, cy - 1, val FROM cells
    ), local AS MATERIALIZED (
      SELECT c.cx, c.cy, c.val,
             CAST(COUNT(*) AS BIGINT) AS w_local,
             CAST(SUM(nbr.v_nbr) AS BIGINT) AS l_sum
      FROM cells c JOIN nbr ON c.cx = nbr.cx AND c.cy = nbr.cy
      GROUP BY 1, 2, 3
    ), scored AS MATERIALIZED (
      SELECT cx, cy, val, w_local,
             CASE WHEN tot.n > 1 AND (tot.n * tot.s2 - tot.s::HUGEINT * tot.s)
                       * (tot.n * w_local - w_local * w_local) > 0
             THEN CAST(floor(
               CAST(tot.n * l_sum::HUGEINT - w_local::HUGEINT * tot.s
                    AS DOUBLE)
               / sqrt(CAST(tot.n * tot.s2 - tot.s::HUGEINT * tot.s AS DOUBLE)
                      * CAST(tot.n * w_local - w_local * w_local AS DOUBLE)
                      / (CAST(tot.n AS DOUBLE) - 1e0))
               * 1000e0) AS BIGINT) END AS gi_z_milli
      FROM local, tot
    ), nn AS MATERIALIZED (
      SELECT * FROM scored WHERE gi_z_milli IS NOT NULL
    )
    SELECT cx, cy, val, w_local, gi_z_milli, bucket, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, 'hot' AS bucket,
             row_number() OVER (ORDER BY gi_z_milli DESC, cx, cy) AS rk
      FROM nn
      UNION ALL
      SELECT *, 'cold' AS bucket,
             row_number() OVER (ORDER BY gi_z_milli ASC, cx, cy) AS rk
      FROM nn
    ) WHERE rk <= 5
    """,
)
def getis_ord_hotspots_grid_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hot/cold spots (operators/spatial.py
    getis_ord_gi_grid) of aggregate account balance over the
    synthesized 100x100 customer site grid — the LOCAL companion to
    ``morans_i_balance_grid``: Moran's I says whether structure
    exists globally; Gi* names the 5 hottest and 5 coldest cells
    (z_milli, deterministic (z, cx, cy) tie-break). On this
    custkey-derived grid the truth is spatial noise, so |z| stays
    small — exactly what a hotspot detector must report."""
    from dpe_energy_performance_analysis_etl_spark.operators.spatial import (
        getis_ord_gi_grid,
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
    return getis_ord_gi_grid(cells, "cx", "cy", "val", top_k=5)


@register(
    "jarque_bera_order_values",
    """
    WITH p AS MATERIALIZED (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
             // 100 AS x
      FROM orders
    ), sums AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s1,
             SUM(x::HUGEINT * x) AS s2,
             SUM(x::HUGEINT * x * x) AS s3,
             SUM(x::HUGEINT * x * x * x) AS s4
      FROM p
    ), mom AS MATERIALIZED (
      SELECT n,
             (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS m2,
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s3 AS DOUBLE)
              - 3e0 * CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                * CAST(s1 AS DOUBLE)
              + 2e0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                * CAST(s1 AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
               AS m3,
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                * CAST(s4 AS DOUBLE)
              - 4e0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                * CAST(s3 AS DOUBLE) * CAST(s1 AS DOUBLE)
              + 6e0 * CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              - 3e0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                * CAST(n AS DOUBLE)) AS m4
      FROM sums
    )
    SELECT n AS n_orders,
           CASE WHEN m2 > 0e0 THEN
             CAST(floor(m3 / sqrt(m2 * m2 * m2) * 1000e0) AS BIGINT)
           END AS skew_milli,
           CASE WHEN m2 > 0e0 THEN
             CAST(floor((m4 / (m2 * m2) - 3e0) * 1000e0) AS BIGINT)
           END AS exkurt_milli,
           CASE WHEN m2 > 0e0 THEN
             CAST(floor(CAST(n AS DOUBLE) / 6e0
                        * (m3 / sqrt(m2 * m2 * m2) * m3 / sqrt(m2 * m2 * m2)
                           + (m4 / (m2 * m2) - 3e0) * (m4 / (m2 * m2) - 3e0)
                             / 4e0)
                        * 1000e0) AS BIGINT)
           END AS jb_milli
    FROM mom
    """,
)
def jarque_bera_order_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality statistic (Economics Letters 1980) over
    ALL order values — the omnibus skewness+kurtosis test turning
    ``stats_moments``' descriptive numbers into the standard
    hypothesis statistic JB = n/6·(S² + (K−3)²/4).

    Determinism: ONE pass accumulates the exact integer power sums
    Σx..Σx⁴ (whole-dollar order values in DECIMAL(38)/HUGEINT — the
    partition-order-immune accumulation); central moments, S, K and
    JB then evaluate in DOUBLE with one fixed IEEE expression per
    output (floor to milli — the z_milli class). Zero-variance input
    emits NULL.

    Scale shape: a single data-sized aggregation; no joins, no
    windows, no shuffle beyond the final 1-row reduce."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = o.selectExpr(
        "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        " div 100 AS x"
    )
    sums = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("s2"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x * x")).alias("s3"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x * x * x")).alias("s4"),
    )
    mom = sums.selectExpr(
        "n",
        "(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)"
        " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS m2",
        "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s3 AS DOUBLE)"
        " - 3e0 * CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) * CAST(s1 AS DOUBLE)"
        " + 2e0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
        "   * CAST(s1 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
        " AS m3",
        "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        "   * CAST(s4 AS DOUBLE)"
        " - 4e0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s3 AS DOUBLE)"
        "   * CAST(s1 AS DOUBLE)"
        " + 6e0 * CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)"
        "   * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
        " - 3e0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
        "   * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        "    * CAST(n AS DOUBLE)) AS m4",
    )
    return mom.selectExpr(
        "n AS n_orders",
        "CASE WHEN m2 > 0e0 THEN"
        " CAST(floor(m3 / sqrt(m2 * m2 * m2) * 1000e0) AS BIGINT)"
        " END AS skew_milli",
        "CASE WHEN m2 > 0e0 THEN"
        " CAST(floor((m4 / (m2 * m2) - 3e0) * 1000e0) AS BIGINT)"
        " END AS exkurt_milli",
        "CASE WHEN m2 > 0e0 THEN"
        " CAST(floor(CAST(n AS DOUBLE) / 6e0"
        "            * (m3 / sqrt(m2 * m2 * m2) * m3 / sqrt(m2 * m2 * m2)"
        "               + (m4 / (m2 * m2) - 3e0) * (m4 / (m2 * m2) - 3e0)"
        "                 / 4e0)"
        "            * 1000e0) AS BIGINT)"
        " END AS jb_milli",
    )
