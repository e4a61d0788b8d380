"""Round 12, wave 1: supply-chain / commerce analytics — yearly
price indices (Laspeyres / Paasche / Fisher), the bullwhip
order-vs-ship variance ratio, the Hoover revenue-inequality index,
the joint ABC-XYZ segmentation matrix, share-of-parent rollup,
open-order aging buckets, Syntetos-Boylan demand classes, and
single-sourcing risk.

Shared exactness recipe (the house rules): money stays exact cents
(DECIMAL(30,2) x 100 -> BIGINT), cross-products ride DECIMAL(38,0) /
HUGEINT, every class boundary compares cross-multiplied INTEGERS
(never a float share), the only doubles are one fixed-form final
ratio per query floored at a declared scale, and every denominator
that can see zero is CASE-guarded in BOTH engines. Data-anchored
boundaries only (observed max order date / last full year) — never a
schema epoch (CLAUDE.md rule).

Reference scope: the reference ETL (scripts/transform.py) stops at
per-group descriptive stats; this wave is the commerce-analytics
superset a gold-zone consumer would query on top of the entity
tables."""

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


@register(
    "price_indices_yearly",
    """
    WITH bounds AS MATERIALIZED (
      SELECT CAST(year(MAX(o_orderdate)) - 2 AS BIGINT) AS y0,
             CAST(year(MAX(o_orderdate)) - 1 AS BIGINT) AS y1
      FROM orders
    ), per AS MATERIALIZED (
      SELECT l.l_partkey AS pk,
             CAST(year(o.o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS c,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey,
           bounds b
      WHERE CAST(year(o.o_orderdate) AS BIGINT) IN (b.y0, b.y1)
      GROUP BY 1, 2
    ), matched AS MATERIALIZED (
      SELECT a.pk, a.c AS c0, a.q AS q0, z.c AS c1, z.q AS q1
      FROM per a JOIN per z ON a.pk = z.pk, bounds b
      WHERE a.yr = b.y0 AND z.yr = b.y1 AND a.q > 0 AND z.q > 0
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM((c1::HUGEINT * q0) // q1) AS BIGINT) AS l_num,
             CAST(SUM(c0) AS BIGINT) AS l_den,
             CAST(SUM(c1) AS BIGINT) AS p_num,
             CAST(SUM((c0::HUGEINT * q1) // q0) AS BIGINT) AS p_den
      FROM matched
    )
    SELECT b.y0 AS base_year, b.y1 AS obs_year, a.n_parts,
           CASE WHEN a.l_den > 0 THEN CAST(floor(1e6 *
             CAST(a.l_num AS DOUBLE) / CAST(a.l_den AS DOUBLE)) AS BIGINT)
           END AS laspeyres_ppm,
           CASE WHEN a.p_den > 0 THEN CAST(floor(1e6 *
             CAST(a.p_num AS DOUBLE) / CAST(a.p_den AS DOUBLE)) AS BIGINT)
           END AS paasche_ppm,
           CASE WHEN a.l_den > 0 AND a.p_den > 0 THEN CAST(floor(1e6 * sqrt(
             (CAST(a.l_num AS DOUBLE) / CAST(a.l_den AS DOUBLE))
             * (CAST(a.p_num AS DOUBLE) / CAST(a.p_den AS DOUBLE))))
             AS BIGINT)
           END AS fisher_ppm
    FROM agg a, bounds b
    """,
)
def price_indices_yearly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres, Paasche and Fisher price indices between the last
    two FULL order years (data-anchored: max observed year is
    partial, so base = max-2, observation = max-1) over parts traded
    in both — the canonical deflator triple (Fisher 1922) a revenue
    dashboard needs to split growth into price vs volume.

    Exactness: per-(part, year) unit value p = cents/qty stays a
    RATIONAL — the index numerators use the integer-floored
    cross-product (c1 * q0) div q1 (nonnegative, so Spark's
    truncating ``div`` and DuckDB's flooring ``//`` agree), summed in
    HUGEINT/DECIMAL(38,0); denominators are exact cent sums. Three
    fixed-form floored ppm ratios at the end (sqrt is IEEE
    correctly-rounded — safe for Fisher).

    Scale shape: one lineitem x orders pass onto a per-(part, year)
    aggregate; the year self-join is equi-keyed on partkey; all
    post-agg tables are |parts|-bounded with scalar output."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bounds = o.agg(
        F.expr("CAST(year(MAX(o_orderdate)) - 2 AS BIGINT)").alias("y0"),
        F.expr("CAST(year(MAX(o_orderdate)) - 1 AS BIGINT)").alias("y1"),
    )
    per = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .crossJoin(F.broadcast(bounds))
        .where(F.expr("CAST(year(o_orderdate) AS BIGINT) IN (y0, y1)"))
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("yr"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100"
                    " AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("c"),
            F.sum(F.expr("CAST(l_quantity AS BIGINT)"))
            .cast("bigint")
            .alias("q"),
        )
        .cache()  # consumed by BOTH sides of the year self-join
    )
    a = per.selectExpr("pk", "yr AS yr0", "c AS c0", "q AS q0")
    z = per.selectExpr("pk AS pk1", "yr AS yr1", "c AS c1", "q AS q1")
    matched = (
        a.join(z, F.col("pk") == F.col("pk1"))
        .crossJoin(F.broadcast(bounds))
        .where(
            F.expr("yr0 = y0 AND yr1 = y1 AND q0 > 0 AND q1 > 0")
        )
    )
    agg = matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.expr("(CAST(c1 AS DECIMAL(38,0)) * q0) div q1"))
        .cast("bigint")
        .alias("l_num"),
        F.sum("c0").cast("bigint").alias("l_den"),
        F.sum("c1").cast("bigint").alias("p_num"),
        F.sum(F.expr("(CAST(c0 AS DECIMAL(38,0)) * q1) div q0"))
        .cast("bigint")
        .alias("p_den"),
    )
    return agg.crossJoin(F.broadcast(bounds)).selectExpr(
        "y0 AS base_year",
        "y1 AS obs_year",
        "n_parts",
        "CASE WHEN l_den > 0 THEN CAST(floor(1e6 *"
        " CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE)) AS BIGINT)"
        " END AS laspeyres_ppm",
        "CASE WHEN p_den > 0 THEN CAST(floor(1e6 *"
        " CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE)) AS BIGINT)"
        " END AS paasche_ppm",
        "CASE WHEN l_den > 0 AND p_den > 0 THEN CAST(floor(1e6 * sqrt("
        " (CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE))"
        " * (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE))))"
        " AS BIGINT) END AS fisher_ppm",
    )


@register(
    "bullwhip_ratio_monthly",
    """
    WITH ord AS MATERIALIZED (
      SELECT CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT)
               AS mn,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS x
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ), shp AS MATERIALIZED (
      SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS mn,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
      FROM lineitem GROUP BY 1
    ), joined AS MATERIALIZED (
      SELECT o.x, s.y FROM ord o JOIN shp s ON o.mn = s.mn
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, SUM(x::HUGEINT * x) AS qx,
             CAST(SUM(y) AS BIGINT) AS sy, SUM(y::HUGEINT * y) AS qy
      FROM joined
    )
    SELECT n AS n_months,
           CASE WHEN n * qy - sy::HUGEINT * sy > 0
                THEN CAST(floor(1e6 *
                  CAST(n * qx - sx::HUGEINT * sx AS DOUBLE)
                  / CAST(n * qy - sy::HUGEINT * sy AS DOUBLE)) AS BIGINT)
           END AS bullwhip_ppm
    FROM agg
    """,
)
def bullwhip_ratio_monthly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip variance-amplification ratio (Lee, Padmanabhan &
    Whang 1997): Var(monthly ORDERED quantity, by order date) over
    Var(monthly SHIPPED quantity, by ship date) on months where both
    series exist — does demand look choppier at order placement than
    at fulfillment? >1e6 ppm means ordering amplifies.

    Exactness: both monthly series are integer quantity sums; both
    variances ride the n*SUM(x^2) - S^2 integer identity in
    HUGEINT/DECIMAL(38,0); ONE floored double ratio, guarded against
    a zero (constant-series) denominator.

    Scale shape: two corpus aggregations onto <=|months| rows; the
    month join and everything after are calendar-bounded."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ordm = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.expr(
                "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)"
            ).alias("mn")
        )
        .agg(F.sum(F.expr("CAST(l_quantity AS BIGINT)")).cast("bigint").alias("x"))
    )
    shpm = li.groupBy(
        F.expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)").alias(
            "mn2"
        )
    ).agg(F.sum(F.expr("CAST(l_quantity AS BIGINT)")).cast("bigint").alias("y"))
    joined = ordm.join(shpm, F.col("mn") == F.col("mn2"))
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("qx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("qy"),
    ).selectExpr(
        "n AS n_months",
        "CASE WHEN n * qy - CAST(sy AS DECIMAL(38,0)) * sy > 0"
        " THEN CAST(floor(1e6 *"
        " CAST(n * qx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"
        " / CAST(n * qy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))"
        " AS BIGINT) END AS bullwhip_ppm",
    )


@register(
    "hoover_index_nations",
    """
    WITH rev AS MATERIALIZED (
      SELECT c.c_nationkey AS nk,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS r
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ), cust AS MATERIALIZED (
      SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS m
      FROM customer GROUP BY 1
    ), per AS MATERIALIZED (
      SELECT c.nk, COALESCE(r.r, 0) AS r, c.m
      FROM cust c LEFT JOIN rev r ON c.nk = r.nk
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(r) AS BIGINT) AS rt, CAST(SUM(m) AS BIGINT) AS mt,
             CAST(COUNT(*) AS BIGINT) AS n_nations
      FROM per
    )
    SELECT t.n_nations,
           CASE WHEN t.rt > 0 AND t.mt > 0 THEN CAST(floor(1e6 *
             CAST((SELECT SUM(abs(p.r::HUGEINT * t2.mt
                                  - p.m::HUGEINT * t2.rt))
                   FROM per p, tot t2) AS DOUBLE)
             / (2e0 * CAST(t.rt AS DOUBLE) * CAST(t.mt AS DOUBLE)))
             AS BIGINT)
           END AS hoover_ppm
    FROM tot t
    """,
)
def hoover_index_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoover (Robin Hood) index of revenue concentration across
    nations relative to their customer counts: the share of total
    revenue that would have to MOVE between nations to equalize
    revenue-per-customer — H = SUM|R_i/R - M_i/M| / 2, the
    transfer-interpretable sibling of ``spend_gini_customers`` /
    ``brand_hhi_by_nation``.

    Exactness: the absolute deviations are cross-multiplied integers
    |R_i*M - M_i*R| in HUGEINT/DECIMAL(38,0) (no per-nation share is
    ever a float), summed exactly; ONE floored ppm ratio over
    2*R*M. Nations with customers but no orders count with R_i = 0
    (left join), keeping the population complete.

    Scale shape: one orders pass + one customer pass onto the
    25-nation table; everything after is domain-bounded."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rev = (
        o.join(
            c.select("c_custkey", "c_nationkey"),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("r")
        )
    )
    cust = c.groupBy(F.col("c_nationkey").alias("nk2")).agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    per = (
        cust.join(rev, F.col("nk2") == F.col("nk"), "left")
        .select(F.col("nk2"), F.coalesce(F.col("r"), F.lit(0)).alias("r"), "m")
        .cache()  # bounded (25 nations); feeds totals AND deviations
    )
    tot = per.agg(
        F.sum("r").cast("bigint").alias("rt"),
        F.sum("m").cast("bigint").alias("mt"),
        F.count(F.lit(1)).cast("bigint").alias("n_nations"),
    )
    dev = per.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.expr(
                "abs(CAST(r AS DECIMAL(38,0)) * mt"
                " - CAST(m AS DECIMAL(38,0)) * rt)"
            )
        ).alias("sdev")
    )
    return (
        tot.crossJoin(F.broadcast(dev))
        .selectExpr(
            "n_nations",
            "CASE WHEN rt > 0 AND mt > 0 THEN CAST(floor(1e6 *"
            " CAST(sdev AS DOUBLE)"
            " / (2e0 * CAST(rt AS DOUBLE) * CAST(mt AS DOUBLE)))"
            " AS BIGINT) END AS hoover_ppm",
        )
    )


@register(
    "abc_xyz_matrix",
    """
    WITH per AS MATERIALIZED (
      SELECT p.p_brand AS brand,
             CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) AS BIGINT)
               AS mn,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), brand_rev AS MATERIALIZED (
      SELECT brand, CAST(SUM(cents) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS nm,
             CAST(SUM(qty) AS BIGINT) AS s,
             SUM(qty::HUGEINT * qty) AS q2
      FROM per GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT brand, v, nm, s, q2,
             SUM(v) OVER (ORDER BY v DESC, brand
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(v) OVER () AS total
      FROM brand_rev
    ), classed AS MATERIALIZED (
      SELECT brand, v,
             CASE WHEN cum * 5 <= total * 4 THEN 'A'
                  WHEN cum * 20 <= total * 19 THEN 'B'
                  ELSE 'C' END AS abc_class,
             CASE WHEN 4 * (nm * q2 - s::HUGEINT * s) < s::HUGEINT * s
                    THEN 'X'
                  WHEN nm * q2 - s::HUGEINT * s < s::HUGEINT * s THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM ranked
    )
    SELECT abc_class, xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_brands,
           CAST(SUM(v) AS BIGINT) AS revenue_cents
    FROM classed
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def abc_xyz_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint ABC-XYZ segmentation of brands (the inventory-policy
    matrix: value class x demand-volatility class — A/X items get
    tight service levels, C/Z get make-to-order):
    ``abc_classification_brands`` and ``xyz_volatility_brands`` each
    read ONE axis; the planner needs the JOINT cell counts.

    Exactness: ABC boundaries compare cum*5 <= total*4 (80%) and
    cum*20 <= total*19 (95%) in integer cents; XYZ compares the
    population-variance identity n*SUM(q^2) - S^2 against S^2
    cross-multiplied (CV^2 < 0.25 -> X, < 1 -> Y, else Z) — all
    integers, no float boundary anywhere.

    Scale shape: one lineitem pass onto (brand, month); the cum
    window runs over the 25-brand aggregate (domain-bounded)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    per = (
        li.join(
            p.select("p_partkey", "p_brand"),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.expr(
                "CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)"
            ).alias("mn"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100"
                    " AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("cents"),
            F.sum(F.expr("CAST(l_quantity AS BIGINT)")).cast("bigint").alias("qty"),
        )
    )
    brand_rev = per.groupBy("brand").agg(
        F.sum("cents").cast("bigint").alias("v"),
        F.count(F.lit(1)).cast("bigint").alias("nm"),
        F.sum("qty").cast("bigint").alias("s"),
        F.sum(F.expr("CAST(qty AS DECIMAL(38,0)) * qty")).alias("q2"),
    )
    # the cum/total windows run over the 25-brand aggregate —
    # domain-bounded (window_audit: ABC-over-brands)
    w_cum = Window.orderBy(F.col("v").desc(), F.col("brand")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_tot = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = brand_rev.select(
        "brand",
        "v",
        "nm",
        "s",
        "q2",
        F.sum("v").over(w_cum).alias("cum"),
        F.sum("v").over(w_tot).alias("total"),
    )
    classed = ranked.selectExpr(
        "brand",
        "v",
        "CASE WHEN cum * 5 <= total * 4 THEN 'A'"
        " WHEN cum * 20 <= total * 19 THEN 'B' ELSE 'C' END AS abc_class",
        "CASE WHEN 4 * (nm * q2 - CAST(s AS DECIMAL(38,0)) * s)"
        "       < CAST(s AS DECIMAL(38,0)) * s THEN 'X'"
        " WHEN nm * q2 - CAST(s AS DECIMAL(38,0)) * s"
        "       < CAST(s AS DECIMAL(38,0)) * s THEN 'Y'"
        " ELSE 'Z' END AS xyz_class",
    )
    return (
        classed.groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_brands"),
            F.sum("v").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("abc_class", "xyz_class")
    )


@register(
    "share_of_parent_regions",
    """
    WITH rev AS MATERIALIZED (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ), wr AS MATERIALIZED (
      SELECT region, nation, cents,
             SUM(cents) OVER (PARTITION BY region) AS reg_cents,
             SUM(cents) OVER () AS tot_cents
      FROM rev
    )
    SELECT region, nation, cents AS revenue_cents,
           CASE WHEN reg_cents > 0 THEN CAST(cents::HUGEINT * 1000000
             // reg_cents AS BIGINT) END AS share_of_region_ppm,
           CASE WHEN tot_cents > 0 THEN CAST(reg_cents::HUGEINT * 1000000
             // tot_cents AS BIGINT) END AS region_share_ppm
    FROM wr ORDER BY region, nation
    """,
)
def share_of_parent_regions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent rollup (the standard OLAP cube metric every
    drill-down UI shows next to a value): each nation's revenue share
    WITHIN its region, and each region's share of the grand total —
    ``cube_status_priority_revenue`` emits the subtotal lattice, this
    emits the normalized view.

    Exactness: shares are nonnegative integer cross-products
    (cents * 1e6) div parent — Spark ``div`` and DuckDB ``//`` agree
    on nonnegatives; both parent sums are exact cents. Windows run
    over the 25-row (region, nation) aggregate."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    rev = (
        o.join(
            c.select("c_custkey", "c_nationkey"),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_regionkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(r.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
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
    w_reg = Window.partitionBy("region")
    w_tot = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wr = rev.select(
        "region",
        "nation",
        "cents",
        F.sum("cents").over(w_reg).alias("reg_cents"),
        F.sum("cents").over(w_tot).alias("tot_cents"),
    )
    return wr.selectExpr(
        "region",
        "nation",
        "cents AS revenue_cents",
        "CASE WHEN reg_cents > 0 THEN CAST(CAST(cents AS DECIMAL(38,0))"
        " * 1000000 div reg_cents AS BIGINT) END AS share_of_region_ppm",
        "CASE WHEN tot_cents > 0 THEN CAST(CAST(reg_cents AS DECIMAL(38,0))"
        " * 1000000 div tot_cents AS BIGINT) END AS region_share_ppm",
    ).orderBy("region", "nation")


@register(
    "aging_buckets_open_orders",
    """
    WITH snap AS MATERIALIZED (
      SELECT MAX(o_orderdate) AS s FROM orders
    ), aged AS MATERIALIZED (
      SELECT CASE
               WHEN date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(s AS DATE)) <= 30 THEN '0-030d'
               WHEN date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(s AS DATE)) <= 90 THEN '031-090d'
               WHEN date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(s AS DATE)) <= 365 THEN '091-365d'
               ELSE '365d+' END AS bucket,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
               AS cents
      FROM orders, snap
      WHERE o_orderstatus IN ('O', 'P')
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS open_value_cents
    FROM aged GROUP BY 1 ORDER BY 1
    """,
)
def aging_buckets_open_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report (the working-capital view an ops
    review starts with): non-final orders (status O/P) bucketed by
    age at the DATA's observed max order date — a data-anchored
    snapshot, never a wall-clock or schema date (CLAUDE.md rule;
    also keeps the query deterministic across runs). Exact day
    diffs on DATE casts, exact cents, four fixed buckets."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    snap = o.agg(F.max("o_orderdate").alias("s"))
    return (
        o.where(F.col("o_orderstatus").isin("O", "P"))
        .crossJoin(F.broadcast(snap))
        .selectExpr(
            "CASE"
            " WHEN datediff(CAST(s AS DATE), CAST(o_orderdate AS DATE)) <= 30"
            "   THEN '0-030d'"
            " WHEN datediff(CAST(s AS DATE), CAST(o_orderdate AS DATE)) <= 90"
            "   THEN '031-090d'"
            " WHEN datediff(CAST(s AS DATE), CAST(o_orderdate AS DATE)) <= 365"
            "   THEN '091-365d'"
            " ELSE '365d+' END AS bucket",
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS cents",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("open_value_cents"),
        )
        .orderBy("bucket")
    )


@register(
    "demand_classes_brands",
    """
    WITH per AS MATERIALIZED (
      SELECT p.p_brand AS brand,
             CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) AS BIGINT)
               AS mn,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), cal AS MATERIALIZED (
      SELECT CAST(MAX(mn) - MIN(mn) + 1 AS BIGINT) AS n_cal FROM per
    ), stats AS MATERIALIZED (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS nz,
             CAST(SUM(qty) AS BIGINT) AS s,
             SUM(qty::HUGEINT * qty) AS q2
      FROM per GROUP BY 1
    )
    SELECT brand, nz AS n_demand_months,
           CAST(n_cal * 1000 // nz AS BIGINT) AS adi_milli,
           CASE WHEN s > 0 THEN
             CAST((nz * q2 - s::HUGEINT * s) * 1000
                  // (s::HUGEINT * s) AS BIGINT)
           END AS cv2_milli,
           CASE WHEN 100 * n_cal < 132 * nz THEN
                  CASE WHEN 100 * (nz * q2 - s::HUGEINT * s)
                         < 49 * s::HUGEINT * s
                       THEN 'smooth' ELSE 'erratic' END
                ELSE
                  CASE WHEN 100 * (nz * q2 - s::HUGEINT * s)
                         < 49 * s::HUGEINT * s
                       THEN 'intermittent' ELSE 'lumpy' END
           END AS demand_class
    FROM stats, cal ORDER BY brand
    """,
)
def demand_classes_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos-Boylan demand classification per brand (smooth /
    erratic / intermittent / lumpy — THE forecast-method router:
    Croston for intermittent, SES for smooth): ADI = calendar months
    / demand months vs the 1.32 cutoff, CV^2 of nonzero monthly
    demand vs the 0.49 cutoff (Syntetos, Boylan & Croston 2005).
    ``croston_intermittent_parts`` forecasts one class; this decides
    the class.

    Exactness: both cutoffs compare CROSS-MULTIPLIED integers
    (100*n_cal < 132*nz; 100*(nz*q2 - s^2) < 49*s^2 in HUGEINT /
    DECIMAL(38,0)) — no float ever decides a class; the reported
    adi/cv2 milli values are nonnegative integer truncating divs.
    The calendar span is data-anchored (observed min/max ship
    month).

    Scale shape: one lineitem pass onto (brand, month); stats and
    the scalar calendar row are domain-bounded."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    per = (
        li.join(
            p.select("p_partkey", "p_brand"),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.expr(
                "CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)"
            ).alias("mn"),
        )
        .agg(F.sum(F.expr("CAST(l_quantity AS BIGINT)")).cast("bigint").alias("qty"))
        .cache()  # bounded (brand x month); feeds calendar AND stats
    )
    cal = per.agg(F.expr("CAST(MAX(mn) - MIN(mn) + 1 AS BIGINT)").alias("n_cal"))
    stats = per.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("nz"),
        F.sum("qty").cast("bigint").alias("s"),
        F.sum(F.expr("CAST(qty AS DECIMAL(38,0)) * qty")).alias("q2"),
    )
    return (
        stats.crossJoin(F.broadcast(cal))
        .selectExpr(
            "brand",
            "nz AS n_demand_months",
            "CAST(n_cal * 1000 div nz AS BIGINT) AS adi_milli",
            "CASE WHEN s > 0 THEN"
            " CAST((nz * q2 - CAST(s AS DECIMAL(38,0)) * s) * 1000"
            " div (CAST(s AS DECIMAL(38,0)) * s) AS BIGINT)"
            " END AS cv2_milli",
            "CASE WHEN 100 * n_cal < 132 * nz THEN"
            "  CASE WHEN 100 * (nz * q2 - CAST(s AS DECIMAL(38,0)) * s)"
            "         < 49 * CAST(s AS DECIMAL(38,0)) * s"
            "       THEN 'smooth' ELSE 'erratic' END"
            " ELSE"
            "  CASE WHEN 100 * (nz * q2 - CAST(s AS DECIMAL(38,0)) * s)"
            "         < 49 * CAST(s AS DECIMAL(38,0)) * s"
            "       THEN 'intermittent' ELSE 'lumpy' END"
            " END AS demand_class",
        )
        .orderBy("brand")
    )


@register(
    "single_source_parts",
    """
    WITH ps AS MATERIALIZED (
      SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem
    ), per AS MATERIALIZED (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_suppliers FROM ps GROUP BY 1
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_parts FROM per
    )
    SELECT p.n_suppliers, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(*)::HUGEINT * 1000000 // t.n_parts AS BIGINT)
             AS share_ppm
    FROM per p, tot t
    GROUP BY p.n_suppliers, t.n_parts ORDER BY p.n_suppliers
    """,
)
def single_source_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sourcing-concentration histogram (the supply-risk slide: how
    many parts depend on exactly one supplier?): distinct observed
    (part, supplier) pairs from the line ledger, parts bucketed by
    supplier count, each bucket's share of all traded parts in ppm.
    Exact distinct counts; the share is a nonnegative integer
    truncating div. One lineitem pass onto |parts| rows; the
    histogram is supplier-count-bounded."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ps = li.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).distinct()
    per = (
        ps.groupBy("pk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_suppliers"))
        .cache()  # |parts|-bounded; feeds the histogram AND the
        # traded-part total — uncached, the (part, supplier) distinct's
        # post-shuffle dedup would re-run per branch
    )
    tot = per.agg(F.count(F.lit(1)).cast("bigint").alias("n_parts_tot"))
    return (
        per.groupBy("n_suppliers")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "n_suppliers",
            "n_parts",
            "CAST(CAST(n_parts AS DECIMAL(38,0)) * 1000000 div n_parts_tot"
            " AS BIGINT) AS share_ppm",
        )
        .orderBy("n_suppliers")
    )
