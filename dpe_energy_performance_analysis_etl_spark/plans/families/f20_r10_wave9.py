"""Round 10, wave 9: multiset (bag) set operations, landmark
harmonic-closeness centrality, Brier score decomposition."""

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
from dpe_energy_performance_analysis_etl_spark.plans.families.f04_l_diversity_customers import (  # noqa: F401,E501
    _bfs_oracle,
)


# =====================================================================
# Round 10, wave 9: multiset ops, closeness centrality, Brier
# =====================================================================

@register(
    "multiset_ops_quantity",
    """
    WITH bounds AS MATERIALIZED (
      SELECT CAST(min(epoch_us(l_shipdate)) AS BIGINT) AS t0,
             CAST(max(epoch_us(l_shipdate)) AS BIGINT) AS t1
      FROM lineitem
    ), tallies AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             CAST(count_if(epoch_us(l_shipdate) * 2 < t0 + t1) AS BIGINT)
               AS c1,
             CAST(count_if(epoch_us(l_shipdate) * 2 >= t0 + t1) AS BIGINT)
               AS c2
      FROM lineitem, bounds
      GROUP BY 1
    )
    SELECT v AS quantity, c1, c2,
           CAST(greatest(c1 - c2, 0) AS BIGINT) AS except_all_count,
           CAST(greatest(c2 - c1, 0) AS BIGINT) AS rexcept_all_count,
           CAST(least(c1, c2) AS BIGINT) AS intersect_all_count
    FROM tallies ORDER BY quantity
    """,
)
def multiset_ops_quantity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (SQL's EXCEPT ALL / INTERSECT
    ALL, which the registry's DISTINCT-semantics ``except_set`` /
    ``intersect_set`` deliberately do not cover) between the two
    halves of the shipping window, per quantity value: with
    multiplicities c1/c2, EXCEPT ALL keeps max(c1−c2, 0) copies and
    INTERSECT ALL min(c1, c2) — computed as ONE tally aggregation
    instead of materializing either multiset (the standard bag-
    algebra rewrite, exactly how a planner lowers these operators).

    Exactness: pure integer counts; the epoch-midpoint half split is
    anchored on the DATA's observed range (CLAUDE.md rule).

    Scale shape: one conditional aggregation onto the ≤50-row
    quantity domain — no join, no window."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bounds = li.agg(
        F.min(epoch_micros(F.col("l_shipdate"))).cast("bigint").alias("t0"),
        F.max(epoch_micros(F.col("l_shipdate"))).cast("bigint").alias("t1"),
    )
    e2 = epoch_micros(F.col("l_shipdate")) * 2
    tallies = (
        li.crossJoin(F.broadcast(bounds))
        .groupBy(F.col("l_quantity").cast("bigint").alias("v"))
        .agg(
            F.count_if(e2 < F.col("t0") + F.col("t1"))
            .cast("bigint")
            .alias("c1"),
            F.count_if(e2 >= F.col("t0") + F.col("t1"))
            .cast("bigint")
            .alias("c2"),
        )
    )
    return tallies.selectExpr(
        "v AS quantity",
        "c1",
        "c2",
        "CAST(greatest(c1 - c2, 0) AS BIGINT) AS except_all_count",
        "CAST(greatest(c2 - c1, 0) AS BIGINT) AS rexcept_all_count",
        "CAST(least(c1, c2) AS BIGINT) AS intersect_all_count",
    ).orderBy("quantity")


_CLOSENESS_SELECT = """
    SELECT CAST(node AS BIGINT) AS node,
           CAST(count_if(dist > 0) AS BIGINT) AS n_reached,
           CAST(SUM(CASE WHEN dist > 0 THEN 12 // dist ELSE 0 END)
                AS BIGINT) AS closeness_x12
    FROM d4 GROUP BY node
"""


@register(
    "closeness_centrality_landmarks",
    _bfs_oracle(4, 4).replace(
        "SELECT landmark, node, CAST(dist AS BIGINT) AS dist FROM d4",
        f"""
    SELECT node, n_reached, closeness_x12, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, row_number() OVER (ORDER BY closeness_x12 DESC, node) AS rk
      FROM ({_CLOSENESS_SELECT})
    ) WHERE rk <= 20
    """,
    ),
)
def closeness_centrality_landmarks_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Landmark-approximated HARMONIC closeness centrality (Boldi &
    Vigna's harmonic variant of closeness, computed from the Potamias
    CIKM'09 landmark distances): per node Σ_landmarks 1/d, top-20 —
    the "who is near everything" ranking the graph suite lacked
    (degree ranks local volume, PageRank ranks flow; closeness ranks
    REACH). Harmonic form handles unreachable landmarks natively
    (contribute 0).

    Exactness: with max_depth = 4 every 1/d is one of 1, 1/2, 1/3,
    1/4 — multiplying by LCM(1..4)·… = 12 makes the score the exact
    integer Σ (12 div d); ties rank on the smaller node id. Reuses
    the exact landmark_bfs_distances rounds (eager localCheckpoint
    per round) and its unrolled oracle with a closeness head.

    Scale shape: the BFS is O(Σ frontier degrees) per round; the
    closeness aggregation is one groupBy over the (landmark, node)
    distance table and the top-20 is a TakeOrdered, never a
    data-sized window."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        landmark_bfs_distances,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pa = li.select("l_orderkey", "l_partkey")
    e = (
        pa.alias("a")
        .join(
            pa.alias("b"),
            F.expr("a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"),
        )
        .groupBy(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("src", "dst")
    )
    dists = landmark_bfs_distances(e, n_landmarks=4, max_depth=4)
    close = dists.groupBy("node").agg(
        F.count_if(F.col("dist") > 0).cast("bigint").alias("n_reached"),
        F.sum(F.expr("CASE WHEN dist > 0 THEN 12 div dist ELSE 0 END"))
        .cast("bigint")
        .alias("closeness_x12"),
    )
    top = close.orderBy(
        F.col("closeness_x12").desc(), F.col("node").asc()
    ).limit(20)
    w = Window.orderBy(F.col("closeness_x12").desc(), F.col("node").asc())
    return top.select(
        F.col("node").cast("bigint").alias("node"),
        "n_reached",
        "closeness_x12",
        F.row_number().over(w).cast("bigint").alias("rk"),
    )


@register(
    "brier_decomposition_orders",
    """
    WITH bounds AS MATERIALIZED (
      SELECT CAST(min(epoch_us(o_orderdate)) AS BIGINT) AS t0,
             CAST(max(epoch_us(o_orderdate)) AS BIGINT) AS t1
      FROM orders
    ), labeled AS MATERIALIZED (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             CASE WHEN epoch_us(o_orderdate) * 2 < t0 + t1
                  THEN 0 ELSE 1 END AS half
      FROM orders, bounds
    ), bins AS MATERIALIZED (
      SELECT w,
             CAST(count_if(half = 0) AS BIGINT) AS n1,
             CAST(count_if(half = 0 AND y = 1) AS BIGINT) AS r1,
             CAST(count_if(half = 1) AS BIGINT) AS n2,
             CAST(count_if(half = 1 AND y = 1) AS BIGINT) AS r2
      FROM labeled GROUP BY 1
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(n2) AS BIGINT) AS n, CAST(SUM(r2) AS BIGINT) AS r
      FROM bins
    ), pv AS MATERIALIZED (
      SELECT CAST(COALESCE(MAX(CASE WHEN w = 1 THEN n1 END), 0) AS BIGINT) AS n1_1,
        CAST(COALESCE(MAX(CASE WHEN w = 1 THEN r1 END), 0) AS BIGINT) AS r1_1,
        CAST(COALESCE(MAX(CASE WHEN w = 1 THEN n2 END), 0) AS BIGINT) AS n2_1,
        CAST(COALESCE(MAX(CASE WHEN w = 1 THEN r2 END), 0) AS BIGINT) AS r2_1,
        CAST(COALESCE(MAX(CASE WHEN w = 2 THEN n1 END), 0) AS BIGINT) AS n1_2,
        CAST(COALESCE(MAX(CASE WHEN w = 2 THEN r1 END), 0) AS BIGINT) AS r1_2,
        CAST(COALESCE(MAX(CASE WHEN w = 2 THEN n2 END), 0) AS BIGINT) AS n2_2,
        CAST(COALESCE(MAX(CASE WHEN w = 2 THEN r2 END), 0) AS BIGINT) AS r2_2,
        CAST(COALESCE(MAX(CASE WHEN w = 3 THEN n1 END), 0) AS BIGINT) AS n1_3,
        CAST(COALESCE(MAX(CASE WHEN w = 3 THEN r1 END), 0) AS BIGINT) AS r1_3,
        CAST(COALESCE(MAX(CASE WHEN w = 3 THEN n2 END), 0) AS BIGINT) AS n2_3,
        CAST(COALESCE(MAX(CASE WHEN w = 3 THEN r2 END), 0) AS BIGINT) AS r2_3,
        CAST(COALESCE(MAX(CASE WHEN w = 4 THEN n1 END), 0) AS BIGINT) AS n1_4,
        CAST(COALESCE(MAX(CASE WHEN w = 4 THEN r1 END), 0) AS BIGINT) AS r1_4,
        CAST(COALESCE(MAX(CASE WHEN w = 4 THEN n2 END), 0) AS BIGINT) AS n2_4,
        CAST(COALESCE(MAX(CASE WHEN w = 4 THEN r2 END), 0) AS BIGINT) AS r2_4,
        CAST(COALESCE(MAX(CASE WHEN w = 5 THEN n1 END), 0) AS BIGINT) AS n1_5,
        CAST(COALESCE(MAX(CASE WHEN w = 5 THEN r1 END), 0) AS BIGINT) AS r1_5,
        CAST(COALESCE(MAX(CASE WHEN w = 5 THEN n2 END), 0) AS BIGINT) AS n2_5,
        CAST(COALESCE(MAX(CASE WHEN w = 5 THEN r2 END), 0) AS BIGINT) AS r2_5
      FROM bins
    ), parts AS MATERIALIZED (
      SELECT
        (CASE WHEN n1_1 > 0 AND n2_1 > 0 THEN CAST(n2_1 AS DOUBLE) * (CAST(r1_1 AS DOUBLE) / CAST(n1_1 AS DOUBLE) - CAST(r2_1 AS DOUBLE) / CAST(n2_1 AS DOUBLE)) * (CAST(r1_1 AS DOUBLE) / CAST(n1_1 AS DOUBLE) - CAST(r2_1 AS DOUBLE) / CAST(n2_1 AS DOUBLE)) ELSE 0e0 END)
           + (CASE WHEN n1_2 > 0 AND n2_2 > 0 THEN CAST(n2_2 AS DOUBLE) * (CAST(r1_2 AS DOUBLE) / CAST(n1_2 AS DOUBLE) - CAST(r2_2 AS DOUBLE) / CAST(n2_2 AS DOUBLE)) * (CAST(r1_2 AS DOUBLE) / CAST(n1_2 AS DOUBLE) - CAST(r2_2 AS DOUBLE) / CAST(n2_2 AS DOUBLE)) ELSE 0e0 END)
           + (CASE WHEN n1_3 > 0 AND n2_3 > 0 THEN CAST(n2_3 AS DOUBLE) * (CAST(r1_3 AS DOUBLE) / CAST(n1_3 AS DOUBLE) - CAST(r2_3 AS DOUBLE) / CAST(n2_3 AS DOUBLE)) * (CAST(r1_3 AS DOUBLE) / CAST(n1_3 AS DOUBLE) - CAST(r2_3 AS DOUBLE) / CAST(n2_3 AS DOUBLE)) ELSE 0e0 END)
           + (CASE WHEN n1_4 > 0 AND n2_4 > 0 THEN CAST(n2_4 AS DOUBLE) * (CAST(r1_4 AS DOUBLE) / CAST(n1_4 AS DOUBLE) - CAST(r2_4 AS DOUBLE) / CAST(n2_4 AS DOUBLE)) * (CAST(r1_4 AS DOUBLE) / CAST(n1_4 AS DOUBLE) - CAST(r2_4 AS DOUBLE) / CAST(n2_4 AS DOUBLE)) ELSE 0e0 END)
           + (CASE WHEN n1_5 > 0 AND n2_5 > 0 THEN CAST(n2_5 AS DOUBLE) * (CAST(r1_5 AS DOUBLE) / CAST(n1_5 AS DOUBLE) - CAST(r2_5 AS DOUBLE) / CAST(n2_5 AS DOUBLE)) * (CAST(r1_5 AS DOUBLE) / CAST(n1_5 AS DOUBLE) - CAST(r2_5 AS DOUBLE) / CAST(n2_5 AS DOUBLE)) ELSE 0e0 END) AS rel_n,
        (CASE WHEN n2_1 > 0 THEN CAST(n2_1 AS DOUBLE) * (CAST(r2_1 AS DOUBLE) / CAST(n2_1 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(r2_1 AS DOUBLE) / CAST(n2_1 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0e0 END)
           + (CASE WHEN n2_2 > 0 THEN CAST(n2_2 AS DOUBLE) * (CAST(r2_2 AS DOUBLE) / CAST(n2_2 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(r2_2 AS DOUBLE) / CAST(n2_2 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0e0 END)
           + (CASE WHEN n2_3 > 0 THEN CAST(n2_3 AS DOUBLE) * (CAST(r2_3 AS DOUBLE) / CAST(n2_3 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(r2_3 AS DOUBLE) / CAST(n2_3 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0e0 END)
           + (CASE WHEN n2_4 > 0 THEN CAST(n2_4 AS DOUBLE) * (CAST(r2_4 AS DOUBLE) / CAST(n2_4 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(r2_4 AS DOUBLE) / CAST(n2_4 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0e0 END)
           + (CASE WHEN n2_5 > 0 THEN CAST(n2_5 AS DOUBLE) * (CAST(r2_5 AS DOUBLE) / CAST(n2_5 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(r2_5 AS DOUBLE) / CAST(n2_5 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0e0 END) AS res_n
      FROM pv, tot
    )
    SELECT tot.n AS n_eval, tot.r AS n_events,
           CASE WHEN tot.n > 0 THEN CAST(floor(
             parts.rel_n / CAST(tot.n AS DOUBLE) * 1000000e0) AS BIGINT)
           END AS reliability_ppm,
           CASE WHEN tot.n > 0 THEN CAST(floor(
             parts.res_n / CAST(tot.n AS DOUBLE) * 1000000e0) AS BIGINT)
           END AS resolution_ppm,
           CASE WHEN tot.n > 0 THEN CAST(floor(
             CAST(tot.r AS DOUBLE) / CAST(tot.n AS DOUBLE)
             * (1e0 - CAST(tot.r AS DOUBLE) / CAST(tot.n AS DOUBLE))
             * 1000000e0) AS BIGINT)
           END AS uncertainty_ppm
    FROM tot, parts
    """,
)
def brier_decomposition_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score (Murphy, J. Appl.
    Meteorology 1973): reliability − resolution + uncertainty, for
    the forecaster "predict P(status = F) per priority bin from the
    FIRST half of the order window, evaluate on the second half" —
    the calibration-vs-sharpness split that the scalar
    ``calibration_ece_orders`` family collapses into one number.

    Determinism: every bin statistic is an exact integer count from
    ONE conditional aggregation (5 priority bins x 2 halves); the 5
    bins then PIVOT into one row (conditional max per bin) and the
    reliability/resolution sums are explicit fixed-order 1..5
    additions of per-bin double terms — never a float SUM aggregate
    whose association order could differ across engines (CLAUDE.md
    fixed-order rule). The train/eval split anchors on the data's
    observed epoch range.

    Scale shape: one scan, one 5-row grid, scalar algebra."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bounds = o.agg(
        F.min(epoch_micros(F.col("o_orderdate"))).cast("bigint").alias("t0"),
        F.max(epoch_micros(F.col("o_orderdate"))).cast("bigint").alias("t1"),
    )
    e2 = epoch_micros(F.col("o_orderdate")) * 2
    labeled = o.crossJoin(F.broadcast(bounds)).select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("w"),
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
        (e2 >= F.col("t0") + F.col("t1")).cast("int").alias("half"),
    )
    bins = labeled.groupBy("w").agg(
        F.count_if(F.col("half") == 0).cast("bigint").alias("n1"),
        F.count_if((F.col("half") == 0) & (F.col("y") == 1))
        .cast("bigint")
        .alias("r1"),
        F.count_if(F.col("half") == 1).cast("bigint").alias("n2"),
        F.count_if((F.col("half") == 1) & (F.col("y") == 1))
        .cast("bigint")
        .alias("r2"),
    ).localCheckpoint(eager=True)  # 5 rows; feeds totals + parts
    tot = bins.agg(
        F.sum("n2").cast("bigint").alias("n"),
        F.sum("r2").cast("bigint").alias("r"),
    )
    # FIXED-ORDER component sums: the 5 priority bins pivot into one
    # row via conditional aggregates and the per-bin terms add in an
    # explicit 1..5 expression — never a float SUM whose partition
    # association order could differ across engines (CLAUDE.md rule)
    pv = bins.agg(
        F.coalesce(F.max(F.expr("CASE WHEN w = 1 THEN n1 END")), F.lit(0))
        .cast("bigint")
        .alias("n1_1"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 1 THEN r1 END")), F.lit(0))
        .cast("bigint")
        .alias("r1_1"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 1 THEN n2 END")), F.lit(0))
        .cast("bigint")
        .alias("n2_1"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 1 THEN r2 END")), F.lit(0))
        .cast("bigint")
        .alias("r2_1"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 2 THEN n1 END")), F.lit(0))
        .cast("bigint")
        .alias("n1_2"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 2 THEN r1 END")), F.lit(0))
        .cast("bigint")
        .alias("r1_2"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 2 THEN n2 END")), F.lit(0))
        .cast("bigint")
        .alias("n2_2"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 2 THEN r2 END")), F.lit(0))
        .cast("bigint")
        .alias("r2_2"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 3 THEN n1 END")), F.lit(0))
        .cast("bigint")
        .alias("n1_3"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 3 THEN r1 END")), F.lit(0))
        .cast("bigint")
        .alias("r1_3"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 3 THEN n2 END")), F.lit(0))
        .cast("bigint")
        .alias("n2_3"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 3 THEN r2 END")), F.lit(0))
        .cast("bigint")
        .alias("r2_3"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 4 THEN n1 END")), F.lit(0))
        .cast("bigint")
        .alias("n1_4"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 4 THEN r1 END")), F.lit(0))
        .cast("bigint")
        .alias("r1_4"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 4 THEN n2 END")), F.lit(0))
        .cast("bigint")
        .alias("n2_4"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 4 THEN r2 END")), F.lit(0))
        .cast("bigint")
        .alias("r2_4"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 5 THEN n1 END")), F.lit(0))
        .cast("bigint")
        .alias("n1_5"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 5 THEN r1 END")), F.lit(0))
        .cast("bigint")
        .alias("r1_5"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 5 THEN n2 END")), F.lit(0))
        .cast("bigint")
        .alias("n2_5"),
        F.coalesce(F.max(F.expr("CASE WHEN w = 5 THEN r2 END")), F.lit(0))
        .cast("bigint")
        .alias("r2_5"),
    )
    parts = pv.crossJoin(F.broadcast(tot)).selectExpr(
        "n",
        "r",
        "(CASE WHEN n1_1 > 0 AND n2_1 > 0 THEN CAST(n2_1 AS DOUBLE) * (CAST(r1_1 AS DOUBLE) / CAST(n1_1 AS DOUBLE) - CAST(r2_1 AS DOUBLE) / CAST(n2_1 AS DOUBLE)) * (CAST(r1_1 AS DOUBLE) / CAST(n1_1 AS DOUBLE) - CAST(r2_1 AS DOUBLE) / CAST(n2_1 AS DOUBLE)) ELSE 0e0 END) + (CASE WHEN n1_2 > 0 AND n2_2 > 0 THEN CAST(n2_2 AS DOUBLE) * (CAST(r1_2 AS DOUBLE) / CAST(n1_2 AS DOUBLE) - CAST(r2_2 AS DOUBLE) / CAST(n2_2 AS DOUBLE)) * (CAST(r1_2 AS DOUBLE) / CAST(n1_2 AS DOUBLE) - CAST(r2_2 AS DOUBLE) / CAST(n2_2 AS DOUBLE)) ELSE 0e0 END) + (CASE WHEN n1_3 > 0 AND n2_3 > 0 THEN CAST(n2_3 AS DOUBLE) * (CAST(r1_3 AS DOUBLE) / CAST(n1_3 AS DOUBLE) - CAST(r2_3 AS DOUBLE) / CAST(n2_3 AS DOUBLE)) * (CAST(r1_3 AS DOUBLE) / CAST(n1_3 AS DOUBLE) - CAST(r2_3 AS DOUBLE) / CAST(n2_3 AS DOUBLE)) ELSE 0e0 END) + (CASE WHEN n1_4 > 0 AND n2_4 > 0 THEN CAST(n2_4 AS DOUBLE) * (CAST(r1_4 AS DOUBLE) / CAST(n1_4 AS DOUBLE) - CAST(r2_4 AS DOUBLE) / CAST(n2_4 AS DOUBLE)) * (CAST(r1_4 AS DOUBLE) / CAST(n1_4 AS DOUBLE) - CAST(r2_4 AS DOUBLE) / CAST(n2_4 AS DOUBLE)) ELSE 0e0 END) + (CASE WHEN n1_5 > 0 AND n2_5 > 0 THEN CAST(n2_5 AS DOUBLE) * (CAST(r1_5 AS DOUBLE) / CAST(n1_5 AS DOUBLE) - CAST(r2_5 AS DOUBLE) / CAST(n2_5 AS DOUBLE)) * (CAST(r1_5 AS DOUBLE) / CAST(n1_5 AS DOUBLE) - CAST(r2_5 AS DOUBLE) / CAST(n2_5 AS DOUBLE)) ELSE 0e0 END) AS rel_n",
        "(CASE WHEN n2_1 > 0 THEN CAST(n2_1 AS DOUBLE) * (CAST(r2_1 AS DOUBLE) / CAST(n2_1 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(r2_1 AS DOUBLE) / CAST(n2_1 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0e0 END) + (CASE WHEN n2_2 > 0 THEN CAST(n2_2 AS DOUBLE) * (CAST(r2_2 AS DOUBLE) / CAST(n2_2 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(r2_2 AS DOUBLE) / CAST(n2_2 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0e0 END) + (CASE WHEN n2_3 > 0 THEN CAST(n2_3 AS DOUBLE) * (CAST(r2_3 AS DOUBLE) / CAST(n2_3 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(r2_3 AS DOUBLE) / CAST(n2_3 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0e0 END) + (CASE WHEN n2_4 > 0 THEN CAST(n2_4 AS DOUBLE) * (CAST(r2_4 AS DOUBLE) / CAST(n2_4 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(r2_4 AS DOUBLE) / CAST(n2_4 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0e0 END) + (CASE WHEN n2_5 > 0 THEN CAST(n2_5 AS DOUBLE) * (CAST(r2_5 AS DOUBLE) / CAST(n2_5 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(r2_5 AS DOUBLE) / CAST(n2_5 AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0e0 END) AS res_n",
    )
    return parts.selectExpr(
        "n AS n_eval",
        "r AS n_events",
        "CASE WHEN n > 0 THEN CAST(floor("
        " rel_n / CAST(n AS DOUBLE) * 1000000e0) AS BIGINT)"
        " END AS reliability_ppm",
        "CASE WHEN n > 0 THEN CAST(floor("
        " res_n / CAST(n AS DOUBLE) * 1000000e0) AS BIGINT)"
        " END AS resolution_ppm",
        "CASE WHEN n > 0 THEN CAST(floor("
        " CAST(r AS DOUBLE) / CAST(n AS DOUBLE)"
        " * (1e0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))"
        " * 1000000e0) AS BIGINT)"
        " END AS uncertainty_ppm",
    )
