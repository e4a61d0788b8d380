"""Round 10, wave 5: Cucconi location-scale test, Krippendorff's
alpha with variable raters, edge embeddedness / local bridges."""

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
# Round 10, wave 5: Cucconi, Krippendorff alpha, edge embeddedness
# =====================================================================

@register(
    "cucconi_status",
    """
    WITH t AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(count_if(substr(o_orderpriority, 1, 1) IN ('1', '2'))
                  AS BIGINT) AS cnt2
      FROM orders GROUP BY 1, 2
    ), c AS MATERIALIZED (
      SELECT g, cnt, cnt2,
             CAST(SUM(cnt) OVER w - cnt AS BIGINT) AS cum_before
      FROM t
      WINDOW w AS (PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), tot AS MATERIALIZED (
      SELECT g, CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(cnt2) AS BIGINT) AS n2
      FROM t GROUP BY 1
    ), sums AS MATERIALIZED (
      -- doubled mid-rank per tier: 2R = 2*cum_before + l + 1; sample-2
      -- sums of R^2 and (N+1-R)^2 via 4*R^2 exact integers
      SELECT c.g,
             CAST(SUM(c.cnt2::HUGEINT
                      * (2 * c.cum_before + c.cnt + 1)
                      * (2 * c.cum_before + c.cnt + 1)) AS HUGEINT) AS sr2x4,
             CAST(SUM(c.cnt2::HUGEINT
                      * (2 * (tot.n + 1) - (2 * c.cum_before + c.cnt + 1))
                      * (2 * (tot.n + 1) - (2 * c.cum_before + c.cnt + 1)))
                  AS HUGEINT) AS ss2x4
      FROM c JOIN tot ON c.g = tot.g
      GROUP BY 1
    )
    SELECT tot.g AS o_orderstatus, tot.n2 AS n2,
           CAST(tot.n - tot.n2 AS BIGINT) AS n1,
           CASE WHEN tot.n2 > 0 AND tot.n > tot.n2 AND tot.n > 1 THEN
             CAST(floor(
               (CAST(sums.sr2x4 AS DOUBLE) / 4e0
                - CAST(tot.n2 AS DOUBLE) * (tot.n + 1) * (2 * tot.n + 1) / 6e0)
               / sqrt(CAST(tot.n2 AS DOUBLE) * (tot.n - tot.n2)
                      * (tot.n + 1) * (2 * tot.n + 1)
                      * (8e0 * tot.n + 11) / 180e0)
               * 1000e0) AS BIGINT)
           END AS u_milli,
           CASE WHEN tot.n2 > 0 AND tot.n > tot.n2 AND tot.n > 1 THEN
             CAST(floor(
               (CAST(sums.ss2x4 AS DOUBLE) / 4e0
                - CAST(tot.n2 AS DOUBLE) * (tot.n + 1) * (2 * tot.n + 1) / 6e0)
               / sqrt(CAST(tot.n2 AS DOUBLE) * (tot.n - tot.n2)
                      * (tot.n + 1) * (2 * tot.n + 1)
                      * (8e0 * tot.n + 11) / 180e0)
               * 1000e0) AS BIGINT)
           END AS v_milli
    FROM tot JOIN sums ON tot.g = sums.g
    """,
)
def cucconi_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cucconi's two-sample location-SCALE rank test (Giornale degli
    Economisti 1968; Marozzi 2009 revival) per order status — one
    test that sees BOTH a mean shift and a variance change, built
    from squared mid-ranks: U standardizes ΣR² of sample 2, V the
    contrarian Σ(N+1−R)² (U picks up right-shift + spread, V
    left-shift + spread). Complements the location-only
    Mann-Whitney and the dispersion-only Mood families.

    Exactness: tier-grouped DOUBLED mid-ranks (2R̄ⱼ = 2·cum_before +
    lⱼ + 1) keep 4·ΣR² an exact integer through the
    grouped-conditional aggregation; U/V evaluate the closed-form
    moments in DOUBLE with a fixed IEEE expression (the z_milli
    class — sqrt is exact, one floor). Tie handling is the standard
    mid-rank substitution, documented.

    Scale shape (r13): one (group, value) tier aggregation, then the
    LOCAL+CROSS fold (grouped_local_prefix + partition_offsets) — both
    tier terms are degree-2 polynomials in the prefix (m = m_loc + 2·O
    with the offset O constant per range partition), so they fold from
    a bounded (partition × group) partial table: Σc₂m² = ΣA + 4O·ΣB +
    4O²·ΣC and Σc₂(K−m)² = K²·n₂ − 2K·Σc₂m + Σc₂m² with K = 2(n+1) a
    group constant. No per-row global prefix, no pin (single ranged
    consumer), no offsets join, no totals broadcast — the old form
    pinned twice (the recipe's internal pin + a second pin to split
    totals from the moment pass). The oracle's window is the sf0.01
    shortcut; the moment algebra is a bounded per-group aggregate."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_local_prefix,
        partition_offsets,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    vals = o.groupBy(
        F.col("o_orderstatus").alias("g"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("v"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.count_if(
            F.substring("o_orderpriority", 1, 1).isin("1", "2")
        )
        .cast("bigint")
        .alias("cnt2"),
    )
    loc = grouped_local_prefix(vals, "g", "v", ["cnt"])
    # m_loc = 2·c_local + l + 1 (the doubled mid-rank's local part)
    part = loc.groupBy("_pid", "g").agg(
        F.sum("cnt").cast("bigint").alias("cnt"),
        F.sum("cnt2").cast("bigint").alias("c2"),
        F.sum(
            F.expr("CAST(cnt2 AS DECIMAL(38,0)) * (2 * _l_cnt + cnt + 1)")
        ).alias("b"),
        F.sum(
            F.expr(
                "CAST(cnt2 AS DECIMAL(38,0)) * (2 * _l_cnt + cnt + 1)"
                " * (2 * _l_cnt + cnt + 1)"
            )
        ).alias("a"),
    )
    offs = partition_offsets(part, "g", ["cnt"])
    agg = offs.groupBy("g").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(
            F.expr(
                "a + 4 * CAST(_o_cnt AS DECIMAL(38,0)) * b"
                " + 4 * CAST(_o_cnt AS DECIMAL(38,0)) * _o_cnt * c2"
            )
        ).alias("sr2x4"),
        F.sum(F.expr("b + 2 * CAST(_o_cnt AS DECIMAL(38,0)) * c2")).alias(
            "sm"
        ),
    )
    zexpr = (
        "CASE WHEN n2 > 0 AND n > n2 AND n > 1 THEN"
        " CAST(floor("
        " (CAST({col} AS DOUBLE) / 4e0"
        "  - CAST(n2 AS DOUBLE) * (n + 1) * (2 * n + 1) / 6e0)"
        " / sqrt(CAST(n2 AS DOUBLE) * (n - n2) * (n + 1) * (2 * n + 1)"
        "        * (8e0 * n + 11) / 180e0)"
        " * 1000e0) AS BIGINT) END AS {out}"
    )
    return agg.selectExpr(
        "g",
        "n",
        "n2",
        "sr2x4",
        # K²·n₂ − 2K·Σc₂m + Σc₂m² with K = 2(n+1), exact in DECIMAL
        "CAST(2 * (n + 1) AS DECIMAL(38,0)) * (2 * (n + 1)) * n2"
        " - 2 * CAST(2 * (n + 1) AS DECIMAL(38,0)) * sm + sr2x4 AS ss2x4",
    ).selectExpr(
        "g AS o_orderstatus",
        "n2",
        "CAST(n - n2 AS BIGINT) AS n1",
        zexpr.format(col="sr2x4", out="u_milli"),
        zexpr.format(col="ss2x4", out="v_milli"),
    )


@register(
    "krippendorff_alpha_orders",
    """
    WITH units AS MATERIALIZED (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(count_if(l_returnflag = 'R') AS BIGINT) AS n_r,
             CAST(count_if(l_returnflag = 'A') AS BIGINT) AS n_a,
             CAST(count_if(l_returnflag = 'N') AS BIGINT) AS n_n
      FROM lineitem GROUP BY 1 HAVING COUNT(*) >= 2
    ), do_parts AS MATERIALIZED (
      SELECT CAST(SUM((60 // (m - 1))
                      * (n_r * (m - n_r) + n_a * (m - n_a)
                         + n_n * (m - n_n))) AS HUGEINT) AS do60,
             CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(n_r) AS BIGINT) AS c_r,
             CAST(SUM(n_a) AS BIGINT) AS c_a,
             CAST(SUM(n_n) AS BIGINT) AS c_n,
             CAST(COUNT(*) AS BIGINT) AS n_units
      FROM units
    )
    SELECT n_units, n AS n_ratings,
           CASE WHEN (c_r::HUGEINT * (n - c_r) + c_a::HUGEINT * (n - c_a)
                      + c_n::HUGEINT * (n - c_n)) > 0 THEN CAST(
             (CASE WHEN 60 * (c_r::HUGEINT * (n - c_r)
                             + c_a::HUGEINT * (n - c_a)
                             + c_n::HUGEINT * (n - c_n))
                        >= (n - 1) * do60
                   THEN 1 ELSE -1 END)
             * ((abs(60 * (c_r::HUGEINT * (n - c_r)
                           + c_a::HUGEINT * (n - c_a)
                           + c_n::HUGEINT * (n - c_n))
                     - (n - 1) * do60) * 1000000)
                // (60 * (c_r::HUGEINT * (n - c_r)
                          + c_a::HUGEINT * (n - c_a)
                          + c_n::HUGEINT * (n - c_n)))) AS BIGINT)
           END AS alpha_ppm
    FROM do_parts
    """,
)
def krippendorff_alpha_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha, nominal metric, VARIABLE raters per unit
    (Content Analysis 1980) — the agreement coefficient for the
    missing-data case ``fleiss_kappa_orders`` cannot touch: every
    order with ≥2 lineitems is a unit, ALL its lineitems are raters
    (m ∈ 2..7), rating = returnflag.

    Exactness: α = 1 − D_o/D_e with
    D_o ∝ Σ_u (1/(m_u−1))·Σ_c n_uc(m_u−n_uc) and
    D_e ∝ Σ_c n_c(n−n_c)/(n(n−1)); multiplying D_o through by
    LCM(1..6) = 60 clears every per-unit fraction exactly (m ≤ 7 for
    TPC-H lineitems, so m−1 divides 60), giving
    α = (60·Σc_c(n−c_c) − (n−1)·D̃_o60) / (60·Σc_c(n−c_c)) — one
    sign-factored integer division, ppm-scaled. All-one-category
    data (D_e = 0) emits NULL.

    Scale shape: one grouped conditional aggregation over lineitem,
    then scalar algebra — no windows, no joins."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    units = (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m"),
            F.count_if(F.col("l_returnflag") == "R").cast("bigint").alias("n_r"),
            F.count_if(F.col("l_returnflag") == "A").cast("bigint").alias("n_a"),
            F.count_if(F.col("l_returnflag") == "N").cast("bigint").alias("n_n"),
        )
        .filter(F.col("m") >= 2)
    )
    parts = units.agg(
        F.sum(
            F.expr(
                "(60 div (m - 1))"
                " * (n_r * (m - n_r) + n_a * (m - n_a) + n_n * (m - n_n))"
            )
        )
        .cast("decimal(38,0)")
        .alias("do60"),
        F.sum("m").cast("bigint").alias("n"),
        F.sum("n_r").cast("bigint").alias("c_r"),
        F.sum("n_a").cast("bigint").alias("c_a"),
        F.sum("n_n").cast("bigint").alias("c_n"),
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
    )
    de = (
        "(CAST(c_r AS DECIMAL(38,0)) * (n - c_r)"
        " + CAST(c_a AS DECIMAL(38,0)) * (n - c_a)"
        " + CAST(c_n AS DECIMAL(38,0)) * (n - c_n))"
    )
    return parts.selectExpr(
        "n_units",
        "n AS n_ratings",
        f"CASE WHEN {de} > 0 THEN CAST("
        f" (CASE WHEN 60 * {de} >= (n - 1) * do60 THEN 1 ELSE -1 END)"
        f" * ((abs(60 * {de} - (n - 1) * do60) * 1000000)"
        f"    div (60 * {de})) AS BIGINT) END AS alpha_ppm",
    )


@register(
    "edge_embeddedness_parts",
    """
    WITH e AS MATERIALIZED (
      SELECT least(a.l_partkey, b.l_partkey) AS a,
             greatest(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), tri AS MATERIALIZED (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e1.b = e2.a
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ), edge_sup AS MATERIALIZED (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS emb FROM (
        SELECT x AS a, y AS b FROM tri
        UNION ALL SELECT y AS a, z AS b FROM tri
        UNION ALL SELECT x AS a, z AS b FROM tri
      ) GROUP BY 1, 2
    ), all_e AS MATERIALIZED (
      SELECT e.a, e.b, COALESCE(edge_sup.emb, 0) AS emb
      FROM e LEFT JOIN edge_sup ON e.a = edge_sup.a AND e.b = edge_sup.b
    )
    SELECT CAST(emb AS BIGINT) AS embeddedness,
           CAST(COUNT(*) AS BIGINT) AS n_edges
    FROM all_e GROUP BY 1
    """,
)
def edge_embeddedness_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge embeddedness histogram over the co-purchase parts graph
    (Granovetter AJS'73 weak ties; Easley-Kleinberg ch. 3): for every
    support-≥2 edge, the number of COMMON neighbors of its endpoints
    = the number of triangles the edge sits in; embeddedness-0 edges
    are LOCAL BRIDGES — the edge-level structural view the per-node
    ``triangle_count_parts`` and ``clustering_coeff_parts`` families
    don't give.

    Plan: the same support-thresholded edge build and ordered wedge
    join as triangle counting (equi-keyed on the shared endpoint,
    never all-pairs); each triangle credits its three edges via ONE
    explode (no unionAll re-evaluation on the Spark side — CLAUDE.md
    subtree rule); bounded histogram output.

    Exactness: pure integer counts."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pa = li.select("l_orderkey", "l_partkey")
    e = (
        pa.alias("a")
        .join(
            pa.alias("b"),
            F.expr(
                "a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            ),
        )
        .groupBy(
            F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("__sup"))
        .filter(F.col("__sup") >= 2)
        .select("a", "b")
        .localCheckpoint(eager=True)  # feeds wedge join x3 + left join
    )
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.expr("e1.b = e2.a"))
        .join(e.alias("e3"), F.expr("e3.a = e1.a AND e3.b = e2.b"))
        .selectExpr("e1.a AS x", "e1.b AS y", "e2.b AS z")
    )
    # one explode credits all three edges of each triangle (never a
    # 3-way unionAll of selects over the same subtree)
    credits = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                F.struct(F.col("y").alias("a"), F.col("z").alias("b")),
                F.struct(F.col("x").alias("a"), F.col("z").alias("b")),
            )
        ).alias("ed")
    ).select("ed.a", "ed.b")
    edge_sup = credits.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("emb")
    )
    all_e = e.join(edge_sup, ["a", "b"], "left").select(
        F.coalesce(F.col("emb"), F.lit(0)).alias("emb")
    )
    return all_e.groupBy(F.col("emb").cast("bigint").alias("embeddedness")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges")
    )
