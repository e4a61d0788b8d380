"""Round 10, wave 14: the variance-decomposition trio — one-way
ANOVA F, Brown-Forsythe variance homogeneity, intraclass
correlation ICC(1).

Shared exactness recipe: per-group (n_g, S_g = Σx, Q_g = Σx²) are
exact integers; the between-groups term Σ_g S_g²/n_g is QUANTIZED —
each group's S_g² div n_g floors independently and the BIGINT
floors sum exactly (both engines floor identically; error ≤ 1e-6 per
group, documented) — the same quantized-sum contract as the
Anderson-Darling and average-precision families. Final F / ICC ratios
evaluate in the fixed double-floor class."""

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

# between-term quantization scale: 1 — the per-group floored term
# (S_g^2 div n_g) must fit BIGINT because Spark's decimal
# IntegralDivide RETURNS LONG; floors at whole dollar^2 lose <= 1
# per group against SSB magnitudes of 1e12+ (documented). The SUM of
# those BIGINT floors is carried in DECIMAL(38,0) (r13): at sf0.1
# brown_forsythe's three cent-scale terms are ~8e18 each, and their
# long sum overflowed — the DuckDB oracle always summed in HUGEINT,
# so widening Spark's container changes no value anywhere.
_Q = 1


@register(
    "anova_f_revenue_nations",
    f"""
    WITH vals AS MATERIALIZED (
      SELECT n.n_name AS g,
             CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
               // 100 AS x
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    ), grp AS MATERIALIZED (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(x) AS BIGINT) AS s_g,
             SUM(x::HUGEINT * x) AS q_g
      FROM vals GROUP BY 1
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS g,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS BIGINT) AS s,
             SUM(q_g) AS q,
             SUM((s_g::HUGEINT * s_g) // n_g) AS bq
      FROM grp
    )
    SELECT g AS n_groups, n AS n_rows,
           CASE WHEN g > 1 AND n > g
                 AND (q::HUGEINT - bq) > 0
           THEN CAST(floor(
             (CAST(bq AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE))
             / (CAST(g AS DOUBLE) - 1e0)
             / ((CAST(q AS DOUBLE) - CAST(bq AS DOUBLE))
                / (CAST(n AS DOUBLE) - CAST(g AS DOUBLE)))
             * 1000e0) AS BIGINT) END AS f_milli
    FROM agg
    """,
)
def anova_f_revenue_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F for order value across nations (Fisher 1925):
    the PARAMETRIC companion the k-sample suite lacked —
    ``kruskal_wallis_status_priority`` is the rank version,
    ``mood_dispersion`` the scale version; F tests mean differences
    directly. F = (SSB/(g−1)) / (SSW/(N−g)) with
    SSB = Σ S_g²/n_g − S²/N and SSW = Q − Σ S_g²/n_g.

    Exactness: whole-dollar values; per-group sums exact; the shared
    between-term Σ S_g²/n_g is quantized per group (module recipe);
    the F ratio is one fixed double-floor expression over those
    integers. Degenerate inputs (one group, zero within-variance)
    emit NULL.

    Scale shape: one equi-keyed orders x customer x nation join, one
    grouped aggregation onto 25 rows, scalar algebra."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    vals = (
        o.join(
            c.select("c_custkey", "c_nationkey"),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .selectExpr(
            "n_name AS g",
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
            " div 100 AS x",
        )
    )
    grp = vals.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("x").cast("bigint").alias("s_g"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("q_g"),
    )
    agg = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("g"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum(
            F.expr(
                "CAST((CAST(s_g AS DECIMAL(38,0)) * s_g) div n_g"
                " AS DECIMAL(38,0))"
            )
        ).alias("bq"),
    )
    return agg.selectExpr(
        "g AS n_groups",
        "n AS n_rows",
        f"CASE WHEN g > 1 AND n > g"
        f" AND (CAST(q AS DECIMAL(38,0)) - bq) > 0"
        " THEN CAST(floor("
        " (CAST(bq AS DOUBLE)"
        "  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
        "    / CAST(n AS DOUBLE))"
        " / (CAST(g AS DOUBLE) - 1e0)"
        " / ((CAST(q AS DOUBLE) - CAST(bq AS DOUBLE))"
        "    / (CAST(n AS DOUBLE) - CAST(g AS DOUBLE)))"
        " * 1000e0) AS BIGINT) END AS f_milli",
    )


@register(
    "brown_forsythe_status",
    f"""
    WITH vals AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v
      FROM orders
    ), ranked AS MATERIALIZED (
      SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v) AS rk,
             COUNT(*) OVER (PARTITION BY g) AS cnt
      FROM vals
    ), med AS MATERIALIZED (
      SELECT g, v AS med FROM ranked WHERE rk = (cnt + 1) // 2
    ), z AS MATERIALIZED (
      SELECT vals.g, abs(vals.v - med.med) AS z
      FROM vals JOIN med ON vals.g = med.g
    ), grp AS MATERIALIZED (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(z) AS BIGINT) AS s_g,
             SUM(z::HUGEINT * z) AS q_g
      FROM z GROUP BY 1
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS g,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS BIGINT) AS s,
             SUM(q_g) AS q,
             SUM((s_g::HUGEINT * s_g) // n_g) AS bq
      FROM grp
    )
    SELECT g AS n_groups, n AS n_rows,
           CASE WHEN g > 1 AND n > g
                 AND (q::HUGEINT - bq) > 0
           THEN CAST(floor(
             (CAST(bq AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE))
             / (CAST(g AS DOUBLE) - 1e0)
             / ((CAST(q AS DOUBLE) - CAST(bq AS DOUBLE))
                / (CAST(n AS DOUBLE) - CAST(g AS DOUBLE)))
             * 1000e0) AS BIGINT) END AS bf_milli
    FROM agg
    """,
)
def brown_forsythe_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (JASA 1974 — Levene's
    test with the MEDIAN center, the robust default): a one-way ANOVA
    F on the absolute deviations from each group's median — "do the
    order-value SPREADS differ across statuses?", the assumption gate
    in front of ``anova_f_revenue_nations`` and the parametric
    companion to rank-based ``mood_dispersion_urgency``/``cucconi``.

    Exactness: group medians are deterministic low-median order
    statistics (exact cents); deviations are exact integers; then the
    module's quantized ANOVA recipe. The oracle's per-row PARTITION
    BY window is the sf0.01 shortcut — Spark rides the
    grouped_running_totals tier recipe for the medians.

    Scale shape: one tier pass for medians, one deviation scan, one
    grouped aggregation onto ≤3 rows."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_running_totals,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    vals = o.selectExpr(
        "o_orderstatus AS g",
        "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v",
    ).localCheckpoint(eager=True)  # feeds the tier pass AND deviations
    tiers = vals.groupBy("g", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # r13: per-group totals ride the recipe's with_totals side table
    # (max inclusive prefix == Σcnt), so the prefix stream has ONE
    # consumer and the old second eager pin is deleted (the r12 KS/AD
    # treatment)
    pre, tot = grouped_running_totals(
        tiers, "g", "v", ["cnt"], with_totals=True
    )
    cum = pre.select(
        "g", "v", (F.col("cnt_before") + F.col("cnt")).alias("cum")
    )
    totals = tot.select("g", F.col("_n_cnt").alias("n"))
    med = (
        cum.join(F.broadcast(totals), "g")
        .groupBy("g")
        .agg(
            F.min(F.expr("CASE WHEN cum >= (n + 1) div 2 THEN v END"))
            .cast("bigint")
            .alias("med")
        )
    )
    z = vals.join(F.broadcast(med), "g").selectExpr(
        "g", "abs(v - med) AS z"
    )
    grp = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("z").cast("bigint").alias("s_g"),
        F.sum(F.expr("CAST(z AS DECIMAL(38,0)) * z")).alias("q_g"),
    )
    agg = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("g"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum(
            F.expr(
                "CAST((CAST(s_g AS DECIMAL(38,0)) * s_g) div n_g"
                " AS DECIMAL(38,0))"
            )
        ).alias("bq"),
    )
    return agg.selectExpr(
        "g AS n_groups",
        "n AS n_rows",
        f"CASE WHEN g > 1 AND n > g"
        f" AND (CAST(q AS DECIMAL(38,0)) - bq) > 0"
        " THEN CAST(floor("
        " (CAST(bq AS DOUBLE)"
        "  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
        "    / CAST(n AS DOUBLE))"
        " / (CAST(g AS DOUBLE) - 1e0)"
        " / ((CAST(q AS DOUBLE) - CAST(bq AS DOUBLE))"
        "    / (CAST(n AS DOUBLE) - CAST(g AS DOUBLE)))"
        " * 1000e0) AS BIGINT) END AS bf_milli",
    )


@register(
    "icc1_orders_per_customer",
    f"""
    WITH vals AS MATERIALIZED (
      SELECT o_custkey AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
               // 100 AS x
      FROM orders
    ), grp AS MATERIALIZED (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(x) AS BIGINT) AS s_g,
             SUM(x::HUGEINT * x) AS q_g
      FROM vals GROUP BY 1
      HAVING COUNT(*) >= 2
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS g,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS BIGINT) AS s,
             SUM(q_g) AS q,
             SUM((s_g::HUGEINT * s_g) // n_g) AS bq,
             SUM(n_g::HUGEINT * n_g) AS n2
      FROM grp
    )
    SELECT g AS n_customers, n AS n_orders,
           CASE WHEN g > 1 AND n > g
                 AND (q::HUGEINT - bq) > 0
           THEN CAST(floor((
             (CAST(bq AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE))
             / (CAST(g AS DOUBLE) - 1e0)
             - (CAST(q AS DOUBLE) - CAST(bq AS DOUBLE))
               / (CAST(n AS DOUBLE) - CAST(g AS DOUBLE))
           ) / (
             (CAST(bq AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE))
             / (CAST(g AS DOUBLE) - 1e0)
             + ((CAST(n AS DOUBLE) - CAST(n2 AS DOUBLE) / CAST(n AS DOUBLE))
                / (CAST(g AS DOUBLE) - 1e0) - 1e0)
               * (CAST(q AS DOUBLE) - CAST(bq AS DOUBLE))
               / (CAST(n AS DOUBLE) - CAST(g AS DOUBLE))
           ) * 1000000e0) AS BIGINT) END AS icc1_ppm
    FROM agg
    """,
)
def icc1_orders_per_customer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraclass correlation ICC(1) of order values within customers
    (Fisher's one-way random-effects ICC, unbalanced-design k₀ of
    Searle): how much of order-value variance is BETWEEN customers —
    the clustering-strength number behind every design-effect /
    clustered-standard-error correction, and the continuous
    counterpart to ``krippendorff_alpha_orders`` (agreement of
    categorical "ratings" within a unit vs clustering of amounts
    within a customer). ICC = (MSB − MSW)/(MSB + (k₀−1)·MSW),
    k₀ = (N − Σn_g²/N)/(g−1).

    Exactness: single-order customers are excluded (no within-
    variance evidence); per-group exact sums + the module's quantized
    between-term; one fixed double-floor expression. Negative ICC
    (within > between) is emitted honestly.

    Scale shape: one grouped aggregation over orders (high-
    cardinality group key — the quantized between-term SUMS as
    BIGINT, so no per-group rows survive the reduce), scalar algebra."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    vals = o.selectExpr(
        "o_custkey AS g",
        "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        " div 100 AS x",
    )
    grp = (
        vals.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum("x").cast("bigint").alias("s_g"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("q_g"),
        )
        .filter(F.col("n_g") >= 2)
    )
    agg = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("g"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum(
            F.expr(
                "CAST((CAST(s_g AS DECIMAL(38,0)) * s_g) div n_g"
                " AS DECIMAL(38,0))"
            )
        ).alias("bq"),
        F.sum(F.expr("CAST(n_g AS DECIMAL(38,0)) * n_g")).alias("n2"),
    )
    msb = (
        "(CAST(bq AS DOUBLE)"
        " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
        "   / CAST(n AS DOUBLE))"
        " / (CAST(g AS DOUBLE) - 1e0)"
    )
    msw = (
        "(CAST(q AS DOUBLE) - CAST(bq AS DOUBLE))"
        " / (CAST(n AS DOUBLE) - CAST(g AS DOUBLE))"
    )
    k0m1 = (
        "((CAST(n AS DOUBLE) - CAST(n2 AS DOUBLE) / CAST(n AS DOUBLE))"
        " / (CAST(g AS DOUBLE) - 1e0) - 1e0)"
    )
    return agg.selectExpr(
        "g AS n_customers",
        "n AS n_orders",
        f"CASE WHEN g > 1 AND n > g"
        f" AND (CAST(q AS DECIMAL(38,0)) - bq) > 0"
        f" THEN CAST(floor(({msb} - {msw})"
        f" / ({msb} + {k0m1} * {msw}) * 1000000e0) AS BIGINT)"
        " END AS icc1_ppm",
    )
