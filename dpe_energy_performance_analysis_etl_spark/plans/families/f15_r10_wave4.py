"""Round 10, wave 4: two-sample Hodges-Lehmann shift, KPSS level
stationarity, ranking average precision."""

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
# Round 10, wave 4: HL shift, KPSS, average precision
# =====================================================================

@register(
    "hl_shift_monthly",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT rev, CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS t,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM monthly
    ), halves AS MATERIALIZED (
      SELECT rev, CASE WHEN t <= (n + 1) // 2 THEN 0 ELSE 1 END AS h, t
      FROM idx
    ), pairs AS MATERIALIZED (
      SELECT b.rev - a.rev AS d, a.t AS ta, b.t AS tb
      FROM halves a JOIN halves b ON a.h = 0 AND b.h = 1
    ), ranked AS MATERIALIZED (
      SELECT d, row_number() OVER (ORDER BY d, ta, tb) AS rk,
             COUNT(*) OVER () AS np
      FROM pairs
    )
    SELECT CAST((SELECT count_if(h = 0) FROM halves) AS BIGINT) AS n_first,
           CAST((SELECT count_if(h = 1) FROM halves) AS BIGINT) AS n_second,
           CAST(np AS BIGINT) AS n_pairs,
           CAST(d AS BIGINT) AS hl_shift_cents
    FROM ranked WHERE rk = (np + 1) // 2
    """,
)
def hl_shift_monthly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Hodges-Lehmann shift estimator (Annals 1963)
    between the first and second halves of the monthly revenue
    series: the median of all pairwise differences rev_late −
    rev_early — the robust "how much did the level move" companion
    to ``hl_pseudomedian_revenue`` (which is the ONE-sample Walsh
    pairwise center). Integer-exact: exact cents, lower median via
    row_number over the bounded ~(n/2)² pair grid with a
    deterministic (d, ta, tb) tie-break.

    Scale shape: one data-sized month aggregation; the pair join and
    ranking run on the bounded month table (≤ ~45x45 pairs)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("rev")
        )
        .localCheckpoint(eager=True)
    )
    idx = monthly.select(
        "rev",
        F.row_number().over(Window.orderBy("month")).cast("bigint").alias("t"),
    ).localCheckpoint(eager=True)
    n_row = idx.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    halves = idx.crossJoin(F.broadcast(n_row)).selectExpr(
        "rev",
        "CASE WHEN t <= (n + 1) div 2 THEN 0 ELSE 1 END AS h",
        "t",
    ).localCheckpoint(eager=True)  # bounded; feeds counts + pair join
    a = halves.filter(F.col("h") == 0).selectExpr("rev AS rev_a", "t AS ta")
    b = halves.filter(F.col("h") == 1).selectExpr("rev AS rev_b", "t AS tb")
    pairs = a.crossJoin(F.broadcast(b)).selectExpr(
        "rev_b - rev_a AS d", "ta", "tb"
    )
    w = Window.orderBy("d", "ta", "tb")
    ranked = pairs.select(
        "d",
        F.row_number().over(w).cast("bigint").alias("rk"),
    )
    np_row = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("np"))
    counts = halves.agg(
        F.count_if(F.col("h") == 0).cast("bigint").alias("n_first"),
        F.count_if(F.col("h") == 1).cast("bigint").alias("n_second"),
    )
    return (
        ranked.crossJoin(F.broadcast(np_row))
        .filter(F.expr("rk = (np + 1) div 2"))
        .crossJoin(F.broadcast(counts))
        .selectExpr(
            "n_first",
            "n_second",
            "np AS n_pairs",
            "CAST(d AS BIGINT) AS hl_shift_cents",
        )
    )


@register(
    "kpss_level_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) // 100 AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT y, CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS t
      FROM monthly
    ), s AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
      FROM idx
    ), e AS MATERIALIZED (
      SELECT t, (s.n::HUGEINT * y - s.sy) AS e FROM idx, s
    ), parts AS MATERIALIZED (
      SELECT SUM(cs * cs) AS ssum FROM (
        SELECT SUM(e) OVER (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        FROM e
      )
    ), gammas AS MATERIALIZED (
      SELECT j, CAST(SUM(a.e * b.e) AS HUGEINT) AS g
      FROM (SELECT unnest([1, 2, 3, 4]) AS j) js
      JOIN e a ON TRUE JOIN e b ON b.t = a.t - js.j
      GROUP BY 1
    ), lrv AS MATERIALIZED (
      SELECT (SELECT 5 * SUM(e.e * e.e) FROM e)
             + 2 * CAST(COALESCE(SUM((5 - j) * g), 0) AS HUGEINT) AS den5
      FROM gammas
    )
    SELECT s.n AS n_months,
           CASE WHEN lrv.den5 > 0 THEN CAST(
             (5 * parts.ssum * 1000000) // (s.n * lrv.den5) AS BIGINT)
           END AS kpss_ppm
    FROM s, parts, lrv
    """,
)
def kpss_level_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic (J. Econometrics 1992) on
    monthly revenue with a Bartlett long-run variance at fixed lag
    l = 4 — the null-reversed companion to the trend diagnostics:
    unit-root tests ask "is there a trend?", KPSS asks "is the level
    STATIONARY?" (big values reject stationarity).

    Exactness: n-scaled centering ẽ_t = n·y_t − Σy (whole-dollar
    months) keeps residuals, partial sums S̃_t, Σẽ², and the lag
    autocovariances γ̃_j exact integers; multiplying the Bartlett
    weights (1 − j/(l+1)) through by l+1 = 5 clears every fraction:
    KPSS = 5·ΣS̃² / (n·(5·Σẽ² + 2·Σⱼ(5−j)·γ̃ⱼ)) — one truncating
    integer division, ppm-scaled (numerator and the Newey-West
    denominator are non-negative; degenerate zero variance → NULL).

    Scale shape: ONE data-sized month aggregation; partial sums and
    the four lag joins run on the bounded month table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100"
                " AS BIGINT)) div 100 AS BIGINT)"
            ).alias("y")
        )
        .localCheckpoint(eager=True)
    )
    idx = monthly.select(
        "y",
        F.row_number().over(Window.orderBy("month")).cast("bigint").alias("t"),
    ).localCheckpoint(eager=True)
    s = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    e = idx.crossJoin(F.broadcast(s)).selectExpr(
        "t", "CAST(n AS DECIMAL(38,0)) * y - sy AS e", "n"
    ).localCheckpoint(eager=True)  # bounded; feeds ssum + gammas + e2
    cs = e.select(
        F.sum("e")
        .over(
            Window.orderBy("t").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cs")
    )
    parts = cs.agg(F.sum(F.expr("cs * cs")).alias("ssum"))
    e2 = e.agg(F.sum(F.expr("e * e")).alias("se2"))
    js = (
        spark.range(1)
        .select(
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4))).alias(
                "j0"
            )
        )
        .select(F.col("j0").cast("bigint").alias("j"))
    )
    ea = e.alias("a")
    eb = e.alias("b")
    gammas = (
        ea.join(F.broadcast(js), F.expr("true"))
        .join(eb, F.expr("b.t = a.t - j"))
        .selectExpr("j", "a.e * b.e AS p")
        .groupBy("j")
        .agg(F.sum("p").alias("g"))
    )
    lrv = gammas.agg(
        F.coalesce(F.sum(F.expr("(5 - j) * g")), F.lit(0).cast("decimal(38,0)"))
        .alias("wg")
    )
    return (
        s.crossJoin(F.broadcast(parts))
        .crossJoin(F.broadcast(e2))
        .crossJoin(F.broadcast(lrv))
        .selectExpr(
            "n AS n_months",
            "CASE WHEN 5 * se2 + 2 * wg > 0 THEN CAST("
            " (5 * ssum * 1000000) div (n * (5 * se2 + 2 * wg)) AS BIGINT)"
            " END AS kpss_ppm",
        )
    )


@register(
    "average_precision_priority",
    """
    WITH scored AS MATERIALIZED (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             CASE WHEN substr(o_orderpriority, 1, 1) = '1'
                  THEN 1 ELSE 0 END AS rel
      FROM orders
    ), ranked AS MATERIALIZED (
      SELECT rel,
             CAST(row_number() OVER (ORDER BY v DESC, o_orderkey)
                  AS BIGINT) AS k
      FROM scored
    ), relranked AS MATERIALIZED (
      SELECT k,
             CAST(row_number() OVER (ORDER BY k) AS BIGINT) AS r
      FROM ranked WHERE rel = 1
    ), terms AS MATERIALIZED (
      SELECT CAST(SUM((r * 1000000) // k) AS BIGINT) AS ap_sum,
             CAST(COUNT(*) AS BIGINT) AS p
      FROM relranked
    )
    SELECT p AS n_relevant,
           CAST((SELECT COUNT(*) FROM ranked) AS BIGINT) AS n_ranked,
           ap_sum AS ap_qppm_sum,
           CASE WHEN p > 0 THEN CAST(ap_sum // p AS BIGINT) END AS ap_qppm
    FROM terms
    """,
)
def average_precision_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision of the "rank orders by value, call URGENT
    priority relevant" retrieval task — THE ranking-eval summary
    (area under the precision-recall curve in its standard discrete
    form), complementing ``roc_auc_by_priority`` (threshold-free ROC)
    and ``youden_j_threshold`` (single operating point):
    AP = (1/P)·Σ_{relevant at rank k} precision@k, precision@k = r/k
    with r the relevant-only rank.

    QUANTIZED-SUM exactness: each precision term is floored
    independently ((r·10⁶) div k, exact integers) and the BIGINT
    floors are summed — deterministic on both engines; the mean
    divides once more by P (documented quantization ≤ 1e-6/term).

    Scale shape (r13): ONE two-pass repartitionByRange recipe —
    ``global_rank_and_prefix`` under the (value desc, key) total
    order yields the global rank k AND, as the inclusive running
    total of the 0/1 ``rel`` column, each relevant row's
    relevant-only rank r in the SAME pass (r at a relevant row =
    #relevant with k' <= k because k is a total order — exactly what
    the old second ``global_rank_column`` over the relevant subset
    computed, minus its second pin, second range exchange and second
    window); everything after is two scalar aggregates. The oracle's
    global windows are the sf0.01 shortcut."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        global_rank_and_prefix,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    scored = o.select(
        "o_orderkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("v"),
        F.expr(
            "CASE WHEN substr(o_orderpriority, 1, 1) = '1' THEN 1 ELSE 0 END"
        ).alias("rel"),
    ).withColumn("nv", -F.col("v"))
    ranked = global_rank_and_prefix(
        scored, ["nv", "o_orderkey"], "rel", rank_col="k", cum_col="r"
    )
    # ONE scalar aggregate over the ranked stream: conditional sums
    # replace the old relevant-subset branch + separate n_all branch
    # (which re-ran the post-pin window+join a second time) + the
    # crossJoin stitch
    terms = ranked.agg(
        F.sum(F.when(F.col("rel") == 1, F.expr("(r * 1000000) div k")))
        .cast("bigint")
        .alias("ap_sum"),
        F.count_if(F.col("rel") == 1).cast("bigint").alias("p"),
        F.count(F.lit(1)).cast("bigint").alias("n_ranked"),
    )
    return terms.selectExpr(
        "p AS n_relevant",
        "n_ranked",
        "ap_sum AS ap_qppm_sum",
        "CASE WHEN p > 0 THEN CAST(ap_sum div p AS BIGINT) END AS ap_qppm",
    )
