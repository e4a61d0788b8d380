"""Round 10, wave 12: statistical process control — p-chart,
process capability, Benford second digit."""

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
# Round 10, wave 12: p-chart, Cp/Cpk, Benford second digit
# =====================================================================

@register(
    "p_chart_monthly_returns",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', l_shipdate) AS month,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(count_if(l_returnflag = 'R') AS BIGINT) AS r
      FROM lineitem GROUP BY 1
    ), pooled AS MATERIALIZED (
      SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(r) AS BIGINT) AS tr
      FROM monthly
    )
    SELECT month, n, r,
           CASE WHEN n > 0 THEN CAST((r * 1000000) // n AS BIGINT)
             END AS p_ppm,
           CASE WHEN n > 0 AND tr > 0 AND tr < tn THEN CAST(floor(
             (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
              - CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))
             / sqrt(CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE)
                    * (1e0 - CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))
                    / CAST(n AS DOUBLE))
             * 1000e0) AS BIGINT) END AS z_milli,
           CASE WHEN n > 0 AND tr > 0 AND tr < tn THEN
             CAST(floor(
               (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
                - CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))
               / sqrt(CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE)
                      * (1e0 - CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))
                      / CAST(n AS DOUBLE))
               * 1000e0) AS BIGINT) > 3000
             OR
             CAST(floor(
               (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
                - CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))
               / sqrt(CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE)
                      * (1e0 - CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))
                      / CAST(n AS DOUBLE))
               * 1000e0) AS BIGINT) < -3000
           END AS out_of_control
    FROM monthly, pooled
    ORDER BY month
    """,
)
def p_chart_monthly_returns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart p-chart of the monthly return PROPORTION (the
    attributes control chart, Montgomery SQC ch. 7): per ship-month
    the fraction of returned lineitems against 3-sigma binomial
    limits around the pooled rate p̄ — the SPC view that separates
    common-cause wobble from special-cause months, complementing
    ``moving_zscore_anomalies`` (value charts) and
    ``cusum_changepoint_revenue`` (cumulative shifts).

    Determinism: n/r are exact integers; p_ppm is one truncating
    division; the z-score evaluates in the fixed double-floor class
    and the out-of-control FLAG derives from the already-floored
    integer z (|z_milli| > 3000 — the documented quantized rule, so
    the boolean can never sit on a float boundary).

    Scale shape: one conditional month aggregation; the pooled rate
    broadcasts back over the bounded month table."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    monthly = (
        li.groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("month"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_if(F.col("l_returnflag") == "R").cast("bigint").alias("r"),
        )
        .localCheckpoint(eager=True)  # bounded; feeds pooled + output
    )
    pooled = monthly.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("r").cast("bigint").alias("tr"),
    )
    zexpr = (
        "CAST(floor((CAST(r AS DOUBLE) / CAST(n AS DOUBLE)"
        " - CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))"
        " / sqrt(CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE)"
        "        * (1e0 - CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))"
        "        / CAST(n AS DOUBLE)) * 1000e0) AS BIGINT)"
    )
    return (
        monthly.crossJoin(F.broadcast(pooled))
        .selectExpr(
            "month",
            "n",
            "r",
            "CASE WHEN n > 0 THEN CAST((r * 1000000) div n AS BIGINT)"
            " END AS p_ppm",
            f"CASE WHEN n > 0 AND tr > 0 AND tr < tn THEN {zexpr}"
            " END AS z_milli",
            f"CASE WHEN n > 0 AND tr > 0 AND tr < tn THEN"
            f" {zexpr} > 3000 OR {zexpr} < -3000"
            " END AS out_of_control",
        )
        .orderBy("month")
    )


@register(
    "process_capability_quantity",
    """
    WITH s AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             SUM(CAST(l_quantity AS BIGINT)::HUGEINT
                 * CAST(l_quantity AS BIGINT)) AS sx2
      FROM lineitem
    )
    SELECT n,
           CASE WHEN n > 0 THEN CAST((sx * 1000) // n AS BIGINT)
             END AS mean_milli,
           CASE WHEN n > 1 AND (n::HUGEINT * sx2 - sx::HUGEINT * sx) > 0
           THEN CAST(floor(
             (50e0 - 1e0)
             / (6e0 * sqrt(CAST(n::HUGEINT * sx2 - sx::HUGEINT * sx
                                AS DOUBLE)
                           / CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1e0)))
             * 1000e0) AS BIGINT) END AS cp_milli,
           CASE WHEN n > 1 AND (n::HUGEINT * sx2 - sx::HUGEINT * sx) > 0
           THEN CAST(floor(
             least(50e0 - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE),
                   CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - 1e0)
             / (3e0 * sqrt(CAST(n::HUGEINT * sx2 - sx::HUGEINT * sx
                                AS DOUBLE)
                           / CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1e0)))
             * 1000e0) AS BIGINT) END AS cpk_milli
    FROM s
    """,
)
def process_capability_quantity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process capability indices Cp / Cpk (AIAG SPC; Montgomery
    ch. 8) for order-line quantity against its design specification
    limits LSL = 1, USL = 50 (the TPC-H generator's domain — a
    process exactly filling its spec window scores Cp ≈ spec/6σ):
    Cp = (USL−LSL)/6σ measures spread, Cpk = min(USL−μ, μ−LSL)/3σ
    punishes off-center processes — the one-number summaries SPC
    dashboards pair with the control charts.

    Determinism: one pass of exact integer sums (n, Σx, Σx²); μ, the
    sample σ (n·Σx²−(Σx)² over n(n−1)) and both indices evaluate in
    fixed IEEE double expressions (double-floor class); mean_milli is
    an exact truncating division.

    Scale shape: a single data-sized aggregation, nothing else."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sx"),
        F.sum(
            F.expr(
                "CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))"
                " * CAST(l_quantity AS BIGINT)"
            )
        ).alias("sx2"),
    )
    var_core = (
        "CAST(CAST(n AS DECIMAL(38,0)) * sx2"
        " - CAST(sx AS DECIMAL(38,0)) * sx AS DECIMAL(38,0))"
    )
    sigma = (
        f"sqrt(CAST({var_core} AS DOUBLE)"
        " / CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1e0))"
    )
    return s.selectExpr(
        "n",
        "CASE WHEN n > 0 THEN CAST((sx * 1000) div n AS BIGINT)"
        " END AS mean_milli",
        f"CASE WHEN n > 1 AND {var_core} > 0 THEN CAST(floor("
        f" (50e0 - 1e0) / (6e0 * {sigma}) * 1000e0) AS BIGINT)"
        " END AS cp_milli",
        f"CASE WHEN n > 1 AND {var_core} > 0 THEN CAST(floor("
        " least(50e0 - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE),"
        "       CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - 1e0)"
        f" / (3e0 * {sigma}) * 1000e0) AS BIGINT) END AS cpk_milli",
    )


@register(
    "benford_second_digit_audit",
    """
    WITH base AS (
      SELECT l_returnflag AS grp,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ), obs AS (
      SELECT grp, CAST(substr(CAST(cents AS VARCHAR), 2, 1) AS INTEGER)
               AS digit,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM base WHERE cents >= 10 GROUP BY 1, 2
    ), tot AS (
      SELECT grp, CAST(SUM(obs) AS BIGINT) AS n FROM obs GROUP BY grp
    ), cells AS (
      SELECT grp, n, CAST(d AS INTEGER) AS digit
      FROM tot, (SELECT unnest(generate_series(0, 9)) AS d)
    ), expd AS (
      SELECT c.grp, c.digit, CAST(COALESCE(o.obs, 0) AS BIGINT) AS obs, c.n,
             CAST(c.n AS DOUBLE) * ([1.1967926859688073e-1,
               1.138901034075564e-1, 1.0882149900550823e-1,
               1.0432956023095939e-1, 1.0030820226757937e-1,
               9.667723580232243e-2, 9.337473578303615e-2,
               9.035198926960332e-2, 8.757005357886138e-2,
               8.499735205769224e-2][c.digit + 1]) AS expected
      FROM cells c LEFT JOIN obs o ON o.grp = c.grp AND o.digit = c.digit
    )
    SELECT grp AS l_returnflag, digit, obs, n, expected,
           (CAST(obs AS DOUBLE) - expected) * (CAST(obs AS DOUBLE) - expected)
             / expected AS chi2_contrib
    FROM expd
    """,
)
def benford_second_digit_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford SECOND-digit audit (operators/quality.py
    benford_second_digit_report — Nigrini's forensic battery):
    fabricated or psychologically-anchored amounts (x9.99 price
    points) often pass the first-digit screen and fail the second;
    per (returnflag, digit 0..9) observed vs n·P₂(d) with chi-square
    contributions, every cell emitted. Same e-notation-literal
    probability contract as ``benford_digit_audit`` (no libm runs
    anywhere); the digit is a string op on exact integer cents."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        benford_second_digit_report,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return benford_second_digit_report(li, "l_returnflag", "l_extendedprice")
