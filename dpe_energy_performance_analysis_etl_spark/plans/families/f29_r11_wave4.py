"""Round 11, wave 4: agreement + binary-classifier metrics — Scott's
pi, Gwet's AC1, Matthews correlation, precision@k / lift@k, Lin's
concordance correlation, odds ratio / relative risk.

Shared exactness recipe: every statistic reduces to a 2x2 (or 2-col
moment) table of EXACT integer counts/sums from one corpus pass; the
final coefficient is a single fixed-form double expression (sqrt
allowed) floored at a declared scale. The two "raters" and the
"classifier" are deterministic rules over the data — the agreement
machinery is what's under test, exactly like the reference's
rule-based quality gates (scripts/transform.py), not a learned
model."""

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

# rater A: priority urgent-or-high; rater B: order value above 200k
_CONF_SQL = """
      SELECT
        CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fa,
        CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fb,
        CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM (
        SELECT CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2')
                    THEN 1 ELSE 0 END AS a,
               CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                             AS BIGINT) >= 20000000 THEN 1 ELSE 0 END AS b
        FROM orders
      )
"""


def _confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    coded = o.selectExpr(
        "CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2')"
        " THEN 1 ELSE 0 END AS a",
        "CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100"
        " AS BIGINT) >= 20000000 THEN 1 ELSE 0 END AS b",
    )
    return coded.agg(
        F.sum(F.expr("CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.expr("CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("fa"),
        F.sum(F.expr("CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("fb"),
        F.sum(F.expr("CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("tn"),
    )


@register(
    "scotts_pi_orders",
    f"""
    WITH conf AS MATERIALIZED ({_CONF_SQL})
    SELECT tp + fa + fb + tn AS n_rows,
           CAST(floor(1e6 * (
             (CAST(tp AS DOUBLE) + tn) / (tp + fa + fb + tn)
             - (
               ((CAST(tp AS DOUBLE) + fa) + (tp + fb))
               / (2e0 * (tp + fa + fb + tn))
               * ((CAST(tp AS DOUBLE) + fa) + (tp + fb))
               / (2e0 * (tp + fa + fb + tn))
               + ((CAST(tn AS DOUBLE) + fb) + (tn + fa))
               / (2e0 * (tp + fa + fb + tn))
               * ((CAST(tn AS DOUBLE) + fb) + (tn + fa))
               / (2e0 * (tp + fa + fb + tn))
             )
           ) / (1e0 - (
               ((CAST(tp AS DOUBLE) + fa) + (tp + fb))
               / (2e0 * (tp + fa + fb + tn))
               * ((CAST(tp AS DOUBLE) + fa) + (tp + fb))
               / (2e0 * (tp + fa + fb + tn))
               + ((CAST(tn AS DOUBLE) + fb) + (tn + fa))
               / (2e0 * (tp + fa + fb + tn))
               * ((CAST(tn AS DOUBLE) + fb) + (tn + fa))
               / (2e0 * (tp + fa + fb + tn))
           ))) AS BIGINT) AS scotts_pi_ppm
    FROM conf
    """,
)
def scotts_pi_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scott's pi between two deterministic order "raters" —
    priority-urgency vs value-threshold (Scott 1955): chance
    agreement uses the POOLED marginal (the joint-proportion
    squared), the single difference from Cohen's kappa
    (``cohens_kappa``'s per-rater marginals overestimate chance when
    raters share a base-rate skew). One 2x2 of exact counts; one
    fixed double expression, floored ppm."""
    conf = _confusion(spark, sf_dir)
    pe = (
        "("
        " ((CAST(tp AS DOUBLE) + fa) + (tp + fb)) / (2e0 * (tp + fa + fb + tn))"
        " * ((CAST(tp AS DOUBLE) + fa) + (tp + fb)) / (2e0 * (tp + fa + fb + tn))"
        " + ((CAST(tn AS DOUBLE) + fb) + (tn + fa)) / (2e0 * (tp + fa + fb + tn))"
        " * ((CAST(tn AS DOUBLE) + fb) + (tn + fa)) / (2e0 * (tp + fa + fb + tn))"
        ")"
    )
    return conf.selectExpr(
        "tp + fa + fb + tn AS n_rows",
        "CAST(floor(1e6 * ("
        " (CAST(tp AS DOUBLE) + tn) / (tp + fa + fb + tn)"
        f" - {pe}"
        f") / (1e0 - {pe})) AS BIGINT) AS scotts_pi_ppm",
    )


@register(
    "gwets_ac1_orders",
    f"""
    WITH conf AS MATERIALIZED ({_CONF_SQL})
    SELECT tp + fa + fb + tn AS n_rows,
           CAST(floor(1e6 * (
             (CAST(tp AS DOUBLE) + tn) / (tp + fa + fb + tn)
             - 2e0 * (((CAST(tp AS DOUBLE) + fa) + (tp + fb))
                      / (2e0 * (tp + fa + fb + tn)))
                   * (1e0 - ((CAST(tp AS DOUBLE) + fa) + (tp + fb))
                      / (2e0 * (tp + fa + fb + tn)))
           ) / (1e0 -
             2e0 * (((CAST(tp AS DOUBLE) + fa) + (tp + fb))
                    / (2e0 * (tp + fa + fb + tn)))
                 * (1e0 - ((CAST(tp AS DOUBLE) + fa) + (tp + fb))
                    / (2e0 * (tp + fa + fb + tn)))
           )) AS BIGINT) AS ac1_ppm
    FROM conf
    """,
)
def gwets_ac1_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 on the same two deterministic raters (Gwet 2008):
    the paradox-resistant agreement coefficient — chance agreement
    2 pi (1 - pi) SHRINKS as the pooled base rate pi leaves 0.5, so
    skewed-prevalence data can't crater the score the way kappa/pi
    do (the kappa paradox). Same 2x2, one fixed double expression,
    floored ppm."""
    conf = _confusion(spark, sf_dir)
    pi = (
        "(((CAST(tp AS DOUBLE) + fa) + (tp + fb))"
        " / (2e0 * (tp + fa + fb + tn)))"
    )
    return conf.selectExpr(
        "tp + fa + fb + tn AS n_rows",
        "CAST(floor(1e6 * ("
        " (CAST(tp AS DOUBLE) + tn) / (tp + fa + fb + tn)"
        f" - 2e0 * {pi} * (1e0 - {pi})"
        f") / (1e0 - 2e0 * {pi} * (1e0 - {pi}))) AS BIGINT) AS ac1_ppm",
    )


@register(
    "mcc_discount_returns",
    """
    WITH conf AS MATERIALIZED (
      SELECT
        CAST(SUM(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(SUM(CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM (
        SELECT CASE WHEN CAST(CAST(l_discount AS DECIMAL(10,2)) * 100
                          AS BIGINT) >= 5 THEN 1 ELSE 0 END AS p,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
      )
    )
    SELECT tp, fp, fn, tn,
           CAST(floor(1e6 *
             (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
             / sqrt((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)
                    * (CAST(tn AS DOUBLE) + fp) * (CAST(tn AS DOUBLE) + fn)))
             AS BIGINT) AS mcc_ppm
    FROM conf
    """,
)
def mcc_discount_returns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient of the deterministic
    "deep-discount predicts return" gate (Matthews 1975): the one
    single-number confusion summary that stays honest under class
    imbalance (accuracy and F1 both saturate; ``youden_j_threshold``
    is its threshold-sweep sibling). Exact 2x2; MCC =
    (TP TN - FP FN)/sqrt(...), one fixed double expression, floored
    ppm."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    conf = li.selectExpr(
        "CASE WHEN CAST(CAST(l_discount AS DECIMAL(10,2)) * 100 AS BIGINT)"
        " >= 5 THEN 1 ELSE 0 END AS p",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y",
    ).agg(
        F.sum(F.expr("CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.expr("CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.expr("CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.expr("CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("tn"),
    )
    return conf.selectExpr(
        "tp",
        "fp",
        "fn",
        "tn",
        "CAST(floor(1e6 *"
        " (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)"
        " / sqrt((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)"
        "        * (CAST(tn AS DOUBLE) + fp) * (CAST(tn AS DOUBLE) + fn)))"
        " AS BIGINT) AS mcc_ppm",
    )


@register(
    "precision_at_k_value",
    """
    WITH topk AS MATERIALIZED (
      SELECT o_orderkey, o_orderpriority
      FROM orders
      ORDER BY CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) DESC,
               o_orderkey
      LIMIT 100
    ), hits AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS rel
      FROM topk
    ), base AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
      FROM orders
    )
    SELECT h.k, h.rel AS hits, b.n_rel AS n_relevant, b.n AS n_rows,
           CAST(floor(1e6 * CAST(h.rel AS DOUBLE) / h.k) AS BIGINT)
             AS precision_ppm,
           CAST(floor(1000e0 * (CAST(h.rel AS DOUBLE) / h.k)
                      / (CAST(b.n_rel AS DOUBLE) / b.n)) AS BIGINT)
             AS lift_milli
    FROM hits h, base b
    """,
)
def precision_at_k_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@100 and lift@100 of ranking orders by value against
    urgent-priority relevance — the top-of-list quality check
    (``average_precision_priority`` integrates the whole list; P@k
    reads one operating point, lift normalizes it by base rate). The
    top-k is ``take_ordered_ranked`` (TakeOrderedAndProject heaps —
    never a global sort). Exact counts; two floored ratios."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        take_ordered_ranked,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    coded = o.selectExpr(
        "o_orderkey",
        "o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS cents",
    )
    topk = take_ordered_ranked(
        coded, [F.col("cents").desc(), F.col("o_orderkey").asc()], 100
    )
    hits = topk.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.expr("CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("rel"),
    )
    base = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_rel"),
    )
    return hits.crossJoin(F.broadcast(base)).selectExpr(
        "k",
        "rel AS hits",
        "n_rel AS n_relevant",
        "n AS n_rows",
        "CAST(floor(1e6 * CAST(rel AS DOUBLE) / k) AS BIGINT) AS precision_ppm",
        "CAST(floor(1000e0 * (CAST(rel AS DOUBLE) / k)"
        " / (CAST(n_rel AS DOUBLE) / n)) AS BIGINT) AS lift_milli",
    )


@register(
    "lins_ccc_order_qty_value",
    """
    WITH per AS MATERIALIZED (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) // 100000 AS BIGINT) AS y
      FROM lineitem GROUP BY 1
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(x::HUGEINT * x) AS qx, SUM(y::HUGEINT * y) AS qy,
             SUM(x::HUGEINT * y) AS sxy
      FROM per
    )
    SELECT n AS n_orders,
           CAST(floor(1e6 *
             2e0 * (CAST(sxy AS DOUBLE) / n
                    - CAST(sx AS DOUBLE) / n * (CAST(sy AS DOUBLE) / n))
             / ((CAST(qx AS DOUBLE) / n
                 - CAST(sx AS DOUBLE) / n * (CAST(sx AS DOUBLE) / n))
                + (CAST(qy AS DOUBLE) / n
                   - CAST(sy AS DOUBLE) / n * (CAST(sy AS DOUBLE) / n))
                + (CAST(sx AS DOUBLE) / n - CAST(sy AS DOUBLE) / n)
                  * (CAST(sx AS DOUBLE) / n - CAST(sy AS DOUBLE) / n)))
             AS BIGINT) AS ccc_ppm
    FROM agg
    """,
)
def lins_ccc_order_qty_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lin's concordance correlation between per-order total quantity
    and value in thousand-dollar units (Lin 1989): penalizes both
    scatter AND location/scale shift from the 45-degree line — the
    method-agreement statistic Pearson r can't be (r ignores bias;
    ``partial_corr_rev_qty_disc`` family measures association only).
    Exact (n, Sx, Sy, Qx, Qy, Sxy) integer moments; one fixed double
    expression, floored ppm."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.expr("CAST(l_quantity AS BIGINT)")).cast("bigint").alias("x"),
            F.expr(
                "CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100"
                " AS BIGINT)) div 100000 AS BIGINT)"
            ).alias("y"),
        )
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("qx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("qy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
    )
    return agg.selectExpr(
        "n AS n_orders",
        "CAST(floor(1e6 *"
        " 2e0 * (CAST(sxy AS DOUBLE) / n"
        "        - CAST(sx AS DOUBLE) / n * (CAST(sy AS DOUBLE) / n))"
        " / ((CAST(qx AS DOUBLE) / n"
        "     - CAST(sx AS DOUBLE) / n * (CAST(sx AS DOUBLE) / n))"
        "    + (CAST(qy AS DOUBLE) / n"
        "       - CAST(sy AS DOUBLE) / n * (CAST(sy AS DOUBLE) / n))"
        "    + (CAST(sx AS DOUBLE) / n - CAST(sy AS DOUBLE) / n)"
        "      * (CAST(sx AS DOUBLE) / n - CAST(sy AS DOUBLE) / n)))"
        " AS BIGINT) AS ccc_ppm",
    )


@register(
    "odds_ratio_discount_returns",
    """
    WITH conf AS MATERIALIZED (
      SELECT
        CAST(SUM(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM (
        SELECT CASE WHEN CAST(CAST(l_discount AS DECIMAL(10,2)) * 100
                          AS BIGINT) >= 5 THEN 1 ELSE 0 END AS p,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
      )
    )
    SELECT a AS exposed_cases, b AS exposed_controls,
           c AS unexposed_cases, d AS unexposed_controls,
           CAST(floor(1000e0 * (CAST(a AS DOUBLE) * d)
                      / (CAST(b AS DOUBLE) * c)) AS BIGINT) AS odds_ratio_milli,
           CAST(floor(1000e0 * (CAST(a AS DOUBLE) / (a + b))
                      / (CAST(c AS DOUBLE) / (c + d))) AS BIGINT)
             AS relative_risk_milli
    FROM conf
    """,
)
def odds_ratio_discount_returns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio and relative risk of return for deep-discounted
    lines (the epidemiology 2x2 pair; ``mantel_haenszel_qty_returns``
    is the stratified version): OR = ad/bc, RR = (a/(a+b))/(c/(c+d)).
    Exact 2x2 counts from one pass; two floored milli ratios."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    conf = li.selectExpr(
        "CASE WHEN CAST(CAST(l_discount AS DECIMAL(10,2)) * 100 AS BIGINT)"
        " >= 5 THEN 1 ELSE 0 END AS p",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y",
    ).agg(
        F.sum(F.expr("CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("a"),
        F.sum(F.expr("CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("b"),
        F.sum(F.expr("CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("c"),
        F.sum(F.expr("CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("d"),
    )
    return conf.selectExpr(
        "a AS exposed_cases",
        "b AS exposed_controls",
        "c AS unexposed_cases",
        "d AS unexposed_controls",
        "CAST(floor(1000e0 * (CAST(a AS DOUBLE) * d)"
        " / (CAST(b AS DOUBLE) * c)) AS BIGINT) AS odds_ratio_milli",
        "CAST(floor(1000e0 * (CAST(a AS DOUBLE) / (a + b))"
        " / (CAST(c AS DOUBLE) / (c + d))) AS BIGINT)"
        " AS relative_risk_milli",
    )
