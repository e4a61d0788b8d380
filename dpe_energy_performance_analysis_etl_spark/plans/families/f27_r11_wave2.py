"""Round 11, wave 2: distribution-distance + concentration suite —
Bhattacharyya coefficient, Hellinger distance, total-variation
distance, chi-square homogeneity, CR4 concentration ratio, pairwise
Dice/overlap vocabulary similarity.

Shared exactness recipe: the compared distributions live on FIXED
small domains (3 statuses, 5 priorities, 25 nations/brands, 20
sources), so every per-category mass is an exact integer count and
cross-engine float parity reduces to (a) fixed-WRITTEN-ORDER sqrt
sums over pivoted wide rows (sqrt is IEEE correctly-rounded; the sum
order is the expression order, not shuffle order), (b) per-category
quantized integer terms summed exactly (the f25 contract), or (c) a
single floored double ratio of exact integers.
"""

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

_SPLIT = "1996-01-01 00:00:00"


@register(
    "bhattacharyya_status_halves",
    f"""
    WITH counts AS MATERIALIZED (
      SELECT
        CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_SPLIT}'
                       AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a_f,
        CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_SPLIT}'
                       AND o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS a_o,
        CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_SPLIT}'
                       AND o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS a_p,
        CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_SPLIT}'
                       AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS b_f,
        CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_SPLIT}'
                       AND o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS b_o,
        CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_SPLIT}'
                       AND o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS b_p
      FROM orders
    )
    SELECT a_f + a_o + a_p AS n_early, b_f + b_o + b_p AS n_late,
           CAST(floor(1e6 * (
             sqrt(CAST(a_f AS DOUBLE) / (a_f + a_o + a_p)
                  * CAST(b_f AS DOUBLE) / (b_f + b_o + b_p))
             + sqrt(CAST(a_o AS DOUBLE) / (a_f + a_o + a_p)
                    * CAST(b_o AS DOUBLE) / (b_f + b_o + b_p))
             + sqrt(CAST(a_p AS DOUBLE) / (a_f + a_o + a_p)
                    * CAST(b_p AS DOUBLE) / (b_f + b_o + b_p))
           )) AS BIGINT) AS bc_ppm
    FROM counts
    """,
)
def bhattacharyya_status_halves_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bhattacharyya coefficient between the order-status mix of the
    early and late halves of the order history (Bhattacharyya 1943):
    BC = SUM_i sqrt(p_i q_i) — the geometric-mean overlap a drift
    monitor reads (1 = identical mixes). The status domain is FIXED
    (F/O/P), so the sum is a 3-term fixed-written-order expression
    over one wide count row — no shuffle-order double sum, no log
    (the KL sibling is deliberately out: libm). Floored ppm."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    counts = o.agg(
        *[
            F.sum(
                F.when(
                    (F.col("o_orderdate") < F.lit(_SPLIT).cast("timestamp"))
                    if half == "a"
                    else (F.col("o_orderdate") >= F.lit(_SPLIT).cast("timestamp")),
                    F.when(F.col("o_orderstatus") == st, 1).otherwise(0),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(f"{half}_{st.lower()}")
            for half in ("a", "b")
            for st in ("F", "O", "P")
        ]
    )
    return counts.selectExpr(
        "a_f + a_o + a_p AS n_early",
        "b_f + b_o + b_p AS n_late",
        "CAST(floor(1e6 * ("
        " sqrt(CAST(a_f AS DOUBLE) / (a_f + a_o + a_p)"
        "      * CAST(b_f AS DOUBLE) / (b_f + b_o + b_p))"
        " + sqrt(CAST(a_o AS DOUBLE) / (a_f + a_o + a_p)"
        "        * CAST(b_o AS DOUBLE) / (b_f + b_o + b_p))"
        " + sqrt(CAST(a_p AS DOUBLE) / (a_f + a_o + a_p)"
        "        * CAST(b_p AS DOUBLE) / (b_f + b_o + b_p))"
        ")) AS BIGINT) AS bc_ppm",
    )


@register(
    "hellinger_priority_halves",
    f"""
    WITH cells AS MATERIALIZED (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pr,
             CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_SPLIT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_SPLIT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM orders GROUP BY 1
    ), wide AS MATERIALIZED (
      SELECT
        MAX(CASE WHEN pr = 1 THEN c1 ELSE 0 END) AS a1,
        MAX(CASE WHEN pr = 2 THEN c1 ELSE 0 END) AS a2,
        MAX(CASE WHEN pr = 3 THEN c1 ELSE 0 END) AS a3,
        MAX(CASE WHEN pr = 4 THEN c1 ELSE 0 END) AS a4,
        MAX(CASE WHEN pr = 5 THEN c1 ELSE 0 END) AS a5,
        MAX(CASE WHEN pr = 1 THEN c2 ELSE 0 END) AS b1,
        MAX(CASE WHEN pr = 2 THEN c2 ELSE 0 END) AS b2,
        MAX(CASE WHEN pr = 3 THEN c2 ELSE 0 END) AS b3,
        MAX(CASE WHEN pr = 4 THEN c2 ELSE 0 END) AS b4,
        MAX(CASE WHEN pr = 5 THEN c2 ELSE 0 END) AS b5,
        CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM cells
    )
    SELECT n1 AS n_early, n2 AS n_late,
           CAST(floor(1e6 * sqrt(1e0 - (
             sqrt(CAST(a1 AS DOUBLE) / n1 * CAST(b1 AS DOUBLE) / n2)
             + sqrt(CAST(a2 AS DOUBLE) / n1 * CAST(b2 AS DOUBLE) / n2)
             + sqrt(CAST(a3 AS DOUBLE) / n1 * CAST(b3 AS DOUBLE) / n2)
             + sqrt(CAST(a4 AS DOUBLE) / n1 * CAST(b4 AS DOUBLE) / n2)
             + sqrt(CAST(a5 AS DOUBLE) / n1 * CAST(b5 AS DOUBLE) / n2)
           ))) AS BIGINT) AS hellinger_ppm
    FROM wide
    """,
)
def hellinger_priority_halves_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger distance between the priority mix of the early and
    late order halves: H = sqrt(1 - BC) — the bounded-metric (0..1)
    drift distance with a true triangle inequality, over the FIXED
    5-priority domain. One grouped count onto 5 cells, one wide
    pivot, one fixed-written-order 5-term sqrt sum (no shuffle-order
    doubles). Floored ppm."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cells = (
        o.selectExpr(
            "CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pr",
            f"CASE WHEN o_orderdate < TIMESTAMP '{_SPLIT}' THEN 1 ELSE 0 END AS e",
        )
        .groupBy("pr")
        .agg(
            F.sum("e").cast("bigint").alias("c1"),
            F.sum(F.expr("1 - e")).cast("bigint").alias("c2"),
        )
    )
    wide = cells.agg(
        *[
            F.max(F.when(F.col("pr") == i, F.col(c)).otherwise(0))
            .cast("bigint")
            .alias(f"{'a' if c == 'c1' else 'b'}{i}")
            for c in ("c1", "c2")
            for i in range(1, 6)
        ],
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    return wide.selectExpr(
        "n1 AS n_early",
        "n2 AS n_late",
        "CAST(floor(1e6 * sqrt(1e0 - ("
        " sqrt(CAST(a1 AS DOUBLE) / n1 * CAST(b1 AS DOUBLE) / n2)"
        " + sqrt(CAST(a2 AS DOUBLE) / n1 * CAST(b2 AS DOUBLE) / n2)"
        " + sqrt(CAST(a3 AS DOUBLE) / n1 * CAST(b3 AS DOUBLE) / n2)"
        " + sqrt(CAST(a4 AS DOUBLE) / n1 * CAST(b4 AS DOUBLE) / n2)"
        " + sqrt(CAST(a5 AS DOUBLE) / n1 * CAST(b5 AS DOUBLE) / n2)"
        "))) AS BIGINT) AS hellinger_ppm",
    )


@register(
    "tv_distance_nation_halves",
    f"""
    WITH cells AS MATERIALIZED (
      SELECT c.c_nationkey AS nk,
             CAST(SUM(CASE WHEN o.o_orderdate < TIMESTAMP '{_SPLIT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{_SPLIT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ), agg AS MATERIALIZED (
      SELECT SUM(abs(c1::HUGEINT * (SELECT SUM(c2) FROM cells)
                     - c2::HUGEINT * (SELECT SUM(c1) FROM cells))) AS s,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2
      FROM cells
    )
    SELECT n1 AS n_early, n2 AS n_late,
           CAST(floor(1e6 * CAST(s AS DOUBLE)
             / (2e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
             AS BIGINT) AS tv_ppm
    FROM agg
    """,
)
def tv_distance_nation_halves_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between the customer-nation mix of
    the early and late order halves: TV = (1/2) SUM_i |p_i - q_i| —
    the worst-case-event drift bound. Fully integer until the last
    step: per-nation |c1_i * N2 - c2_i * N1| sums exactly in
    DECIMAL(38,0)/HUGEINT (order-independent), one floored double
    ratio by 2 N1 N2. One orders x customer equi-join, 25 cells."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cells = (
        o.join(c.select("c_custkey", "c_nationkey"), o["o_custkey"] == F.col("c_custkey"))
        .selectExpr(
            "c_nationkey AS nk",
            f"CASE WHEN o_orderdate < TIMESTAMP '{_SPLIT}' THEN 1 ELSE 0 END AS e",
        )
        .groupBy("nk")
        .agg(
            F.sum("e").cast("bigint").alias("c1"),
            F.sum(F.expr("1 - e")).cast("bigint").alias("c2"),
        )
        .cache()  # 25 rows; feeds the totals row and the |d| sum
    )
    tots = cells.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    agg = (
        cells.crossJoin(F.broadcast(tots))
        .agg(
            F.sum(
                F.expr(
                    "abs(CAST(c1 AS DECIMAL(38,0)) * n2"
                    " - CAST(c2 AS DECIMAL(38,0)) * n1)"
                )
            ).alias("s"),
            F.max("n1").cast("bigint").alias("n1"),
            F.max("n2").cast("bigint").alias("n2"),
        )
    )
    return agg.selectExpr(
        "n1 AS n_early",
        "n2 AS n_late",
        "CAST(floor(1e6 * CAST(s AS DOUBLE)"
        " / (2e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))"
        " AS BIGINT) AS tv_ppm",
    )


@register(
    "chisq_homogeneity_priority_halves",
    f"""
    WITH cells AS MATERIALIZED (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pr,
             CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_SPLIT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_SPLIT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM orders GROUP BY 1
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM cells
    ), terms AS MATERIALIZED (
      SELECT pr,
        ((c1::HUGEINT * t.n2 - c2::HUGEINT * t.n1)
         * (c1::HUGEINT * t.n2 - c2::HUGEINT * t.n1) * 1000000)
        // (t.n1::HUGEINT * t.n2 * (c1 + c2)) AS term_micro
      FROM cells, tot t
    )
    SELECT (SELECT n1 FROM tot) AS n_early, (SELECT n2 FROM tot) AS n_late,
           CAST(COUNT(*) - 1 AS BIGINT) AS dof,
           CAST(SUM(term_micro) AS BIGINT) AS chi2_micro
    FROM terms
    """,
)
def chisq_homogeneity_priority_halves_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chi-square homogeneity of the priority mix across the early
    and late order halves (Pearson 1900, 2 x k form): via the exact
    identity chi^2 = SUM_i d_i^2 / (N1 N2 r_i) with d_i = c1_i N2 -
    c2_i N1 — every term a NONNEGATIVE integer ratio, floored at
    micro scale per category and summed exactly (the f25 quantized-
    sum contract; floor == truncate for nonnegative operands, so
    Spark div and DuckDB // agree). No expected-count doubles at
    all."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cells = (
        o.selectExpr(
            "CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pr",
            f"CASE WHEN o_orderdate < TIMESTAMP '{_SPLIT}' THEN 1 ELSE 0 END AS e",
        )
        .groupBy("pr")
        .agg(
            F.sum("e").cast("bigint").alias("c1"),
            F.sum(F.expr("1 - e")).cast("bigint").alias("c2"),
        )
        .cache()  # 5 rows; feeds totals + terms
    )
    tot = cells.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    terms = cells.crossJoin(F.broadcast(tot)).selectExpr(
        "pr",
        "n1",
        "n2",
        "((CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1)"
        " * (CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1)"
        " * 1000000)"
        " div (CAST(n1 AS DECIMAL(38,0)) * n2 * (c1 + c2)) AS term_micro",
    )
    return terms.agg(
        F.max("n1").alias("n_early"),
        F.max("n2").alias("n_late"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("dof"),
        F.sum("term_micro").cast("bigint").alias("chi2_micro"),
    )


@register(
    "cr4_brand_concentration",
    """
    WITH per AS MATERIALIZED (
      SELECT p.p_brand AS brand,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ), top4 AS MATERIALIZED (
      SELECT CAST(SUM(cents) AS BIGINT) AS top_cents,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM (SELECT cents FROM per ORDER BY cents DESC, brand LIMIT 4)
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(cents) AS BIGINT) AS total_cents,
             CAST(COUNT(*) AS BIGINT) AS n_brands
      FROM per
    )
    SELECT t4.k AS k, t.n_brands AS n_brands,
           t4.top_cents AS top4_cents, t.total_cents AS total_cents,
           CAST(floor(1e6 * CAST(t4.top_cents AS DOUBLE)
                      / CAST(t.total_cents AS DOUBLE)) AS BIGINT) AS cr4_ppm
    FROM top4 t4, tot t
    """,
)
def cr4_brand_concentration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CR4 concentration ratio of brand revenue (the antitrust
    shortlist statistic; ``concentration_supplier_nations`` carries
    the HHI sibling): top-4 brand share of total line revenue. The
    top-4 comes from ``take_ordered_ranked`` — TakeOrderedAndProject
    per-partition heaps, the r11 scale-safe top-k spelling — so the
    recipe survives a brand domain that outgrows its current 25
    values. Exact cents; one floored ppm ratio."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        take_ordered_ranked,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    per = (
        li.join(p.select("p_partkey", "p_brand"), li["l_partkey"] == F.col("p_partkey"))
        .selectExpr(
            "p_brand AS brand",
            "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS c",
        )
        .groupBy("brand")
        .agg(F.sum("c").cast("bigint").alias("cents"))
        .cache()  # 25 rows; feeds top-4 and the total
    )
    top4 = take_ordered_ranked(
        per, [F.col("cents").desc(), F.col("brand").asc()], 4
    ).agg(
        F.sum("cents").cast("bigint").alias("top_cents"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    tot = per.agg(
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
    )
    return top4.crossJoin(F.broadcast(tot)).selectExpr(
        "k",
        "n_brands",
        "top_cents AS top4_cents",
        "total_cents",
        "CAST(floor(1e6 * CAST(top_cents AS DOUBLE)"
        " / CAST(total_cents AS DOUBLE)) AS BIGINT) AS cr4_ppm",
    )


@register(
    "dice_overlap_source_vocab",
    """
    WITH vocab AS MATERIALIZED (
      SELECT DISTINCT source, w FROM (
        SELECT source,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents
      )
    ), sizes AS MATERIALIZED (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS sz FROM vocab GROUP BY 1
    ), inter AS MATERIALIZED (
      SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS i
      FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.s1, i.s2, za.sz AS n1, zb.sz AS n2, i.i AS n_common,
           CAST(floor(1e6 * 2e0 * CAST(i.i AS DOUBLE)
                      / (za.sz + zb.sz)) AS BIGINT) AS dice_ppm,
           CAST(floor(1e6 * CAST(i.i AS DOUBLE)
                      / least(za.sz, zb.sz)) AS BIGINT) AS overlap_ppm
    FROM inter i
    JOIN sizes za ON za.source = i.s1
    JOIN sizes zb ON zb.source = i.s2
    ORDER BY s1, s2
    """,
)
def dice_overlap_source_vocab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Sorensen-Dice and overlap (Szymkiewicz-Simpson)
    coefficients between per-source vocabularies — the set-similarity
    siblings of ``kmv_source_overlap``'s Jaccard (Dice weights the
    intersection double; overlap normalizes by the SMALLER set, the
    containment signal). Candidate generation is the equi-keyed join
    on the term — posting-list style, never source x source x vocab —
    and the source domain bounds the output at pairs(20) = 190 rows.
    Exact integer set sizes; two floored ppm ratios."""
    from dpe_energy_performance_analysis_etl_spark.plans._core import read_documents
    from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr

    docs = read_documents(spark, sf_dir)
    vocab = (
        docs.select("source", F.explode(tokens_expr("text")).alias("w"))
        .distinct()
        .cache()  # source x term; feeds sizes and the pair join
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    a = vocab.select(F.col("source").alias("s1"), "w")
    b = vocab.select(F.col("source").alias("s2"), "w")
    inter = (
        a.join(b, "w")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    za = sizes.select(F.col("source").alias("s1"), F.col("sz").alias("n1"))
    zb = sizes.select(F.col("source").alias("s2"), F.col("sz").alias("n2"))
    return (
        inter.join(F.broadcast(za), "s1")
        .join(F.broadcast(zb), "s2")
        .selectExpr(
            "s1",
            "s2",
            "n1",
            "n2",
            "i AS n_common",
            "CAST(floor(1e6 * 2e0 * CAST(i AS DOUBLE) / (n1 + n2)) AS BIGINT)"
            " AS dice_ppm",
            "CAST(floor(1e6 * CAST(i AS DOUBLE) / least(n1, n2)) AS BIGINT)"
            " AS overlap_ppm",
        )
        .orderBy("s1", "s2")
    )
