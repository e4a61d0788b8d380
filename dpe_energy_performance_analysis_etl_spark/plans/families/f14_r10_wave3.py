"""Round 10, wave 3: Quade weighted-rank test, Jelinek-Mercer query
likelihood retrieval, Chow structural-break test."""

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
# Round 10, wave 3: Quade test, JM query likelihood, Chow break
# =====================================================================

@register(
    "quade_test_nations",
    """
    WITH cells AS MATERIALIZED (
      SELECT n.n_name AS block,
             CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS trt,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), ranked AS MATERIALIZED (
      SELECT block, trt,
             CAST(row_number() OVER (PARTITION BY block
                                     ORDER BY rev, trt) AS BIGINT) AS rk,
             CAST(MAX(rev) OVER (PARTITION BY block)
                  - MIN(rev) OVER (PARTITION BY block) AS BIGINT) AS rng
      FROM cells
    ), qrank AS MATERIALIZED (
      SELECT block,
             CAST(row_number() OVER (ORDER BY rng, block) AS BIGINT) AS q
      FROM (SELECT DISTINCT block, rng FROM ranked)
    ), ks AS MATERIALIZED (
      SELECT CAST(MAX(trt) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT block) AS BIGINT) AS b
      FROM ranked
    ), s2 AS MATERIALIZED (
      SELECT ranked.trt,
             CAST(SUM(qrank.q * (2 * ranked.rk - ks.k - 1)) AS BIGINT) AS sj,
             SUM((qrank.q * (2 * ranked.rk - ks.k - 1))::HUGEINT
                 * (qrank.q * (2 * ranked.rk - ks.k - 1))) AS a2j
      FROM ranked JOIN qrank ON ranked.block = qrank.block, ks
      GROUP BY 1
    ), agg AS MATERIALIZED (
      SELECT CAST(SUM(a2j) AS BIGINT) AS a2,
             CAST(SUM(sj::HUGEINT * sj) AS BIGINT) AS bsum
      FROM s2
    )
    SELECT ks.b AS n_blocks, ks.k AS n_treatments, agg.a2 AS a2_sum,
           agg.bsum AS b_sum,
           CASE WHEN ks.b * agg.a2 > agg.bsum THEN CAST(
             ((ks.b - 1)::HUGEINT * agg.bsum * 1000000)
             // (ks.b::HUGEINT * agg.a2 - agg.bsum) AS BIGINT)
           END AS t3_ppm
    FROM agg, ks
    """,
)
def quade_test_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade's weighted-rank test (JASA 1979) on the nation x
    order-priority revenue grid — the two-way test that WEIGHTS each
    block by how much signal it carries (blocks ranked by their
    within-block range), completing the Friedman (any difference?) /
    Page (this ordering?) / Quade (difference, weighted by block
    spread) triple over the same exact-cents cells.

    With doubled centered ranks S̃ᵢⱼ = Qᵢ·(2rᵢⱼ − k − 1) (k = 5 so no
    halves survive), A₂ = ΣS̃², Bs = Σⱼ(ΣᵢS̃ᵢⱼ)², the statistic
    T₃ = (b−1)·Bs / (b·A₂ − Bs) is integer-exact end-to-end
    (Cauchy-Schwarz makes the denominator ≥ 0; identical block
    patterns — denominator 0 — emit NULL). Ranks break cents ties on
    the treatment index; block ranks break range ties on block name.

    Scale shape: one equi-keyed orders x customer x nation join into
    the ≤125-cell grid; every window runs on the bounded grid."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cells = (
        o.join(
            c.select("c_custkey", "c_nationkey"),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("block"),
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("trt"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("rev")
        )
        .localCheckpoint(eager=True)  # bounded grid; feeds 3 branches
    )
    wb = Window.partitionBy("block")
    ranked = cells.select(
        "block",
        "trt",
        F.row_number()
        .over(Window.partitionBy("block").orderBy("rev", "trt"))
        .cast("bigint")
        .alias("rk"),
        (F.max("rev").over(wb) - F.min("rev").over(wb))
        .cast("bigint")
        .alias("rng"),
    ).localCheckpoint(eager=True)
    qrank = (
        ranked.select("block", "rng")
        .distinct()
        .select(
            "block",
            F.row_number()
            .over(Window.orderBy("rng", "block"))
            .cast("bigint")
            .alias("q"),
        )
    )
    ks = ranked.agg(
        F.max("trt").cast("bigint").alias("k"),
        F.countDistinct("block").cast("bigint").alias("b"),
    )
    s2 = (
        ranked.join(qrank, "block")
        .crossJoin(F.broadcast(ks))
        .selectExpr("trt", "q * (2 * rk - k - 1) AS s")
        .groupBy("trt")
        .agg(
            F.sum("s").cast("bigint").alias("sj"),
            F.sum(F.expr("CAST(s AS DECIMAL(38,0)) * s")).alias("a2j"),
        )
    )
    agg = s2.agg(
        F.sum("a2j").cast("bigint").alias("a2"),
        F.sum(F.expr("CAST(sj AS DECIMAL(38,0)) * sj")).cast("bigint").alias(
            "bsum"
        ),
    )
    return agg.crossJoin(F.broadcast(ks)).selectExpr(
        "b AS n_blocks",
        "k AS n_treatments",
        "a2 AS a2_sum",
        "bsum AS b_sum",
        "CASE WHEN b * a2 > bsum THEN CAST("
        " (CAST(b - 1 AS DECIMAL(38,0)) * bsum * 1000000)"
        " div (CAST(b AS DECIMAL(38,0)) * a2 - bsum) AS BIGINT) END AS t3_ppm",
    )


@register(
    "jm_query_likelihood_docs",
    """
    WITH toks AS MATERIALIZED (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ), tf AS MATERIALIZED (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
      FROM toks
    ), corpus AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS c_total,
             CAST(count_if(term = 'spark') AS BIGINT) AS cf0,
             CAST(count_if(term = 'join') AS BIGINT) AS cf1,
             CAST(count_if(term = 'window') AS BIGINT) AS cf2
      FROM tf
    ), matched AS MATERIALIZED (
      SELECT doc_id, CAST(MAX(dl) AS BIGINT) AS dl,
             CAST(count_if(term = 'spark') AS BIGINT) AS tf0,
             CAST(count_if(term = 'join') AS BIGINT) AS tf1,
             CAST(count_if(term = 'window') AS BIGINT) AS tf2
      FROM tf GROUP BY 1
      HAVING count_if(term IN ('spark', 'join', 'window')) > 0
    ), scored AS MATERIALIZED (
      SELECT doc_id, dl, tf0 + tf1 + tf2 AS tfsum,
             CAST((((tf0 + tf1 + tf2)::HUGEINT * c_total
                    + dl::HUGEINT * (cf0 + cf1 + cf2)) * 1000000)
                  // (2::HUGEINT * dl * c_total) AS BIGINT) AS score_ppm
      FROM matched, corpus
    )
    SELECT doc_id, dl AS n_tokens, CAST(tfsum AS BIGINT) AS tf_matched,
           score_ppm, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS rn
      FROM scored
    ) WHERE rn <= 10
    """,
)
def jm_query_likelihood_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer-smoothed query likelihood top-10 (Ponte & Croft
    SIGIR'98 language-model retrieval; Zhai & Lafferty SIGIR'01
    smoothing study) for the fixed 3-term query — the LM-retrieval
    companion to ``bm25_topk_docs`` (same tokens, same query): rank
    by Σ_q [λ·tf_q/dl + (1−λ)·cf_q/|C|] with λ = 1/2 DYADIC, the
    additive form of JM smoothing.

    Exactness: over the common denominator 2·dl·|C| the score is the
    single integer (Σtf_matched·|C| + dl·Σcf_q), one ppm division —
    no logs, no per-term float sums. Docs matching none of the query
    terms score on background mass alone and are excluded before the
    top-k window (documented; keeps the ranking window on the TINY
    matched set, exactly the bm25 plan shape).

    Scale shape: one corpus tokenization feeding the scalar corpus
    stats (broadcast, 1 row) and the per-doc conditional aggregation;
    the top-k window runs over matched docs only."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        term_frequencies,
    )

    from dpe_energy_performance_analysis_etl_spark.plans._core import read_documents

    terms = ["spark", "join", "window"]
    tf = term_frequencies(read_documents(spark, sf_dir)).cache()
    corpus = tf.agg(
        F.sum("tf").cast("bigint").alias("c_total"),
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf")).otherwise(0))
            .cast("bigint")
            .alias(f"cf{i}")
            for i, t in enumerate(terms)
        ],
    )
    matched = (
        tf.filter(F.col("term").isin(*terms))
        .groupBy("doc_id")
        .agg(
            F.max("dl").cast("bigint").alias("dl"),
            F.sum("tf").cast("bigint").alias("tfsum"),
        )
    )
    scored = matched.crossJoin(F.broadcast(corpus)).selectExpr(
        "doc_id",
        "dl",
        "tfsum",
        "CAST(((CAST(tfsum AS DECIMAL(38,0)) * c_total"
        "       + CAST(dl AS DECIMAL(38,0)) * (cf0 + cf1 + cf2)) * 1000000)"
        " div (CAST(2 AS DECIMAL(38,0)) * dl * c_total) AS BIGINT)"
        " AS score_ppm",
    )
    # Top-10 via TakeOrderedAndProject — the matched-doc set grows
    # with the corpus, so no global row_number window over it
    # (VERDICT r10 ask #1 named this site).
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        take_ordered_ranked,
    )

    return take_ordered_ranked(
        scored, [F.col("score_ppm").desc(), F.col("doc_id").asc()], 10
    ).select(
        "doc_id",
        F.col("dl").alias("n_tokens"),
        F.col("tfsum").alias("tf_matched"),
        "score_ppm",
        "rank",
    )


@register(
    "chow_break_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) // 100 AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT y, CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS t,
             CASE WHEN month >= TIMESTAMP '1996-01-01 00:00:00'
                  THEN 1 ELSE 0 END AS seg
      FROM monthly
    ), segs AS MATERIALIZED (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(t * t) AS BIGINT) AS st2,
             CAST(SUM(y) AS BIGINT) AS sy, SUM(t::HUGEINT * y) AS sty
      FROM idx GROUP BY 1
      UNION ALL
      SELECT 2 AS seg, CAST(COUNT(*) AS BIGINT),
             CAST(SUM(t) AS BIGINT), CAST(SUM(t * t) AS BIGINT),
             CAST(SUM(y) AS BIGINT), SUM(t::HUGEINT * y)
      FROM idx
    ), coefs AS MATERIALIZED (
      SELECT seg, n, sy, st,
             (n * sty - st::HUGEINT * sy) AS nb,
             (n::HUGEINT * st2 - st::HUGEINT * st) AS d
      FROM segs
    ), sse AS MATERIALIZED (
      SELECT coefs.seg,
             CAST(coefs.n AS BIGINT) AS n,
             CAST(SUM((coefs.n * coefs.d * idx.y - coefs.d * coefs.sy
                       + coefs.nb * coefs.st - coefs.n * coefs.nb * idx.t)
                      * (coefs.n * coefs.d * idx.y - coefs.d * coefs.sy
                         + coefs.nb * coefs.st - coefs.n * coefs.nb * idx.t))
                  AS DOUBLE)
             / (CAST(coefs.n AS DOUBLE) * CAST(coefs.d AS DOUBLE)
                * CAST(coefs.n AS DOUBLE) * CAST(coefs.d AS DOUBLE))
               AS ssev
      FROM idx JOIN coefs
        ON coefs.seg = 2 OR coefs.seg = idx.seg
      WHERE coefs.d <> 0
      GROUP BY coefs.seg, coefs.n, coefs.d
    )
    SELECT
      CAST(MAX(CASE WHEN seg = 0 THEN n END) AS BIGINT) AS n_pre,
      CAST(MAX(CASE WHEN seg = 1 THEN n END) AS BIGINT) AS n_post,
      CASE WHEN MAX(CASE WHEN seg = 0 THEN ssev END) IS NOT NULL
            AND MAX(CASE WHEN seg = 1 THEN ssev END) IS NOT NULL
            AND MAX(CASE WHEN seg = 2 THEN ssev END) IS NOT NULL
            AND MAX(CASE WHEN seg = 0 THEN ssev END)
                + MAX(CASE WHEN seg = 1 THEN ssev END) > 0e0
            AND MAX(CASE WHEN seg = 2 THEN n END) > 4
      THEN CAST(floor(
        ((MAX(CASE WHEN seg = 2 THEN ssev END)
          - MAX(CASE WHEN seg = 0 THEN ssev END)
          - MAX(CASE WHEN seg = 1 THEN ssev END)) / 2e0)
        / ((MAX(CASE WHEN seg = 0 THEN ssev END)
            + MAX(CASE WHEN seg = 1 THEN ssev END))
           / (MAX(CASE WHEN seg = 2 THEN n END) - 4e0))
        * 1000e0) AS BIGINT) END AS f_milli
    FROM sse
    """,
)
def chow_break_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break test (Econometrica 1960) on the monthly
    revenue trend at the fixed 1996-01 breakpoint: does one OLS line
    fit the whole series, or do the pre/post segments want their own?
    F = ((SSE_pooled − SSE₁ − SSE₂)/k) / ((SSE₁+SSE₂)/(n−2k)), k = 2.

    Determinism: each segment's residuals are the EXACT integers
    ẽ_t = nD·y_t − D·Σy + Nb·Σt − n·Nb·t (whole-dollar monthly
    revenue), and SSE_s = Σ (ẽ_t/(n_s·D_s))² is evaluated in DOUBLE
    with a FIXED expression shape — every divide/multiply/add is an
    IEEE-correctly-rounded op on values both engines compute
    identically, so f_milli replays bit-exactly (same class as the
    z_milli closed forms; the only non-rational step is the final
    float division pair + floor). Degenerate segments (<3 points,
    zero D, zero residual variance) emit NULL.

    Scale shape: ONE data-sized month aggregation; segment/pooled
    sums and the residual pass run on the bounded month table (the
    pooled row rides a seg-or-2 join, ≤ 3x~85 rows)."""
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
        F.expr(
            "CASE WHEN month >= TIMESTAMP '1996-01-01 00:00:00'"
            " THEN 1 ELSE 0 END"
        ).alias("seg"),
    ).localCheckpoint(eager=True)  # bounded; feeds seg sums + residuals
    seg_sums = idx.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.expr("t * t")).cast("bigint").alias("st2"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * y")).alias("sty"),
    )
    pooled = idx.agg(
        F.lit(2).cast("bigint").alias("seg"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.expr("t * t")).cast("bigint").alias("st2"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * y")).alias("sty"),
    ).select("seg", "n", "st", "st2", "sy", "sty")
    segs = seg_sums.select("seg", "n", "st", "st2", "sy", "sty").unionByName(
        pooled
    )
    coefs = segs.selectExpr(
        "seg",
        "n",
        "sy",
        "st",
        "CAST(n * sty - CAST(st AS DECIMAL(38,0)) * sy AS DECIMAL(38,0)) AS nb",
        "CAST(CAST(n AS DECIMAL(38,0)) * st2"
        " - CAST(st AS DECIMAL(38,0)) * st AS DECIMAL(38,0)) AS d",
    ).localCheckpoint(eager=True)  # 3 rows
    joined = idx.alias("i").join(
        F.broadcast(coefs.alias("c")),
        F.expr("c.seg = 2 OR c.seg = i.seg"),
    ).filter(F.expr("c.d <> 0"))
    # exact integer sum of squared scaled residuals per segment; ONE
    # double division per segment after (float partial sums would be
    # partition-order-nondeterministic — CLAUDE.md fixed-order rule)
    sse = (
        joined.selectExpr(
            "c.seg AS seg",
            "c.n AS n",
            "c.d AS d",
            "CAST(c.n * c.d * i.y - c.d * c.sy + c.nb * c.st"
            " - c.n * c.nb * i.t AS DECIMAL(38,0)) AS e",
        )
        .groupBy("seg", "n", "d")
        .agg(F.sum(F.expr("e * e")).alias("__ss"))
        .selectExpr(
            "seg",
            "n",
            "CAST(__ss AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * CAST(d AS DOUBLE)"
            "    * CAST(n AS DOUBLE) * CAST(d AS DOUBLE)) AS ssev",
        )
    )
    return sse.groupBy().agg(
        F.max(F.expr("CASE WHEN seg = 0 THEN n END")).cast("bigint").alias(
            "n_pre"
        ),
        F.max(F.expr("CASE WHEN seg = 1 THEN n END")).cast("bigint").alias(
            "n_post"
        ),
        F.max(F.expr("CASE WHEN seg = 0 THEN ssev END")).alias("__s0"),
        F.max(F.expr("CASE WHEN seg = 1 THEN ssev END")).alias("__s1"),
        F.max(F.expr("CASE WHEN seg = 2 THEN ssev END")).alias("__sp"),
        F.max(F.expr("CASE WHEN seg = 2 THEN n END")).cast("bigint").alias(
            "__np"
        ),
    ).selectExpr(
        "n_pre",
        "n_post",
        "CASE WHEN __s0 IS NOT NULL AND __s1 IS NOT NULL"
        " AND __sp IS NOT NULL AND __s0 + __s1 > 0e0 AND __np > 4"
        " THEN CAST(floor(((__sp - __s0 - __s1) / 2e0)"
        " / ((__s0 + __s1) / (__np - 4e0)) * 1000e0) AS BIGINT)"
        " END AS f_milli",
    )
