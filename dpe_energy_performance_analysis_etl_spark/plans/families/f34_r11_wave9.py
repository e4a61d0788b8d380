"""Round 11, wave 9: paired/positional analytics — Wilcoxon signed
rank, moving-average crossover signals, Pareto 80/20 revenue share,
day-k retention, Yule's Q word co-occurrence, paired embedding
cosine.

Shared exactness recipe: signed-rank ties use the doubled-midrank
trick (2x ranks stay integer); crossover states compare
CROSS-MULTIPLIED integer window sums (12*sum5 vs 5*sum12 — no
division, no floats); the top-20% share rides
``global_rank_and_prefix``; cosines are ORDERED folds over the
vector dims (Spark ``aggregate`` / DuckDB ``list_reduce`` step the
same IEEE doubles in the same order)."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.plans._core import (  # noqa: F401
    DataFrame,
    SparkSession,
    Window,
    F,
    QUERIES,
    ORACLE_SQL,
    read_documents,
    read_events,
    register,
)


@register(
    "wilcoxon_signed_rank_monthly",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) // 100 AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), diffs AS MATERIALIZED (
      SELECT y - lag(y, 1) OVER (ORDER BY month) AS d
      FROM monthly
    ), nz AS MATERIALIZED (
      SELECT d, abs(d) AS ad FROM diffs WHERE d IS NOT NULL AND d <> 0
    ), ranked AS MATERIALIZED (
      SELECT d,
             2 * (rank() OVER (ORDER BY ad) - 1)
               + COUNT(*) OVER (PARTITION BY ad) + 1 AS mr2
      FROM nz
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN d > 0 THEN mr2 ELSE 0 END) AS BIGINT) AS w2p
      FROM ranked
    )
    SELECT n AS n_nonzero_diffs, w2p AS w_plus_doubled,
           CAST(floor(1000e0 *
             (CAST(w2p AS DOUBLE) / 2e0
              - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1e0) / 4e0)
             / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1e0)
                    * (2e0 * CAST(n AS DOUBLE) + 1e0) / 24e0)) AS BIGINT)
             AS z_milli
    FROM agg
    """,
)
def wilcoxon_signed_rank_monthly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on month-over-month revenue changes
    (Wilcoxon 1945): are the ups systematically bigger than the downs
    — the magnitude-aware paired test the sign-only Cox-Stuart can't
    be. Tie-safe DOUBLED midranks (the Mann-Whitney mr2 trick: 2W+
    stays integer under ties); zero diffs drop per the standard
    procedure; z from the exact normal approximation, floored milli.
    All windows run over the ~80-row month table."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100"
            " AS BIGINT)) div 100 AS BIGINT)"
        ).alias("y")
    )
    w = Window.orderBy("month")
    nz = (
        monthly.select((F.col("y") - F.lag("y", 1).over(w)).alias("d"))
        .where(F.col("d").isNotNull() & (F.col("d") != 0))
        .withColumn("ad", F.abs(F.col("d")))
    )
    wr = Window.orderBy("ad")
    wt = Window.partitionBy("ad")
    ranked = nz.select(
        "d",
        (
            F.lit(2) * (F.rank().over(wr) - 1)
            + F.count(F.lit(1)).over(wt)
            + 1
        ).alias("mr2"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("CASE WHEN d > 0 THEN mr2 ELSE 0 END"))
        .cast("bigint")
        .alias("w2p"),
    )
    return agg.selectExpr(
        "n AS n_nonzero_diffs",
        "w2p AS w_plus_doubled",
        "CAST(floor(1000e0 *"
        " (CAST(w2p AS DOUBLE) / 2e0"
        "  - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1e0) / 4e0)"
        " / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1e0)"
        "        * (2e0 * CAST(n AS DOUBLE) + 1e0) / 24e0)) AS BIGINT)"
        " AS z_milli",
    )


@register(
    "ma_crossover_monthly",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) // 100 AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), sums AS MATERIALIZED (
      SELECT month,
             CAST(SUM(y) OVER (ORDER BY month
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS s5,
             CAST(SUM(y) OVER (ORDER BY month
               ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS BIGINT) AS s12,
             CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS t
      FROM monthly
    ), states AS MATERIALIZED (
      SELECT month, t,
             CASE WHEN 12 * s5 > 5 * s12 THEN 1 ELSE 0 END AS fast_above
      FROM sums WHERE t >= 12
    ), crossings AS MATERIALIZED (
      SELECT fast_above,
             lag(fast_above) OVER (ORDER BY month) AS prev_state
      FROM states
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_months_signal,
           CAST(SUM(CASE WHEN prev_state = 0 AND fast_above = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS golden_crosses,
           CAST(SUM(CASE WHEN prev_state = 1 AND fast_above = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS death_crosses
    FROM crossings
    """,
)
def ma_crossover_monthly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover signals on monthly revenue (the
    golden/death-cross momentum rule, SMA5 vs SMA12): crossings
    counted from the INTEGER comparison 12*sum5 > 5*sum12 — the
    cross-multiplied form needs no division and no floats, so the
    state sequence is exact in both engines. Windows run over the
    calendar-bounded month table; the first 11 warm-up months are
    excluded so both SMAs cover full windows."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100"
            " AS BIGINT)) div 100 AS BIGINT)"
        ).alias("y")
    )
    w = Window.orderBy("month")
    sums = monthly.select(
        "month",
        F.sum("y").over(w.rowsBetween(-4, 0)).cast("bigint").alias("s5"),
        F.sum("y").over(w.rowsBetween(-11, 0)).cast("bigint").alias("s12"),
        F.row_number().over(w).cast("bigint").alias("t"),
    )
    states = sums.where(F.col("t") >= 12).select(
        "month",
        F.expr("CASE WHEN 12 * s5 > 5 * s12 THEN 1 ELSE 0 END").alias(
            "fast_above"
        ),
    )
    crossings = states.select(
        "fast_above", F.lag("fast_above").over(w).alias("prev_state")
    )
    return crossings.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months_signal"),
        F.sum(
            F.expr("CASE WHEN prev_state = 0 AND fast_above = 1 THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("golden_crosses"),
        F.sum(
            F.expr("CASE WHEN prev_state = 1 AND fast_above = 0 THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("death_crosses"),
    )


@register(
    "pareto_8020_customers",
    """
    WITH per AS MATERIALIZED (
      SELECT o_custkey AS k,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT x,
             CAST(row_number() OVER (ORDER BY x DESC, k) AS BIGINT) AS r,
             CAST(SUM(x) OVER (ORDER BY x DESC, k
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM per
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
      FROM per
    )
    SELECT t.n AS n_customers, t.n // 5 AS top20pct_n,
           CAST(MAX(CASE WHEN r.r = t.n // 5 THEN r.cum END) AS BIGINT)
             AS top20pct_cents,
           t.s AS total_cents,
           CAST(floor(1e6 *
             CAST(MAX(CASE WHEN r.r = t.n // 5 THEN r.cum END) AS DOUBLE)
             / t.s) AS BIGINT) AS share_ppm
    FROM ranked r, tot t
    GROUP BY t.n, t.s
    """,
)
def pareto_8020_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 check: revenue share held by the top 20% of
    customers by spend (the one-number Pareto summary next to
    ``spend_gini_customers``' full-curve Gini). The rank AND the
    running revenue both come from ``global_rank_and_prefix``'s
    partition-offset two-pass (spend descending) — the customer
    table grows with the data, so no single-partition window; the
    share is the cumulative at rank n/5 over the total, one floored
    ppm."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        global_rank_and_prefix,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("x")
    )
    ranked = global_rank_and_prefix(
        per, [F.col("x").desc(), F.col("k").asc()], "x", rank_col="r", cum_col="cum"
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .where(F.col("r") == F.expr("n div 5"))
        .selectExpr(
            "n AS n_customers",
            "n div 5 AS top20pct_n",
            "cum AS top20pct_cents",
            "s AS total_cents",
            "CAST(floor(1e6 * CAST(cum AS DOUBLE) / s) AS BIGINT) AS share_ppm",
        )
    )


@register(
    "dayk_retention_events",
    """
    WITH firstday AS MATERIALIZED (
      SELECT MIN(date_trunc('day', ts)) AS d0 FROM events
    ), cohort AS MATERIALIZED (
      SELECT DISTINCT user_id FROM events, firstday
      WHERE date_trunc('day', ts) = d0
    ), activity AS MATERIALIZED (
      SELECT DISTINCT e.user_id,
             CAST(date_diff('day', f.d0, date_trunc('day', e.ts)) AS BIGINT)
               AS k
      FROM events e, firstday f
      WHERE e.user_id IN (SELECT user_id FROM cohort)
    )
    SELECT k AS day_k, CAST(COUNT(*) AS BIGINT) AS n_retained,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cohort) AS cohort_size,
           CAST(floor(1e6 * CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM cohort)) AS BIGINT) AS retention_ppm
    FROM activity WHERE k BETWEEN 0 AND 7
    GROUP BY k ORDER BY k
    """,
)
def dayk_retention_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-k retention curve for the day-0 user cohort (the classic
    D1/D7 product-health readout; ``cohort_retention`` reads the
    orders table at month grain — this is the events-stream daily
    version, anchored to the DATA's first observed day): fraction of
    day-0 users active again on day k, k = 0..7. Exact distinct
    (user, day) counts; one floored ppm per row."""
    ev = read_events(spark, sf_dir)
    days = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
        .distinct()
        .cache()  # bounded (users x days << events) and consumed by
        # THREE branches (d0 min, cohort filter, activity join) — the
        # distinct's post-shuffle dedup agg would re-run per branch
    )
    d0 = days.agg(F.min("day").alias("d0"))
    cohort = (
        days.crossJoin(F.broadcast(d0))
        .where(F.col("day") == F.col("d0"))
        .select("user_id")
        .distinct()
        .cache()  # bounded (day-0 users), consumed by the activity
        # join AND the cohort-size aggregate
    )
    activity = (
        days.join(cohort, "user_id")
        .crossJoin(F.broadcast(d0))
        .select(
            F.datediff(F.col("day"), F.col("d0")).cast("bigint").alias("k"),
            "user_id",
        )
        .distinct()
    )
    csize = cohort.agg(F.count(F.lit(1)).cast("bigint").alias("cohort_size"))
    return (
        activity.where(F.col("k").between(0, 7))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_retained"))
        .crossJoin(F.broadcast(csize))
        .selectExpr(
            "k AS day_k",
            "n_retained",
            "cohort_size",
            "CAST(floor(1e6 * CAST(n_retained AS DOUBLE) / cohort_size)"
            " AS BIGINT) AS retention_ppm",
        )
        .orderBy("day_k")
    )


@register(
    "yules_q_word_cooccurrence",
    """
    WITH flags AS MATERIALIZED (
      SELECT CASE WHEN regexp_matches(lower(text),
                       '\\b(spark)\\b') THEN 1 ELSE 0 END AS ha,
             CASE WHEN regexp_matches(lower(text),
                       '\\b(join)\\b') THEN 1 ELSE 0 END AS hb
      FROM documents
    ), tab AS MATERIALIZED (
      SELECT
        CAST(SUM(CASE WHEN ha=1 AND hb=1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN ha=1 AND hb=0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN ha=0 AND hb=1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN ha=0 AND hb=0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM flags
    )
    SELECT a AS both_docs, b AS only_spark, c AS only_join, d AS neither,
           CAST(floor(1e6 *
             (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
             / (CAST(a AS DOUBLE) * d + CAST(b AS DOUBLE) * c)) AS BIGINT)
             AS yules_q_ppm
    FROM tab
    """,
)
def yules_q_word_cooccurrence_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's Q association between two terms' document-level
    co-occurrence ('spark' and 'join' — Yule 1900): Q = (ad - bc)/
    (ad + bc), the odds-ratio transform bounded to [-1, 1] — the
    collocation signal at DOCUMENT grain where ``pmi_collocations``
    reads adjacent-pair grain (and Yule's K reads repetition, not
    association). Exact 2x2 presence counts; one floored ppm."""
    docs = read_documents(spark, sf_dir)
    flags = docs.selectExpr(
        "CASE WHEN lower(text) RLIKE '\\\\b(spark)\\\\b' THEN 1 ELSE 0 END AS ha",
        "CASE WHEN lower(text) RLIKE '\\\\b(join)\\\\b' THEN 1 ELSE 0 END AS hb",
    )
    tab = flags.agg(
        F.sum(F.expr("CASE WHEN ha=1 AND hb=1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("a"),
        F.sum(F.expr("CASE WHEN ha=1 AND hb=0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("b"),
        F.sum(F.expr("CASE WHEN ha=0 AND hb=1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("c"),
        F.sum(F.expr("CASE WHEN ha=0 AND hb=0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("d"),
    )
    return tab.selectExpr(
        "a AS both_docs",
        "b AS only_spark",
        "c AS only_join",
        "d AS neither",
        "CAST(floor(1e6 *"
        " (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)"
        " / (CAST(a AS DOUBLE) * d + CAST(b AS DOUBLE) * c)) AS BIGINT)"
        " AS yules_q_ppm",
    )


@register(
    "paired_cosine_embeddings",
    """
    WITH pairs AS MATERIALIZED (
      SELECT a.vec_id AS id1, b.vec_id AS id2,
             a.embedding AS va, b.embedding AS vb,
             a.label AS la, b.label AS lb
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % 2 = 0
    ), scored AS MATERIALIZED (
      SELECT id1, id2, la, lb,
             list_reduce(
               list_prepend(struct_pack(acc := 0.0::DOUBLE, i := 0::BIGINT),
                 list_transform(range(1, len(va) + 1),
                   i -> struct_pack(acc := 0.0::DOUBLE, i := i::BIGINT))),
               (acc, x) -> struct_pack(
                 acc := acc.acc + CAST(va[x.i] AS DOUBLE)
                        * CAST(vb[x.i] AS DOUBLE),
                 i := x.i)
             ).acc AS dot,
             list_reduce(
               list_prepend(struct_pack(acc := 0.0::DOUBLE, i := 0::BIGINT),
                 list_transform(range(1, len(va) + 1),
                   i -> struct_pack(acc := 0.0::DOUBLE, i := i::BIGINT))),
               (acc, x) -> struct_pack(
                 acc := acc.acc + CAST(va[x.i] AS DOUBLE)
                        * CAST(va[x.i] AS DOUBLE),
                 i := x.i)
             ).acc AS na,
             list_reduce(
               list_prepend(struct_pack(acc := 0.0::DOUBLE, i := 0::BIGINT),
                 list_transform(range(1, len(vb) + 1),
                   i -> struct_pack(acc := 0.0::DOUBLE, i := i::BIGINT))),
               (acc, x) -> struct_pack(
                 acc := acc.acc + CAST(vb[x.i] AS DOUBLE)
                        * CAST(vb[x.i] AS DOUBLE),
                 i := x.i)
             ).acc AS nb
      FROM pairs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
             AS n_same_label,
           CAST(SUM(CASE WHEN la = lb THEN
             CAST(floor(1000e0 * dot / sqrt(na) / sqrt(nb)) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS same_label_cos_milli_sum,
           CAST(SUM(CASE WHEN la <> lb THEN
             CAST(floor(1000e0 * dot / sqrt(na) / sqrt(nb)) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS diff_label_cos_milli_sum
    FROM scored
    """,
)
def paired_cosine_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine similarity of deterministically paired embeddings
    (vec 2k with vec 2k+1) split by label agreement — the quick
    embedding-geometry health check (same-label pairs should average
    higher cosine than different-label pairs if the space encodes the
    labels). Each dot/norm is an ORDERED per-dimension fold — Spark
    ``aggregate`` and DuckDB ``list_reduce`` add the same IEEE
    doubles in index order, so the floored per-pair milli cosines
    match bit-for-bit; the pairing is an equi-join on vec_id+1, never
    an all-pairs product."""
    from dpe_energy_performance_analysis_etl_spark.plans._core import read_embeddings

    emb = read_embeddings(spark, sf_dir)
    a = emb.selectExpr("vec_id AS id1", "embedding AS va", "label AS la").where(
        F.expr("id1 % 2 = 0")
    )
    b = emb.selectExpr("vec_id AS id2", "embedding AS vb", "label AS lb")
    pairs = a.join(b, F.col("id2") == F.col("id1") + 1)
    fold = (
        "aggregate(zip_with({u}, {v}, (p, q) -> CAST(p AS DOUBLE)"
        " * CAST(q AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    scored = pairs.selectExpr(
        "la",
        "lb",
        f"{fold.format(u='va', v='vb')} AS dot",
        f"{fold.format(u='va', v='va')} AS na",
        f"{fold.format(u='vb', v='vb')} AS nb",
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.expr("CASE WHEN la = lb THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_same_label"),
        F.sum(
            F.expr(
                "CASE WHEN la = lb THEN"
                " CAST(floor(1000e0 * dot / sqrt(na) / sqrt(nb)) AS BIGINT)"
                " ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("same_label_cos_milli_sum"),
        F.sum(
            F.expr(
                "CASE WHEN la <> lb THEN"
                " CAST(floor(1000e0 * dot / sqrt(na) / sqrt(nb)) AS BIGINT)"
                " ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("diff_label_cos_milli_sum"),
    )
