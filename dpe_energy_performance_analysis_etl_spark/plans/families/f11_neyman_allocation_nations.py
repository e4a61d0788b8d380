"""Query-registry family chunk 11 (auto-split from the
historical plans/queries.py lines 19621-20905; registration
order preserved — see plans/queries.py facade)."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.plans._core import (  # noqa: F401
    Callable,
    DataFrame,
    SparkSession,
    Window,
    F,
    epoch_double,
    epoch_micros,
    epoch_seconds,
    exact_cents_sum,
    exact_sum_agg,
    from_cents,
    scaled_long,
    TABLES,
    load_tables,
    read_events,
    read_documents,
    read_embeddings,
    dsum,
    davg,
    dsum_fast,
    davg_fast,
    QUERIES,
    ORACLE_SQL,
    register,
)
from dpe_energy_performance_analysis_etl_spark.plans.families.f10_mcnemar_repeat_purchase import (  # noqa: F401
    _NEY_B,
)

@register(
    "neyman_allocation_nations",
    f"""
    WITH strata AS MATERIALIZED (
      SELECT n.n_name,
             CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS sm,
             SUM((CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                  AS BIGINT))::HUGEINT
                 * (CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                    AS BIGINT))) AS ssq
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ), wts AS MATERIALIZED (
      SELECT n_name, nh,
             CASE WHEN nh > 1 THEN
               sqrt(CAST(nh AS DOUBLE)
                    * CAST(nh::HUGEINT * ssq - sm::HUGEINT * sm AS DOUBLE)
                    / (nh - 1)) / nh
             ELSE 0e0 END AS w
      FROM strata
    ), tot AS MATERIALIZED (
      SELECT list_reduce(list_prepend(0e0, list(w ORDER BY n_name)),
                         (acc, x) -> acc + x) AS wsum
      FROM wts
    ), alloc AS MATERIALIZED (
      SELECT n_name, nh,
             CAST(floor({_NEY_B}e0 * w / wsum) AS BIGINT) AS alloc_floor,
             {_NEY_B}e0 * w / wsum
               - floor({_NEY_B}e0 * w / wsum) AS rem
      FROM wts, tot
    ), ranked AS MATERIALIZED (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, n_name) AS rk,
             CAST({_NEY_B} - SUM(alloc_floor) OVER () AS BIGINT) AS extra
      FROM alloc
    )
    SELECT n_name, nh AS n_orders, alloc_floor,
           CAST(alloc_floor + CASE WHEN rk <= extra THEN 1 ELSE 0 END
                AS BIGINT) AS n_allocated
    FROM ranked
    """,
)
def neyman_allocation_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal stratified-sampling allocation (Neyman 1934) of
    a 10,000-row sample budget across nation strata: n_h ∝ N_h·S_h —
    big AND volatile strata get more of the budget than proportional
    allocation would give, the variance-minimizing design for a fixed
    cost (the sampling-design step of any stratified corpus draw).
    Stratum moments are exact integers (HUGEINT/DECIMAL(38,0) sum of
    squares); N_h·S_h moves to doubles through scale-0 conversions
    and one sqrt; the weight TOTAL is an ordered fold by stratum name
    (a bare SUM over doubles has no defined order — CLAUDE.md rule);
    integer allocations use the largest-remainder (Hamilton) method,
    deterministic ties by name, so Σ n_allocated = budget EXACTLY.
    Windows run over the ≤|nations| stratum table."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cents = "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
    strata = (
        o.join(c.select("c_custkey", "c_nationkey"), o["o_custkey"] == F.col("c_custkey"))
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nh"),
            F.sum(F.expr(cents)).cast("bigint").alias("sm"),
            F.sum(F.expr(f"CAST({cents} AS DECIMAL(38,0)) * {cents}")).alias(
                "ssq"
            ),
        )
    )
    wts = strata.selectExpr(
        "n_name",
        "nh",
        "CASE WHEN nh > 1 THEN"
        " sqrt(CAST(nh AS DOUBLE)"
        "      * CAST(CAST(nh AS DECIMAL(38,0)) * ssq"
        "             - CAST(sm AS DECIMAL(38,0)) * sm AS DOUBLE)"
        "      / (nh - 1)) / nh"
        " ELSE 0e0 END AS w",
    ).localCheckpoint(eager=True)  # feeds the ordered fold + allocation
    tot = wts.agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(n_name, w))),"
            " CAST(0 AS DOUBLE), (acc, s) -> acc + s.w) AS wsum"
        )
    )
    alloc = wts.crossJoin(F.broadcast(tot)).selectExpr(
        "n_name",
        "nh",
        f"CAST(floor({_NEY_B}e0 * w / wsum) AS BIGINT) AS alloc_floor",
        f"{_NEY_B}e0 * w / wsum - floor({_NEY_B}e0 * w / wsum) AS rem",
    )
    w_rk = Window.orderBy(F.col("rem").desc(), F.col("n_name"))
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        alloc.withColumn("rk", F.row_number().over(w_rk))
        .withColumn(
            "extra",
            (F.lit(_NEY_B) - F.sum("alloc_floor").over(w_all)).cast("bigint"),
        )
        .selectExpr(
            "n_name",
            "nh AS n_orders",
            "alloc_floor",
            "CAST(alloc_floor + CASE WHEN rk <= extra THEN 1 ELSE 0 END"
            " AS BIGINT) AS n_allocated",
        )
    )


@register(
    "required_sample_size_brands",
    """
    WITH a AS MATERIALIZED (
      SELECT p.p_brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(count_if(l.l_returnflag = 'R') AS BIGINT) AS x
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    )
    SELECT p_brand, n, x,
           CAST((x * 1000000) // n AS BIGINT) AS rate_ppm,
           CASE WHEN x > 0 THEN
             CAST((800 * (n - x) + x - 1) // x AS BIGINT)
           END AS n_required_per_arm
    FROM a
    """,
)
def required_sample_size_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test sample-size requirement per brand: rows needed PER
    ARM to detect a 10% relative change in that brand's return rate
    at z = 2 (dyadic, the wilson_return_rate_brands convention) —
    n = 2·z²·p(1−p)/(0.1·p)² = 800·(1−p)/p, which with p = x/N
    collapses to the EXACT integer ceiling (800·(N−x) + x − 1) div x.
    Zero float ops: the planning table that says which brands can
    even be experimented on at current traffic. One broadcast-dim
    aggregation pass."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    a = (
        li.join(
            pt.select("p_partkey", "p_brand"),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_if(F.col("l_returnflag") == "R").cast("bigint").alias("x"),
        )
    )
    return a.selectExpr(
        "p_brand",
        "n",
        "x",
        "CAST((x * 1000000) div n AS BIGINT) AS rate_ppm",
        "CASE WHEN x > 0 THEN"
        " CAST((800 * (n - x) + x - 1) div x AS BIGINT)"
        " END AS n_required_per_arm",
    )


# =====================================================================
# Round 9, wave 19: Kendall tau-b / Somers' D / gamma via bounded-
# domain dominance counting
# =====================================================================

_KT_N = 50  # l_quantity domain 1..50
_KT_C = ",\n             ".join(
    f"CAST(count_if(qty = {i + 1}) AS BIGINT) AS c{i}" for i in range(_KT_N)
)
_KT_PRE = ",\n             ".join(
    f"CAST(COALESCE(SUM(c{i}) OVER win, 0) AS BIGINT) AS c{i}_before"
    for i in range(_KT_N)
)
_KT_CONC = " + ".join(
    f"c{i}::HUGEINT * ({' + '.join(f'c{j}_before' for j in range(i))})"
    for i in range(1, _KT_N)
)
_KT_DISC = " + ".join(
    f"c{i}::HUGEINT * ({' + '.join(f'c{j}_before' for j in range(i + 1, _KT_N))})"
    for i in range(_KT_N - 1)
)
_KT_T = ",\n             ".join(
    f"CAST(SUM(c{i}) AS BIGINT) AS t{i}" for i in range(_KT_N)
)
_KT_TX2 = " + ".join(f"t{i}::HUGEINT * (t{i} - 1)" for i in range(_KT_N))
_KT_SGN = "(CASE WHEN conc >= disc THEN 1 ELSE -1 END)"


@register(
    "kendall_tau_qty_price_brands",
    f"""
    WITH base AS MATERIALIZED (
      SELECT p.p_brand AS g,
             CAST(l.l_quantity AS BIGINT) AS qty,
             CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)
               AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), tiers AS MATERIALIZED (
      SELECT g, y, CAST(COUNT(*) AS BIGINT) AS cnt,
             {_KT_C}
      FROM base GROUP BY 1, 2
    ), pre AS MATERIALIZED (
      SELECT *,
             {_KT_PRE}
      FROM tiers
      WINDOW win AS (PARTITION BY g ORDER BY y
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), per AS MATERIALIZED (
      SELECT g, CAST(SUM(cnt) AS BIGINT) AS n,
             SUM({_KT_CONC}) AS conc,
             SUM({_KT_DISC}) AS disc,
             SUM(cnt::HUGEINT * (cnt - 1)) AS ty2,
             {_KT_T}
      FROM pre GROUP BY 1
    ), fin AS MATERIALIZED (
      SELECT g, n, conc, disc,
             n::HUGEINT * (n - 1) AS n02,
             ({_KT_TX2}) AS tx2,
             ty2
      FROM per
    )
    SELECT g AS p_brand, n,
           CAST(conc AS DOUBLE) AS concordant,
           CAST(disc AS DOUBLE) AS discordant,
           CASE WHEN n02 > tx2 AND n02 > ty2 THEN CAST(
             {_KT_SGN} * floor(CAST(abs(conc - disc) AS DOUBLE) * 2000000e0
               / sqrt(CAST(n02 - tx2 AS DOUBLE) * CAST(n02 - ty2 AS DOUBLE)))
           AS BIGINT) END AS tau_b_ppm,
           CASE WHEN n02 > tx2 THEN CAST(
             {_KT_SGN} * ((abs(conc - disc) * 2000000) // (n02 - tx2))
           AS BIGINT) END AS somers_d_ppm,
           CASE WHEN conc + disc > 0 THEN CAST(
             {_KT_SGN} * ((abs(conc - disc) * 1000000) // (conc + disc))
           AS BIGINT) END AS gamma_ppm
    FROM fin
    """,
)
def kendall_tau_qty_price_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b, Somers' D and Goodman-Kruskal gamma between
    quantity and line price per brand (operators/stats.py
    kendall_tau_b_bounded): the concordance triple computed WITHOUT
    the O(n²) pair walk — quantity's bounded 1..50 domain turns
    concordant/discordant counting into dominance sums over 50
    running class-counts (one tier aggregation, one prefix pass via
    the grouped_running_totals range-partition recipe, one bounded
    fold; the oracle's PARTITION BY windows are the sf0.01
    shortcut). Somers and gamma are exact ppm integer divisions;
    tau-b pays two scale-0 int→double conversions and one sqrt.
    The rank-concordance sibling of spearman_qty_price_brands —
    tau weighs PAIRS, rho weighs rank displacement."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        kendall_tau_b_bounded,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    base = li.join(
        pt.select("p_partkey", "p_brand"),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    return kendall_tau_b_bounded(
        base, "p_brand", "qty", "cents", list(range(1, _KT_N + 1))
    )


# =====================================================================
# Round 9, wave 20: semantic decontamination, Yule's K, effective
# sample size
# =====================================================================

@register(
    "semantic_decontaminate_embeddings",
    """
    WITH base AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS MATERIALIZED (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base
    ), ev AS MATERIALIZED (
      SELECT vec_id, v, nrm FROM n WHERE vec_id < 20
    ), scored AS MATERIALIZED (
      SELECT c.vec_id, e.vec_id AS eval_id,
             list_dot_product(c.v, e.v) / (c.nrm * e.nrm) AS cosine
      FROM n c JOIN ev e ON c.vec_id >= 20
    ), best AS MATERIALIZED (
      SELECT vec_id, eval_id, cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY cosine DESC, eval_id) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT vec_id, eval_id AS nearest_eval_id, cosine AS max_cosine,
           cosine > 98e-2 AS contaminated
    FROM best
    """,
)
def semantic_decontaminate_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination against an evaluation set (the
    embedding-space counterpart of the n-gram
    `decontaminate_overlap`): for every corpus vector, the single
    nearest eval-set vector by cosine and a contamination flag at
    0.98 — near-duplicates of benchmark items that exact n-gram
    matching misses (paraphrases, reformattings). The eval side
    (vec_id < 20) broadcasts; the corpus scans ONCE with a 20-wide
    bounded fan-out and a 20-row-per-vector argmax window — at
    100 TB this is the shape you want: eval sets are small by
    definition, the corpus never self-joins. Cosines are the same
    deterministic left-to-right dot-product fold both engines run in
    the other embedding families."""
    from dpe_energy_performance_analysis_etl_spark.dedup.embedding import (
        dot_double,
        norm2_double,
    )

    emb = read_embeddings(spark, sf_dir)
    ev = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("ev_emb"),
        F.sqrt(norm2_double(F.col("embedding"))).alias("ev_nrm"),
    )
    corpus = emb.where(F.col("vec_id") >= 20).select(
        "vec_id",
        "embedding",
        F.sqrt(norm2_double(F.col("embedding"))).alias("c_nrm"),
    )
    scored = corpus.join(F.broadcast(ev)).select(
        "vec_id",
        "eval_id",
        (
            dot_double(F.col("embedding"), F.col("ev_emb"))
            / (F.col("c_nrm") * F.col("ev_nrm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("eval_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .selectExpr(
            "vec_id",
            "eval_id AS nearest_eval_id",
            "cosine AS max_cosine",
            "cosine > 98e-2 AS contaminated",
        )
    )


@register(
    "yules_k_sources",
    """
    WITH tf AS MATERIALIZED (
      SELECT source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), counts AS MATERIALIZED (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM tf GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS m1_tokens,
           CAST(COUNT(*) AS BIGINT) AS v_types,
           CAST(SUM(c::HUGEINT * c) AS BIGINT) AS m2,
           CASE WHEN SUM(c) > 0 THEN
             CAST((10000 * (SUM(c::HUGEINT * c) - SUM(c)) * 1000)
                  // (SUM(c)::HUGEINT * SUM(c)) AS BIGINT)
           END AS yules_k_milli
    FROM counts GROUP BY 1
    """,
)
def yules_k_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per source (Yule 1944, the stylometry
    staple): K = 10⁴·(M₂ − M₁)/M₁² with M₁ = tokens and
    M₂ = Σ c² over term frequencies — vocabulary CONCENTRATION,
    robust to text length where raw type-token ratios aren't. High K
    = repetitive vocabulary (boilerplate, templated spam), low K =
    lexically rich text; the repetition screen that complements
    chao1_vocab_richness's unseen-mass estimate. One token
    aggregation, one bounded fold, exact HUGEINT/DECIMAL integers,
    one truncating milli division."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr

    docs = read_documents(spark, sf_dir)
    counts = (
        docs.select("source", F.explode(tokens_expr("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("m1_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("v_types"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).cast("bigint").alias("m2"),
        F.expr(
            "CASE WHEN SUM(c) > 0 THEN"
            " CAST((10000 * (SUM(CAST(c AS DECIMAL(38,0)) * c) - SUM(c))"
            "       * 1000)"
            " div (CAST(SUM(c) AS DECIMAL(38,0)) * SUM(c)) AS BIGINT) END"
        ).alias("yules_k_milli"),
    )


@register(
    "ess_length_weights_sources",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS w_sum,
           CASE WHEN SUM(n_chars::HUGEINT * n_chars) > 0 THEN
             CAST((SUM(n_chars)::HUGEINT * SUM(n_chars) * 1000000)
                  // (COUNT(*)::HUGEINT
                      * SUM(n_chars::HUGEINT * n_chars)) AS BIGINT)
           END AS ess_ratio_ppm
    FROM documents GROUP BY source
    """,
)
def ess_length_weights_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of length-proportional sampling per
    source (Kish 1965): ESS/n = (Σw)²/(n·Σw²) for w = n_chars — how
    much of a source survives as INDEPENDENT signal when documents
    are drawn proportional to length (the usual token-budget
    sampling). A ppm near 10⁶ means uniform lengths (every doc
    counts); a low ppm means a few giants dominate and the effective
    corpus is far smaller than its row count — the diagnostic to run
    BEFORE committing a mixture weight. One aggregation pass, exact
    integers, one truncating division."""
    docs = read_documents(spark, sf_dir)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("w_sum"),
        F.expr(
            "CASE WHEN SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars) > 0 THEN"
            " CAST((CAST(SUM(n_chars) AS DECIMAL(38,0)) * SUM(n_chars)"
            "       * 1000000)"
            " div (CAST(COUNT(1) AS DECIMAL(38,0))"
            "      * SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars))"
            " AS BIGINT) END"
        ).alias("ess_ratio_ppm"),
    )


# =====================================================================
# Round 9, wave 21: actuarial life table
# =====================================================================

@register(
    "life_table_orders",
    """
    WITH subj AS (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
      FROM orders
    ), tiers AS MATERIALIZED (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM subj GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT t, d, c,
             CAST(SUM(d + c) OVER () -
                  COALESCE(SUM(d + c) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n,
             CAST(row_number() OVER (ORDER BY t) AS INT) AS i
      FROM tiers
    ), packed AS MATERIALIZED (
      SELECT *,
             (2 * n - c - 2 * d) * 2147483648 + (2 * n - c) AS v
      FROM ranked
    ), encs AS MATERIALIZED (
      SELECT list(v ORDER BY t) AS xs FROM packed
    )
    SELECT t, n AS n_at_risk, d AS d_events, c AS c_censored,
           CASE WHEN 2 * n - c > 0 THEN
             CAST((2 * d * 1000000) // (2 * n - c) AS BIGINT)
           END AS q_ppm,
           CAST(list_reduce(
             list_prepend(CAST(1000000 AS BIGINT), encs.xs[1:i]),
             (acc, e) -> CASE WHEN e % 2147483648 > 0 THEN
               (acc * (e // 2147483648)) // (e % 2147483648)
               ELSE acc END
           ) AS BIGINT) AS surv_scaled
    FROM packed CROSS JOIN encs
    """,
)
def life_table_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Actuarial life table over the SAME order-lifetime tiers as
    `kaplan_meier_orders` / `nelson_aalen_orders` (operators/stats.py
    life_table_actuarial — Cutler & Ederer 1958): censored subjects
    count as HALF an exposure in their interval, q = 2d/(2n−c), and
    survival folds as the exact integer (acc·(2n−c−2d)) div (2n−c)
    per tier — the third classical survival surface, grouped-interval
    semantics where KM is event-time exact. One data-sized tier
    aggregation; the fold runs over the packed bounded tier array
    (a·2³¹ + b, guarded) via the SQL `aggregate` function."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        life_table_actuarial,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    subj = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("t"),
        (F.col("o_orderstatus") == "F").cast("int").alias("ev"),
    )
    return life_table_actuarial(subj, "t", "ev")


# =====================================================================
# Round 9, wave 22: partial correlation, lead-lag CCF, Mood's median
# test
# =====================================================================

_PC_R = (
    "(CAST({sab} AS DOUBLE)"
    " / sqrt(CAST({saa} AS DOUBLE) * CAST({sbb} AS DOUBLE)))"
)


@register(
    "partial_corr_rev_qty_disc",
    f"""
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', l_shipdate) AS month,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y,
             CAST(SUM(CAST(CAST(l_discount AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS z
      FROM lineitem GROUP BY 1
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(z) AS BIGINT) AS sz
      FROM monthly
    ), ctr AS MATERIALIZED (
      SELECT (n::HUGEINT * x - sx) AS dx, (n::HUGEINT * y - sy) AS dy,
             (n::HUGEINT * z - sz) AS dz, n
      FROM monthly, tot
    ), mom AS MATERIALIZED (
      SELECT MAX(n) AS n,
             SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy, SUM(dz * dz) AS szz,
             SUM(dx * dy) AS sxy, SUM(dx * dz) AS sxz, SUM(dy * dz) AS syz
      FROM ctr
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           CAST(floor({_PC_R.format(sab="sxy", saa="sxx", sbb="syy")}
                      * 1000000e0) AS BIGINT) AS r_xy_ppm,
           CAST(floor({_PC_R.format(sab="sxz", saa="sxx", sbb="szz")}
                      * 1000000e0) AS BIGINT) AS r_xz_ppm,
           CAST(floor({_PC_R.format(sab="syz", saa="syy", sbb="szz")}
                      * 1000000e0) AS BIGINT) AS r_yz_ppm,
           CAST(floor(
             ({_PC_R.format(sab="sxy", saa="sxx", sbb="syy")}
              - {_PC_R.format(sab="sxz", saa="sxx", sbb="szz")}
                * {_PC_R.format(sab="syz", saa="syy", sbb="szz")})
             / sqrt((1e0 - {_PC_R.format(sab="sxz", saa="sxx", sbb="szz")}
                           * {_PC_R.format(sab="sxz", saa="sxx", sbb="szz")})
                    * (1e0 - {_PC_R.format(sab="syz", saa="syy", sbb="szz")}
                             * {_PC_R.format(sab="syz", saa="syy", sbb="szz")}))
             * 1000000e0) AS BIGINT) AS partial_xy_given_z_ppm
    FROM mom
    """,
)
def partial_corr_rev_qty_disc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation of monthly revenue and
    quantity CONTROLLING for total discount —
    r_xy·z = (r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²)) — does the
    revenue-volume link survive once discounting is held fixed? All
    covariances are exact n-scaled integers (HUGEINT/DECIMAL(38,0));
    the three pairwise r's and the partial move to doubles through
    scale-0 conversions and IDENTICAL expression text in both
    engines (each r is one division + one sqrt — the same subterm
    repeated verbatim, so both engines evaluate the same IEEE ops).
    One fact scan to the bounded month table."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    monthly = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        ).cast("bigint").alias("x"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("y"),
        F.sum(
            F.expr("CAST(CAST(l_discount AS DECIMAL(30,2)) * 100 AS BIGINT)")
        ).cast("bigint").alias("z"),
    ).localCheckpoint(eager=True)  # feeds totals + centering
    tot = monthly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("z").cast("bigint").alias("sz"),
    )
    ctr = monthly.crossJoin(F.broadcast(tot)).selectExpr(
        "CAST(n * x - sx AS DECIMAL(38,0)) AS dx",
        "CAST(n * y - sy AS DECIMAL(38,0)) AS dy",
        "CAST(n * z - sz AS DECIMAL(38,0)) AS dz",
        "n",
    )
    mom = ctr.agg(
        F.max("n").alias("n"),
        F.sum(F.expr("dx * dx")).alias("sxx"),
        F.sum(F.expr("dy * dy")).alias("syy"),
        F.sum(F.expr("dz * dz")).alias("szz"),
        F.sum(F.expr("dx * dy")).alias("sxy"),
        F.sum(F.expr("dx * dz")).alias("sxz"),
        F.sum(F.expr("dy * dz")).alias("syz"),
    )
    rxy = _PC_R.format(sab="sxy", saa="sxx", sbb="syy")
    rxz = _PC_R.format(sab="sxz", saa="sxx", sbb="szz")
    ryz = _PC_R.format(sab="syz", saa="syy", sbb="szz")
    return mom.selectExpr(
        "CAST(n AS BIGINT) AS n_months",
        f"CAST(floor({rxy} * 1000000e0) AS BIGINT) AS r_xy_ppm",
        f"CAST(floor({rxz} * 1000000e0) AS BIGINT) AS r_xz_ppm",
        f"CAST(floor({ryz} * 1000000e0) AS BIGINT) AS r_yz_ppm",
        f"CAST(floor(({rxy} - {rxz} * {ryz})"
        f" / sqrt((1e0 - {rxz} * {rxz}) * (1e0 - {ryz} * {ryz}))"
        " * 1000000e0) AS BIGINT) AS partial_xy_given_z_ppm",
    )


_CCF_LAGS = list(range(-6, 7))


@register(
    "lead_lag_ccf_rev_qty",
    f"""
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', l_shipdate) AS month,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
      FROM lineitem GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY month) AS i, x, y FROM monthly
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy
      FROM idx
    ), ctr AS MATERIALIZED (
      SELECT i, (n::HUGEINT * x - sx) AS dx, (n::HUGEINT * y - sy) AS dy
      FROM idx, tot
    ), led AS MATERIALIZED (
      SELECT i, dx, dy,
             {",".join(f"lead(dy, {k}) OVER (ORDER BY i) AS dyp{k}" for k in range(1, 7))},
             {",".join(f"lag(dy, {k}) OVER (ORDER BY i) AS dym{k}" for k in range(1, 7))}
      FROM ctr
    ), mom AS MATERIALIZED (
      SELECT SUM(dx * dx) AS cxx, SUM(dy * dy) AS cyy,
             SUM(dx * dy) AS c0,
             {",".join(f"SUM(dx * dyp{k}) AS cp{k}" for k in range(1, 7))},
             {",".join(f"SUM(dx * dym{k}) AS cm{k}" for k in range(1, 7))}
      FROM led
    ), lagrows AS MATERIALIZED (
      SELECT 0 AS lag, c0 AS cv FROM mom
      {" ".join(f"UNION ALL SELECT {k}, cp{k} FROM mom" for k in range(1, 7))}
      {" ".join(f"UNION ALL SELECT -{k}, cm{k} FROM mom" for k in range(1, 7))}
    ), scored AS MATERIALIZED (
      SELECT lagrows.lag,
             (CASE WHEN lagrows.cv >= 0 THEN 1 ELSE -1 END)
             * floor(CAST(abs(lagrows.cv) AS DOUBLE) * 1000000e0
                     / sqrt(CAST(mom.cxx AS DOUBLE)
                            * CAST(mom.cyy AS DOUBLE))) AS r_raw
      FROM lagrows, mom
    )
    SELECT lag, CAST(r_raw AS BIGINT) AS ccf_ppm,
           abs(r_raw) = MAX(abs(r_raw)) OVER () AS is_peak
    FROM scored
    """,
)
def lead_lag_ccf_rev_qty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between monthly revenue and monthly
    quantity at lags −6..+6 (positive lag = quantity LEADS revenue by
    k months), peak flagged — the "which series moves first"
    diagnostic behind demand forecasting; rolling_corr_revenue_qty
    sees only the contemporaneous link. Cross-covariances are exact
    n-scaled integers off lead/lag windows over the bounded month
    table (unnormalized by the per-lag overlap — the standard biased
    CCF, documented); the normalization √(cxx·cyy) and the floor are
    the only double ops, sign factored. One fact scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    monthly = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        ).cast("bigint").alias("x"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("y"),
    )
    wi = Window.orderBy("month")
    idx = monthly.select(
        F.row_number().over(wi).alias("i"), "x", "y"
    ).localCheckpoint(eager=True)  # feeds totals + centering
    tot = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    ctr = idx.crossJoin(F.broadcast(tot)).selectExpr(
        "i",
        "CAST(n * x - sx AS DECIMAL(38,0)) AS dx",
        "CAST(n * y - sy AS DECIMAL(38,0)) AS dy",
    )
    wl = Window.orderBy("i")
    led = ctr.select(
        "dx",
        "dy",
        *[F.lead("dy", k).over(wl).alias(f"dyp{k}") for k in range(1, 7)],
        *[F.lag("dy", k).over(wl).alias(f"dym{k}") for k in range(1, 7)],
    )
    mom = led.agg(
        F.sum(F.expr("dx * dx")).alias("cxx"),
        F.sum(F.expr("dy * dy")).alias("cyy"),
        F.sum(F.expr("dx * dy")).alias("c0"),
        *[F.sum(F.expr(f"dx * dyp{k}")).alias(f"cp{k}") for k in range(1, 7)],
        *[F.sum(F.expr(f"dx * dym{k}")).alias(f"cm{k}") for k in range(1, 7)],
    )
    structs = ", ".join(
        ["struct(0 AS lag, c0 AS cv)"]
        + [f"struct({k} AS lag, cp{k} AS cv)" for k in range(1, 7)]
        + [f"struct(-{k} AS lag, cm{k} AS cv)" for k in range(1, 7)]
    )
    scored = mom.selectExpr(
        "cxx", "cyy", f"explode(array({structs})) AS e"
    ).selectExpr(
        "e.lag AS lag",
        "(CASE WHEN e.cv >= 0 THEN 1 ELSE -1 END)"
        " * floor(CAST(abs(e.cv) AS DOUBLE) * 1000000e0"
        "         / sqrt(CAST(cxx AS DOUBLE) * CAST(cyy AS DOUBLE)))"
        " AS r_raw",
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return scored.select(
        "lag",
        F.expr("CAST(r_raw AS BIGINT)").alias("ccf_ppm"),
        (F.abs(F.col("r_raw")) == F.max(F.abs(F.col("r_raw"))).over(w_all)).alias(
            "is_peak"
        ),
    )


@register(
    "moods_median_status",
    """
    WITH v AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v
      FROM orders
    ), med AS MATERIALIZED (
      SELECT v AS gm FROM (
        SELECT v, row_number() OVER (ORDER BY v) AS rk, COUNT(*) OVER () AS n
        FROM v
      ) WHERE rk = (n + 1) // 2
    ), cells AS MATERIALIZED (
      SELECT g,
             CAST(count_if(v.v > med.gm) AS BIGINT) AS above,
             CAST(count_if(v.v <= med.gm) AS BIGINT) AS at_or_below
      FROM v, med GROUP BY 1
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(above) AS BIGINT) AS ta,
             CAST(SUM(at_or_below) AS BIGINT) AS tb,
             CAST(SUM(above + at_or_below) AS BIGINT) AS n
      FROM cells
    )
    SELECT g AS o_orderstatus, above, at_or_below,
           CAST(((above + at_or_below) * ta * 1000000) // tot.n AS BIGINT)
             AS e_above_scaled,
           CASE WHEN ta > 0 AND tb > 0 THEN CAST(
             ((above::HUGEINT * tot.n - (above + at_or_below)::HUGEINT * ta)
              * (above::HUGEINT * tot.n - (above + at_or_below)::HUGEINT * ta)
              * 1000000)
             // ((above + at_or_below)::HUGEINT * ta * tot.n)
             + ((at_or_below::HUGEINT * tot.n
                 - (above + at_or_below)::HUGEINT * tb)
                * (at_or_below::HUGEINT * tot.n
                   - (above + at_or_below)::HUGEINT * tb)
                * 1000000)
               // ((above + at_or_below)::HUGEINT * tb * tot.n)
           AS BIGINT) END AS chi2_contrib_ppm
    FROM cells, tot
    """,
)
def moods_median_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across order statuses (the k-sample
    location test on a single order statistic): split every order at
    the GRAND lower median, count above / at-or-below per status,
    and emit each status's chi-square contribution
    Σ_cells (O·N − n_g·col)²/(n_g·col·N) ppm-scaled — cross-
    multiplied so the expected counts never materialize as
    fractions (two truncating divisions per row, both engines floor
    identically). The grand median rides the same ranking recipe as
    the other order statistics (the oracle's global window is the
    sf0.01 shortcut); cells are ONE conditional aggregation."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_kth_smallest,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v = o.select(
        F.col("o_orderstatus").alias("g"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("v"),
    ).localCheckpoint(eager=True)  # feeds the median recipe + the cells
    med = grouped_kth_smallest(
        v.select(F.lit(1).alias("one"), "v"),
        "one",
        "v",
        k_of_n="(n + 1) div 2",
    ).select(F.col("kth_value").alias("gm"))
    cells = (
        v.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(
            F.count_if(F.col("v") > F.col("gm")).cast("bigint").alias("above"),
            F.count_if(F.col("v") <= F.col("gm"))
            .cast("bigint")
            .alias("at_or_below"),
        )
        .localCheckpoint(eager=True)  # bounded; feeds totals + output
    )
    tot = cells.agg(
        F.sum("above").cast("bigint").alias("ta"),
        F.sum("at_or_below").cast("bigint").alias("tb"),
        F.sum(F.col("above") + F.col("at_or_below")).cast("bigint").alias("n"),
    )
    return cells.crossJoin(F.broadcast(tot)).selectExpr(
        "g AS o_orderstatus",
        "above",
        "at_or_below",
        "CAST(((above + at_or_below) * ta * 1000000) div n AS BIGINT)"
        " AS e_above_scaled",
        # ta=0 happens when the grand lower median equals the max
        # value (every row at-or-below); ANSI div would raise — emit
        # NULL instead (ADVICE r9; oracle mirrors the CASE).
        "CASE WHEN ta > 0 AND tb > 0 THEN CAST("
        " ((CAST(above AS DECIMAL(38,0)) * n"
        "   - CAST(above + at_or_below AS DECIMAL(38,0)) * ta)"
        "  * (CAST(above AS DECIMAL(38,0)) * n"
        "     - CAST(above + at_or_below AS DECIMAL(38,0)) * ta)"
        "  * 1000000)"
        " div (CAST(above + at_or_below AS DECIMAL(38,0)) * ta * n)"
        " + ((CAST(at_or_below AS DECIMAL(38,0)) * n"
        "     - CAST(above + at_or_below AS DECIMAL(38,0)) * tb)"
        "    * (CAST(at_or_below AS DECIMAL(38,0)) * n"
        "       - CAST(above + at_or_below AS DECIMAL(38,0)) * tb)"
        "    * 1000000)"
        "   div (CAST(above + at_or_below AS DECIMAL(38,0)) * tb * n)"
        " AS BIGINT) END AS chi2_contrib_ppm",
    )


# =====================================================================
# Round 9, wave 23: differential-privacy mechanisms (deterministic
# seeded randomness — oracle bit-exact)
# =====================================================================

def _mix32_sql(expr: str, salt: int, xor_fn: str) -> str:
    """Two rounds of the house xor-shift-multiply finalizer on
    ``expr + salt``, both engines (CLAUDE.md portable-hash recipe);
    ``xor_fn`` is 'xor' for DuckDB oracle SQL, '^'-style infix is not
    shared, so Spark passes a lambda-free two-arg form too."""
    s0 = f"(({expr}) % 4294967296 * 73244475 + {salt} * 2246822519) % 4294967296"
    s1 = f"({xor_fn}({s0}, ({s0}) >> 16) * 73244475) % 4294967296"
    return f"({xor_fn}({s1}, ({s1}) >> 16) * 73244475) % 4294967296"


# ctz via the mod-37 de Bruijn trick: the lowest set bit v = h & -h is
# a power of two, and 2^k mod 37 are DISTINCT for k = 0..31 (2 has
# order 36 mod 37) — one bounded CASE maps residue -> k.
_CTZ_POW37 = {pow(2, k, 37): k for k in range(32)}
_CTZ_CASE = (
    "CASE WHEN {h} = 0 THEN 32 ELSE "
    + "CASE (({h}) & -({h})) % 37 "
    + " ".join(f"WHEN {r} THEN {k}" for r, k in sorted(_CTZ_POW37.items()))
    + " END END"
)


@register(
    "dp_geometric_counts_nations",
    f"""
    WITH cnt AS MATERIALIZED (
      SELECT n.n_name, n.n_nationkey,
             CAST(COUNT(*) AS BIGINT) AS true_count
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), h AS MATERIALIZED (
      SELECT n_name, true_count,
             {_mix32_sql("n_nationkey * 2 + 1", 1091, "xor")} AS h1,
             {_mix32_sql("n_nationkey * 2 + 2", 4639, "xor")} AS h2
      FROM cnt
    ), noise AS MATERIALIZED (
      SELECT n_name, true_count,
             CAST({_CTZ_CASE.format(h="h1")} AS BIGINT)
             - CAST({_CTZ_CASE.format(h="h2")} AS BIGINT) AS z
      FROM h
    )
    SELECT n_name, true_count, z AS noise,
           CAST(true_count + z AS BIGINT) AS noisy_count
    FROM noise
    """,
)
def dp_geometric_counts_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε = ln 2 differentially-private customer counts per nation via
    the DISCRETE Laplace (two-sided geometric) mechanism (Ghosh,
    Roughgarden & Sundararajan, STOC'09 — the utility-optimal
    mechanism for count queries): Z = G₁ − G₂ with G ~ Geometric(½),
    and a Geometric(½) draw is EXACTLY the trailing-zero count of a
    uniform 32-bit integer — here the house portable xor-shift hash
    of the nation key, so the "randomness" is seeded, reproducible,
    and bit-identical in both engines (release pipelines want
    deterministic replays; swap the salt per release for fresh
    draws). ctz is branch-free algebra: lowest-set-bit isolation
    h & −h plus the mod-37 de Bruijn residue lookup (2 has order 36
    mod 37, so 2^k mod 37 is injective for k < 32). Sensitivity-1
    count + Laplace(p=½) noise ⇒ ε = ln 2. Zero floats, one bounded
    CASE per draw."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cnt = (
        c.join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", "n_nationkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_count"))
    )
    def spark_xor(a: str, b: str) -> str:
        return f"({a}) ^ ({b})"

    def mix(expr: str, salt: int) -> str:
        s0 = f"(({expr}) % 4294967296 * 73244475 + {salt} * 2246822519) % 4294967296"
        s1 = f"((({s0}) ^ (({s0}) >> 16)) * 73244475) % 4294967296"
        return f"((({s1}) ^ (({s1}) >> 16)) * 73244475) % 4294967296"

    h = cnt.selectExpr(
        "n_name",
        "true_count",
        f"{mix('n_nationkey * 2 + 1', 1091)} AS h1",
        f"{mix('n_nationkey * 2 + 2', 4639)} AS h2",
    )
    noise = h.selectExpr(
        "n_name",
        "true_count",
        f"CAST({_CTZ_CASE.format(h='h1')} AS BIGINT)"
        f" - CAST({_CTZ_CASE.format(h='h2')} AS BIGINT) AS z",
    )
    return noise.selectExpr(
        "n_name",
        "true_count",
        "z AS noise",
        "CAST(true_count + z AS BIGINT) AS noisy_count",
    )


@register(
    "randomized_response_returns",
    f"""
    WITH rr AS MATERIALIZED (
      SELECT p.p_brand,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS t,
             CASE WHEN ({_mix32_sql("l.l_orderkey * 8 + l.l_linenumber", 7211, "xor")}) % 4 = 0
                  THEN 1 ELSE 0 END AS flip
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), agg AS MATERIALIZED (
      SELECT p_brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS true_returns,
             CAST(count_if((t + flip) % 2 = 1) AS BIGINT) AS reported_returns
      FROM rr GROUP BY 1
    )
    SELECT p_brand, n, true_returns, reported_returns,
           CAST((true_returns * 1000000) // n AS BIGINT) AS true_ppm,
           CAST((CASE WHEN 4 * reported_returns >= n THEN 1 ELSE -1 END)
                * ((abs(4 * reported_returns - n) * 1000000) // (2 * n))
                AS BIGINT) AS estimated_ppm
    FROM agg
    """,
)
def randomized_response_returns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner's randomized response (JASA 1965) on the per-row return
    flag: each row reports the TRUTH with probability 3/4 and the
    flip with probability 1/4 (the dyadic design — two seeded hash
    bits decide, so the obfuscation is reproducible and bit-exact in
    both engines), giving each individual row plausible deniability
    (ε = ln 3 local DP) while the aggregate debiases EXACTLY:
    P(report) = 1/4 + p/2 ⇒ p̂ = (4·obs − n)/(2n), emitted as a
    sign-factored ppm integer next to the true rate the curator can
    compare against. One broadcast-dim pass, zero floats."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")

    def mix(expr: str, salt: int) -> str:
        s0 = f"(({expr}) % 4294967296 * 73244475 + {salt} * 2246822519) % 4294967296"
        s1 = f"((({s0}) ^ (({s0}) >> 16)) * 73244475) % 4294967296"
        return f"((({s1}) ^ (({s1}) >> 16)) * 73244475) % 4294967296"

    rr = li.join(
        pt.select("p_partkey", "p_brand"),
        li["l_partkey"] == F.col("p_partkey"),
    ).selectExpr(
        "p_brand",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS t",
        f"CASE WHEN ({mix('l_orderkey * 8 + l_linenumber', 7211)}) % 4 = 0"
        " THEN 1 ELSE 0 END AS flip",
    )
    agg = rr.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("true_returns"),
        F.count_if(F.expr("(t + flip) % 2 = 1"))
        .cast("bigint")
        .alias("reported_returns"),
    )
    return agg.selectExpr(
        "p_brand",
        "n",
        "true_returns",
        "reported_returns",
        "CAST((true_returns * 1000000) div n AS BIGINT) AS true_ppm",
        "CAST((CASE WHEN 4 * reported_returns >= n THEN 1 ELSE -1 END)"
        " * ((abs(4 * reported_returns - n) * 1000000) div (2 * n))"
        " AS BIGINT) AS estimated_ppm",
    )


# =====================================================================
# Round 9, wave 24: clustering validity indices
# =====================================================================

@register(
    "kmeans_validity_embeddings",
    """
    WITH vecs AS MATERIALIZED (
      SELECT vec_id AS vid,
             CAST(unnest(range(0, len(embedding))) AS BIGINT) AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024) + 1024
                  AS BIGINT) AS x
      FROM embeddings
    ), seeds AS (
      SELECT vid FROM (
        SELECT vid, row_number() OVER (ORDER BY vid) AS rn
        FROM (SELECT DISTINCT vid FROM vecs)
      ) WHERE rn <= 8
    ), c0 AS MATERIALIZED (
      SELECT v.vid AS cluster, v.d, v.x AS cd
      FROM vecs v JOIN seeds s ON s.vid = v.vid
    ), a1 AS MATERIALIZED (
      SELECT v.vid, c.cluster,
             CAST(SUM((v.x - c.cd) * (v.x - c.cd)) AS BIGINT) AS dist
      FROM vecs v JOIN c0 c ON v.d = c.d
      GROUP BY 1, 2
    ), b1 AS MATERIALIZED (
      SELECT vid, cluster FROM (
        SELECT vid, cluster,
               row_number() OVER (PARTITION BY vid ORDER BY dist, cluster) AS rn
        FROM a1
      ) WHERE rn = 1
    ), c1 AS MATERIALIZED (
      SELECT b.cluster, v.d, CAST(SUM(v.x) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS cd
      FROM b1 b JOIN vecs v ON v.vid = b.vid
      GROUP BY 1, 2
    ), a2 AS MATERIALIZED (
      SELECT v.vid, c.cluster,
             CAST(SUM((v.x - c.cd) * (v.x - c.cd)) AS BIGINT) AS dist
      FROM vecs v JOIN c1 c ON v.d = c.d
      GROUP BY 1, 2
    ), b2 AS MATERIALIZED (
      SELECT vid, cluster FROM (
        SELECT vid, cluster, dist,
               row_number() OVER (PARTITION BY vid ORDER BY dist, cluster) AS rn
        FROM a2
      ) WHERE rn = 1
    ), c2 AS MATERIALIZED (
      SELECT b.cluster, v.d, CAST(SUM(v.x) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS cd
      FROM b2 b JOIN vecs v ON v.vid = b.vid
      GROUP BY 1, 2
    ), fin AS MATERIALIZED (
      SELECT b.vid, b.cluster AS own, c.cluster,
             CAST(SUM((v.x - c.cd) * (v.x - c.cd)) AS BIGINT) AS dist
      FROM b2 b JOIN vecs v ON v.vid = b.vid JOIN c2 c ON c.d = v.d
      GROUP BY 1, 2, 3
    ), pts AS MATERIALIZED (
      SELECT vid, own,
             CAST(MIN(CASE WHEN cluster = own THEN dist END) AS BIGINT) AS a2d,
             CAST(MIN(CASE WHEN cluster <> own THEN dist END) AS BIGINT) AS b2d
      FROM fin GROUP BY 1, 2
    ), sil AS MATERIALIZED (
      SELECT own AS cluster, a2d, b2d,
             CASE WHEN greatest(a2d, b2d) > 0 THEN
               (CASE WHEN b2d >= a2d THEN 1 ELSE -1 END)
               * ((abs(b2d - a2d) * 1000000) // greatest(a2d, b2d))
             ELSE 0 END AS s_ppm
      FROM pts
    ), pc AS MATERIALIZED (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST((CASE WHEN SUM(s_ppm) >= 0 THEN 1 ELSE -1 END)
                  * (abs(SUM(s_ppm)) // COUNT(*)) AS BIGINT)
               AS mean_silhouette_ppm,
             CAST(count_if(b2d < a2d) AS BIGINT) AS n_negative,
             CAST(SUM(a2d) AS BIGINT) AS w_part
      FROM sil GROUP BY 1
    ), tt AS MATERIALIZED (
      SELECT CAST(SUM(w_part) AS BIGINT) AS w,
             CAST(SUM(n_members) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS kk
      FROM pc
    ), sc AS MATERIALIZED (
      SELECT SUM(nd::HUGEINT * sxx - sx::HUGEINT * sx) AS tn2 FROM (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(SUM(x) AS BIGINT) AS sx, SUM(x::HUGEINT * x) AS sxx
        FROM vecs GROUP BY d
      )
    )
    SELECT pc.cluster, pc.n_members, pc.mean_silhouette_ppm, pc.n_negative,
           CASE WHEN tt.kk > 1 AND tt.w > 0 AND tt.n > tt.kk THEN CAST(
             (CASE WHEN sc.tn2 >= tt.w::HUGEINT * tt.n THEN 1 ELSE -1 END)
             * ((abs(sc.tn2 - tt.w::HUGEINT * tt.n)
                 * (tt.n - tt.kk) * 1000000)
                // (tt.w::HUGEINT * tt.n * (tt.kk - 1))) AS BIGINT)
           END AS ch_ppm
    FROM pc, tt, sc
    """,
)
def kmeans_validity_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal clustering-validity readout for the portable k-means
    fit (operators/ml.py kmeans_validity_indices): per cluster the
    SIMPLIFIED silhouette on exact squared integer distances to the
    final centroids (per-point ppm floors, sign-factored mean), the
    count of points whose nearest final centroid is not their
    assigned one, and the Calinski-Harabasz variance ratio (global
    scalar, n-scaled scatter so n cancels exactly) — the "was k = 8
    a good idea" diagnostics, all integer divisions. Same unrolled
    two-round Lloyd prefix as kmeans_lloyd_portable; one extra
    k-wide broadcast scoring pass — no second corpus shuffle."""
    from dpe_energy_performance_analysis_etl_spark.operators.ml import (
        kmeans_validity_indices,
    )

    emb = read_embeddings(spark, sf_dir)
    return kmeans_validity_indices(emb, k=8, iterations=2)


# =====================================================================
# Round 9, wave 25: Haar wavelet energy decomposition
# =====================================================================

_HAAR_LEVELS = 4  # over the first 64 months: 32+16+8+4 detail coeffs


def _haar_oracle_level(lvl: int) -> str:
    src = "base0" if lvl == 1 else f"s{lvl - 1}"
    return f"""
    , d{lvl} AS MATERIALIZED (
      SELECT (k - 1) // 2 AS k,
             SUM(CASE WHEN k % 2 = 1 THEN v ELSE -v END) AS d,
             SUM(v) AS s
      FROM {src} GROUP BY 1 HAVING COUNT(*) = 2
    ), s{lvl} AS MATERIALIZED (
      SELECT k + 1 AS k, s AS v FROM d{lvl}
    ), e{lvl} AS MATERIALIZED (
      SELECT {lvl} AS level, CAST(COUNT(*) AS BIGINT) AS n_coeffs,
             CAST(SUM(d::HUGEINT * d) * {1 << (_HAAR_LEVELS - lvl)}
                  AS HUGEINT) AS e_scaled
      FROM d{lvl}
    )"""


@register(
    "haar_energy_revenue",
    f"""
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), base0 AS MATERIALIZED (
      SELECT k, rev AS v FROM (
        SELECT row_number() OVER (ORDER BY month) AS k, rev FROM monthly
      ) WHERE k <= 64
    ){"".join(_haar_oracle_level(l) for l in range(1, _HAAR_LEVELS + 1))}
    , alle AS MATERIALIZED (
      {" UNION ALL ".join(f"SELECT * FROM e{l}" for l in range(1, _HAAR_LEVELS + 1))}
    ), tot AS MATERIALIZED (
      SELECT SUM(e_scaled) AS te FROM alle
    )
    SELECT level, n_coeffs, CAST(e_scaled AS DOUBLE) AS energy_scaled,
           CASE WHEN tot.te > 0 THEN
             CAST((e_scaled * 1000000) // tot.te AS BIGINT)
           END AS share_ppm
    FROM alle, tot
    """,
)
def haar_energy_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy decomposition of the first 64 months of
    revenue (Haar 1910; the wavelet variance spectrum): level-l
    detail coefficients are UNNORMALIZED pairwise differences of the
    level-(l−1) smooth — exact integers — and each level's energy is
    rescaled by 2^(L−l) so the dyadic 1/2^l normalizations cancel
    into one exact integer share: which time-scale (2-month swings
    up to 16-month cycles) carries the variance? The scale-localized
    complement of Ljung-Box (correlation per lag) and R/S (global
    memory). Four levels of bounded stride-2 aggregations over the
    pinned month table; energies emitted as scale-0 doubles, shares
    as exact ppm integers."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    )
    wi = Window.orderBy("month")
    cur = (
        monthly.select(F.row_number().over(wi).alias("k"), F.col("rev").alias("v"))
        .where(F.col("k") <= 64)
        .localCheckpoint(eager=True)
    )
    levels = []
    for lvl in range(1, _HAAR_LEVELS + 1):
        dd = (
            cur.groupBy(F.expr("(k - 1) div 2").alias("k"))
            .agg(
                F.sum(F.expr("CASE WHEN k % 2 = 1 THEN v ELSE -v END")).alias("d"),
                F.sum("v").alias("s"),
                F.count(F.lit(1)).alias("_c"),
            )
            # a trailing orphan is not a pair — it carries no Haar
            # difference and must not leak into the next level
            .where(F.col("_c") == 2)
            .drop("_c")
        )
        # bounded (≤64/2^l rows), consumed by the energy agg AND the
        # next level — pinned
        dd = dd.localCheckpoint(eager=True)
        levels.append(
            dd.agg(
                F.lit(lvl).alias("level"),
                F.count(F.lit(1)).cast("bigint").alias("n_coeffs"),
                F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d"))
                .alias("_raw_e"),
            ).selectExpr(
                "level",
                "n_coeffs",
                f"_raw_e * {1 << (_HAAR_LEVELS - lvl)} AS e_scaled",
            )
        )
        # re-base k to 1 so (k - 1) div 2 never sees a negative
        cur = dd.select((F.col("k") + 1).alias("k"), F.col("s").alias("v"))
    alle = levels[0]
    for o in levels[1:]:
        alle = alle.unionAll(o)
    alle = alle.localCheckpoint(eager=True)  # 4 rows; feeds total + output
    tot = alle.agg(F.sum("e_scaled").alias("te"))
    return alle.crossJoin(F.broadcast(tot)).selectExpr(
        "level",
        "n_coeffs",
        "CAST(e_scaled AS DOUBLE) AS energy_scaled",
        "CASE WHEN te > 0 THEN CAST((e_scaled * 1000000) div te AS BIGINT)"
        " END AS share_ppm",
    )
