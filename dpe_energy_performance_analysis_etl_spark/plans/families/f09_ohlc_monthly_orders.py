"""Query-registry family chunk 9 (auto-split from the
historical plans/queries.py lines 16145-17841; registration
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

@register(
    "ohlc_monthly_orders",
    """
    WITH base AS MATERIALIZED (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS mn,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS cents,
             o_orderdate, o_orderkey
      FROM orders
    ), r AS MATERIALIZED (
      SELECT mn, cents,
             row_number() OVER (PARTITION BY mn
               ORDER BY o_orderdate, o_orderkey) AS rf,
             row_number() OVER (PARTITION BY mn
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rl
      FROM base
    )
    SELECT mn AS month_num,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(CASE WHEN rf = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           CAST(MAX(CASE WHEN rl = 1 THEN cents END) AS BIGINT) AS close_cents,
           CAST(SUM(cents) AS BIGINT) AS volume_cents
    FROM r GROUP BY 1
    """,
)
def ohlc_monthly_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick rollup of order values by month — the
    order-sensitive aggregation family (first/last by a total
    (date, key) order + min/max + volume) every time-series store
    exposes. Spark computes open/close with min_by/max_by over a
    STRUCT ordering key in the SAME single aggregation as the other
    measures (no window at all — the oracle's row_number windows are
    the sf0.01 shortcut); exact cents throughout. volume_cents as
    BIGINT is safe to ~9e18 cents/month (DECIMAL carry at larger
    scale documented in the operator note)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.expr(
            "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)"
        ).alias("mn"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
        F.struct("o_orderdate", "o_orderkey").alias("ok"),
    )
    return base.groupBy(F.col("mn").alias("month_num")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min_by("cents", "ok").cast("bigint").alias("open_cents"),
        F.max("cents").cast("bigint").alias("high_cents"),
        F.min("cents").cast("bigint").alias("low_cents"),
        F.max_by("cents", "ok").cast("bigint").alias("close_cents"),
        F.sum("cents").cast("bigint").alias("volume_cents"),
    )


@register(
    "cumulative_adopters_by_type",
    """
    WITH fs AS MATERIALIZED (
      SELECT event_type, user_id, MIN(epoch_us(ts) // 86400000000) AS d
      FROM events GROUP BY 1, 2
    ), per AS MATERIALIZED (
      SELECT event_type, CAST(d AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS new_users
      FROM fs GROUP BY 1, 2
    )
    SELECT event_type, day, new_users,
           CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM per
    """,
)
def cumulative_adopters_by_type_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-adoption curve per event type: each user's FIRST
    day doing each action, new adopters per (type, day), and the
    running total — the feature-adoption chart, computed without a
    single sliding distinct (one per-(type, user) min, one bounded
    per-(type, day) count, one prefix sum over the BOUNDED
    (type, day) table). Per-type, not global first-seen: on this
    events shape every user appears within the first days of the
    range, so the global curve is a 2-row degenerate — per-type
    adoption spreads over weeks (measured)."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )

    ev = read_events(spark, sf_dir)
    fs = (
        ev.select("event_type", "user_id", epoch_micros("ts").alias("us"))
        .selectExpr("event_type", "user_id", "us div 86400000000 AS d")
        .groupBy("event_type", "user_id")
        .agg(F.min("d").alias("d"))
    )
    per = fs.groupBy("event_type", F.col("d").cast("bigint").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # bounded window: one row per (type, day)
    return per.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


@register(
    "good_turing_docs",
    """
    WITH toks AS (
      SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), vocab AS MATERIALIZED (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
        FROM toks
      ) GROUP BY 1
    ), cc AS MATERIALIZED (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS n_c FROM vocab GROUP BY 1
    )
    SELECT a.c AS c, a.n_c AS n_c,
           CAST((a.c + 1) * b.n_c * 1000000 // a.n_c AS BIGINT)
             AS c_star_ppm
    FROM cc a LEFT JOIN cc b ON b.c = a.c + 1
    WHERE a.c <= 20
    """,
)
def good_turing_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency smoothing over the corpus TRIGRAM types
    (Good, Biometrika 1953; the Katz-backoff building block): for
    each observed count c ≤ 20, the count-of-counts N_c and the
    smoothed c* = (c+1)·N_{c+1}/N_c as exact ppm — the estimate of
    how much probability mass the rare types REALLY carry (c* << c
    flags a heavy tail; the c=1 row's mass estimates unseen types).
    Trigrams, not unigrams, because GT lives where counts are small —
    this corpus's unigram vocabulary has min count 26 and the c ≤ 20
    head is empty (measured), while its 16k trigram types span counts
    1-8. One n-gram aggregation, one BOUNDED counts-of-counts table,
    one self-join on c+1 (NULL c_star where N_{c+1}=0 — the honest
    gap, not a fake zero)."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import ngrams_expr

    docs = read_documents(spark, sf_dir)
    vocab = (
        docs.select(F.explode(ngrams_expr("text", 3)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    # bounded (one row per distinct count), consumed as BOTH join
    # sides — cache, or the trigram aggregation runs twice
    cc = vocab.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c")
    ).cache()
    a = cc.where(F.col("c") <= 20).alias("a")
    b = cc.select(
        (F.col("c") - 1).alias("c_prev"), F.col("n_c").alias("n_next")
    ).alias("b")
    return (
        a.join(F.broadcast(b), F.col("a.c") == F.col("c_prev"), "left")
        .select(
            F.col("a.c").alias("c"),
            F.col("a.n_c").alias("n_c"),
            F.expr(
                "CAST((c + 1) * n_next * 1000000 div n_c AS BIGINT)"
            ).alias("c_star_ppm"),
        )
    )


_KEY_COLS = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"]


def _kd_enc_sql(c: str) -> str:
    e = (
        f"CASE WHEN {c} IS NULL THEN 'n' "
        f"ELSE 'v' || CAST({c} AS VARCHAR) END"
    )
    return f"(CAST(length({e}) AS VARCHAR) || ':' || {e})"


_KD_ARMS = "\n      UNION ALL\n".join(
    [
        f"""      SELECT '{c}' AS candidate,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT {_kd_enc_sql(c)}) AS BIGINT) AS n_distinct
      FROM customer"""
        for c in _KEY_COLS
    ]
    + [
        f"""      SELECT '{a}+{b}' AS candidate,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT {_kd_enc_sql(a)} || '#' || {_kd_enc_sql(b)})
                  AS BIGINT) AS n_distinct
      FROM customer"""
        for i, a in enumerate(_KEY_COLS)
        for b in _KEY_COLS[i + 1 :]
    ]
)


@register(
    "key_discovery_customer",
    f"""
    WITH arms AS MATERIALIZED (
{_KD_ARMS}
    )
    SELECT candidate, n_rows, n_distinct,
           CAST(CASE WHEN n_distinct = n_rows THEN 1 ELSE 0 END AS BIGINT)
             AS is_key
    FROM arms
    """,
)
def key_discovery_customer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery over the customer profile columns
    (operators/quality.py key_discovery): all 5 singles + 10 pairs
    checked for uniqueness in ONE exploded pass (the oracle rescans
    per candidate — fine at sf0.01, exactly what a 100 TB profiler
    avoids). c_custkey and every pair containing it are keys; c_name
    is a key in disguise; the categorical columns and their pairs are
    not — both branches exercised. Injective length-prefixed value
    encoding so concatenation can't fake uniqueness."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        key_discovery,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return key_discovery(c, _KEY_COLS)


@register(
    "max_spend_drawdown_customers",
    """
    WITH seq AS MATERIALIZED (
      SELECT o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS cents,
             CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS peak
      FROM orders
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(peak) AS BIGINT) AS peak_cents,
           CAST(MAX(peak - cents) AS BIGINT) AS max_drawdown_cents
    FROM seq GROUP BY 1
    HAVING COUNT(*) >= 12
    """,
)
def max_spend_drawdown_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each customer's order-value series (orders
    in (date, key) order): max over time of (running-peak − current) —
    the classic risk statistic, here "biggest collapse from a
    customer's historical max order size", for customers with ≥ 12
    orders. Exact cents; the PARTITION BY customer window is bounded
    by per-customer activity (the user_event_paths class), never
    data-sized."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    seq = o.select(
        "o_custkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
        F.struct("o_orderdate", "o_orderkey").alias("ok"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("ok")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peaked = seq.withColumn("peak", F.max("cents").over(w).cast("bigint"))
    return (
        peaked.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.max("peak").cast("bigint").alias("peak_cents"),
            F.max(F.col("peak") - F.col("cents"))
            .cast("bigint")
            .alias("max_drawdown_cents"),
        )
        .where(F.col("n_orders") >= 12)
    )


@register(
    "view_purchase_within_hour",
    """
    WITH v AS MATERIALIZED (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             epoch_us(ts) // 86400000000 AS d
      FROM events WHERE event_type = 'view'
    ), p AS MATERIALIZED (
      SELECT user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'purchase'
    ), conv AS MATERIALIZED (
      SELECT v.d, CAST(COUNT(*) AS BIGINT) AS n_converted
      FROM v WHERE EXISTS (
        SELECT 1 FROM p WHERE p.user_id = v.user_id
          AND p.us > v.us AND p.us <= v.us + 3600000000
      )
      GROUP BY 1
    ), vd AS MATERIALIZED (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n_views FROM v GROUP BY 1
    )
    SELECT CAST(vd.d AS BIGINT) AS day, vd.n_views,
           CAST(COALESCE(conv.n_converted, 0) AS BIGINT) AS n_converted,
           CAST(COALESCE(conv.n_converted, 0) * 1000000 // vd.n_views
                AS BIGINT) AS conversion_ppm
    FROM vd LEFT JOIN conv ON vd.d = conv.d
    """,
)
def view_purchase_within_hour_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed conversion: per day, how many 'view' events were
    followed by a 'purchase' from the SAME user within one hour —
    the interval-join conversion metric (and the batch anchor for the
    stream-stream interval-join streaming surface). Candidate
    generation is equi-keyed on user_id (a LEFT SEMI join with the
    time-range predicate riding the hash join — never a cross
    product); per-user event counts bound the pair fan-out. n_views
    > 0 by construction, so the ppm division is safe."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )

    ev = read_events(spark, sf_dir)
    base = ev.select(
        "user_id", "event_id", "event_type", epoch_micros("ts").alias("us")
    )
    v = base.where(F.col("event_type") == "view").selectExpr(
        "user_id", "event_id", "us", "us div 86400000000 AS d"
    )
    p = base.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("us").alias("pus")
    )
    conv = (
        v.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pus") > F.col("us"))
            & (F.col("pus") <= F.col("us") + 3_600_000_000),
            "left_semi",
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_converted"))
    )
    vd = v.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("n_views"))
    return (
        vd.join(conv, "d", "left")
        .select(
            F.col("d").cast("bigint").alias("day"),
            "n_views",
            F.coalesce(F.col("n_converted"), F.lit(0))
            .cast("bigint")
            .alias("n_converted"),
            F.expr(
                "CAST(coalesce(n_converted, 0) * 1000000 div n_views AS BIGINT)"
            ).alias("conversion_ppm"),
        )
    )


def _soundex_chain_sql(word: str) -> str:
    """Shared Spark/DuckDB SQL for the simplified-soundex digit chain
    of ``word`` (lowercase letters): translate to the classic code
    digits, collapse runs of 1-6 with a fixed replace cascade (4
    passes halve runs — enough for any <= 16-char word; RE2 has no
    backreferences so the oracle cannot regex-collapse), drop the
    0s (vowels/h/w/y separate duplicates, then vanish)."""
    s = (
        f"translate({word}, 'abcdefghijklmnopqrstuvwxyz',"
        f" '01230120022455012623010202')"
    )
    for _ in range(4):
        for d in "123456":
            s = f"replace({s}, '{d}{d}', '{d}')"
    return f"replace({s}, '0', '')"


def _soundex_code_sql(word: str) -> str:
    """4-char simplified soundex: first letter (upper) + first 3
    collapsed digits of the REST of the word, zero-padded. Simplified
    vs NARA: no h/w transparency and no first-letter-digit merge —
    both engines implement the identical variant, and blocking only
    needs a consistent code."""
    rest = _soundex_chain_sql(f"substr({word}, 2)")
    return (
        f"(upper(substr({word}, 1, 1)) || rpad(substr({rest}, 1, 3), 3, '0'))"
    )


_SOUNDEX_WORD_SPARK = "regexp_extract(lower(p_name), '^[a-z]+', 0)"
_SOUNDEX_WORD_DUCK = "coalesce(regexp_extract(lower(p_name), '^[a-z]+'), '')"


@register(
    "soundex_blocking_parts",
    f"""
    WITH w AS MATERIALIZED (
      SELECT p_partkey, {_SOUNDEX_WORD_DUCK} AS w FROM part
    ), coded AS MATERIALIZED (
      SELECT p_partkey, w, {_soundex_code_sql('w')} AS code
      FROM w WHERE w <> ''
    )
    SELECT code,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct_words,
           CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS pair_count
    FROM coded GROUP BY 1
    """,
)
def soundex_blocking_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking for entity resolution: simplified soundex of
    each part name's first word, block sizes, distinct surface forms
    per block, and the candidate-pair budget n·(n−1)/2 — the blocking
    statistics that decide whether a phonetic key is usable before
    anyone runs the expensive match step (classic Fellegi-Sunter
    preprocessing). The code is pure string expressions (translate +
    a fixed replace cascade — identical semantics in both engines;
    RE2's missing backreferences rule out regex run-collapse in the
    oracle), zero shuffle until the bounded per-code count."""
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    coded = (
        pt.select(F.expr(_SOUNDEX_WORD_SPARK).alias("w"))
        .where(F.col("w") != "")
        .select("w", F.expr(_soundex_code_sql("w")).alias("code"))
    )
    return coded.groupBy("code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.countDistinct("w").cast("bigint").alias("n_distinct_words"),
        F.expr("CAST(count(1) * (count(1) - 1) div 2 AS BIGINT)").alias(
            "pair_count"
        ),
    )


# =====================================================================
# Round 9, wave 2: Kruskal-Wallis k-sample test, exact L-moments
# =====================================================================

_KW_SAMPLES = ["1", "2", "3", "4", "5"]
_KW_C = "\n             ".join(
    f"CAST(count_if(substr(o_orderpriority, 1, 1) = '{s}') AS BIGINT) AS c{i},"
    for i, s in enumerate(_KW_SAMPLES)
)
_KW_R = "\n             ".join(
    f"CAST(SUM(c{i}) AS BIGINT) AS n{i}, CAST(SUM(c{i} * mr2) AS BIGINT) AS r{i},"
    for i in range(5)
)
_KW_A = " + ".join(
    f"(CASE WHEN n{i} > 0 THEN (r{i}::HUGEINT * r{i} * 3000000) // n{i}"
    f" ELSE 0::HUGEINT END)"
    for i in range(5)
)
_KW_K = " + ".join(f"(CASE WHEN n{i} > 0 THEN 1 ELSE 0 END)" for i in range(5))


@register(
    "kruskal_wallis_status_priority",
    f"""
    WITH tiers AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             {_KW_C[:-1]}
      FROM orders GROUP BY 1, 2
    ), pre AS MATERIALIZED (
      SELECT *,
             CAST(COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cnt_before
      FROM tiers
    ), mr AS MATERIALIZED (
      SELECT g, cnt, c0, c1, c2, c3, c4,
             2 * cnt_before + cnt + 1 AS mr2
      FROM pre
    ), per AS MATERIALIZED (
      SELECT g, CAST(SUM(cnt) AS BIGINT) AS n,
             {_KW_R[:-1]}
      FROM mr GROUP BY 1
    )
    SELECT g AS o_orderstatus, n,
           CAST({_KW_K} AS BIGINT) AS k_nonempty,
           CAST(({_KW_A}) // (n * (n + 1)) - 3000000 * (n + 1)
                AS BIGINT) AS h_scaled
    FROM per
    """,
)
def kruskal_wallis_status_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the five order-priority classes, per
    order status (operators/stats.py kruskal_wallis_h — Kruskal &
    Wallis 1952): does order value distribute identically across
    priorities? The k-sample rank test with EXACT doubled mid-ranks
    and per-sample truncating divisions applied in the same floor
    order by both engines; prefix counts ride the
    grouped_running_totals range-partition recipe (the oracle's
    PARTITION BY window is the sf0.01 shortcut)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        kruskal_wallis_h,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.col("o_orderstatus").alias("st"),
        F.substring("o_orderpriority", 1, 1).alias("pr"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    return kruskal_wallis_h(
        base, "st", "pr", "cents", _KW_SAMPLES
    ).withColumnRenamed("st", "o_orderstatus")


@register(
    "l_moments_price_flag",
    """
    WITH ranked AS MATERIALIZED (
      SELECT l_returnflag AS g,
             CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             row_number() OVER (PARTITION BY l_returnflag
               ORDER BY CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
                             AS BIGINT)) AS i
      FROM lineitem
    ), agg AS MATERIALIZED (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(v::HUGEINT) AS s0,
             SUM((i - 1)::HUGEINT * v) AS s1,
             SUM(((i - 1) * (i - 2))::HUGEINT * v) AS t2,
             SUM((i - 1)::HUGEINT * ((i - 2) * (i - 3)) * v) AS t3
      FROM ranked GROUP BY 1
    )
    SELECT g AS l_returnflag, n,
           CAST((s0 * 1000) // n AS BIGINT) AS mean_milli,
           CAST(((2 * s1 - (n - 1) * s0) * 1000) // (n * (n - 1)) AS BIGINT)
             AS l2_milli,
           CASE WHEN 2 * s1 - (n - 1) * s0 > 0 THEN CAST(
             (CASE WHEN 6 * t2 - 6 * (n - 2) * s1 + (n - 1) * (n - 2) * s0
                        >= 0 THEN 1 ELSE -1 END)
             * (abs(6 * t2 - 6 * (n - 2) * s1 + (n - 1) * (n - 2) * s0)
                * 1000000)
               // ((n - 2) * (2 * s1 - (n - 1) * s0)) AS BIGINT)
           END AS t3_ppm,
           CASE WHEN 2 * s1 - (n - 1) * s0 > 0 THEN CAST(
             (CASE WHEN 20 * t3 - 30 * (n - 3) * t2
                        + 12 * (n - 2) * (n - 3) * s1
                        - (n - 1) * (n - 2) * (n - 3) * s0 >= 0
                   THEN 1 ELSE -1 END)
             * (abs(20 * t3 - 30 * (n - 3) * t2
                    + 12 * (n - 2) * (n - 3) * s1
                    - (n - 1) * (n - 2) * (n - 3) * s0) * 1000000)
               // ((n - 2) * (n - 3) * (2 * s1 - (n - 1) * s0))
             AS BIGINT)
           END AS t4_ppm
    FROM agg WHERE n >= 4
    """,
)
def l_moments_price_flag_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample L-moments of line price per return flag
    (operators/stats.py grouped_l_moments — Hosking 1990): L-scale,
    L-skewness, L-kurtosis as exact integer rationals on ranks — the
    robust tail-shape fingerprint classical moments can't give on
    heavy tails. Sign factored out of every truncating division
    (negative integer division floors/truncates differently across
    engines); ranks ride the range-partition recipe (the oracle's
    PARTITION BY window is the sf0.01 shortcut)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        grouped_l_moments,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.select(
        F.col("l_returnflag").alias("fl"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    return grouped_l_moments(base, "fl", "cents").withColumnRenamed(
        "fl", "l_returnflag"
    )


# =====================================================================
# Round 9, wave 3: time-to-convert median (k_of_n reuse), longest
# increasing subsequence per customer
# =====================================================================

@register(
    "time_to_convert_median",
    """
    WITH v AS MATERIALIZED (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             epoch_us(ts) // 86400000000 AS d
      FROM events WHERE event_type = 'view'
    ), p AS MATERIALIZED (
      SELECT user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'purchase'
    ), conv AS MATERIALIZED (
      SELECT v.d, v.event_id,
             MIN(p.us - v.us) AS delta_us
      FROM v JOIN p ON p.user_id = v.user_id
        AND p.us > v.us AND p.us <= v.us + 3600000000
      GROUP BY 1, 2
    ), ranked AS MATERIALIZED (
      SELECT d, delta_us,
             row_number() OVER (PARTITION BY d ORDER BY delta_us) AS rk,
             COUNT(*) OVER (PARTITION BY d) AS n
      FROM conv
    )
    SELECT CAST(d AS BIGINT) AS day, CAST(MAX(n) AS BIGINT) AS n_conversions,
           CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN delta_us END) // 1000
                AS BIGINT) AS median_delta_ms
    FROM ranked GROUP BY 1
    """,
)
def time_to_convert_median_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median time from a 'view' to that view's FIRST 'purchase'
    within one hour, per day — the latency half of the conversion
    funnel (view_purchase_within_hour counts; this times). The median
    is the exact lower-median order statistic via
    grouped_kth_smallest's k_of_n path (k = (n+1) div 2 read off the
    ranking recipe's own bounded sizes table — the r9 one-pass
    conformal machinery reused; the oracle's PARTITION BY window is
    the sf0.01 shortcut). Candidate pairs stay equi-keyed on
    user_id."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_kth_smallest,
    )

    ev = read_events(spark, sf_dir)
    base = ev.select(
        "user_id", "event_id", "event_type", epoch_micros("ts").alias("us")
    )
    v = base.where(F.col("event_type") == "view").selectExpr(
        "user_id", "event_id", "us", "us div 86400000000 AS d"
    )
    p = base.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("us").alias("pus")
    )
    conv = (
        v.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pus") > F.col("us"))
            & (F.col("pus") <= F.col("us") + 3_600_000_000),
        )
        .groupBy("d", "event_id")
        .agg(F.min(F.col("pus") - F.col("us")).alias("delta_us"))
    )
    med = grouped_kth_smallest(
        conv, "d", "delta_us", k_of_n="(n + 1) div 2"
    )
    return med.select(
        F.col("d").cast("bigint").alias("day"),
        F.col("n").cast("bigint").alias("n_conversions"),
        F.expr("CAST(kth_value div 1000 AS BIGINT)").alias("median_delta_ms"),
    )


_LIS_FOLD = """
  size(aggregate(
    vals,
    CAST(array() AS ARRAY<BIGINT>),
    (acc, y) -> IF(
      size(filter(acc, t -> t < y)) = size(acc),
      concat(acc, array(y)),
      concat(
        slice(acc, 1, size(filter(acc, t -> t < y))),
        array(y),
        slice(acc, size(filter(acc, t -> t < y)) + 2,
              size(acc) - size(filter(acc, t -> t < y)) - 1)
      )
    )
  ))
"""


@register(
    "lis_order_values_customers",
    """
    WITH RECURSIVE seq AS MATERIALIZED (
      SELECT * FROM (
        SELECT o_custkey AS c,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS i,
               CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
               COUNT(*) OVER (PARTITION BY o_custkey) AS n
        FROM orders
      ) WHERE n >= 12
    ), chain AS (
      SELECT c, i, v, 1 AS k FROM seq
      UNION
      SELECT s.c, s.i, s.v, chain.k + 1
      FROM chain JOIN seq s
        ON s.c = chain.c AND s.i > chain.i AND s.v > chain.v
    )
    SELECT chain.c AS o_custkey,
           CAST(MAX(seq.n) AS BIGINT) AS n_orders,
           CAST(MAX(chain.k) AS BIGINT) AS lis_len
    FROM chain JOIN seq ON seq.c = chain.c AND seq.i = chain.i
    GROUP BY 1
    """,
)
def lis_order_values_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-increasing subsequence of each customer's
    order values in time order (customers with >= 12 orders) — the
    trend-persistence statistic ("how long a run of ever-bigger
    orders does this account support"), and a showcase of the shared
    SQL-fold machinery: Spark runs the O(n log n)-style patience
    algorithm as ONE row-local `aggregate` fold whose state is the
    tails array (replace the first tail >= y via filter-count +
    slice concat — no indexed-lambda pitfalls), while the oracle —
    whose folds are scalar-state only — climbs chain lengths with a
    recursive CTE (level k = elements reachable by a strictly
    increasing chain of length k, deduped per level; polynomial, and
    bounded by the per-customer eligibility filter). Per-customer
    arrays are activity-bounded (the user_event_paths class)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    seq = o.select(
        F.col("o_custkey").alias("c"),
        F.struct("o_orderdate", "o_orderkey").alias("ok"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("v"),
    )
    arrs = (
        seq.groupBy("c")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(ok, v))), x -> x.v)"
            ).alias("vals")
        )
        .where(F.size("vals") >= 12)
    )
    return arrs.select(
        F.col("c").alias("o_custkey"),
        F.size("vals").cast("bigint").alias("n_orders"),
        F.expr(f"CAST({_LIS_FOLD} AS BIGINT)").alias("lis_len"),
    )


# =====================================================================
# Round 9, wave 4: exact quadratic trend fit (Cramer determinants)
# =====================================================================

from dpe_energy_performance_analysis_etl_spark.operators.stats import (  # noqa: E402
    QUAD_DET,
    quad_coef_sql,
)

_QUAD_ORACLE = f"""
    WITH monthly AS MATERIALIZED (
      SELECT n.n_name,
             CAST(EXTRACT(year FROM o.o_orderdate) * 12
                  + EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS mn,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), mn0 AS (SELECT MIN(mn) AS m0 FROM monthly),
    xs AS MATERIALIZED (
      SELECT n_name, CAST(mn - m0 AS BIGINT) AS x, y FROM monthly, mn0
    ), moments AS MATERIALIZED (
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) AS HUGEINT) AS s0,
             SUM(x::HUGEINT) AS s1,
             SUM(x::HUGEINT * x) AS s2,
             SUM(x::HUGEINT * x * x) AS s3,
             SUM(x::HUGEINT * x * x * x) AS s4,
             SUM(y::HUGEINT) AS t0,
             SUM(y::HUGEINT * x) AS t1,
             SUM(y::HUGEINT * x * x) AS t2
      FROM xs GROUP BY 1
    )
    SELECT n_name, n AS n_points,
           CASE WHEN {QUAD_DET} > 0 THEN
             CAST({quad_coef_sql('a', 1000, '//')} AS BIGINT) END AS a_scaled,
           CASE WHEN {QUAD_DET} > 0 THEN
             CAST({quad_coef_sql('b', 1000, '//')} AS BIGINT) END AS b_scaled,
           CASE WHEN {QUAD_DET} > 0 THEN
             CAST({quad_coef_sql('c', 1000, '//')} AS BIGINT) END AS c_scaled
    FROM moments
"""


@register("quadratic_trend_nations", _QUAD_ORACLE)
def quadratic_trend_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quadratic trend of monthly revenue per nation
    (operators/stats.py group_quadratic_fit): y = a + b·x + c·x² fit
    by Cramer's rule on integer normal equations — c's sign says
    whether a nation's revenue is accelerating or rolling over, which
    a straight line (group_linregress) can't. The regression runs
    over the BOUNDED (nation, month) table; all moments/determinants
    are exact integers; each coefficient is one sign-factored
    truncating division replicated token-for-token in the oracle via
    the shared QUAD_* SQL generators (only the `div` vs `//` operator
    differs). Dimension joins broadcast."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        group_quadratic_fit,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    monthly = (
        o.join(c.select("c_custkey", "c_nationkey"),
               o["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.expr(
                "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)"
            ).alias("mn"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("y")
        )
    )
    # bounded (nations x months), consumed by the min scan AND the
    # moment aggregation — cache
    monthly = monthly.cache()
    m0 = monthly.agg(F.min("mn").alias("m0"))
    xs = monthly.crossJoin(F.broadcast(m0)).selectExpr(
        "n_name", "CAST(mn - m0 AS BIGINT) AS x", "y"
    )
    return group_quadratic_fit(xs, "n_name", "x", "y", scale=1000)


# =====================================================================
# Round 9, wave 5: Wilson score lower bound (rate ranking under
# uncertainty)
# =====================================================================

# z = 2 (dyadic, ~97.7% two-sided ~95.4%): every step is integer
# except ONE bigint->double division, one sqrt (IEEE correctly
# rounded), and a fixed-order combine; floor() BEFORE the int cast
# (fractional->int casts round on DuckDB but truncate on Spark).
_WILSON_LOWER = (
    "CAST(floor((x + 2 - 2 * sqrt(CAST(x * (n - x) AS DOUBLE) / n + 1))"
    " * 1000000e0 / (n + 4)) AS BIGINT)"
)


@register(
    "wilson_return_rate_brands",
    f"""
    WITH a AS MATERIALIZED (
      SELECT p.p_brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(count_if(l.l_returnflag = 'R') AS BIGINT) AS x
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    )
    SELECT p_brand, n, x,
           CAST((x * 1000000) // n AS BIGINT) AS rate_ppm,
           {_WILSON_LOWER} AS wilson_lower_ppm
    FROM a
    """,
)
def wilson_return_rate_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score lower bound (z = 2) on each brand's return rate —
    the "rank by lower confidence bound, not raw rate" correction
    (Wilson 1927; the Reddit comment sort) that stops a 2-of-3 brand
    outranking a 400-of-1300 one. The bound reduces to
    (x + 2 − 2·√(x(n−x)/n + 1)) / (n + 4): exact integers up to ONE
    bigint→double division, one correctly-rounded sqrt, and a
    fixed-order combine with an explicit floor() before the cast
    (fractional→int casts round on DuckDB but truncate on Spark —
    CLAUDE.md rule). Dimension join broadcasts; one aggregation."""
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
        f"{_WILSON_LOWER} AS wilson_lower_ppm",
    )


# =====================================================================
# Round 9, wave 6: two-sweep diameter lower bound
# =====================================================================

def _two_sweep_oracle(max_depth: int) -> str:
    head = """
    WITH co AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ), e AS MATERIALIZED (
      SELECT a, b FROM co WHERE n >= 2
    ), adj AS MATERIALIZED (
      SELECT a AS z, b AS nbr FROM e UNION ALL SELECT b AS z, a AS nbr FROM e
    ), deg AS MATERIALIZED (
      SELECT z, COUNT(*) AS d FROM adj GROUP BY 1
    ), st AS MATERIALIZED (
      SELECT z AS s FROM deg ORDER BY d DESC, z LIMIT 1
    ), a0 AS MATERIALIZED (
      SELECT s AS node, 0 AS dist FROM st
    )"""
    blocks = [head]
    for r in range(1, max_depth + 1):
        blocks.append(
            f""", a{r} AS MATERIALIZED (
      SELECT * FROM a{r - 1}
      UNION ALL
      SELECT DISTINCT j.nbr AS node, {r} AS dist
      FROM a{r - 1} f JOIN adj j ON j.z = f.node
      WHERE f.dist = {r - 1}
        AND NOT EXISTS (SELECT 1 FROM a{r - 1} v WHERE v.node = j.nbr)
    )"""
        )
    blocks.append(
        f""", far AS MATERIALIZED (
      SELECT node AS u FROM a{max_depth} ORDER BY dist DESC, node LIMIT 1
    ), b0 AS MATERIALIZED (
      SELECT u AS node, 0 AS dist FROM far
    )"""
    )
    for r in range(1, max_depth + 1):
        blocks.append(
            f""", b{r} AS MATERIALIZED (
      SELECT * FROM b{r - 1}
      UNION ALL
      SELECT DISTINCT j.nbr AS node, {r} AS dist
      FROM b{r - 1} f JOIN adj j ON j.z = f.node
      WHERE f.dist = {r - 1}
        AND NOT EXISTS (SELECT 1 FROM b{r - 1} v WHERE v.node = j.nbr)
    )"""
        )
    blocks.append(
        f"""
    SELECT CAST(st.s AS BIGINT) AS start_node,
           CAST((SELECT MAX(dist) FROM a{max_depth}) AS BIGINT) AS ecc_start,
           CAST(far.u AS BIGINT) AS far_node,
           CAST((SELECT MAX(dist) FROM b{max_depth}) AS BIGINT) AS diameter_lb,
           CAST((SELECT COUNT(*) FROM a{max_depth}) AS BIGINT)
             AS n_reached_start,
           CAST((SELECT COUNT(*) FROM b{max_depth}) AS BIGINT)
             AS n_reached_far
    FROM st, far
    """
    )
    return "".join(blocks)


@register("diameter_two_sweep_parts", _two_sweep_oracle(6))
def diameter_two_sweep_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sweep diameter lower bound of the recurring-pair part
    graph (operators/graph.py diameter_two_sweep — Magnien, Latapy &
    Habib 2009): BFS from the max-degree node, re-BFS from the
    farthest node found; the second eccentricity is the classic cheap
    diameter estimate (exact on trees). Both sweeps hop-capped at 6
    (a bound equal to the cap means "at least 6" — honest).
    Deterministic start/far picks via min-of-struct (tie: smallest
    id); each BFS round is frontier ⋈ adjacency + visited anti-join
    with eager localCheckpoint lineage cuts. The oracle unrolls both
    sweeps as MATERIALIZED CTE rounds."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        diameter_two_sweep,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        cooccurrence_pairs,
    )

    # basket-array pair build — one (order, part) shuffle + row-local
    # sorted-array pair explode instead of the lineitem self-join
    # (r12: 2.94 -> 1.81 s min-of-3 same-session, identical rows)
    pairs = cooccurrence_pairs(
        li.select("l_orderkey", "l_partkey"), "l_orderkey", "l_partkey"
    ).select("src", "dst")
    return diameter_two_sweep(pairs, max_depth=6)


# =====================================================================
# Round 9, wave 7: CUPED variance-reduced experiment readout
# =====================================================================

@register(
    "cuped_adjusted_lift_events",
    """
    WITH d AS MATERIALIZED (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
    ), d0 AS (SELECT MIN(day) AS d0 FROM d),
    per_user AS MATERIALIZED (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
             CAST(count_if(day <  d0.d0 + 15) AS BIGINT) AS x,
             CAST(count_if(day >= d0.d0 + 15) AS BIGINT) AS y
      FROM d, d0 GROUP BY 1, 2, d0.d0
    ), g AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(x::HUGEINT * y) AS sxy, SUM(x::HUGEINT * x) AS sxx
      FROM per_user
    ), st AS MATERIALIZED (
      SELECT n, sx, sy,
             (n * sxy - sx::HUGEINT * sy) AS cov_num,
             (n * sxx - sx::HUGEINT * sx) AS var_num
      FROM g
    ), pv AS MATERIALIZED (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_v,
             CAST(SUM(x) AS BIGINT) AS sx_v, CAST(SUM(y) AS BIGINT) AS sy_v
      FROM per_user GROUP BY 1
    )
    SELECT pv.variant, pv.n_v AS n_users,
           CAST((sy_v * 1000) // n_v AS BIGINT) AS mean_y_milli,
           CASE WHEN st.var_num > 0 THEN CAST(
             (CASE WHEN st.cov_num >= 0 THEN 1 ELSE -1 END)
             * (abs(st.cov_num) * 1000000) // st.var_num AS BIGINT)
           END AS theta_micro,
           CASE WHEN st.var_num > 0 THEN CAST(
             (CASE WHEN sy_v::HUGEINT * st.var_num * st.n
                        - st.cov_num * (sx_v::HUGEINT * st.n - st.sx * n_v)
                        >= 0 THEN 1 ELSE -1 END)
             * abs(sy_v::HUGEINT * st.var_num * st.n
                   - st.cov_num * (sx_v::HUGEINT * st.n - st.sx * n_v))
             * 1000 // (n_v::HUGEINT * st.var_num * st.n) AS BIGINT)
           END AS adjusted_mean_y_milli
    FROM pv, st
    """,
)
def cuped_adjusted_lift_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al.,
    WSDM'13 — the standard pre-period covariate adjustment every A/B
    platform runs): per synthetic variant (user_id parity), the raw
    and CUPED-adjusted mean post-period activity, with
    θ = cov(x,y)/var(x) from the pre-period covariate x. The entire
    adjustment is ONE exact rational per variant —
    [Σy_v·var·n − cov·(Σx_v·n − Σx·n_v)] / (n_v·var·n) — carried in
    DECIMAL(38,0)/HUGEINT with the sign factored out of the one
    truncating division. The pre/post split anchors to the DATA's
    observed min day + 15 (never a schema epoch — CLAUDE.md rule).
    One (user) aggregation, bounded scalar tables after."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )

    ev = read_events(spark, sf_dir)
    d = ev.select(
        "user_id", epoch_micros("ts").alias("us")
    ).selectExpr("user_id", "us div 86400000000 AS day")
    d0 = d.agg(F.min("day").alias("d0"))
    per_user = (
        d.crossJoin(F.broadcast(d0))
        .groupBy("user_id")
        .agg(
            F.count_if(F.col("day") < F.col("d0") + 15)
            .cast("bigint")
            .alias("x"),
            F.count_if(F.col("day") >= F.col("d0") + 15)
            .cast("bigint")
            .alias("y"),
        )
        .withColumn("variant", F.expr("CAST(user_id % 2 AS BIGINT)"))
        # consumed by the global-stats agg AND the per-variant agg —
        # bounded (one row per user is data-sized, but both consumers
        # are cheap aggregations of a narrow projection); cache the
        # small 4-column table
        .cache()
    )
    g = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
    )
    st = g.selectExpr(
        "n",
        "sx",
        "sy",
        "(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) AS cov_num",
        "(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx) AS var_num",
    )
    pv = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_v"),
        F.sum("x").cast("bigint").alias("sx_v"),
        F.sum("y").cast("bigint").alias("sy_v"),
    )
    return pv.crossJoin(F.broadcast(st)).selectExpr(
        "variant",
        "n_v AS n_users",
        "CAST((sy_v * 1000) div n_v AS BIGINT) AS mean_y_milli",
        """CASE WHEN var_num > 0 THEN CAST(
             (CASE WHEN cov_num >= 0 THEN 1 ELSE -1 END)
             * (abs(cov_num) * 1000000) div var_num AS BIGINT)
           END AS theta_micro""",
        """CASE WHEN var_num > 0 THEN CAST(
             (CASE WHEN CAST(sy_v AS DECIMAL(38,0)) * var_num * n
                        - cov_num * (CAST(sx_v AS DECIMAL(38,0)) * n - sx * n_v)
                        >= 0 THEN 1 ELSE -1 END)
             * abs(CAST(sy_v AS DECIMAL(38,0)) * var_num * n
                   - cov_num * (CAST(sx_v AS DECIMAL(38,0)) * n - sx * n_v))
             * 1000 div (CAST(n_v AS DECIMAL(38,0)) * var_num * n) AS BIGINT)
           END AS adjusted_mean_y_milli""",
    )


# =====================================================================
# Round 9, wave 8: nearest as-of join (bidirectional)
# =====================================================================

@register(
    "asof_nearest_error_click",
    """
    WITH e AS MATERIALIZED (
      SELECT event_id AS eid, user_id, epoch_us(ts) AS us,
             epoch_us(ts) // 86400000000 AS d
      FROM events WHERE event_type = 'error'
    ), c AS MATERIALIZED (
      SELECT user_id, epoch_us(ts) AS cus FROM events
      WHERE event_type = 'click'
    ), pairs AS MATERIALIZED (
      SELECT e.eid, e.d, e.us, c.cus
      FROM e JOIN c ON c.user_id = e.user_id
    ), best AS MATERIALIZED (
      SELECT *, row_number() OVER (PARTITION BY eid
        ORDER BY abs(cus - us), (cus > us), cus) AS rn
      FROM pairs
    ), matched AS MATERIALIZED (
      SELECT eid, d, abs(cus - us) AS adel, (cus <= us) AS back
      FROM best WHERE rn = 1
    )
    SELECT CAST(e2.d AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_errors,
           CAST(COUNT(m.eid) AS BIGINT) AS n_matched,
           CAST(count_if(m.back) AS BIGINT) AS n_backward,
           CASE WHEN COUNT(m.eid) > 0 THEN
             CAST((SUM(m.adel) // 1000) // COUNT(m.eid) AS BIGINT)
           END AS mean_abs_delta_ms
    FROM e e2 LEFT JOIN matched m ON m.eid = e2.eid
    GROUP BY 1
    """,
)
def asof_nearest_error_click_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-match as-of join (operators/temporal.py
    asof_join_nearest — the bidirectional third as-of semantic): for
    each 'error' event, the temporally CLOSEST 'click' by the same
    user in either direction (tie prefers the earlier-or-equal
    match), rolled up per day. Spark runs two merge-sort-window as-of
    passes (no candidate pair blowup); the oracle's all-pairs
    user-keyed join + row_number is the sf0.01 shortcut. Mean |Δ| is exact: the µs delta SUM
    floors to ms, then one truncating division by the match count —
    the identical two-step floor order in both engines."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        asof_join_nearest,
    )

    ev = read_events(spark, sf_dir)
    base = ev.select(
        "event_id", "user_id", "event_type", epoch_micros("ts").alias("us")
    )
    e = base.where(F.col("event_type") == "error").selectExpr(
        "event_id AS eid", "user_id", "us", "us div 86400000000 AS d"
    )
    c = base.where(F.col("event_type") == "click").select(
        "user_id", F.col("us").alias("cus")
    )
    near = asof_join_nearest(
        e, c, on="user_id", left_ts="us", right_ts="cus", right_payload=[]
    )
    return (
        near.groupBy(F.col("d").cast("bigint").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_errors"),
            F.count("cus_near").cast("bigint").alias("n_matched"),
            F.count_if(F.col("__direction") == "b")
            .cast("bigint")
            .alias("n_backward"),
            F.when(
                F.count("cus_near") > 0,
                F.expr(
                    "CAST((sum(abs(cus_near - us)) div 1000)"
                    " div count(cus_near) AS BIGINT)"
                ),
            ).alias("mean_abs_delta_ms"),
        )
    )


# =====================================================================
# Round 9, wave 9: Jonckheere-Terpstra pairwise U, grouped Spearman,
# RSI momentum
# =====================================================================

_JT_SAMPLES = ["1", "2", "3", "4", "5"]
_JT_C = ",\n             ".join(
    f"CAST(count_if(substr(o_orderpriority, 1, 1) = '{s}') AS BIGINT) AS c{i}"
    for i, s in enumerate(_JT_SAMPLES)
)
_JT_WIN = (
    "OVER (PARTITION BY g ORDER BY v"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
)
_JT_PRE = ",\n             ".join(
    f"CAST(COALESCE(SUM(c{i}) {_JT_WIN}, 0) AS BIGINT) AS c{i}_before"
    for i in range(5)
)
_JT_PER = ",\n             ".join(
    [f"CAST(SUM(c{i}) AS BIGINT) AS n{i}" for i in range(5)]
    + [
        f"CAST(SUM(c{j} * (2 * c{i}_before + c{i})) AS BIGINT) AS u2_{i}_{j}"
        for i in range(5)
        for j in range(5)
        if i < j
    ]
)
_JT_UNION = "\n    UNION ALL\n".join(
    f"""    SELECT g AS o_orderstatus, '{_JT_SAMPLES[i]}' AS pr_lo,
           '{_JT_SAMPLES[j]}' AS pr_hi, n{i} AS n_lo, n{j} AS n_hi,
           u2_{i}_{j} AS u2, CAST(n{i} * n{j} AS BIGINT) AS e2 FROM per"""
    for i in range(5)
    for j in range(5)
    if i < j
)


@register(
    "jonckheere_u_status_priority",
    f"""
    WITH tiers AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             {_JT_C}
      FROM orders GROUP BY 1, 2
    ), pre AS MATERIALIZED (
      SELECT *,
             {_JT_PRE}
      FROM tiers
    ), per AS MATERIALIZED (
      SELECT g,
             {_JT_PER}
      FROM pre GROUP BY 1
    )
{_JT_UNION}
    """,
)
def jonckheere_u_status_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra trend components per order status
    (operators/stats.py jonckheere_pairwise_u): for every ordered
    priority pair i < j, the doubled Mann-Whitney count 2·U_ij of
    order-value pairs shifting upward, against the doubled null
    expectation e2 = n_i·n_j — the ordered-alternative k-sample test
    Kruskal-Wallis can't see (JT weights the ORDER of the classes).
    Exact integers end to end: doubled strict-less counts plus tie
    mid-counts off per-sample prefixes, which ride the
    grouped_running_totals range-partition recipe (the oracle's
    PARTITION BY window is the sf0.01 shortcut); the 10 pair rows
    come off ONE explode(array(struct…)) per group."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        jonckheere_pairwise_u,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.col("o_orderstatus").alias("st"),
        F.substring("o_orderpriority", 1, 1).alias("pr"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("v"),
    )
    return jonckheere_pairwise_u(
        base, "st", "pr", "v", _JT_SAMPLES
    ).withColumnRenamed("st", "o_orderstatus")


_SP_CN = "CAST(n AS HUGEINT) * (n + 1) * (n + 1)"


@register(
    "spearman_qty_price_brands",
    f"""
    WITH base AS MATERIALIZED (
      SELECT p.p_brand AS g,
             CAST(l.l_quantity AS BIGINT) AS x,
             CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)
               AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), tx AS MATERIALIZED (
      SELECT g, x,
             2 * CAST(COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) + cnt + 1 AS mr2x
      FROM (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM base GROUP BY 1, 2)
    ), ty AS MATERIALIZED (
      SELECT g, y,
             2 * CAST(COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) + cnt + 1 AS mr2y
      FROM (SELECT g, y, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM base GROUP BY 1, 2)
    ), agg AS MATERIALIZED (
      SELECT b.g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(tx.mr2x::HUGEINT * ty.mr2y) AS sxy,
             SUM(tx.mr2x::HUGEINT * tx.mr2x) AS sxx,
             SUM(ty.mr2y::HUGEINT * ty.mr2y) AS syy
      FROM base b
      JOIN tx ON tx.g = b.g AND tx.x = b.x
      JOIN ty ON ty.g = b.g AND ty.y = b.y
      GROUP BY 1
    )
    SELECT g AS p_brand, n,
           CASE WHEN sxx > {_SP_CN} AND syy > {_SP_CN} THEN CAST(
             (CASE WHEN sxy >= {_SP_CN} THEN 1 ELSE -1 END)
             * floor(CAST(abs(sxy - ({_SP_CN})) AS DOUBLE) * 1000000e0
               / sqrt(CAST(sxx - ({_SP_CN}) AS DOUBLE)
                 * CAST(syy - ({_SP_CN}) AS DOUBLE)))
           AS BIGINT) END AS rho_ppm
    FROM agg
    """,
)
def spearman_qty_price_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and line price per
    brand (operators/stats.py grouped_spearman): the tie-aware
    mid-rank form, exact doubled-rank integers up to two scale-0
    decimal→double conversions, one sqrt, one division, sign factored
    out of the floor. Rank prefixes ride the grouped_running_totals
    range-partition recipe (the oracle's PARTITION BY windows are the
    sf0.01 shortcut); the bounded quantity tier broadcasts, the dense
    price tier shuffle-joins — both equi-keyed. The feed is a
    parquet scan ⋈ broadcast dim, cheap to consume three times (the
    NOTES histprune rule)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        grouped_spearman,
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
    return grouped_spearman(base, "p_brand", "qty", "cents")


@register(
    "rsi_monthly_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1
    ), d AS MATERIALIZED (
      SELECT month, rev_cents,
             rev_cents - lag(rev_cents) OVER (ORDER BY month) AS delta
      FROM monthly
    ), w AS MATERIALIZED (
      SELECT month, rev_cents,
             CAST(SUM(CASE WHEN delta > 0 THEN delta ELSE 0 END)
               OVER (ORDER BY month
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS BIGINT) AS gain14,
             CAST(SUM(CASE WHEN delta < 0 THEN -delta ELSE 0 END)
               OVER (ORDER BY month
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS BIGINT) AS loss14,
             COUNT(delta) OVER (ORDER BY month
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS nd
      FROM d
    )
    SELECT month, rev_cents, gain14, loss14,
           CASE WHEN gain14 + loss14 > 0
                THEN CAST((gain14 * 1000000) // (gain14 + loss14) AS BIGINT)
           END AS rsi_ppm
    FROM w WHERE nd = 14
    """,
)
def rsi_monthly_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-period Relative Strength Index on monthly revenue (Wilder
    1978, the SMA variant): gains and losses from month-over-month
    deltas in EXACT integer cents, one 14-row sliding sum over the
    bounded month table, and rsi_ppm = gain·10⁶ div (gain+loss) — a
    single truncating integer division, zero float ops anywhere.
    The only windows run over ~|months| rows, never the fact table;
    rows before the 14th delta are excluded (nd = 14), months with
    no movement emit NULL."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev_cents")
    )
    wm = Window.orderBy("month")
    d = monthly.withColumn(
        "delta", F.col("rev_cents") - F.lag("rev_cents").over(wm)
    )
    w14 = Window.orderBy("month").rowsBetween(-13, 0)
    w = d.select(
        "month",
        "rev_cents",
        F.sum(F.expr("CASE WHEN delta > 0 THEN delta ELSE 0 END"))
        .over(w14)
        .cast("bigint")
        .alias("gain14"),
        F.sum(F.expr("CASE WHEN delta < 0 THEN -delta ELSE 0 END"))
        .over(w14)
        .cast("bigint")
        .alias("loss14"),
        F.count("delta").over(w14).alias("nd"),
    )
    return w.where(F.col("nd") == 14).selectExpr(
        "month",
        "rev_cents",
        "gain14",
        "loss14",
        "CASE WHEN gain14 + loss14 > 0 THEN"
        " CAST((gain14 * 1000000) div (gain14 + loss14) AS BIGINT)"
        " END AS rsi_ppm",
    )


# =====================================================================
# Round 9, wave 10: Copeland pairwise duels, Gini decision stump,
# McNemar paired test
# =====================================================================

@register(
    "copeland_brand_duels",
    """
    WITH cb AS MATERIALIZED (
      SELECT o.o_custkey AS cust, p.p_brand AS b,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS s
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), na AS MATERIALIZED (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM cb GROUP BY 1
    ), cells AS MATERIALIZED (
      SELECT x.b AS b1, y.b AS b2,
             CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(count_if(x.s > y.s) AS BIGINT) AS gt1,
             CAST(count_if(x.s < y.s) AS BIGINT) AS gt2
      FROM cb x JOIN cb y ON x.cust = y.cust AND x.b < y.b
      GROUP BY 1, 2
    ), duel AS MATERIALIZED (
      SELECT a.b AS b1, c.b AS b2,
             a.n - COALESCE(p.nb, 0) + COALESCE(p.gt1, 0) AS w1,
             c.n - COALESCE(p.nb, 0) + COALESCE(p.gt2, 0) AS w2
      FROM na a JOIN na c ON a.b < c.b
      LEFT JOIN cells p ON p.b1 = a.b AND p.b2 = c.b
    ), pts AS MATERIALIZED (
      SELECT b1 AS b,
             CASE WHEN w1 > w2 THEN 2 WHEN w1 = w2 THEN 1 ELSE 0 END AS pt
      FROM duel
      UNION ALL
      SELECT b2,
             CASE WHEN w2 > w1 THEN 2 WHEN w1 = w2 THEN 1 ELSE 0 END
      FROM duel
    )
    SELECT na.b AS p_brand, na.n AS n_buyers,
           CAST(COALESCE(SUM(pts.pt), 0) AS BIGINT) AS copeland2,
           CAST(COALESCE(SUM(pts.pt), 0) AS BIGINT)
             = 2 * ((SELECT COUNT(*) FROM na) - 1) AS is_condorcet
    FROM na LEFT JOIN pts ON pts.b = na.b
    GROUP BY 1, 2
    """,
)
def copeland_brand_duels_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copeland pairwise-duel ranking of brands by customer spend
    (Copeland 1951): brand a beats brand b if MORE customers spent
    more on a than on b (never-bought = zero spend, so a customer
    buying only a prefers a; buying neither is a tie and cancels).
    copeland2 = Σ over the 24 duels of 2·win + 1·draw; a brand with
    copeland2 = 2·(k−1) is the Condorcet winner. Exact integer cents
    everywhere; duel wins come off per-pair comparison counts.

    Scale shape: the apriori basket-array replan pattern — one
    (customer, brand) spend aggregation, per-customer sorted basket,
    singles + pairwise comparisons exploded ROW-LOCALLY (≤ k(k−1)/2
    per customer, k bounded by the brand domain — never a data-sized
    self-join shuffle), one bounded (b1, b2) aggregation pinned
    eagerly (its filters feed na / cells / scores), bounded-table
    algebra after. The oracle's customer self-join is the sf0.01
    shortcut."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    cb = (
        li.join(o.select("o_orderkey", "o_custkey"), li["l_orderkey"] == F.col("o_orderkey"))
        .join(pt.select("p_partkey", "p_brand"), li["l_partkey"] == F.col("p_partkey"))
        .groupBy(F.col("o_custkey").alias("cust"), F.col("p_brand").alias("b"))
        .agg(
            F.sum(
                F.expr("CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
            )
            .cast("bigint")
            .alias("s")
        )
    )
    baskets = cb.groupBy("cust").agg(
        F.expr("sort_array(collect_list(struct(b, s)))").alias("items")
    )
    exploded = baskets.select(
        F.explode(
            F.expr(
                """
                concat(
                  transform(items, x ->
                    struct(x.b AS b1, CAST(NULL AS STRING) AS b2, 2 AS cmp)),
                  flatten(transform(items, (x, i) ->
                    transform(
                      slice(items, i + 2, greatest(size(items) - i - 1, 0)),
                      y -> struct(x.b AS b1, y.b AS b2,
                                  CASE WHEN x.s > y.s THEN 1
                                       WHEN x.s < y.s THEN -1
                                       ELSE 0 END AS cmp)))))
                """
            )
        ).alias("e")
    ).select("e.b1", "e.b2", "e.cmp")
    # bounded (≤ k + k(k-1)/2 rows) multi-consumer aggregate — pinned
    # eagerly so na/cells/score branches never re-run the explode
    agg = (
        exploded.groupBy("b1", "b2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nb"),
            F.count_if(F.col("cmp") == 1).cast("bigint").alias("gt1"),
            F.count_if(F.col("cmp") == -1).cast("bigint").alias("gt2"),
        )
        .localCheckpoint(eager=True)
    )
    na = agg.where(F.col("b2").isNull()).select(
        F.col("b1").alias("b"), F.col("nb").alias("n")
    )
    cells = agg.where(F.col("b2").isNotNull())
    grid = (
        na.alias("a")
        .join(F.broadcast(na.alias("c")), F.expr("a.b < c.b"))
        .selectExpr("a.b AS b1", "c.b AS b2", "a.n AS n1", "c.n AS n2")
    )
    duel = grid.join(cells, ["b1", "b2"], "left").selectExpr(
        "b1",
        "b2",
        "n1 - COALESCE(nb, 0) + COALESCE(gt1, 0) AS w1",
        "n2 - COALESCE(nb, 0) + COALESCE(gt2, 0) AS w2",
    )
    pts = duel.selectExpr(
        "explode(array("
        " struct(b1 AS b, CASE WHEN w1 > w2 THEN 2 WHEN w1 = w2 THEN 1"
        "                      ELSE 0 END AS pt),"
        " struct(b2 AS b, CASE WHEN w2 > w1 THEN 2 WHEN w1 = w2 THEN 1"
        "                      ELSE 0 END AS pt))) AS e"
    ).select("e.b", "e.pt")
    k = na.agg(F.count(F.lit(1)).alias("k"))
    cop = pts.groupBy("b").agg(F.sum("pt").cast("bigint").alias("cop2"))
    return (
        na.join(cop, "b", "left")
        .crossJoin(F.broadcast(k))
        .selectExpr(
            "b AS p_brand",
            "n AS n_buyers",
            "CAST(COALESCE(cop2, 0) AS BIGINT) AS copeland2",
            "COALESCE(cop2, 0) = 2 * (k - 1) AS is_condorcet",
        )
    )


@register(
    "gini_stump_qty_returns",
    """
    WITH t AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS qty,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(count_if(l_returnflag = 'R') AS BIGINT) AS pos
      FROM lineitem GROUP BY 1
    ), c AS MATERIALIZED (
      SELECT qty,
             CAST(SUM(cnt) OVER (ORDER BY qty
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_le,
             CAST(SUM(pos) OVER (ORDER BY qty
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS pos_le,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n_tot,
             CAST(SUM(pos) OVER () AS BIGINT) AS p_tot
      FROM t
    ), s AS MATERIALIZED (
      SELECT qty AS qty_threshold, n_le, pos_le,
             CAST((2 * (pos_le::HUGEINT * (n_le - pos_le) * (n_tot - n_le)
                   + (p_tot - pos_le)::HUGEINT
                     * ((n_tot - n_le) - (p_tot - pos_le)) * n_le)
                   * 1000000000)
                  // (n_le::HUGEINT * (n_tot - n_le) * n_tot)
                  AS BIGINT) AS impurity_ppb
      FROM c WHERE n_le < n_tot
    )
    SELECT qty_threshold, n_le, pos_le, impurity_ppb,
           impurity_ppb = MIN(impurity_ppb) OVER () AS is_best
    FROM s
    """,
)
def gini_stump_qty_returns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split search (CART, Breiman 1984): for every
    quantity threshold t, the weighted Gini impurity of the split
    qty ≤ t predicting l_returnflag = 'R' — as ONE exact integer
    rational per candidate, impurity_ppb =
    ⌊2·(p_L·q_L·n_R + p_R·q_R·n_L)·10⁹ / (n_L·n_R·N)⌋ (the common
    2p(1−p) form cross-multiplied so zero float ops survive), and
    the argmin flagged. One fact-table aggregation to the BOUNDED
    (≤ |qty domain|) tier table; prefix sums and the min ride
    windows over ≤ 50 rows. Magnitude bound n³·10⁹/2 < 10³⁸ —
    n ≲ 5·10⁹ rows."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    t = li.groupBy(F.col("l_quantity").cast("bigint").alias("qty")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.count_if(F.col("l_returnflag") == "R").cast("bigint").alias("pos"),
    )
    w_cum = Window.orderBy("qty").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("qty").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = t.select(
        "qty",
        F.sum("cnt").over(w_cum).cast("bigint").alias("n_le"),
        F.sum("pos").over(w_cum).cast("bigint").alias("pos_le"),
        F.sum("cnt").over(w_all).cast("bigint").alias("n_tot"),
        F.sum("pos").over(w_all).cast("bigint").alias("p_tot"),
    )
    s = c.where(F.col("n_le") < F.col("n_tot")).selectExpr(
        "qty AS qty_threshold",
        "n_le",
        "pos_le",
        "CAST((2 * (CAST(pos_le AS DECIMAL(38,0)) * (n_le - pos_le)"
        "            * (n_tot - n_le)"
        "       + CAST(p_tot - pos_le AS DECIMAL(38,0))"
        "         * ((n_tot - n_le) - (p_tot - pos_le)) * n_le)"
        "       * 1000000000)"
        "      div (CAST(n_le AS DECIMAL(38,0)) * (n_tot - n_le) * n_tot)"
        "      AS BIGINT) AS impurity_ppb",
    )
    w_min = Window.orderBy("qty_threshold").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return s.select(
        "qty_threshold",
        "n_le",
        "pos_le",
        "impurity_ppb",
        (F.col("impurity_ppb") == F.min("impurity_ppb").over(w_min)).alias(
            "is_best"
        ),
    )
