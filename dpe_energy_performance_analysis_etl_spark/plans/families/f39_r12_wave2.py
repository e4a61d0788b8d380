"""Round 12, wave 2: association / queueing / spatial / clustering
analytics — Goodman-Kruskal tau, Little's-law session readout with a
scale-safe concurrency sweep, next-event Gini impurity, a
ring-windowed Clark-Evans spatial randomness test, the adjusted Rand
index between given labels and a portable bucket clustering,
quartile-dispersion per brand on the multi-k rank recipe, the Lorenz
asymmetry coefficient, and a customer spend-tier migration matrix.

Shared exactness recipe: integer contingency/count tables with ONE
fixed-form floored double ratio per query; combinatorial sums
(C(n,2)) and cross-products ride DECIMAL(38,0)/HUGEINT; order
statistics are rank picks (``grouped_kths_smallest`` — one pinned
ranged subtree for ALL picks); coordinates/buckets come from the
portable xor-shift-multiply mix (SQL-replayable in DuckDB via
xor()/>>); per-point NN distances are sqrt-quantized to exact 2^20ths
before summation (sqrt is IEEE correctly-rounded; the floor
quantization makes the SUM order-independent). Every denominator that
can see zero is CASE-guarded in both engines."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.plans._core import (  # noqa: F401
    DataFrame,
    SparkSession,
    Window,
    F,
    QUERIES,
    ORACLE_SQL,
    read_events,
    register,
)

_STATUSES = ["F", "O", "P"]
_PRIOS = [1, 2, 3, 4, 5]


def _gk_tau_expr(cast="CAST"):
    """The shared Goodman-Kruskal tau(C|R) expression over the 15
    pivoted cells c_<status><prio> (identical text both engines, so
    the double evaluation order is fixed): tau = [N * SUM_i
    (SUM_j n_ij^2)/n_i+ - SUM_j n_+j^2] / [N^2 - SUM_j n_+j^2]."""
    row_terms = []
    for s in _STATUSES:
        sq = " + ".join(
            f"{cast}(c_{s}{p} AS DOUBLE) * {cast}(c_{s}{p} AS DOUBLE)"
            for p in _PRIOS
        )
        r = " + ".join(f"c_{s}{p}" for p in _PRIOS)
        row_terms.append(
            f"(CASE WHEN {r} > 0 THEN ({sq}) / {cast}({r} AS DOUBLE)"
            " ELSE 0e0 END)"
        )
    col_sq = " + ".join(
        "{c}(({cells}) AS DOUBLE) * {c}(({cells}) AS DOUBLE)".format(
            c=cast, cells=" + ".join(f"c_{s}{p}" for s in _STATUSES)
        )
        for p in _PRIOS
    )
    num = (
        f"({cast}(nn AS DOUBLE) * ({' + '.join(row_terms)}) - ({col_sq}))"
    )
    den = f"({cast}(nn AS DOUBLE) * {cast}(nn AS DOUBLE) - ({col_sq}))"
    return (
        f"CASE WHEN {den} > 0e0 THEN"
        f" CAST(floor(1e6 * {num} / {den}) AS BIGINT) END AS gk_tau_ppm"
    )


_GK_TAU_CELLS_SQL = ",\n             ".join(
    f"CAST(COALESCE(SUM(CASE WHEN o_orderstatus = '{s}' AND pr = {p}"
    f" THEN 1 END), 0) AS BIGINT) AS c_{s}{p}"
    for s in _STATUSES
    for p in _PRIOS
)


@register(
    "gk_tau_status_priority",
    f"""
    WITH wide AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS nn,
             {_GK_TAU_CELLS_SQL}
      FROM (
        SELECT o_orderstatus,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pr
        FROM orders
      )
    )
    SELECT nn AS n_orders, {_gk_tau_expr()}
    FROM wide
    """,
)
def gk_tau_status_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal tau predicting order PRIORITY from STATUS
    (Goodman & Kruskal 1954, the tau variant): the proportional
    reduction in the probability of a CLASSIFICATION ERROR when
    guessing proportionally to the conditional distribution —
    ``gk_lambda_status_priority`` reads modal prediction; tau reads
    the full distribution and is nonzero whenever ANY cell deviates.

    Exactness: one corpus aggregation pivots the bounded 3x5 table
    into 15 integer cells on one row; tau is ONE fixed-text double
    expression (generated from the same template for both engines,
    so the summation order is identical), floored ppm, with both the
    per-row and global denominators CASE-guarded."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.selectExpr(
        "o_orderstatus",
        "CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pr",
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("nn")]
    for s in _STATUSES:
        for p in _PRIOS:
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("o_orderstatus") == s) & (F.col("pr") == p),
                            F.lit(1),
                        )
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias(f"c_{s}{p}")
            )
    wide = base.agg(*aggs)
    return wide.selectExpr("nn AS n_orders", _gk_tau_expr())


@register(
    "littles_law_sessions",
    """
    WITH ev AS MATERIALIZED (
      SELECT user_id, epoch_us(ts) // 1000000 AS sec, event_id
      FROM events
    ), gapped AS MATERIALIZED (
      SELECT user_id, sec, event_id,
             CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id
                    ORDER BY sec, event_id) > 1800
                  OR lag(sec) OVER (PARTITION BY user_id
                    ORDER BY sec, event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM ev
    ), sess AS MATERIALIZED (
      SELECT user_id, sid, CAST(MIN(sec) AS BIGINT) AS s,
             CAST(MAX(sec) AS BIGINT) AS e
      FROM (
        SELECT user_id, sec,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY sec, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM gapped
      ) GROUP BY 1, 2
    ), deltas AS MATERIALIZED (
      SELECT t, CAST(SUM(d) AS BIGINT) AS d FROM (
        SELECT s AS t, 1 AS d FROM sess
        UNION ALL
        SELECT e + 1 AS t, -1 AS d FROM sess
      ) GROUP BY 1
    ), sweep AS MATERIALIZED (
      SELECT SUM(d) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM deltas
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(e - s) AS BIGINT) AS busy,
             CAST(MAX(e) - MIN(s) AS BIGINT) AS span
      FROM sess
    )
    SELECT a.n AS n_sessions, a.busy AS busy_sec, a.span AS span_sec,
           CASE WHEN a.span > 0
                THEN CAST(a.busy * 1000 // a.span AS BIGINT)
           END AS l_avg_concurrency_milli,
           CASE WHEN a.span > 0
                THEN CAST(a.n * 3600000 // a.span AS BIGINT)
           END AS lambda_per_hour_milli,
           CASE WHEN a.n > 0 THEN CAST(a.busy * 1000 // a.n AS BIGINT)
           END AS w_session_sec_milli,
           (SELECT CAST(MAX(conc) AS BIGINT) FROM sweep)
             AS peak_concurrency
    FROM agg a
    """,
)
def littles_law_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's-law session readout (L = lambda * W — the queueing
    identity capacity planning is built on): 30-min-gap sessions from
    the event stream, then the three terms — time-average concurrent
    sessions L (busy seconds / span), arrival rate lambda
    (sessions/hour) and mean session length W — plus the PEAK
    concurrency from a time-sweep. The identity holds exactly in the
    rationals, so the three reported integers are mutually
    consistent; peak is the capacity headroom number.

    Exactness: whole-second epochs (epoch_us div 1e6 — the r6 rule);
    every term a nonnegative integer truncating div. The
    concurrency sweep aggregates +1/-1 deltas PER DISTINCT SECOND
    first (so the running sum is order-independent), then — r12 —
    folds the peak via ``global_prefix_max``'s LOCAL+CROSS
    decomposition (only the extremum is reported, so the per-row
    global prefix, its eager pin and its offsets join are never
    built); the delta stream itself is ONE explode over the cached
    session table instead of a unionAll of two selects (CLAUDE.md
    subtree rule: one scan, one plan branch).

    Scale shape: sessionization is per-user windows over one
    user-keyed shuffle; the sweep is the scale-safe fold
    primitive; output is one row."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        global_prefix_max,
    )

    ev = read_events(spark, sf_dir).select(
        "user_id",
        (epoch_micros("ts") / F.lit(1000000)).cast("bigint").alias("sec"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    gapped = ev.select(
        "user_id",
        "sec",
        "event_id",
        F.when(
            F.lag("sec").over(w).isNull()
            | (F.col("sec") - F.lag("sec").over(w) > 1800),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    w_sid = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = (
        gapped.withColumn("sid", F.sum("brk").over(w_sid))
        .groupBy("user_id", "sid")
        .agg(
            F.min("sec").cast("bigint").alias("s"),
            F.max("sec").cast("bigint").alias("e"),
        )
        .cache()  # feeds the scalar aggregate AND the sweep deltas
    )
    agg = sess.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("e - s")).cast("bigint").alias("busy"),
        F.expr("CAST(MAX(e) - MIN(s) AS BIGINT)").alias("span"),
    )
    deltas = (
        sess.selectExpr(
            "explode(array(struct(s AS t, CAST(1 AS BIGINT) AS d),"
            " struct(e + 1 AS t, CAST(-1 AS BIGINT) AS d))) AS ev"
        )
        .selectExpr("ev.t AS t", "ev.d AS d")
        .groupBy("t")
        .agg(F.sum("d").cast("bigint").alias("d"))
    )
    peak = global_prefix_max(
        deltas, [F.col("t").asc()], "d", out_col="peak_concurrency"
    )
    return agg.crossJoin(F.broadcast(peak)).selectExpr(
        "n AS n_sessions",
        "busy AS busy_sec",
        "span AS span_sec",
        "CASE WHEN span > 0 THEN CAST(busy * 1000 div span AS BIGINT)"
        " END AS l_avg_concurrency_milli",
        "CASE WHEN span > 0 THEN CAST(n * 3600000 div span AS BIGINT)"
        " END AS lambda_per_hour_milli",
        "CASE WHEN n > 0 THEN CAST(busy * 1000 div n AS BIGINT)"
        " END AS w_session_sec_milli",
        "peak_concurrency",
    )


@register(
    "next_event_gini",
    """
    WITH pairs AS MATERIALIZED (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT event_type AS a,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS b
        FROM events
      ) WHERE b IS NOT NULL GROUP BY 1, 2
    ), per AS MATERIALIZED (
      SELECT a, CAST(SUM(c) AS BIGINT) AS t,
             SUM(c::HUGEINT * c) AS c2
      FROM pairs GROUP BY 1
    )
    SELECT a AS event_type, t AS n_transitions,
           CASE WHEN t > 0 THEN CAST(floor(1e6 *
             CAST(t::HUGEINT * t - c2 AS DOUBLE)
             / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE))) AS BIGINT)
           END AS gini_ppm
    FROM per ORDER BY a
    """,
)
def next_event_gini_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity of each event type's NEXT-event distribution
    (1 - SUM p^2 — the split criterion CART uses, here reading how
    deterministic the behavioral transition out of each state is;
    ``markov_next_event_hitrate`` scores top-1 prediction, this
    scores the whole distribution without logs). Transition counts
    from per-user lead windows; impurity = (T^2 - SUM c^2)/T^2 — all
    integers in HUGEINT/DECIMAL(38,0), one floored ppm per type."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("a"),
            F.lead("event_type").over(w).alias("b"),
        )
        .where(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    per = pairs.groupBy("a").agg(
        F.sum("c").cast("bigint").alias("t"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("c2"),
    )
    return per.selectExpr(
        "a AS event_type",
        "t AS n_transitions",
        "CASE WHEN t > 0 THEN CAST(floor(1e6 *"
        " CAST(CAST(t AS DECIMAL(38,0)) * t - c2 AS DOUBLE)"
        " / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE))) AS BIGINT)"
        " END AS gini_ppm",
    ).orderBy("event_type")


def _ce_mix_sql(salt: int, mod: int) -> str:
    """DuckDB twin of ``operators.graph._portable_mix32(k, salt)``:
    s = (k mod 2^32 + salt*40503) mod 2^32, one xor-shift-multiply
    round, final xor-shift — then ``% mod`` for the coordinate."""
    s = f"(c_custkey % 4294967296 + {salt * 40503}) % 4294967296"
    b = f"(xor({s}, ({s}) >> 16) * 73244475) % 4294967296"
    return f"xor({b}, ({b}) >> 16) % {mod}"


_CE_X = _ce_mix_sql(1, 4000)
_CE_Y = _ce_mix_sql(2, 4000)


@register(
    "clark_evans_grid",
    f"""
    WITH pts AS MATERIALIZED (
      SELECT c_custkey AS k,
             CAST({_CE_X} AS BIGINT) AS x,
             CAST({_CE_Y} AS BIGINT) AS y
      FROM customer
    ), cand AS MATERIALIZED (
      SELECT a.k, MIN((a.x - b.x) * (a.x - b.x)
                      + (a.y - b.y) * (a.y - b.y)) AS d2
      FROM (SELECT k, x, y, x // 100 AS cx, y // 100 AS cy FROM pts) a
      JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox ON TRUE
      JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy ON TRUE
      JOIN (SELECT k, x, y, x // 100 AS cx, y // 100 AS cy FROM pts) b
        ON b.cx = a.cx + ox.dx AND b.cy = a.cy + oy.dy AND b.k <> a.k
      GROUP BY 1
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(CAST(floor(sqrt(CAST(d2 AS DOUBLE)) * 1048576e0)
                           AS BIGINT)) AS BIGINT) AS sq20
      FROM cand
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts
    )
    SELECT t.n AS n_points, a.m AS n_with_ring_neighbor,
           CASE WHEN a.m > 0 THEN
             CAST(floor(CAST(a.sq20 AS DOUBLE) / (1048576e0
                  * CAST(a.m AS DOUBLE)) * 1e3) AS BIGINT)
           END AS mean_nn_milli,
           CASE WHEN a.m > 0 AND t.n > 0 THEN
             CAST(floor(1e3 * (CAST(a.sq20 AS DOUBLE)
                  / (1048576e0 * CAST(a.m AS DOUBLE)))
                  * 2e0 * sqrt(CAST(t.n AS DOUBLE) / 16000000e0))
                  AS BIGINT)
           END AS clark_evans_r_milli
    FROM agg a, tot t
    """,
)
def clark_evans_grid_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ring-windowed Clark-Evans aggregation index (Clark & Evans
    1954): observed mean nearest-neighbor distance over the expected
    mean under complete spatial randomness (1/(2 sqrt(density))) —
    R < 1000 milli = clustered, ~1000 = random, > 1000 = dispersed.
    Customer sites are scattered on a 4000x4000 lattice by the
    portable xor-shift-multiply mix (SQL-replayable; custkey-derived,
    so the null hypothesis holds by construction and a detector must
    NOT reject). The NN search is windowed to the 3x3 ring of 100x100
    cells (equi-keyed candidate join — never an all-pairs distance
    join; points whose ring is empty are excluded and counted, the
    honest windowed variant).

    Exactness: squared distances are exact integers; each point's
    NN distance is sqrt(d2) quantized to exact 2^20ths BEFORE the
    global sum (IEEE sqrt + floor — identical both engines; the
    integer sum is order-independent). Two fixed-form floored milli
    ratios at the end.

    Scale shape: explode 9 ring keys per point, equi-join on the
    cell key, min per point — candidate volume is ring-bounded;
    density keeps per-cell counts O(n/1600)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        _portable_mix32,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pts = c.select(
        F.col("c_custkey").alias("k"),
        (_portable_mix32(F.col("c_custkey"), F.lit(1)) % F.lit(4000)).alias("x"),
        (_portable_mix32(F.col("c_custkey"), F.lit(2)) % F.lit(4000)).alias("y"),
    ).cache()  # feeds both candidate-join sides AND the total count
    cells = pts.select(
        "k",
        "x",
        "y",
        F.expr("x div 100").alias("cx"),
        F.expr("y div 100").alias("cy"),
    )
    ring = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probes = (
        cells.select(
            F.col("k").alias("ka"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            "cx",
            "cy",
            F.explode(ring).alias("dx"),
        )
        .select("ka", "xa", "ya", "cx", "cy", "dx", F.explode(ring).alias("dy"))
        .select(
            "ka",
            "xa",
            "ya",
            (F.col("cx") + F.col("dx")).alias("qx"),
            (F.col("cy") + F.col("dy")).alias("qy"),
        )
    )
    cand = (
        probes.join(
            cells,
            (F.col("cx") == F.col("qx"))
            & (F.col("cy") == F.col("qy"))
            & (F.col("k") != F.col("ka")),
        )
        .groupBy("ka")
        .agg(
            F.min(
                F.expr("(xa - x) * (xa - x) + (ya - y) * (ya - y)")
            ).alias("d2")
        )
    )
    agg = cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(
            F.expr(
                "CAST(floor(sqrt(CAST(d2 AS DOUBLE)) * 1048576e0) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("sq20"),
    )
    tot = pts.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return agg.crossJoin(F.broadcast(tot)).selectExpr(
        "n AS n_points",
        "m AS n_with_ring_neighbor",
        "CASE WHEN m > 0 THEN"
        " CAST(floor(CAST(sq20 AS DOUBLE) / (1048576e0"
        " * CAST(m AS DOUBLE)) * 1e3) AS BIGINT)"
        " END AS mean_nn_milli",
        "CASE WHEN m > 0 AND n > 0 THEN"
        " CAST(floor(1e3 * (CAST(sq20 AS DOUBLE)"
        " / (1048576e0 * CAST(m AS DOUBLE)))"
        " * 2e0 * sqrt(CAST(n AS DOUBLE) / 16000000e0))"
        " AS BIGINT) END AS clark_evans_r_milli",
    )


@register(
    "ari_label_buckets_embeddings",
    """
    WITH pts AS MATERIALIZED (
      SELECT label,
             CASE WHEN embedding[1] >= 0 THEN 2 ELSE 0 END
             + CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END AS bucket
      FROM embeddings
    ), cells AS MATERIALIZED (
      SELECT label, bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM pts GROUP BY 1, 2
    ), sums AS MATERIALIZED (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             SUM((c::HUGEINT * (c - 1)) // 2) AS sp
      FROM cells
    ), am AS MATERIALIZED (
      SELECT SUM((s::HUGEINT * (s - 1)) // 2) AS a FROM (
        SELECT CAST(SUM(c) AS BIGINT) AS s FROM cells GROUP BY label
      )
    ), bm AS MATERIALIZED (
      SELECT SUM((s::HUGEINT * (s - 1)) // 2) AS b FROM (
        SELECT CAST(SUM(c) AS BIGINT) AS s FROM cells GROUP BY bucket
      )
    )
    SELECT s.n AS n_vectors,
           CASE WHEN (s.n::HUGEINT * (s.n - 1)) // 2 * (a.a + b.b)
                     - 2 * a.a::HUGEINT * b.b <> 0 THEN
             CAST(floor(1e6 *
               CAST(2 * ((s.n::HUGEINT * (s.n - 1)) // 2) * s.sp
                    - 2 * a.a::HUGEINT * b.b AS DOUBLE)
               / CAST((s.n::HUGEINT * (s.n - 1)) // 2 * (a.a + b.b)
                    - 2 * a.a::HUGEINT * b.b AS DOUBLE)) AS BIGINT)
           END AS ari_ppm
    FROM sums s, am a, bm b
    """,
)
def ari_label_buckets_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand index (Hubert & Arabie 1985) between the GIVEN
    embedding labels and a portable 4-way sign-bucket clustering
    (sign of dims 1 and 2): the chance-corrected agreement between
    two partitions — near 0 here by construction (label geometry is
    not axis-aligned), which is exactly the null a clustering
    evaluation must calibrate against. ``kmeans_validity_embeddings``
    scores ONE partition's geometry; ARI compares TWO partitions.

    Exactness: ARI's pair counts are pure integer combinatorics —
    sp = SUM C(n_ij,2), a = SUM C(a_i,2), b = SUM C(b_j,2),
    t = C(n,2); ARI = (t*sp - a*b)/(t*(a+b)/2 - a*b), multiplied
    through by 2 so every term stays an integer in HUGEINT /
    DECIMAL(38,0); one floored ppm ratio, denominator guarded.
    Float sign reads (v >= 0) compare the same parquet value in both
    engines. The contingency is label x bucket <= 10 x 4."""
    from dpe_energy_performance_analysis_etl_spark.plans._core import (
        read_embeddings,
    )

    emb = read_embeddings(spark, sf_dir)
    pts = emb.selectExpr(
        "label",
        "CASE WHEN element_at(embedding, 1) >= 0 THEN 2 ELSE 0 END"
        " + CASE WHEN element_at(embedding, 2) >= 0 THEN 1 ELSE 0 END"
        " AS bucket",
    )
    cells = pts.groupBy("label", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).cache()  # bounded (<= 10 x 4); feeds three marginal sums
    sums = cells.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.expr("(CAST(c AS DECIMAL(38,0)) * (c - 1)) div 2")).alias("sp"),
    )
    am = (
        cells.groupBy("label")
        .agg(F.sum("c").cast("bigint").alias("s"))
        .agg(F.sum(F.expr("(CAST(s AS DECIMAL(38,0)) * (s - 1)) div 2")).alias("a"))
    )
    bm = (
        cells.groupBy("bucket")
        .agg(F.sum("c").cast("bigint").alias("s"))
        .agg(F.sum(F.expr("(CAST(s AS DECIMAL(38,0)) * (s - 1)) div 2")).alias("b"))
    )
    return (
        sums.crossJoin(F.broadcast(am))
        .crossJoin(F.broadcast(bm))
        .selectExpr(
            "n AS n_vectors",
            "CASE WHEN (CAST(n AS DECIMAL(38,0)) * (n - 1)) div 2 * (a + b)"
            "          - 2 * a * b <> 0 THEN"
            " CAST(floor(1e6 *"
            " CAST(2 * ((CAST(n AS DECIMAL(38,0)) * (n - 1)) div 2) * sp"
            "      - 2 * a * b AS DOUBLE)"
            " / CAST((CAST(n AS DECIMAL(38,0)) * (n - 1)) div 2 * (a + b)"
            "      - 2 * a * b AS DOUBLE)) AS BIGINT)"
            " END AS ari_ppm",
        )
    )


@register(
    "quartile_dispersion_brands",
    """
    WITH vals AS MATERIALIZED (
      SELECT p.p_brand AS brand,
             CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)
               AS x
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), ranked AS MATERIALIZED (
      SELECT brand, x,
             row_number() OVER (PARTITION BY brand ORDER BY x) AS r,
             COUNT(*) OVER (PARTITION BY brand) AS n
      FROM vals
    )
    SELECT brand, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN r = (n + 3) // 4 THEN x END) AS BIGINT)
             AS q1_cents,
           CAST(MAX(CASE WHEN r = (3 * n + 3) // 4 THEN x END) AS BIGINT)
             AS q3_cents,
           CASE WHEN MAX(CASE WHEN r = (n + 3) // 4 THEN x END)
                   + MAX(CASE WHEN r = (3 * n + 3) // 4 THEN x END) > 0
                THEN CAST(floor(1e6 *
             CAST(MAX(CASE WHEN r = (3 * n + 3) // 4 THEN x END)
                - MAX(CASE WHEN r = (n + 3) // 4 THEN x END) AS DOUBLE)
             / CAST(MAX(CASE WHEN r = (3 * n + 3) // 4 THEN x END)
                + MAX(CASE WHEN r = (n + 3) // 4 THEN x END) AS DOUBLE))
             AS BIGINT)
           END AS qcd_ppm
    FROM ranked GROUP BY brand ORDER BY brand
    """,
)
def quartile_dispersion_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile coefficient of dispersion per brand ((Q3 - Q1) /
    (Q3 + Q1) — the robust relative-spread measure that, unlike
    CV, ignores the tails a luxury SKU drags in): both quartiles are
    exact rank picks (Q1 at rank ceil(n/4), Q3 at ceil(3n/4)) from
    ONE ``grouped_kths_smallest`` pass — one pinned ranged subtree
    for both picks, never a per-brand data-sized sort window. One
    floored ppm ratio on exact cents, guarded."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_kths_smallest,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    vals = li.join(
        p.select("p_partkey", "p_brand"), li["l_partkey"] == F.col("p_partkey")
    ).selectExpr(
        "p_brand AS brand",
        "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS x",
    )
    return (
        grouped_kths_smallest(
            vals,
            "brand",
            "x",
            {
                "q1_cents": "(n + 3) div 4",
                "q3_cents": "(3 * n + 3) div 4",
            },
        )
        .selectExpr(
            "brand",
            "CAST(n AS BIGINT) AS n",
            "CAST(q1_cents AS BIGINT) AS q1_cents",
            "CAST(q3_cents AS BIGINT) AS q3_cents",
            "CASE WHEN q1_cents + q3_cents > 0 THEN CAST(floor(1e6 *"
            " CAST(q3_cents - q1_cents AS DOUBLE)"
            " / CAST(q3_cents + q1_cents AS DOUBLE)) AS BIGINT)"
            " END AS qcd_ppm",
        )
        .orderBy("brand")
    )


@register(
    "lorenz_asymmetry_customers",
    """
    WITH per AS MATERIALIZED (
      SELECT CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY o_custkey
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS t,
             CAST(SUM(CASE WHEN x::HUGEINT * (SELECT COUNT(*) FROM per)
                             < (SELECT SUM(x)::HUGEINT FROM per)
                           THEN 1 ELSE 0 END) AS BIGINT) AS m,
             CAST(SUM(CASE WHEN x::HUGEINT * (SELECT COUNT(*) FROM per)
                             < (SELECT SUM(x)::HUGEINT FROM per)
                           THEN x ELSE 0 END) AS BIGINT) AS lm
      FROM per
    )
    SELECT n AS n_customers, m AS n_below_mean,
           CASE WHEN t > 0 THEN CAST(floor(1e6 *
             CAST(m::HUGEINT * t + lm::HUGEINT * n AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))) AS BIGINT)
           END AS lorenz_asymmetry_ppm
    FROM agg
    """,
)
def lorenz_asymmetry_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz asymmetry coefficient S = F(mu) + L(mu) (Damgaard &
    Weiner 2000): WHERE the inequality lives — S < 1e6 ppm means the
    Gini is driven by many small spenders, > 1e6 by a few giants;
    ``spend_gini_customers`` gives the magnitude, this gives the
    shape (the step-function variant: counts/sums strictly below the
    mean, no interpolation term).

    Exactness: below-mean membership compares x*n < T in
    cross-multiplied integers (the mean never becomes a float);
    F(mu) + L(mu) = (m*T + L_m*n)/(n*T) — integer numerator in
    HUGEINT/DECIMAL(38,0), ONE floored ppm ratio, guarded.

    Scale shape: one orders pass onto per-customer totals; the
    totals row broadcasts back for the membership test; output is
    one row."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per = o.groupBy("o_custkey").agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("x")
    ).cache()  # feeds the totals row AND the below-mean scan
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("t"),
    )
    agg = per.crossJoin(F.broadcast(tot)).agg(
        F.max("n").alias("n"),
        F.max("t").alias("t"),
        F.sum(
            F.expr(
                "CASE WHEN CAST(x AS DECIMAL(38,0)) * n < CAST(t AS"
                " DECIMAL(38,0)) THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("m"),
        F.sum(
            F.expr(
                "CASE WHEN CAST(x AS DECIMAL(38,0)) * n < CAST(t AS"
                " DECIMAL(38,0)) THEN x ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("lm"),
    )
    return agg.selectExpr(
        "n AS n_customers",
        "m AS n_below_mean",
        "CASE WHEN t > 0 THEN CAST(floor(1e6 *"
        " CAST(CAST(m AS DECIMAL(38,0)) * t + CAST(lm AS DECIMAL(38,0)) * n"
        " AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))) AS BIGINT)"
        " END AS lorenz_asymmetry_ppm",
    )


@register(
    "customer_migration_matrix",
    """
    WITH bounds AS MATERIALIZED (
      SELECT CAST(year(MAX(o_orderdate)) - 2 AS BIGINT) AS y0,
             CAST(year(MAX(o_orderdate)) - 1 AS BIGINT) AS y1
      FROM orders
    ), per AS MATERIALIZED (
      SELECT o_custkey AS k, CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x
      FROM orders, bounds b
      WHERE CAST(year(o_orderdate) AS BIGINT) IN (b.y0, b.y1)
      GROUP BY 1, 2
    ), ranked AS MATERIALIZED (
      SELECT k, yr, x, row_number() OVER (PARTITION BY yr ORDER BY x, k)
               AS r, COUNT(*) OVER (PARTITION BY yr) AS n
      FROM per
    ), th AS MATERIALIZED (
      SELECT yr,
             CAST(MAX(CASE WHEN r = (n + 2) // 3 THEN x END) AS BIGINT)
               AS t1,
             CAST(MAX(CASE WHEN r = (2 * n + 2) // 3 THEN x END) AS BIGINT)
               AS t2
      FROM ranked GROUP BY 1
    ), tiered AS MATERIALIZED (
      SELECT p.k, p.yr,
             CASE WHEN p.x <= t.t1 THEN 'low'
                  WHEN p.x <= t.t2 THEN 'mid' ELSE 'high' END AS tier
      FROM per p JOIN th t ON p.yr = t.yr
    )
    SELECT a.tier AS tier_from, z.tier AS tier_to,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM tiered a JOIN tiered z ON a.k = z.k, bounds b
    WHERE a.yr = b.y0 AND z.yr = b.y1
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def customer_migration_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-tier migration matrix between the last two FULL order
    years (the retention-economics slide: who moved low -> high and
    who churned down?): customers present in both years, bucketed by
    within-year spend TERTILES (data-derived thresholds — exact rank
    picks at ceil(n/3) and ceil(2n/3) per year, never a float
    quantile), counted per (tier_from, tier_to) cell.

    Exactness: tertile thresholds are exact order statistics from
    ONE ``grouped_kths_smallest`` pass over the per-(customer, year)
    cent totals (group key = year, so both years' thresholds come
    from one pinned ranged subtree); tier membership compares exact
    cents. Output is the <= 3x3 integer matrix.

    Scale shape: one orders pass onto per-(customer, year) totals
    (cached — feeds the rank recipe AND the tier join), a 2-row
    broadcast threshold table, and an equi-join on customer for the
    year pair."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_kths_smallest,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bounds = o.agg(
        F.expr("CAST(year(MAX(o_orderdate)) - 2 AS BIGINT)").alias("y0"),
        F.expr("CAST(year(MAX(o_orderdate)) - 1 AS BIGINT)").alias("y1"),
    )
    per = (
        o.crossJoin(F.broadcast(bounds))
        .where(F.expr("CAST(year(o_orderdate) AS BIGINT) IN (y0, y1)"))
        .groupBy(
            F.col("o_custkey").alias("k"),
            F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("yr"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("x")
        )
        .cache()  # feeds the rank recipe AND the tier join
    )
    th = grouped_kths_smallest(
        per.select("yr", "x"),
        "yr",
        "x",
        {"t1": "(n + 2) div 3", "t2": "(2 * n + 2) div 3"},
    ).select("yr", "t1", "t2")
    tiered = per.join(F.broadcast(th), "yr").selectExpr(
        "k",
        "yr",
        "CASE WHEN x <= t1 THEN 'low' WHEN x <= t2 THEN 'mid'"
        " ELSE 'high' END AS tier",
    )
    a = tiered.selectExpr("k", "yr AS yra", "tier AS tier_from")
    z = tiered.selectExpr("k AS kz", "yr AS yrz", "tier AS tier_to")
    return (
        a.join(z, F.col("k") == F.col("kz"))
        .crossJoin(F.broadcast(bounds))
        .where(F.expr("yra = y0 AND yrz = y1"))
        .groupBy("tier_from", "tier_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("tier_from", "tier_to")
    )
