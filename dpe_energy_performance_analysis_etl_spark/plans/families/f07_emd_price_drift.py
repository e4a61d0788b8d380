"""Query-registry family chunk 7 (auto-split from the
historical plans/queries.py lines 12626-14384; registration
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
from dpe_energy_performance_analysis_etl_spark.plans.families.f04_l_diversity_customers import (  # noqa: F401
    _walk_mix_sql,
)

@register(
    "emd_price_drift",
    """
    WITH pts AS MATERIALIZED (
      SELECT o_orderkey % 2 AS side,
             LEAST(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
                   // 3000000, 19) AS bin
      FROM orders
    ), hist AS MATERIALIZED (
      SELECT bin,
             CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM pts GROUP BY bin
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb
      FROM hist
    ), freq AS MATERIALIZED (
      SELECT bin,
             (na * 1000000) // GREATEST(ta, 1) AS fa,
             (nb * 1000000) // GREATEST(tb, 1) AS fb
      FROM hist CROSS JOIN tot
    ), cum AS MATERIALIZED (
      SELECT bin,
             CAST(SUM(fa - fb) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cd
      FROM freq
    )
    SELECT CAST(SUM(ABS(cd)) AS BIGINT) AS emd_ppm_bins,
           CAST(MAX(ABS(cd)) AS BIGINT) AS ks_ppm,
           CAST(COUNT(*) AS BIGINT) AS n_bins
    FROM cum
    """,
)
def emd_price_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D earth mover's distance (Wasserstein-1) between the order-
    value distributions of the two orderkey-parity halves — in one
    dimension EMD = Σ_bins |CDF_a − CDF_b|, so over ppm-scaled
    20-bin histograms the whole metric is exact integers (and the
    max of the same cumulative differences is the KS statistic for
    free — both emitted). The distribution-shift monitor for training
    mixtures, next to `category_drift_halves`' categorical form; the
    parity halves of a uniform synthetic column give a near-zero
    reading, i.e. the null baseline. One data-sized binning pass;
    everything after runs on the bounded bin table."""
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pts = o.select(
        (F.col("o_orderkey") % 2).alias("side"),
        F.least(
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                " div 3000000"
            ),
            F.lit(19).cast("bigint"),
        ).alias("bin"),
    )
    hist = pts.groupBy("bin").agg(
        F.sum((F.col("side") == 0).cast("bigint")).alias("na"),
        F.sum((F.col("side") == 1).cast("bigint")).alias("nb"),
    )
    tot = hist.agg(
        F.sum("na").cast("bigint").alias("ta"), F.sum("nb").cast("bigint").alias("tb")
    )
    freq = hist.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.expr("(na * 1000000) div greatest(ta, 1L)").alias("fa"),
        F.expr("(nb * 1000000) div greatest(tb, 1L)").alias("fb"),
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = freq.select(
        "bin", F.sum(F.col("fa") - F.col("fb")).over(wc).cast("bigint").alias("cd")
    )
    return cum.agg(
        F.sum(F.abs(F.col("cd"))).cast("bigint").alias("emd_ppm_bins"),
        F.max(F.abs(F.col("cd"))).cast("bigint").alias("ks_ppm"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )


@register(
    "holt_linear_revenue",
    """
    WITH tiers AS MATERIALIZED (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT t, y, CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i
      FROM tiers
    ), arrs AS MATERIALIZED (
      SELECT list(y ORDER BY t) AS ys, list(t ORDER BY t) AS ts FROM ranked
    ), folded AS MATERIALIZED (
      SELECT ys, ts,
        list_reduce(
          list_prepend(
            [ys[1], COALESCE(ys[2] - ys[1], CAST(0 AS BIGINT)), ys[1]],
            list_transform(ys[2:], v -> [v])
          ),
          (acc, el) -> list_concat(
            list_concat(
              [(el[1] + acc[1] + acc[2]) // 2,
               (((el[1] + acc[1] + acc[2]) // 2) - acc[1] + 3 * acc[2]) // 4],
              acc[3:]
            ),
            [acc[1] + acc[2]]
          )
        ) AS st
      FROM arrs
    )
    SELECT r.t, r.y, CAST(f.st[CAST(r.i + 2 AS INT)] AS BIGINT) AS fitted
    FROM ranked r CROSS JOIN folded f
    UNION ALL
    SELECT ts[CAST(len(ts) AS INT)] + h.h AS t, CAST(NULL AS BIGINT) AS y,
           CAST(st[1] + h.h * st[2] AS BIGINT) AS fitted
    FROM folded CROSS JOIN (SELECT unnest([1, 2, 3]) AS h) h
    """,
)
def holt_linear_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing of monthly revenue
    (operators/temporal.py holt_linear_fitted — dyadic α=1/2, β=1/4
    so every update is shift/div arithmetic, exact both engines;
    one-step-ahead fitted values for every month plus a 3-month
    forecast). The whole (level, trend, trajectory) state folds over
    the BOUNDED month-tier array via the SQL `aggregate` HOF — the
    Kaplan-Meier discipline applied to forecasting; the DuckDB twin
    folds the same array with list-typed accumulator state."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        holt_linear_fitted,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("m"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    return holt_linear_fitted(monthly, "m", "cents", horizon=3)


def _ring_oracle(vnodes: int) -> str:
    hmix = _walk_mix_sql("x", "97", 0)
    pmix = _walk_mix_sql("node", "vn", 0)

    def assign(n: int, name: str) -> str:
        return f"""pts{name} AS MATERIALIZED (
      SELECT n.node, v.vn, CAST({pmix} AS BIGINT) AS pos
      FROM (SELECT unnest(generate_series(0, {n - 1})) AS node) n
      CROSS JOIN (SELECT unnest(generate_series(0, {vnodes - 1})) AS vn) v
    ), a{name} AS MATERIALIZED (
      SELECT h.x,
             (MIN({{'d': ((p.pos - h.h) % 4294967296 + 4294967296) % 4294967296,
                    'node': p.node, 'vn': p.vn}})).node AS shard{name}
      FROM hk h CROSS JOIN pts{name} p
      GROUP BY h.x
    )"""

    return f"""
    WITH keys AS MATERIALIZED (
      SELECT DISTINCT o_orderkey AS x FROM orders
    ), hk AS MATERIALIZED (
      SELECT x, CAST({hmix} AS BIGINT) AS h FROM keys
    ), {assign(4, "4")}, {assign(5, "5")}
    SELECT CAST(a4.shard4 AS BIGINT) AS shard4,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN a4.shard4 <> a5.shard5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved,
           CAST(SUM(CASE WHEN a4.shard4 <> a5.shard5 AND a5.shard5 = 4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_to_new
    FROM a4 JOIN a5 ON a5.x = a4.x
    GROUP BY 1
    """


@register("ring_shard_moves", _ring_oracle(64))
def ring_shard_moves_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash RING placement and the 4 → 5 node movement
    profile (operators/scaling.py ring_assign — Karger STOC'97 with
    64 vnodes/node, the memcached/Dynamo scheme), side by side with
    `rendezvous_shard_moves`: same minimal-movement property
    (measured 23.1% moved, EVERY move to the new node — growing the
    ring only claims arcs for the newcomer's points; 64 vnodes put
    shard balance at max/avg 1.06 where 16 left 1.50), different
    state trade-off (static precomputable point table vs per-node
    hashing). Assignment is a row-local fold over the LITERAL point
    array — zero shuffle before the bounded aggregate."""
    from dpe_energy_performance_analysis_etl_spark.operators.scaling import ring_assign

    keys = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey")
        .distinct()
    )
    s4 = ring_assign(keys, "o_orderkey", 4).withColumnRenamed("shard", "shard4")
    s5 = ring_assign(s4, "o_orderkey", 5).withColumnRenamed("shard", "shard5")
    moved = F.col("shard4") != F.col("shard5")
    return s5.groupBy("shard4").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(moved.cast("int")).cast("bigint").alias("n_moved"),
        F.sum((moved & (F.col("shard5") == 4)).cast("int"))
        .cast("bigint")
        .alias("n_moved_to_new"),
    )


@register(
    "allen_relations_sessions",
    """
    WITH ev AS MATERIALIZED (
      SELECT user_id AS u, epoch_us(ts) // 1000000 AS t,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
      FROM events
    ), flagged AS MATERIALIZED (
      SELECT u, t, rk,
             CASE WHEN t - LAG(t) OVER (PARTITION BY u ORDER BY rk) > 1800
                       OR LAG(t) OVER (PARTITION BY u ORDER BY rk) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM ev
    ), sess AS MATERIALIZED (
      SELECT u, SUM(new_s) OVER (PARTITION BY u ORDER BY rk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid, t
      FROM flagged
    ), ivals AS MATERIALIZED (
      SELECT u, sid, MIN(t) AS s, MAX(t) AS e FROM sess GROUP BY u, sid
    ), tagged AS MATERIALIZED (
      SELECT u, sid, s, e, s // 900 AS hb FROM ivals
    ), pairs AS MATERIALIZED (
      SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
      FROM tagged a JOIN tagged b
        ON b.hb BETWEEN a.hb AND a.hb + 1
       AND a.u <> b.u
       AND b.s - a.s BETWEEN 0 AND 900
       AND (a.s < b.s OR (a.s = b.s AND (a.e < b.e
            OR (a.e = b.e AND a.u < b.u))))
    )
    SELECT relation, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT CASE WHEN e1 < s2 THEN 'before'
                  WHEN e1 = s2 THEN 'meets'
                  WHEN s1 = s2 AND e1 = e2 THEN 'equals'
                  WHEN s1 = s2 THEN 'starts'
                  WHEN e1 = e2 THEN 'finished_by'
                  WHEN e1 > e2 THEN 'contains'
                  ELSE 'overlaps' END AS relation
      FROM pairs
    ) GROUP BY relation
    """,
)
def allen_relations_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra (AI Journal 1983) over user sessions:
    classify EVERY cross-user session pair whose starts lie within
    900 s into the seven canonical relations (before / meets /
    overlaps / starts / finished_by / contains / equals — the
    inverses collapse because each unordered pair is oriented ONCE,
    by (s, e, u) lexicographic order) and count each. Two round-7
    corrections to the r6 version: (1) the old `u1 < u2` predicate
    composed with `s1 <= s2` silently dropped every pair whose
    earlier-starting session belonged to the higher user id (~half
    of all pairs; the oracle mirrored the bug so the gate could not
    see it) — the canonical orientation is now TIME-ONLY (`u1 <>
    u2`, lex (s, e, u) as the sole dedup rule); (2) the start-gap
    default shrank 3600 → 900 s so worst-case candidate volume in a
    dense corpus stays bounded — cross-user pairs per bucket grow
    with user density squared, and the gap is the knob that keeps
    the growth O(sessions · density · gap), the r6 sf5 scale-table
    lesson. Completes the temporal-join taxonomy next to
    asof/range/interval-coverage: sessionization is the per-user
    window pass; candidate pairs come from a gap-bucket equi-join
    with the bounded start gap — never an interval cross product.
    Exact integer second arithmetic throughout."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir).select(
        F.col("user_id").alias("u"),
        epoch_seconds("ts").alias("t"),
        "ts",
        "event_id",
    )
    wr = Window.partitionBy("u").orderBy("ts", "event_id")
    flagged = ev.withColumn("rk", F.row_number().over(wr)).withColumn(
        "new_s",
        (
            F.lag("t").over(wr).isNull()
            | (F.col("t") - F.lag("t").over(wr) > 1800)
        ).cast("int"),
    )
    # cumsum MUST order by the unique rank: epoch seconds tie within
    # a user (microsecond ts truncates), and tie-ambiguous cumsums
    # diverge across engines (gate-caught: 11 sessions differed)
    wc = Window.partitionBy("u").orderBy("rk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = flagged.withColumn("sid", F.sum("new_s").over(wc))
    ivals = sess.groupBy("u", "sid").agg(
        F.min("t").alias("s"), F.max("t").alias("e")
    )
    tagged = ivals.withColumn("hb", F.expr("s div 900"))
    a = tagged.select(
        F.col("u").alias("u1"), F.col("s").alias("s1"), F.col("e").alias("e1"),
        F.col("hb").alias("hb1"),
    ).withColumn("hb", F.explode(F.array(F.col("hb1"), F.col("hb1") + 1)))
    b = tagged.select(
        F.col("u").alias("u2"), F.col("s").alias("s2"), F.col("e").alias("e2"),
        F.col("hb").alias("hb"),
    )
    pairs = (
        a.join(b, "hb")
        .where(
            (F.col("u1") != F.col("u2"))
            & (F.col("s2") - F.col("s1")).between(0, 900)
            & (
                (F.col("s1") < F.col("s2"))
                | (
                    (F.col("s1") == F.col("s2"))
                    & (
                        (F.col("e1") < F.col("e2"))
                        | ((F.col("e1") == F.col("e2")) & (F.col("u1") < F.col("u2")))
                    )
                )
            )
        )
        .select("s1", "e1", "s2", "e2")
    )
    rel = (
        F.when(F.col("e1") < F.col("s2"), "before")
        .when(F.col("e1") == F.col("s2"), "meets")
        .when((F.col("s1") == F.col("s2")) & (F.col("e1") == F.col("e2")), "equals")
        .when(F.col("s1") == F.col("s2"), "starts")
        .when(F.col("e1") == F.col("e2"), "finished_by")
        .when(F.col("e1") > F.col("e2"), "contains")
        .otherwise("overlaps")
    )
    return pairs.select(rel.alias("relation")).groupBy("relation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


# =====================================================================
# Round 7, wave 1: densest subgraph (Bahmani parallel peeling)
# =====================================================================

def _densest_oracle(iterations: int, eps_num: int = 1, eps_den: int = 2) -> str:
    """Chained-CTE replay of the Bahmani peel (operators/graph.py
    densest_subgraph): per round a degree table, a 1-row stats table,
    the cross-multiplied keep rule, then the argmax round by the
    integer density key ne·2²⁰ div nv (ties → earliest round — the
    same key the Spark loop tracks driver-side). Every CTE is
    MATERIALIZED (the k-core lesson: default inlining re-evaluates
    the whole peel prefix per reference)."""
    thr = 2 * (eps_den + eps_num)
    blocks = [
        """
    WITH e0 AS MATERIALIZED (
      SELECT least(a.l_partkey, b.l_partkey) AS a,
             greatest(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )"""
    ]
    for i in range(iterations + 1):
        blocks.append(
            f""", d{i} AS MATERIALIZED (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
      FROM (SELECT a AS v FROM e{i} UNION ALL SELECT b AS v FROM e{i})
      GROUP BY v
    ), s{i} AS MATERIALIZED (
      SELECT {i} AS r,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM d{i}) AS nv,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM e{i}) AS ne
    )"""
        )
        if i < iterations:
            blocks.append(
                f""", keep{i} AS MATERIALIZED (
      SELECT v FROM d{i}, s{i}
      WHERE deg * nv * {eps_den} > {thr} * ne
    ), e{i + 1} AS MATERIALIZED (
      SELECT e{i}.a, e{i}.b FROM e{i}
      JOIN keep{i} x ON e{i}.a = x.v JOIN keep{i} y ON e{i}.b = y.v
    )"""
            )
    stats_union = " UNION ALL ".join(
        f"SELECT * FROM s{i}" for i in range(iterations + 1)
    )
    mem_union = " UNION ALL ".join(
        f"SELECT {i} AS r, v, deg FROM d{i}" for i in range(iterations + 1)
    )
    blocks.append(
        f""", stats AS MATERIALIZED ({stats_union})
    , best AS MATERIALIZED (
      SELECT r, nv, ne, CAST(ne * 1048576 // nv AS BIGINT) AS dens
      FROM stats WHERE nv > 0
      ORDER BY dens DESC, r ASC LIMIT 1
    ), mem AS ({mem_union})
    SELECT m.v, m.deg, CAST(b.r AS BIGINT) AS best_round,
           b.nv AS n_nodes, b.ne AS n_edges, b.dens AS density_scaled
    FROM mem m JOIN best b ON m.r = b.r"""
    )
    return "".join(blocks)


@register("densest_subgraph_parts", _densest_oracle(8, eps_num=0, eps_den=1))
def densest_subgraph_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densest subgraph of the recurring part-copurchase graph
    (operators/graph.py densest_subgraph — Bahmani et al. VLDB'12
    parallel peeling, ε=0 → threshold = the current average degree,
    2-approximation): the community core that avg-degree and
    kcore_membership miss because their thresholds don't ratchet
    with the shrinking graph. ε=0 chosen by measurement: on this
    graph ε=1/2 peels 80% of nodes in round 1 and density only
    falls (best = the input — a vacuous green, the k-truss lesson),
    while ε=0's gentler avg-degree threshold finds a genuinely
    denser 915-node core at round 1 (2.08 vs 1.92 edges/node at
    sf0.01). Same support≥2 graph as kcore/ktruss; 8 fixed peel
    rounds registered
    for oracle parity (peeling is confluent, so the unrolled CTE
    replay matches the loop's prefix; the operator's iterations=None
    mode peels to the (nv, ne) fixpoint with two bounded scalar
    pulls per round)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        densest_subgraph,
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
    return densest_subgraph(pairs, eps_num=0, eps_den=1, iterations=8)


# =====================================================================
# Round 7, wave 2: split-conformal prediction intervals
# =====================================================================

@register(
    "conformal_interval_orders",
    """
    WITH base AS MATERIALIZED (
      SELECT o_orderpriority AS grp,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             xor((xor(o_orderkey % 4294967296,
                      (o_orderkey % 4294967296) >> 16) * 73244475)
                   % 4294967296,
                 ((xor(o_orderkey % 4294967296,
                       (o_orderkey % 4294967296) >> 16) * 73244475)
                   % 4294967296) >> 16) % 4 AS sp
      FROM orders
    ), model AS MATERIALIZED (
      SELECT grp, CAST(SUM(cents) // COUNT(*) AS BIGINT) AS m
      FROM base WHERE sp = 0 GROUP BY grp
    ), cal AS MATERIALIZED (
      SELECT base.grp, ABS(cents - m) AS score
      FROM base JOIN model ON base.grp = model.grp WHERE sp = 1
    ), ks AS MATERIALIZED (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_cal,
             CAST(((COUNT(*) + 1) * 9 + 9) // 10 AS BIGINT) AS k
      FROM cal GROUP BY grp
    ), ranked AS (
      SELECT grp, score,
             row_number() OVER (PARTITION BY grp ORDER BY score) AS rk
      FROM cal
    ), qh AS MATERIALIZED (
      SELECT r.grp, ks.n_cal, ks.k, r.score AS qhat_cents
      FROM ranked r JOIN ks ON r.grp = ks.grp AND r.rk = ks.k
    ), test AS MATERIALIZED (
      SELECT base.grp, ABS(cents - m) AS score
      FROM base JOIN model ON base.grp = model.grp WHERE sp >= 2
    ), cov AS (
      SELECT t.grp, CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN t.score <= q.qhat_cents THEN 1 ELSE 0 END)
                  AS BIGINT) AS covered
      FROM test t JOIN qh q ON t.grp = q.grp GROUP BY t.grp
    )
    SELECT q.grp, q.n_cal, q.k, q.qhat_cents, c.n_test,
           CAST(c.covered * 1000000 // GREATEST(c.n_test, 1) AS BIGINT)
             AS covered_ppm
    FROM qh q JOIN cov c ON q.grp = c.grp
    """,
)
def conformal_interval_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (operators/stats.py
    conformal_qhat + operators/quantiles.py grouped_kth_smallest —
    Vovk et al. 2005 / Lei et al. JASA'18) for order totals by
    priority: a portable-hash 4-way split (train / calibration /
    2x test), a train-half integer-mean model, nonconformity =
    |cents − mean| in exact cents, q̂ = the ⌈(n+1)·0.9⌉-th smallest
    calibration score via range-partitioned parallel ranking (no
    per-group global sort window — 5 huge groups would otherwise pin
    5 executors), and the empirical test-half coverage in ppm. The
    conformal guarantee (coverage ≥ 90% in expectation) is itself
    oracle-checked — everything is rank-based or exact-integer, so
    both engines agree bit-for-bit."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        _portable_mix32,
    )
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        conformal_qhat,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        (_portable_mix32(F.col("o_orderkey")) % 4).alias("sp"),
    ).cache()
    model = (
        base.where(F.col("sp") == 0)
        .groupBy("grp")
        .agg(F.expr("CAST(sum(cents) div count(*) AS BIGINT)").alias("m"))
    )
    cal = (
        base.where(F.col("sp") == 1)
        .join(F.broadcast(model), "grp")
        .select("grp", F.abs(F.col("cents") - F.col("m")).alias("score"))
        # single consumer since r9: conformal_qhat reads n_cal off the
        # ranking recipe's bounded sizes table (one pass, no cache)
    )
    # 5-row result consumed by the coverage agg AND the final join
    qh = conformal_qhat(cal, "grp", "score", alpha_num=1, alpha_den=10).cache()
    test = (
        base.where(F.col("sp") >= 2)
        .join(F.broadcast(model), "grp")
        .select("grp", F.abs(F.col("cents") - F.col("m")).alias("score"))
    )
    cov = (
        test.join(F.broadcast(qh), "grp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(F.col("score") <= F.col("qhat"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("covered"),
        )
    )
    return (
        qh.where(F.col("qhat").isNotNull())
        .join(cov, "grp")
        .select(
            "grp",
            "n_cal",
            "k",
            F.col("qhat").alias("qhat_cents"),
            "n_test",
            F.expr("CAST(covered * 1000000 div greatest(n_test, 1L) AS BIGINT)").alias(
                "covered_ppm"
            ),
        )
    )


# =====================================================================
# Round 7, wave 3: Smith-Waterman local alignment
# =====================================================================

@register(
    "smith_waterman_events",
    """
    WITH ids AS MATERIALIZED (
      SELECT et, CAST(dense_rank() OVER (ORDER BY et) AS BIGINT) AS tid
      FROM (SELECT DISTINCT event_type AS et FROM events)
    ), ev AS MATERIALIZED (
      SELECT user_id AS u, tid,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rk
      FROM events JOIN ids ON events.event_type = ids.et
    ), series AS MATERIALIZED (
      SELECT u, list(tid ORDER BY rk) AS s
      FROM ev WHERE rk <= 10 GROUP BY u
    ), pairs AS MATERIALIZED (
      SELECT x.u AS user_a, y.u AS user_b, x.s AS a, y.s AS b
      FROM series x JOIN series y ON y.u = x.u + 1
    )
    SELECT CAST(user_a AS BIGINT) AS user_a, CAST(user_b AS BIGINT) AS user_b,
           CAST(list_max(
             list_reduce(
               list_prepend(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(a, x -> CAST(0 AS BIGINT))),
                 list_transform(b, x -> [x])
               ),
               (acc, bj) -> list_concat(acc, list_reduce(
                 list_prepend([CAST(0 AS BIGINT)],
                              list_transform(range(1, len(a) + 1), i -> [i])),
                 (acc2, el) -> list_append(acc2, GREATEST(
                   CAST(0 AS BIGINT),
                   acc[CAST(len(acc) AS INT) - CAST(len(a) AS INT) - 1
                       + CAST(el[1] AS INT)]
                     + CASE WHEN a[CAST(el[1] AS INT)] = bj[1]
                            THEN CAST(2 AS BIGINT)
                            ELSE CAST(-1 AS BIGINT) END,
                   acc[CAST(len(acc) AS INT) - CAST(len(a) AS INT)
                       + CAST(el[1] AS INT)] - 1,
                   acc2[CAST(len(acc2) AS INT)] - 1))
               ))
             )
           ) AS BIGINT) AS sw_score
    FROM pairs
    """,
)
def smith_waterman_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smith-Waterman local alignment score between consecutive
    users' event-type sequences (operators/entity.py
    smith_waterman_score — full O(n·m) local-alignment DP as nested
    codegen `aggregate` folds, +2/−1/−1, max over ALL cells via the
    concatenate-rows trick). The local variant finds the shared
    clickstream MOTIF that DTW (global, distance) and the GSP
    support counts (order-only) both miss. Event types are
    dictionary-encoded to BIGINT through a bounded alphabetical
    dense_rank dim (broadcast) so the DuckDB list_reduce twin keeps
    one element type; series = first 10 events per user; candidate
    pairing (consecutive user ids) stands in for real blocking, as
    in dtw_user_value_series."""
    from pyspark.sql import Window

    from dpe_energy_performance_analysis_etl_spark.operators.entity import (
        smith_waterman_score,
    )

    ev0 = read_events(spark, sf_dir)
    ids = (
        ev0.select(F.col("event_type").alias("et"))
        .distinct()
        .withColumn(
            "tid", F.dense_rank().over(Window.orderBy("et")).cast("bigint")
        )
    )
    wr = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        ev0.join(F.broadcast(ids), ev0["event_type"] == ids["et"])
        .withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= 10)
    )
    series = ev.groupBy(F.col("user_id").alias("u")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rk", "tid"))),
            lambda s: s["tid"],
        ).alias("s")
    ).cache()  # both sides of the consecutive-user self-join
    x = series.select(F.col("u").alias("user_a"), F.col("s").alias("a"))
    y = series.select((F.col("u") - 1).alias("user_a"), F.col("u").alias("user_b"), F.col("s").alias("b"))
    pairs = x.join(y, "user_a")
    return pairs.select(
        F.col("user_a").cast("bigint").alias("user_a"),
        F.col("user_b").cast("bigint").alias("user_b"),
        smith_waterman_score(F.col("a"), F.col("b")).alias("sw_score"),
    )


# =====================================================================
# Round 7, wave 4: Bradley-Terry preference strengths
# =====================================================================

def _bt_oracle(rounds: int = 3) -> str:
    """Unrolled MM rounds over the bounded pairwise game matrix —
    the SQL twin of operators/ml.py bradley_terry_mm's driver-side
    exact-integer loop. Products that can exceed int64 at the 100 TB
    framing (n·10¹², w·10¹², the renormalization p·players·10⁶) run
    in HUGEINT and are cast back down; Python's ints are arbitrary-
    precision, so both engines are exact."""
    head = """
    WITH ev AS MATERIALIZED (
      SELECT user_id AS u, event_type AS et,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rk
      FROM events
    ), wl AS MATERIALIZED (
      SELECT CASE WHEN x.c > y.c THEN x.et ELSE y.et END AS w,
             CASE WHEN x.c > y.c THEN y.et ELSE x.et END AS l
      FROM ev x JOIN ev y ON x.u = y.u AND y.rk = x.rk + 1
      WHERE x.et <> y.et AND x.c <> y.c
    ), pc AS MATERIALIZED (
      SELECT w, l, CAST(COUNT(*) AS BIGINT) AS n FROM wl GROUP BY 1, 2
    ), g AS MATERIALIZED (
      SELECT i, j, CAST(SUM(n) AS BIGINT) AS n FROM (
        SELECT w AS i, l AS j, n FROM pc
        UNION ALL SELECT l AS i, w AS j, n FROM pc
      ) GROUP BY 1, 2
    ), players AS MATERIALIZED (SELECT DISTINCT i FROM g
    ), wns AS MATERIALIZED (
      SELECT p.i, CAST(COALESCE(SUM(pc.n), 0) AS BIGINT) AS w
      FROM players p LEFT JOIN pc ON pc.w = p.i GROUP BY p.i
    ), np AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS c FROM players
    ), p0 AS MATERIALIZED (
      SELECT i, CAST(1000000 AS BIGINT) AS p FROM players
    )"""
    blocks = [head]
    for k in range(rounds):
        blocks.append(
            f""", d{k} AS MATERIALIZED (
      SELECT g.i,
             SUM((CAST(g.n AS HUGEINT) * 1000000000000)
                 // GREATEST(pi.p + pj.p, 1)) AS d
      FROM g JOIN p{k} pi ON g.i = pi.i JOIN p{k} pj ON g.j = pj.i
      GROUP BY g.i
    ), r{k} AS MATERIALIZED (
      SELECT w.i,
             (CAST(w.w AS HUGEINT) * 1000000000000)
               // GREATEST(COALESCE(d.d, 0), 1) AS p
      FROM wns w LEFT JOIN d{k} d ON w.i = d.i
    ), t{k} AS MATERIALIZED (
      SELECT SUM(p) AS t FROM r{k}
    ), p{k + 1} AS MATERIALIZED (
      SELECT r.i,
             CAST((r.p * np.c * 1000000) // GREATEST(t.t, 1) AS BIGINT) AS p
      FROM r{k} r, np, t{k} t
    )"""
        )
    blocks.append(
        f"""
    SELECT p.i AS player, p.p AS strength_ppm, gg.n AS games, w.w AS wins
    FROM p{rounds} p
    JOIN (SELECT i, CAST(SUM(n) AS BIGINT) AS n FROM g GROUP BY i) gg
      ON gg.i = p.i
    JOIN wns w ON w.i = p.i"""
    )
    return "".join(blocks)


@register("bradley_terry_events", _bt_oracle(3))
def bradley_terry_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths (operators/ml.py bradley_terry_mm —
    Hunter's MM, 3 rounds, exact ppm integers) over event types: a
    'match' is each adjacent event pair within a user's timeline
    whose types AND values differ, won by the higher exact-cents
    value — the arena-leaderboard model (P(i beats j) =
    pᵢ/(pᵢ+pⱼ)) applied to the synthetic clickstream. ONE data-sized
    aggregation builds the players²-bounded game matrix; the MM
    rounds run driver-side in exact Python ints (the Markov-
    attribution precedent), and the unrolled HUGEINT SQL twin
    certifies every round bit-for-bit."""
    from pyspark.sql import Window

    from dpe_energy_performance_analysis_etl_spark.operators.ml import (
        bradley_terry_mm,
    )

    ev = read_events(spark, sf_dir).select(
        "user_id",
        F.col("event_type").alias("et"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("c"),
        "ts",
        "event_id",
    )
    wr = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.withColumn("rk", F.row_number().over(wr))
    x = r.select("user_id", F.col("et").alias("et_a"), F.col("c").alias("c_a"), F.col("rk"))
    y = r.select(
        "user_id",
        F.col("et").alias("et_b"),
        F.col("c").alias("c_b"),
        (F.col("rk") - 1).alias("rk"),
    )
    matches = (
        x.join(y, ["user_id", "rk"])
        .where((F.col("et_a") != F.col("et_b")) & (F.col("c_a") != F.col("c_b")))
        .select(
            F.when(F.col("c_a") > F.col("c_b"), F.col("et_a"))
            .otherwise(F.col("et_b"))
            .alias("winner"),
            F.when(F.col("c_a") > F.col("c_b"), F.col("et_b"))
            .otherwise(F.col("et_a"))
            .alias("loser"),
        )
    )
    return bradley_terry_mm(matches, rounds=3)


# =====================================================================
# Round 7, wave 5: Holt-Winters seasonal smoothing
# =====================================================================

@register(
    "holt_winters_revenue",
    """
    WITH tiers AS MATERIALIZED (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT t, y, CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i
      FROM tiers
    ), arrs AS MATERIALIZED (
      SELECT list(y ORDER BY t) AS ys, list(t ORDER BY t) AS ts FROM ranked
    ), folded AS MATERIALIZED (
      SELECT ys, ts,
        list_reduce(
          list_prepend(
            list_concat(
              [list_reduce(ys[1:12], (a, x) -> a + x) // 12,
               CAST(0 AS BIGINT)],
              list_transform(ys[1:12],
                y -> y - list_reduce(ys[1:12], (a, x) -> a + x) // 12)
            ),
            list_transform(ys[13:], v -> [v])
          ),
          (acc, el) -> list_concat(list_concat(list_concat(list_concat(
            [(el[1] - acc[3] + acc[1] + acc[2]) // 2,
             (((el[1] - acc[3] + acc[1] + acc[2]) // 2)
               - acc[1] + 3 * acc[2]) // 4],
            acc[4:14]),
            [(el[1] - ((el[1] - acc[3] + acc[1] + acc[2]) // 2)
              + acc[3]) // 2]),
            acc[15:]),
            [acc[1] + acc[2] + acc[3]])
        ) AS st
      FROM arrs
    )
    SELECT r.t, r.y, CAST(f.st[CAST(r.i + 2 AS INT)] AS BIGINT) AS fitted
    FROM ranked r CROSS JOIN folded f WHERE r.i > 12
    UNION ALL
    SELECT ts[CAST(len(ts) AS INT)] + h.h AS t, CAST(NULL AS BIGINT) AS y,
           CAST(st[1] + h.h * st[2]
                + st[CAST(3 + (h.h - 1) % 12 AS INT)] AS BIGINT) AS fitted
    FROM folded CROSS JOIN (SELECT unnest([1, 2, 3]) AS h) h
    """,
)
def holt_winters_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters seasonal smoothing of monthly revenue
    (operators/temporal.py holt_winters_fitted — dyadic α=1/2, β=1/4,
    γ=1/2 over a 12-month season, init from the first season's mean
    and offsets; one-step-ahead fits for every month past the first
    season plus a 3-month forecast). Completes the smoothing ladder
    ewma (level) → holt_linear (trend) → this (trend + seasonality);
    the whole (level, trend, 12-slot rotating seasonal buffer,
    trajectory) state is ONE flat BIGINT array folded over the
    bounded month-tier array — the DuckDB twin replays it with
    list_reduce and inclusive 1-based slices."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        holt_winters_fitted,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("t"),
        (F.col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return holt_winters_fitted(monthly, "t", "cents", period=12, horizon=3)


# =====================================================================
# Round 7, wave 6: Apriori frequent triples + rule confidence
# =====================================================================

@register(
    "apriori_triples_brands",
    """
    WITH b AS MATERIALIZED (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS it
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), ms AS MATERIALIZED (
      SELECT GREATEST(5, COUNT(DISTINCT o) // 1000) AS floor_sup FROM b
    ), f1 AS MATERIALIZED (
      SELECT it FROM b GROUP BY it
      HAVING COUNT(*) >= (SELECT floor_sup FROM ms)
    ), occ AS MATERIALIZED (
      SELECT b.o, b.it FROM b SEMI JOIN f1 ON b.it = f1.it
    ), pr AS MATERIALIZED (
      SELECT x.o, x.it AS i, y.it AS j
      FROM occ x JOIN occ y ON x.o = y.o AND x.it < y.it
    ), f2 AS MATERIALIZED (
      SELECT i, j, CAST(COUNT(*) AS BIGINT) AS sup2
      FROM pr GROUP BY i, j
      HAVING COUNT(*) >= (SELECT floor_sup FROM ms)
    ), pr2 AS MATERIALIZED (
      SELECT pr.o, pr.i, pr.j FROM pr
      SEMI JOIN f2 ON pr.i = f2.i AND pr.j = f2.j
    ), t3 AS MATERIALIZED (
      SELECT pr2.i AS i1, pr2.j AS i2, z.it AS i3,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM pr2
      JOIN occ z ON pr2.o = z.o AND pr2.j < z.it
      WHERE EXISTS (SELECT 1 FROM f2 WHERE f2.i = pr2.j AND f2.j = z.it)
        AND EXISTS (SELECT 1 FROM f2 WHERE f2.i = pr2.i AND f2.j = z.it)
      GROUP BY 1, 2, 3 HAVING COUNT(*) >= (SELECT floor_sup FROM ms)
    ), stats AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS nt, CAST(SUM(support) AS BIGINT) AS ts
      FROM t3
    )
    SELECT t3.i1, t3.i2, t3.i3, t3.support,
           CAST(t3.support * 1000000 // f2.sup2 AS BIGINT) AS conf_ppm
    FROM t3 JOIN f2 ON t3.i1 = f2.i AND t3.i2 = f2.j, stats
    WHERE t3.support * stats.nt > stats.ts
    """,
)
def apriori_triples_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori frequent 3-itemsets over part-BRAND baskets (Agrawal &
    Srikant, VLDB\'94) with rule confidence: baskets = each order\'s
    distinct brands (25-value dimension, so the item space is
    SF-stable), the unordered market-basket sibling of
    gsp_event_sequences. Two-level thresholding, both data-relative
    and cross-engine exact: (1) the Apriori FLOOR — items and pairs
    below greatest(5, n_orders div 1000) leave BEFORE any join and
    candidate triples extend only frequent-pair occurrences with
    both closing sub-pairs checked frequent (on this uniform
    synthetic corpus the floor prunes nothing — documented; on a
    skewed real corpus it is the load-bearing step, exactly like the
    max_df cap on shingles); (2) the REPORTING filter — triples
    ABOVE THE MEAN surviving support (integer cross-multiplied
    sup·n_triples > total_sup), which stays ~half the 2300 possible
    triples at every SF where the round-7 first cut (absolute
    minsup 5 on SF-growing supplier baskets) collapsed to zero rows
    at sf0.1 — caught by the new scale-sweep row-count gate on its
    first run. conf_ppm = support(i1,i2,i3)*10^6 div support(i1,i2)."""
    # Basket-ARRAY plan (r8, VERDICT r7 ask #5 follow-through): the
    # r7 level-wise plan shuffled on the order key FOUR times (basket
    # distinct, frequent-item semi, pair self-join, triple extension
    # join) — measured 12.3 + 6.6 + 7.7 + 9.6 s of its 37 s at sf5.
    # With a BOUNDED item dimension (25 brands), collect_set builds
    # each basket in ONE o-keyed shuffle and every candidate pair /
    # triple explodes ROW-LOCALLY from the sorted array (i < j < k by
    # position); Apriori pruning becomes broadcast semi-joins against
    # the tiny frequent tables, and the only remaining shuffles are
    # map-side-combining aggregations onto <= |items|^2 / |items|^3
    # keys. Measured 37.1 -> 23.5 s at sf5 — and the 23.5 ran at
    # calib 0.648 vs the 37.1's 0.373 (a ~1.7x slower host), so the
    # matched-host ratio is larger; rows bit-identical, oracle green
    # (NOTES round 8). Worst-case explode fan-out is C(|arr|,3) with
    # |arr| <= |frequent items| — bounded by the dimension, which is
    # the documented applicability condition of the array plan (an
    # unbounded item space keeps the r7 join shape instead).
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    baskets = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("it"))
        .groupBy("o")
        .agg(F.array_sort(F.collect_set("it")).alias("arr"))
        .cache()
    )
    floor_sup = max(5, baskets.count() // 1000)
    items = baskets.select(F.explode("arr").alias("it"))
    f1 = (
        items.groupBy("it")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= floor_sup)
    )
    freq_items = sorted(r["it"] for r in f1.collect())  # bounded dimension
    lit_f1 = F.array(*[F.lit(s) for s in freq_items])
    fb = baskets.select(
        "o", F.array_sort(F.array_intersect("arr", lit_f1)).alias("arr")
    ).where(F.size("arr") >= 2)
    pairs = fb.selectExpr(
        "explode(flatten(transform(arr, (x, i) ->"
        " transform(slice(arr, i + 2, size(arr) - i - 1),"
        " y -> struct(x AS i, y AS j))))) AS p"
    ).select("p.i", "p.j")
    f2 = (
        pairs.groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sup2"))
        .where(F.col("sup2") >= floor_sup)
        .cache()
    )
    triples = (
        fb.where(F.size("arr") >= 3)
        .selectExpr(
            "explode(flatten(flatten(transform(arr, (x, i) ->"
            " transform(slice(arr, i + 2, size(arr) - i - 1), (y, j) ->"
            " transform(slice(arr, i + j + 3, size(arr) - i - j - 2),"
            " z -> struct(x AS i1, y AS i2, z AS i3))))))) AS tr"
        )
        .select("tr.i1", "tr.i2", "tr.i3")
        # Apriori closure: all three sub-pairs frequent, pruned on the
        # exploded stream via broadcast semi-joins BEFORE the count
        .join(
            F.broadcast(f2.select(F.col("i").alias("i1"), F.col("j").alias("i2"))),
            ["i1", "i2"],
            "left_semi",
        )
        .join(
            F.broadcast(f2.select(F.col("i").alias("i1"), F.col("j").alias("i3"))),
            ["i1", "i3"],
            "left_semi",
        )
        .join(
            F.broadcast(f2.select(F.col("i").alias("i2"), F.col("j").alias("i3"))),
            ["i2", "i3"],
            "left_semi",
        )
    )
    t3 = (
        triples.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .where(F.col("support") >= floor_sup)
        .cache()
    )
    stats = t3.agg(
        F.count(F.lit(1)).cast("bigint").alias("nt"),
        F.sum("support").cast("bigint").alias("ts"),
    )
    return (
        t3.crossJoin(F.broadcast(stats))
        .where(F.col("support") * F.col("nt") > F.col("ts"))
        .join(
            f2.select(F.col("i").alias("i1"), F.col("j").alias("i2"), "sup2"),
            ["i1", "i2"],
        )
        .select(
            "i1",
            "i2",
            "i3",
            "support",
            F.expr("CAST(support * 1000000 div sup2 AS BIGINT)").alias("conf_ppm"),
        )
    )


# =====================================================================
# Round 7, wave 7: Fellegi-Sunter EM parameter estimation
# =====================================================================

def _fs_em_oracle(rounds: int = 3) -> str:
    """Unrolled EM rounds over the <=2^3 agreement-pattern table —
    the SQL twin of operators/entity.py fellegi_sunter_em's
    driver-side exact-integer loop (same candidate construction as
    record_linkage_fs). Pattern-likelihood products run in HUGEINT;
    every division site matches the Python loop exactly."""
    head = """
    WITH r AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0
                  THEN replace(c_name, 'Customer', 'Custoner') ELSE c_name END AS name,
             c_nationkey,
             CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1.75e1 ELSE c_acctbal END AS bal,
             CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS seg
      FROM customer
    ), l AS (
      SELECT c_custkey, c_name AS name, c_nationkey, c_acctbal AS bal,
             c_mktsegment AS seg
      FROM customer
    ), nc AS (SELECT COUNT(*) AS n FROM customer
    ), rnd AS MATERIALIZED (
      -- u-estimation population: 6 deterministic hash partners per
      -- customer (scale-LINEAR, unlike any loosened blocking)
      SELECT l.c_custkey AS lk,
             xor((xor((l.c_custkey % 4294967296 + s.s * 40503) % 4294967296,
                      ((l.c_custkey % 4294967296 + s.s * 40503) % 4294967296)
                        >> 16) * 73244475) % 4294967296,
                 ((xor((l.c_custkey % 4294967296 + s.s * 40503) % 4294967296,
                       ((l.c_custkey % 4294967296 + s.s * 40503) % 4294967296)
                         >> 16) * 73244475) % 4294967296) >> 16)
               % (SELECT n FROM nc) AS rk
      FROM l CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6]) AS s) s
    ), cand AS MATERIALIZED (
      SELECT (l.name = r.name) AS g1, (l.seg = r.seg) AS g2,
             (CAST(floor(l.bal * 100 + 0.5) AS BIGINT) // 100000
              = CAST(floor(r.bal * 100 + 0.5) AS BIGINT) // 100000) AS g3
      FROM l JOIN r ON l.c_nationkey = r.c_nationkey
                   AND l.name[-3:] = r.name[-3:]
      UNION ALL
      SELECT (l.name = r.name), (l.seg = r.seg),
             (CAST(floor(l.bal * 100 + 0.5) AS BIGINT) // 100000
              = CAST(floor(r.bal * 100 + 0.5) AS BIGINT) // 100000)
      FROM rnd JOIN l ON rnd.lk = l.c_custkey
               JOIN r ON rnd.rk = r.c_custkey
      WHERE rnd.lk <> rnd.rk
    ), pat AS MATERIALIZED (
      SELECT g1, g2, g3, CAST(COUNT(*) AS BIGINT) AS n
      FROM cand GROUP BY 1, 2, 3
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(n) AS BIGINT) AS nt FROM pat
    ), prm0 AS MATERIALIZED (
      SELECT CAST(100000 AS BIGINT) AS p,
             CAST(900000 AS BIGINT) AS m1, CAST(900000 AS BIGINT) AS m2,
             CAST(900000 AS BIGINT) AS m3,
             CAST(100000 AS BIGINT) AS u1, CAST(100000 AS BIGINT) AS u2,
             CAST(100000 AS BIGINT) AS u3
    )"""
    blocks = [head]
    for k in range(rounds):
        blocks.append(
            f""", w{k} AS MATERIALIZED (
      SELECT g1, g2, g3, n,
        (CAST(p AS HUGEINT)
         * (CASE WHEN g1 THEN m1 ELSE 1000000 - m1 END)
         * (CASE WHEN g2 THEN m2 ELSE 1000000 - m2 END)
         * (CASE WHEN g3 THEN m3 ELSE 1000000 - m3 END)) * 1000000
        // GREATEST(
          (CAST(p AS HUGEINT)
           * (CASE WHEN g1 THEN m1 ELSE 1000000 - m1 END)
           * (CASE WHEN g2 THEN m2 ELSE 1000000 - m2 END)
           * (CASE WHEN g3 THEN m3 ELSE 1000000 - m3 END))
          + (CAST(1000000 - p AS HUGEINT)
             * (CASE WHEN g1 THEN u1 ELSE 1000000 - u1 END)
             * (CASE WHEN g2 THEN u2 ELSE 1000000 - u2 END)
             * (CASE WHEN g3 THEN u3 ELSE 1000000 - u3 END)), 1) AS w
      FROM pat, prm{k}
    ), prm{k + 1} AS MATERIALIZED (
      SELECT
        CAST(SUM(n * w) // GREATEST((SELECT nt FROM tot), 1) AS BIGINT) AS p,
        CAST(SUM(CASE WHEN g1 THEN n * w ELSE 0 END) * 1000000
             // GREATEST(SUM(n * w), 1) AS BIGINT) AS m1,
        CAST(SUM(CASE WHEN g2 THEN n * w ELSE 0 END) * 1000000
             // GREATEST(SUM(n * w), 1) AS BIGINT) AS m2,
        CAST(SUM(CASE WHEN g3 THEN n * w ELSE 0 END) * 1000000
             // GREATEST(SUM(n * w), 1) AS BIGINT) AS m3,
        CAST(SUM(CASE WHEN g1 THEN n * (1000000 - w) ELSE 0 END) * 1000000
             // GREATEST(SUM(n * (1000000 - w)), 1) AS BIGINT) AS u1,
        CAST(SUM(CASE WHEN g2 THEN n * (1000000 - w) ELSE 0 END) * 1000000
             // GREATEST(SUM(n * (1000000 - w)), 1) AS BIGINT) AS u2,
        CAST(SUM(CASE WHEN g3 THEN n * (1000000 - w) ELSE 0 END) * 1000000
             // GREATEST(SUM(n * (1000000 - w)), 1) AS BIGINT) AS u3
      FROM w{k}
    )"""
        )
    blocks.append(
        f"""
    SELECT 'name' AS field, m1 AS m_ppm, u1 AS u_ppm, p AS p_ppm FROM prm{rounds}
    UNION ALL
    SELECT 'segment', m2, u2, p FROM prm{rounds}
    UNION ALL
    SELECT 'balance', m3, u3, p FROM prm{rounds}"""
    )
    return "".join(blocks)


@register("fs_em_customers", _fs_em_oracle(3))
def fs_em_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised Fellegi-Sunter m/u estimation by EM
    (operators/entity.py fellegi_sunter_em — Winkler 1988, the fit
    behind Splink-style linkage). Candidate population = the
    record_linkage_fs blocked perturbed-copy pairs PLUS six
    deterministic hash-partner pairs per customer — the u-estimation
    augmentation real FS deployments use, and it matters: on the
    blocked pairs alone (~94% true matches) EM converged to a
    DEGENERATE split (the "non-match" class absorbed corrupted
    matches, u_name 48%); with the scale-LINEAR random pairs the
    population is ~14% matches and EM recovers the planted truth —
    m_name 87.4% (true 6/7), u_name ~0.1%, m_seg 80.8% (true ~4/5),
    u_seg 16.4% (~1/5 segment collisions), m_bal 99.9% (the $1000
    bucket absorbs the $17.50 shift except at boundaries), u_bal
    11.2% (random bucket collisions). Agreement patterns aggregate
    to <= 8 counted rows in one pass; 3 EM rounds run driver-side in
    exact ppm integers, mirrored bit-for-bit by the unrolled HUGEINT
    SQL twin."""
    from dpe_energy_performance_analysis_etl_spark.operators.entity import (
        fellegi_sunter_em,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    right = cust.select(
        "c_custkey",
        F.when(k % 7 == 0, F.regexp_replace("c_name", "Customer", "Custoner"))
        .otherwise(F.col("c_name"))
        .alias("name"),
        "c_nationkey",
        F.when(k % 3 == 0, F.col("c_acctbal") + 17.5)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
        F.when(k % 5 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    left = cust.select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        "c_nationkey",
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    lb = left.withColumn("tail", F.substring(F.col("name"), -3, 3))
    rb = right.withColumn("tail", F.substring(F.col("name"), -3, 3))
    bucket = lambda c: F.expr(
        f"CAST(floor({c} * 100 + 0.5) AS BIGINT) div 100000"
    )
    comp = lambda l, r: [
        (F.col(f"{l}.name") == F.col(f"{r}.name")).alias("g1"),
        (F.col(f"{l}.seg") == F.col(f"{r}.seg")).alias("g2"),
        (bucket(f"{l}.bal") == bucket(f"{r}.bal")).alias("g3"),
    ]
    blocked = (
        lb.alias("l")
        .join(rb.alias("r"), ["c_nationkey", "tail"])
        .select(*comp("l", "r"))
    )
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        _portable_mix32,
    )

    n_cust = cust.count()
    rnd = (
        left.withColumn("lk", F.col("key"))
        .select("lk")
        .withColumn("s", F.explode(F.array(*[F.lit(i) for i in range(1, 7)])))
        .select(
            "lk",
            (_portable_mix32(F.col("lk"), F.col("s")) % F.lit(n_cust)).alias("rk"),
        )
        .where(F.col("lk") != F.col("rk"))
    )
    random_pairs = (
        rnd.join(left.alias("l"), rnd["lk"] == F.col("l.key"))
        .join(rb.alias("r"), rnd["rk"] == F.col("r.c_custkey"))
        .select(*comp("l", "r"))
    )
    cand = blocked.unionByName(random_pairs)
    out = fellegi_sunter_em(cand, ["g1", "g2", "g3"], rounds=3)
    return out.select(
        F.when(F.col("field") == "g1", "name")
        .when(F.col("field") == "g2", "segment")
        .otherwise("balance")
        .alias("field"),
        "m_ppm",
        "u_ppm",
        "p_ppm",
    )


# =====================================================================
# Round 7, wave 8: multi-word phrase blocklist matching
# =====================================================================

@register(
    "blocklist_phrase_match_docs",
    """
    WITH tok AS MATERIALIZED (
      SELECT doc_id,
             CAST(unnest(range(1, len(regexp_extract_all(lower(text),
                  '[a-z0-9]+')) + 1)) AS BIGINT) AS pos,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents
    ), pat AS MATERIALIZED (
      SELECT pid, phrase,
             CAST(unnest(range(0, len(string_split(phrase, ' ')))) AS BIGINT)
               AS off,
             unnest(string_split(phrase, ' ')) AS ptok,
             CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen
      FROM (VALUES (1, 'table hash'), (2, 'merge group'),
                   (3, 'customer join'), (4, 'slow key scan'),
                   (5, 'sort merge group')) v(pid, phrase)
    ), hits AS MATERIALIZED (
      SELECT tok.doc_id, pat.pid, pat.phrase, pat.plen,
             tok.pos - pat.off AS anchor,
             COUNT(*) AS n_off
      FROM tok JOIN pat ON tok.t = pat.ptok
      GROUP BY 1, 2, 3, 4, 5
    ), full_hits AS (
      SELECT doc_id, pid, phrase, anchor FROM hits WHERE n_off = plen
    )
    SELECT phrase,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM full_hits GROUP BY phrase
    """,
)
def blocklist_phrase_match_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-word phrase blocklist matching over the corpus — the
    filter-list primitive (bad-phrase removal, policy screening)
    beside decontaminate_overlap's n-gram benchmark overlap. The
    scale mechanism is the classic position-anchor inverted join
    (Rabin-Karp's verify step relationalized): tokens equi-join the
    broadcast (pattern, offset, token) table on TOKEN ONLY, each
    match votes for anchor = pos − offset, and a phrase occurrence
    is an anchor whose vote count equals the phrase length — no
    substring scan, no per-pattern pass over the corpus; candidate
    volume is Σ_token df(token)·patterns_containing(token), bounded
    by the blocklist's vocabulary selectivity. Handles repeated
    tokens inside a phrase correctly (each offset must vote for the
    SAME anchor). Returns per phrase (n_hits, n_docs)."""
    docs = read_documents(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("pos0", "t"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "t")
    phrases = [
        (1, "table hash"),
        (2, "merge group"),
        (3, "customer join"),
        (4, "slow key scan"),
        (5, "sort merge group"),
    ]
    pat = (
        spark.createDataFrame(phrases, "pid int, phrase string")
        .select(
            "pid",
            "phrase",
            F.posexplode(F.split("phrase", " ")).alias("off", "ptok"),
            F.size(F.split("phrase", " ")).cast("bigint").alias("plen"),
        )
        .select("pid", "phrase", F.col("off").cast("bigint").alias("off"), "ptok", "plen")
    )
    hits = (
        tok.join(F.broadcast(pat), tok["t"] == pat["ptok"])
        .groupBy(
            "doc_id", "pid", "phrase", "plen",
            (F.col("pos") - F.col("off")).alias("anchor"),
        )
        .agg(F.count(F.lit(1)).alias("n_off"))
        .where(F.col("n_off") == F.col("plen"))
    )
    return hits.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
    )


# =====================================================================
# Round 7, wave 9: rank-biased overlap between rankings
# =====================================================================

# RBO_p (Webber, Moffat & Zobel, TOIS 2010) at p = 1/2, depth 20:
# RBO = (1-p)·Σ p^(d-1)·A_d = Σ_d overlap_d / (d·2^d). Every term is
# made EXACT by scaling with D = 2^20 · lcm(1..20): the per-depth
# integer weights below are D/(d·2^d) (all divisions exact), so
# rbo_scaled = Σ overlap_d · w_d is a plain BIGINT sum ≤ D ≈ 2.44e14
# — no floats anywhere, identical in both engines. Identical top-20
# lists score D·(1 − 2⁻²⁰) (the truncated-series maximum).
_RBO_D = 244100691394560
_RBO_W = [
    122050345697280, 30512586424320, 10170862141440, 3814073303040,
    1525629321216, 635678883840, 272433807360, 119189790720,
    52973240320, 23837958144, 10835435520, 4966241280, 2292111360,
    1064194560, 496624128, 232792560, 109549440, 51731680, 24504480,
    11639628,
]


@register(
    "rbo_rankings_brands",
    """
    WITH agg AS MATERIALIZED (
      SELECT p.p_brand AS brand, l.l_partkey AS pk,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), ra AS MATERIALIZED (
      SELECT brand, pk,
             row_number() OVER (PARTITION BY brand
               ORDER BY rev DESC, pk ASC) AS r
      FROM agg
    ), rb AS MATERIALIZED (
      SELECT brand, pk,
             row_number() OVER (PARTITION BY brand
               ORDER BY qty DESC, pk ASC) AS r
      FROM agg
    ), lists AS MATERIALIZED (
      SELECT a.brand,
             (SELECT list(pk ORDER BY r) FROM ra
               WHERE ra.brand = a.brand AND ra.r <= 20) AS la,
             (SELECT list(pk ORDER BY r) FROM rb
               WHERE rb.brand = a.brand AND rb.r <= 20) AS lb
      FROM (SELECT DISTINCT brand FROM agg) a
    )
    SELECT brand,
           CAST(list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, 21), d ->
                 CAST(len(list_intersect(la[1:CAST(d AS INT)],
                                         lb[1:CAST(d AS INT)])) AS BIGINT)
                 * ([122050345697280, 30512586424320, 10170862141440,
                     3814073303040, 1525629321216, 635678883840,
                     272433807360, 119189790720, 52973240320,
                     23837958144, 10835435520, 4966241280, 2292111360,
                     1064194560, 496624128, 232792560, 109549440,
                     51731680, 24504480, 11639628])[CAST(d AS INT)])),
             (acc, x) -> acc + x) AS BIGINT) AS rbo_scaled,
           CAST(len(list_intersect(la[1:20], lb[1:20])) AS BIGINT)
             AS overlap_20
    FROM lists
    """,
)
def rbo_rankings_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber-Moffat-Zobel, TOIS 2010) between
    each brand's top-20 parts BY REVENUE and BY QUANTITY — the
    top-weighted ranking-agreement metric that Kendall/Spearman
    (all-pairs, depth-blind) and plain overlap@k (order-blind) both
    miss; the eval primitive for comparing retrieval/recommender
    rankings. p = 1/2 makes every geometric weight dyadic, and the
    whole score is integer-scaled by D = 2^20·lcm(1..20) so
    rbo_scaled = Σ_d |S_d ∩ T_d|·(D div (d·2^d)) is an exact BIGINT
    on both engines. Rankings are deterministic ((metric DESC, pk)
    order over exact integer aggregates); per-depth intersections
    run on ≤20-element arrays inside codegen — O(k²) work per brand,
    data shuffled once for the (brand, part) aggregate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    from pyspark.sql import Window

    agg = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_partkey").alias("pk"))
        .agg(
            F.sum((F.col("l_extendedprice").cast("decimal(30,2)") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
        )
        .cache()
    )
    wa = Window.partitionBy("brand").orderBy(F.col("rev").desc(), F.col("pk").asc())
    wb = Window.partitionBy("brand").orderBy(F.col("qty").desc(), F.col("pk").asc())
    la = (
        agg.withColumn("r", F.row_number().over(wa))
        .where("r <= 20")
        .groupBy("brand")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("r", "pk"))), lambda s: s["pk"]
            ).alias("la")
        )
    )
    lb = (
        agg.withColumn("r", F.row_number().over(wb))
        .where("r <= 20")
        .groupBy("brand")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("r", "pk"))), lambda s: s["pk"]
            ).alias("lb")
        )
    )
    w_arr = F.array(*[F.lit(w).cast("bigint") for w in _RBO_W])
    lists = la.join(lb, "brand")
    rbo = F.aggregate(
        F.sequence(F.lit(1), F.lit(20)),
        F.lit(0).cast("bigint"),
        lambda acc, d: acc
        + F.size(
            F.array_intersect(
                F.slice(F.col("la"), 1, d), F.slice(F.col("lb"), 1, d)
            )
        ).cast("bigint")
        * F.element_at(w_arr, d.cast("int")),
    )
    return lists.select(
        "brand",
        rbo.alias("rbo_scaled"),
        F.size(F.array_intersect(F.col("la"), F.col("lb")))
        .cast("bigint")
        .alias("overlap_20"),
    )


# =====================================================================
# Round 7, wave 10: quantile normalization across sources
# =====================================================================

@register(
    "quantile_normalize_doclen",
    """
    WITH g AS MATERIALIZED (
      SELECT source, doc_id, n_chars,
             CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
               AS grank,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY n_chars, doc_id) AS BIGINT) AS gr,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ng,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM documents
    )
    SELECT a.source, CAST(a.doc_id AS BIGINT) AS doc_id,
           CAST(a.n_chars AS BIGINT) AS n_chars,
           CAST(b.n_chars AS BIGINT) AS qn_value
    FROM (SELECT source, doc_id, n_chars,
                 ((2 * gr - 1) * n + 2 * ng - 1) // (2 * ng) AS idx
          FROM g) a
    JOIN (SELECT grank, n_chars FROM g) b ON a.idx = b.grank
    """,
)
def quantile_normalize_doclen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document lengths across sources
    (operators/quantiles.py quantile_normalize — Bolstad et al. 2003
    applied to corpus curation): every doc's n_chars is replaced by
    the GLOBAL length distribution's order statistic at the doc's
    within-source midpoint quantile ⌈(2r−1)N / 2n_g⌉, making one
    length threshold mean the same thing in every source regardless
    of how skewed each source's raw lengths are. All rank-based —
    no interpolation, engine-exact; the Spark global ranking is the
    repartitionByRange two-pass recipe (the oracle's flat window is
    the sf0.01 shortcut, the operator's plan is the 100 TB one)."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        quantile_normalize,
    )

    docs = read_documents(spark, sf_dir).select("source", "doc_id", "n_chars")
    out = quantile_normalize(docs, "source", "n_chars", "doc_id")
    return out.select(
        "source",
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("qn_value").cast("bigint").alias("qn_value"),
    )


# =====================================================================
# Round 7, wave 11: CMS join-size estimate, walk-forward CV splits,
# k-anonymity audit
# =====================================================================

@register(
    "cms_join_size_estimate",
    """
    WITH lk AS (
      SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem
    ), ok AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders
    ), lh AS MATERIALIZED (
      SELECT list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(k, '.'),
                                c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000000000000
             ) % 999999937 AS hp
      FROM lk
    ), oh AS MATERIALIZED (
      SELECT list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(k, '.'),
                                c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000000000000
             ) % 999999937 AS hp
      FROM ok
    ), ls AS MATERIALIZED (
      SELECT row, cell, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT 0 AS row, ((31 * hp + 7) % 999999937) % 65536 AS cell FROM lh
        UNION ALL SELECT 1, ((37 * hp + 11) % 999999937) % 65536 FROM lh
        UNION ALL SELECT 2, ((41 * hp + 13) % 999999937) % 65536 FROM lh
      ) GROUP BY 1, 2
    ), os AS MATERIALIZED (
      SELECT row, cell, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT 0 AS row, ((31 * hp + 7) % 999999937) % 65536 AS cell FROM oh
        UNION ALL SELECT 1, ((37 * hp + 11) % 999999937) % 65536 FROM oh
        UNION ALL SELECT 2, ((41 * hp + 13) % 999999937) % 65536 FROM oh
      ) GROUP BY 1, 2
    ), est AS (
      SELECT CAST(MIN(dot) AS BIGINT) AS est FROM (
        SELECT ls.row, SUM(ls.cnt * os.cnt) AS dot
        FROM ls JOIN os ON ls.row = os.row AND ls.cell = os.cell
        GROUP BY ls.row
      )
    ), exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT est.est, exact.exact,
           CAST((est.est - exact.exact) * 1000000 // exact.exact AS BIGINT)
             AS over_ppm
    FROM est, exact
    """,
)
def cms_join_size_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from two Count-Min sketches
    (operators/sketch.py cms_inner_product — Cormode-Muthukrishnan
    §4.2): |lineitem ⋈ orders| estimated as the min-over-rows sketch
    dot product, beside the exact join count and the overestimate in
    ppm — the planner-style "how big is this join" primitive that
    needs only two ≤ 3×512-cell sketches, mergeable across
    partitions/batches like every sketch in this repo. CM inner
    products only OVERestimate (collisions add mass) — the oracle
    certifies est, exact, and the gap bit-for-bit."""
    from dpe_energy_performance_analysis_etl_spark.operators.sketch import (
        cms_build,
        cms_inner_product,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").cast("string").alias("k")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("string").alias("k")
    )
    # width sized for the inner-product bound e/w * F1(L) * F1(O): at
    # 512 the uniform 15k-key FK join is CM's worst case (measured 28x
    # overestimate); 65536 cells bring the certified bound to ~1.6x
    # while the sketch stays 3 x 64Ki rows - mergeable and tiny. Size
    # w ~ e * F1A * F1B / (eps * J) for a target relative error.
    est = cms_inner_product(
        cms_build(li, "k", width=65536), cms_build(o, "k", width=65536)
    )
    li2 = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o2 = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = (
        li2.join(o2, li2["l_orderkey"] == o2["o_orderkey"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est",
        "exact",
        F.expr("CAST((est - exact) * 1000000 div exact AS BIGINT)").alias(
            "over_ppm"
        ),
    )


@register(
    "walk_forward_splits_orders",
    """
    WITH m AS MATERIALIZED (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS mo
      FROM orders
    ), span AS MATERIALIZED (
      SELECT CAST(MIN(mo) AS BIGINT) AS mn, CAST(MAX(mo) AS BIGINT) AS mx
      FROM m
    ), folds AS MATERIALIZED (
      SELECT f, (SELECT mn FROM span)
                + ((SELECT mx FROM span) - (SELECT mn FROM span)) * f // 6
                AS train_end
      FROM (SELECT unnest([1, 2, 3, 4]) AS f)
    )
    SELECT CAST(f AS BIGINT) AS fold, train_end,
           train_end + 2 AS test_start,
           LEAST(train_end + 7, (SELECT mx FROM span)) AS test_end,
           CAST((SELECT COUNT(*) FROM m WHERE mo <= train_end) AS BIGINT)
             AS n_train,
           CAST((SELECT COUNT(*) FROM m
                 WHERE mo BETWEEN train_end + 2
                   AND LEAST(train_end + 7, (SELECT mx FROM span)))
                AS BIGINT) AS n_test
    FROM folds
    """,
)
def walk_forward_splits_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward (expanding-window) cross-validation splits with a
    purge embargo — the time-series CV discipline (de Prado 2018's
    purged K-fold, walk-forward flavor) that random K-fold violates
    by leaking future into train: 4 folds with train_end at
    min + span·f/6 (anchored to the DATA's month range — a 1992
    epoch anchor left fold 1 empty on this corpus, caught by
    inspection), ONE embargoed month (orders placed in it belong
    to neither side — label horizons overlap the boundary), then a
    6-month test window. All boundaries are exact integer month
    arithmetic from a single data-derived scalar; the per-fold
    train/test counts are conditional aggregates over ONE pass of
    the month column (no per-fold scans at scale — the fold table
    is 4 rows, broadcast)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    m = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("mo")
    ).cache()
    mn, mx = m.agg(F.min("mo"), F.max("mo")).collect()[0]
    folds = spark.createDataFrame(
        [
            (
                f,
                mn + (mx - mn) * f // 6,
                mn + (mx - mn) * f // 6 + 2,
                min(mn + (mx - mn) * f // 6 + 7, mx),
            )
            for f in range(1, 5)
        ],
        "fold bigint, train_end bigint, test_start bigint, test_end bigint",
    )
    counts = m.crossJoin(F.broadcast(folds)).groupBy(
        "fold", "train_end", "test_start", "test_end"
    ).agg(
        F.sum((F.col("mo") <= F.col("train_end")).cast("int"))
        .cast("bigint")
        .alias("n_train"),
        F.sum(
            (
                (F.col("mo") >= F.col("test_start"))
                & (F.col("mo") <= F.col("test_end"))
            ).cast("int")
        )
        .cast("bigint")
        .alias("n_test"),
    )
    return counts


@register(
    "k_anonymity_audit_customers",
    """
    WITH qi AS MATERIALIZED (
      SELECT c_nationkey AS nat, c_mktsegment AS seg,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) // 100000 AS balb,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS sens
      FROM customer
    ), grp AS MATERIALIZED (
      SELECT nat, seg, balb, CAST(COUNT(*) AS BIGINT) AS sz,
             CAST(COUNT(DISTINCT sens) AS BIGINT) AS l_div
      FROM qi GROUP BY 1, 2, 3
    )
    SELECT CAST(k.k AS BIGINT) AS k,
           CAST(SUM(CASE WHEN sz < k.k THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(SUM(CASE WHEN sz < k.k THEN sz ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(MIN(sz) AS BIGINT) AS min_group_size,
           CAST(MIN(l_div) AS BIGINT) AS min_l_diversity
    FROM grp CROSS JOIN (SELECT unnest([2, 5, 10, 25]) AS k) k
    GROUP BY k.k
    """,
)
def k_anonymity_audit_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    et al. 2007) of the customer table under the quasi-identifier
    (nation, segment, $1000-balance-bucket) with exact balance cents
    as the sensitive attribute — the privacy-risk report that
    belongs beside pseudonymize_pii/pii_redact: for each re-id
    threshold k ∈ {2,5,10,25}, how many QI groups are smaller than k
    and how many ROWS those groups expose, plus the global minimum
    group size and minimum l-diversity. One (QI)-keyed aggregation
    pass; the per-k report is a 4-row broadcast cross over the
    bounded group table."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    qi = cust.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) div 100000").alias(
            "balb"
        ),
        cents.alias("sens"),
    )
    grp = qi.groupBy("nat", "seg", "balb").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz"),
        F.count_distinct("sens").cast("bigint").alias("l_div"),
    )
    ks = spark.createDataFrame([(2,), (5,), (10,), (25,)], "k bigint")
    return grp.crossJoin(F.broadcast(ks)).groupBy("k").agg(
        F.sum(F.when(F.col("sz") < F.col("k"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.min("sz").cast("bigint").alias("min_group_size"),
        F.min("l_div").cast("bigint").alias("min_l_diversity"),
    )
