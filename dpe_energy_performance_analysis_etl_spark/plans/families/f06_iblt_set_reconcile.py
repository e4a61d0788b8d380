"""Query-registry family chunk 6 (auto-split from the
historical plans/queries.py lines 10888-12623; registration
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
    "iblt_set_reconcile",
    """
    WITH l AS (
      SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0
    ), r AS (
      SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 11 <> 0
    )
    SELECT o_orderkey, 'left_only' AS side
    FROM l WHERE o_orderkey NOT IN (SELECT o_orderkey FROM r)
    UNION ALL
    SELECT o_orderkey, 'right_only' AS side
    FROM r WHERE o_orderkey NOT IN (SELECT o_orderkey FROM l)
    """,
)
def iblt_set_reconcile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set reconciliation via Invertible Bloom Lookup Table
    (operators/diff.py iblt_set_diff; Eppstein SIGCOMM'11): two order
    snapshots (keys mod-7 / mod-11 filtered) compress to mergeable
    (sum, bit_xor, bit_xor) cells each; subtracting cancels the ~75%
    common keys and peeling recovers EXACTLY the differing keys —
    work bounded by the diff, not the tables. The cell count is
    SIZED FROM THE DATA (next pow2 ≥ count/2 ≈ 2.4× the ~0.21·n
    expected diff — a bounded count pull): the first fixed-8192
    version silently decoded 1 then 0 rows at sf1/sf5 because
    peeling collapses once cells < ~2·|diff| (the sweep caught it).
    In a real deployment the sketch size is negotiated from the
    expected churn, exactly like this. The oracle is the semantic
    ground truth (two anti-joins), so decode must be complete and
    bit-exact."""
    from dpe_energy_performance_analysis_etl_spark.operators.diff import iblt_set_diff

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = o.count()  # bounded scalar pull, sizes the sketch
    n_cells = 1 << max((n // 2).bit_length(), 10)
    left = o.filter(F.col("o_orderkey") % 7 != 0)
    right = o.filter(F.col("o_orderkey") % 11 != 0)
    return iblt_set_diff(left, right, "o_orderkey", n_cells=n_cells, k=3)


def _rendezvous_oracle() -> str:
    def mix(salt: int) -> str:
        inner = _walk_mix_sql("o_orderkey", str(salt), 0)
        return _walk_mix_sql(f"({inner})", str(salt), 0)

    w4 = ", ".join(f"({mix(i)}) AS w{i}" for i in range(5))
    return f"""
    WITH keys AS MATERIALIZED (
      SELECT DISTINCT o_orderkey FROM orders
    ), wts AS MATERIALIZED (
      SELECT o_orderkey, {w4} FROM keys
    ), shards AS MATERIALIZED (
      SELECT o_orderkey,
             (SELECT i FROM (SELECT unnest([0,1,2,3]) AS i,
                                    unnest([w0,w1,w2,w3]) AS w)
              ORDER BY w DESC, i LIMIT 1) AS shard4,
             (SELECT i FROM (SELECT unnest([0,1,2,3,4]) AS i,
                                    unnest([w0,w1,w2,w3,w4]) AS w)
              ORDER BY w DESC, i LIMIT 1) AS shard5
      FROM wts
    )
    SELECT CAST(shard4 AS BIGINT) AS shard4,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN shard4 <> shard5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved,
           CAST(SUM(CASE WHEN shard4 <> shard5 AND shard5 = 4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved_to_new,
           CAST(SUM(CASE WHEN shard4 <> shard5 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS moved_frac
    FROM shards GROUP BY 1
    """


@register("rendezvous_shard_moves", _rendezvous_oracle())
def rendezvous_shard_moves_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hash shard placement and the movement profile when
    the cluster grows 4 → 5 nodes (operators/scaling.py
    rendezvous_assign): per old shard, how many keys stay, how many
    move, and that EVERY move lands on the new node (the HRW
    minimal-movement property — expected 1/5 of keys move, all to
    node 4; `hash % n` would reshuffle ~4/5). Row-local argmax over
    the portable mix — zero shuffle before the bounded aggregate."""
    from dpe_energy_performance_analysis_etl_spark.operators.scaling import (
        rendezvous_assign,
    )

    keys = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey")
        .distinct()
    )
    s4 = rendezvous_assign(keys, "o_orderkey", 4).withColumnRenamed("shard", "shard4")
    s5 = rendezvous_assign(s4, "o_orderkey", 5).withColumnRenamed("shard", "shard5")
    moved = F.col("shard4") != F.col("shard5")
    return s5.groupBy("shard4").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(moved.cast("int")).cast("bigint").alias("n_moved"),
        F.sum((moved & (F.col("shard5") == 4)).cast("int"))
        .cast("bigint")
        .alias("n_moved_to_new"),
        (
            F.sum(moved.cast("int")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("moved_frac"),
    )


# =====================================================================
# Round 6, wave 3: k-truss decomposition, GSP sequential patterns
# =====================================================================

def _ktruss_oracle(iterations: int, k: int) -> str:
    blocks = [
        """
    WITH co AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ), e0 AS MATERIALIZED (
      SELECT a, b FROM co WHERE n >= 2
    )"""
    ]
    for r in range(1, iterations + 1):
        blocks.append(
            f""", tri{r} AS MATERIALIZED (
      SELECT e1.a AS u, e1.b AS x, e2.b AS y
      FROM e{r - 1} e1 JOIN e{r - 1} e2 ON e1.a = e2.a AND e1.b < e2.b
      WHERE EXISTS (SELECT 1 FROM e{r - 1} e3
                    WHERE e3.a = e1.b AND e3.b = e2.b)
    ), sup{r} AS MATERIALIZED (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support FROM (
        SELECT u AS a, x AS b FROM tri{r}
        UNION ALL SELECT u, y FROM tri{r}
        UNION ALL SELECT x, y FROM tri{r}
      ) GROUP BY 1, 2
    ), e{r} AS MATERIALIZED (
      SELECT e.a, e.b, COALESCE(s.support, 0) AS support
      FROM e{r - 1} e LEFT JOIN sup{r} s ON s.a = e.a AND s.b = e.b
      WHERE COALESCE(s.support, 0) >= {k - 2}
    )"""
        )
    blocks.append(
        f"""
    SELECT a, b, CAST(support AS BIGINT) AS support FROM e{iterations}
    """
    )
    return "".join(blocks)


@register("ktruss_parts_graph", _ktruss_oracle(3, 3))
def ktruss_parts_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss of the recurring part-copurchase graph
    (operators/graph.py ktruss_edges, 3 fixed peel rounds): edges
    surviving iff ≥1 triangle survives around them — the edge-level
    cohesion core next to kcore_membership's vertex-level one. Per
    round one ordered wedge join + explode-to-3-edges support agg +
    semi-join, eager localCheckpoint (the cascade rule)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import ktruss_edges

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
    return ktruss_edges(pairs, k=3, iterations=3)


@register(
    "gsp_event_sequences",
    """
    WITH ev0 AS MATERIALIZED (
      SELECT user_id AS k, event_type AS it,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS r
      FROM events
    ), ev AS MATERIALIZED (
      SELECT k, it, row_number() OVER (PARTITION BY k ORDER BY r) AS r
      FROM ev0 WHERE r <= 5
    ), f1 AS MATERIALIZED (
      SELECT it, CAST(COUNT(*) AS BIGINT) AS support
      FROM (SELECT DISTINCT k, it FROM ev) GROUP BY 1
      HAVING COUNT(*) >= 40
    ), occ AS MATERIALIZED (
      SELECT ev.* FROM ev SEMI JOIN f1 ON ev.it = f1.it
    ), p2 AS MATERIALIZED (
      SELECT DISTINCT x.k, x.it AS i1, y.it AS i2
      FROM occ x JOIN occ y ON x.k = y.k AND x.r < y.r
    ), f2 AS MATERIALIZED (
      SELECT i1, i2, CAST(COUNT(*) AS BIGINT) AS support
      FROM p2 GROUP BY 1, 2 HAVING COUNT(*) >= 40
    ), p3 AS MATERIALIZED (
      SELECT DISTINCT x.k, x.it AS i1, y.it AS i2, z.it AS i3
      FROM occ x
      JOIN occ y ON x.k = y.k AND x.r < y.r
      JOIN occ z ON x.k = z.k AND y.r < z.r
      WHERE EXISTS (SELECT 1 FROM f2 WHERE f2.i1 = x.it AND f2.i2 = y.it)
    ), f3 AS (
      SELECT i1, i2, i3, CAST(COUNT(*) AS BIGINT) AS support
      FROM p3 GROUP BY 1, 2, 3 HAVING COUNT(*) >= 40
    )
    SELECT it AS pattern, CAST(1 AS BIGINT) AS length, support FROM f1
    UNION ALL
    SELECT i1 || '→' || i2, CAST(2 AS BIGINT), support FROM f2
    UNION ALL
    SELECT i1 || '→' || i2 || '→' || i3, CAST(3 AS BIGINT), support FROM f3
    """,
)
def gsp_event_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent event-type sequences with gaps over each user's FIRST
    5 events (operators/temporal.py gsp_frequent_sequences — GSP,
    Srikant-Agrawal EDBT'96): the sequential-pattern family the
    contiguous trigram queries can't express (⟨signup→…→purchase⟩
    counts however many events intervene). Restricting to the first
    5 events makes supports discriminative on the uniform synthetic
    stream; level-wise Apriori pruning keeps every join equi-keyed
    and frequent-bounded."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        gsp_frequent_sequences,
    )

    ev = read_events(spark, sf_dir)
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    first5 = ev.withColumn("__r", rk).where(F.col("__r") <= 5)
    return gsp_frequent_sequences(
        first5, min_support=40, max_len=3
    )


@register(
    "kaplan_meier_orders",
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
    ), encs AS (
      SELECT list(n * 1048576 + d ORDER BY t) AS encs FROM ranked
    )
    SELECT t, n AS n_at_risk, d AS d_events, c AS c_censored,
           CAST(list_reduce(
             list_prepend(CAST(1000000 AS BIGINT), encs[1:i]),
             (acc, e) -> (acc * ((e // 1048576) - (e % 1048576)))
                          // (e // 1048576)
           ) AS BIGINT) AS surv_scaled
    FROM ranked CROSS JOIN encs
    """,
)
def kaplan_meier_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival over order lifetimes (operators/stats.py
    kaplan_meier): month tiers since 1992-01, status 'F' = event,
    else censored — S(t) per tier as an exact integer product-limit
    fold (per-step floor at scale 10⁶), the survival-analysis family
    (churn/retention/time-to-failure) in bit-portable form. Data-
    sized work is ONE tier aggregation; the fold runs over the
    ~80-row tier array via the SQL `aggregate` higher-order
    function."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import kaplan_meier

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    subj = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("t"),
        (F.col("o_orderstatus") == "F").cast("int").alias("ev"),
    )
    return kaplan_meier(subj, "t", "ev")


@register("mst_parts_forest")
def mst_parts_forest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest of the recurring part-copurchase graph
    (operators/graph.py boruvka_mst — Borůvka rounds, ≤log₂|V|,
    min-struct tie-break, hash-min + pointer-doubling component
    merge): the backbone of single-linkage clustering at scale —
    cutting this forest at weight θ equals the threshold clustering
    the oracle-checked `dedup_clusters_cc` family computes directly.
    Rows-only by design (nested iterative control flow — per-round
    convergence loops inside rounds — is not unrollable SQL); the
    algorithm is value-verified against a reference Kruskal with
    distinct weights (unique-MST equality, tests/test_graph.py)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import boruvka_mst

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        cooccurrence_pairs,
    )

    # basket-array pair build (r12, see cooccurrence_pairs);
    # weight = inverse co-occurrence: the forest keeps the
    # STRONGEST links needed to span (ties broken by endpoints)
    pairs = cooccurrence_pairs(
        li.select("l_orderkey", "l_partkey"), "l_orderkey", "l_partkey"
    ).select("src", "dst", (F.lit(1000) - F.col("n")).alias("weight"))
    return boruvka_mst(pairs)


def _dbscan_oracle(eps: int, min_pts: int, cc_rounds: int) -> str:
    def mx(expr: str, salt: int) -> str:
        return f"({_walk_mix_sql(expr, str(salt), 0)})"

    rounds = []
    for r in range(cc_rounds):
        rounds.append(
            f"""lab{r + 1} AS MATERIALIZED (
      SELECT l.node,
             LEAST(l.lab,
                   COALESCE(nb.m, l.lab),
                   COALESCE(j.lab, l.lab)) AS lab
      FROM lab{r} l
      LEFT JOIN (SELECT e.a AS node, MIN(x.lab) AS m
                 FROM core_edges e JOIN lab{r} x ON x.node = e.b
                 GROUP BY e.a) nb ON nb.node = l.node
      LEFT JOIN lab{r} j ON j.node = l.lab
    )"""
        )
    labs = ", ".join(rounds)
    last = f"lab{cc_rounds}"
    return f"""
    WITH nc AS MATERIALIZED (
      SELECT GREATEST(COUNT(*) // 44, 1) AS centers FROM customer
    ), pts AS MATERIALIZED (
      SELECT c_custkey AS id,
             ({mx('(c_custkey % centers)', 11)} % 1000) * 50000 + 10000
               + CASE WHEN c_custkey % 9 = 0
                      THEN {mx('c_custkey', 15)} % 6000
                      ELSE {mx('c_custkey', 13)} % 1200 END AS x,
             ({mx('(c_custkey % centers)', 12)} % 1000) * 50000 + 10000
               + CASE WHEN c_custkey % 9 = 0
                      THEN {mx('c_custkey', 16)} % 6000
                      ELSE {mx('c_custkey', 14)} % 1200 END AS y
      FROM customer CROSS JOIN nc
    ), cells AS MATERIALIZED (
      SELECT id, x, y, x // {eps} AS cx, y // {eps} AS cy FROM pts
    ), pairs AS MATERIALIZED (
      SELECT l.id AS a, r.id AS b
      FROM cells l JOIN cells r
        ON r.cx BETWEEN l.cx - 1 AND l.cx + 1
       AND r.cy BETWEEN l.cy - 1 AND l.cy + 1
       AND (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y)
           <= {eps * eps}
    ), core AS MATERIALIZED (
      SELECT a AS id FROM pairs GROUP BY a HAVING COUNT(*) >= {min_pts}
    ), core_edges AS MATERIALIZED (
      SELECT p.a, p.b FROM pairs p
      JOIN core ca ON ca.id = p.a
      JOIN core cb ON cb.id = p.b
      WHERE p.a <> p.b
    ), lab0 AS MATERIALIZED (
      SELECT id AS node, id AS lab FROM core
    ), {labs}, border AS MATERIALIZED (
      SELECT p.a AS id, MIN(l.lab) AS cluster
      FROM pairs p
      JOIN {last} l ON l.node = p.b
      LEFT JOIN core c ON c.id = p.a
      WHERE p.a <> p.b AND c.id IS NULL
      GROUP BY p.a
    ), assigned AS MATERIALIZED (
      SELECT node AS id, 'core' AS role, lab AS cluster FROM {last}
      UNION ALL
      SELECT id, 'border' AS role, cluster FROM border
    )
    SELECT CAST(id AS BIGINT) AS id, role,
           CAST(cluster AS BIGINT) AS cluster
    FROM assigned
    UNION ALL
    SELECT CAST(p.id AS BIGINT) AS id, 'noise' AS role,
           CAST(-1 AS BIGINT) AS cluster
    FROM pts p LEFT JOIN assigned s ON s.id = p.id
    WHERE s.id IS NULL
    """


@register("dbscan_customer_sites", _dbscan_oracle(2500, 10, 8))
def dbscan_customer_sites_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density clustering (DBSCAN, Ester KDD'96) of synthesized
    customer site coordinates (operators/spatial.py dbscan_grid —
    3x3 grid-cell candidate equi-join, integer squared distances,
    core/border/noise roles, clusters = connected components of the
    core graph labeled by min core id). Coordinates are planted
    deterministically with the portable mix32, SCALE-AWARE: the
    center count grows with the table (n div 44) so blobs stay a
    CONSTANT ~40 points at every SF — candidate pairs stay linear in
    data instead of quadratic-in-blob-size (the first layout's 500-
    point sf0.1 cliques cost 9.2 s; constant blobs are the honest
    DBSCAN shape, its cost is inherently density²). 8/9 of customers
    sit in tight blobs (spread 1200 << eps 2500, min_pts 10 << blob size 40) on a 1000² grid of
    50000 spacing; 1/9 scatter in a [0,6000)² ring around their own
    blob center — near offsets join the cluster, mid offsets become
    borders, far corners become noise, so all three roles appear at
    every SF. The oracle mirrors the grid join in SQL and unrolls 8
    hash-min + pointer-jump rounds (MATERIALIZED; reach 2^8 >> the
    blob diameters of 1-2 hops) — Spark runs the real convergence
    loop, so equality also certifies the fixpoint. Border points
    take the MIN adjacent core's cluster (canonical DBSCAN is
    scan-order-dependent there; min is engine-exact)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import _portable_mix32
    from dpe_energy_performance_analysis_etl_spark.operators.spatial import dbscan_grid

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    centers = max(c.count() // 44, 1)  # bounded scalar pull

    def mx(col, salt: int):
        return _portable_mix32(col, F.lit(salt), F.lit(0))

    k = F.col("c_custkey") % centers
    scatter = F.col("c_custkey") % 9 == 0
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (
            (mx(k, 11) % 1000) * 50000
            + 10000
            + F.when(scatter, mx(F.col("c_custkey"), 15) % 6000).otherwise(
                mx(F.col("c_custkey"), 13) % 1200
            )
        ).alias("x"),
        (
            (mx(k, 12) % 1000) * 50000
            + 10000
            + F.when(scatter, mx(F.col("c_custkey"), 16) % 6000).otherwise(
                mx(F.col("c_custkey"), 14) % 1200
            )
        ).alias("y"),
    )
    return dbscan_grid(pts, eps=2500, min_pts=10)


def _jaro_winkler_oracle() -> str:
    mixq = _walk_mix_sql("k", "21", 0)
    cands = (
        "list_filter(range(GREATEST(0, i - w), LEAST(lb - 1, i + w) + 1), "
        "j -> substr(b, CAST(j + 1 AS INT), 1) = substr(a, CAST(i + 1 AS INT), 1) "
        "AND ((acc >> CAST(32 + j AS INT)) & 1) = 0)[1]"
    )
    big_a = "(2*m*m*lb + 2*m*m*la + (2*m - t)*la*lb)"
    big_b = "(6*m*la*lb)"
    return f"""
    WITH base AS MATERIALIZED (
      SELECT p_partkey AS k, substr(p_name, 1, 30) AS nm FROM part
    ), qs AS MATERIALIZED (
      SELECT k, nm, ({mixq}) % (length(nm) - 1) AS q FROM base
    ), pertd AS MATERIALIZED (
      SELECT k, nm, CASE WHEN k % 4 = 0 THEN substr(pe, 1, CAST(length(pe) - 1 AS INT)) ELSE pe END AS pe
      FROM (SELECT k, nm,
              substr(nm, 1, CAST(q AS INT)) || substr(nm, CAST(q + 2 AS INT), 1)
              || substr(nm, CAST(q + 1 AS INT), 1) || substr(nm, CAST(q + 3 AS INT)) AS pe
            FROM qs)
    ), pairs AS MATERIALIZED (
      SELECT k, 'self' AS kind, nm AS a, pe AS b FROM pertd
      UNION ALL
      SELECT x.k, 'next' AS kind, x.nm AS a, y.pe AS b
      FROM pertd x JOIN pertd y ON y.k = x.k + 1 WHERE x.k % 2 = 1
    ), dims AS MATERIALIZED (
      SELECT k, kind, a, b, length(a) AS la, length(b) AS lb,
             GREATEST((GREATEST(length(a), length(b)) >> 1) - 1, 0) AS w
      FROM pairs
    ), folded AS MATERIALIZED (
      SELECT *, CASE WHEN la = 0 OR lb = 0 THEN CAST(0 AS BIGINT) ELSE
        list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, la)),
          (acc, i) -> CASE WHEN COALESCE({cands}, -1) >= 0
            THEN acc | (CAST(1 AS BIGINT) << CAST(i AS INT))
                     | (CAST(1 AS BIGINT) << CAST(32 + {cands} AS INT))
            ELSE acc END)
        END AS mk
      FROM dims
    ), masks AS MATERIALIZED (
      SELECT *, CAST(bit_count(mk & 4294967295) AS BIGINT) AS m FROM folded
    ), seqs AS MATERIALIZED (
      SELECT *,
        list_filter(range(0, la), i -> ((mk >> CAST(i AS INT)) & 1) = 1) AS mi,
        list_filter(range(0, lb), j -> ((mk >> CAST(32 + j AS INT)) & 1) = 1) AS mjs
      FROM masks
    ), tcnt AS MATERIALIZED (
      SELECT *, CASE WHEN m = 0 THEN 0 ELSE
        len(list_filter(range(1, m + 1),
          k2 -> substr(a, CAST(mi[CAST(k2 AS INT)] + 1 AS INT), 1)
               <> substr(b, CAST(mjs[CAST(k2 AS INT)] + 1 AS INT), 1))) END AS t
      FROM seqs
    ), pre AS MATERIALIZED (
      SELECT *,
        (CASE WHEN la >= 1 AND lb >= 1 AND substr(a,1,1) = substr(b,1,1) THEN 1 ELSE 0 END
       + CASE WHEN la >= 2 AND lb >= 2 AND substr(a,1,2) = substr(b,1,2) THEN 1 ELSE 0 END
       + CASE WHEN la >= 3 AND lb >= 3 AND substr(a,1,3) = substr(b,1,3) THEN 1 ELSE 0 END
       + CASE WHEN la >= 4 AND lb >= 4 AND substr(a,1,4) = substr(b,1,4) THEN 1 ELSE 0 END) AS l
      FROM tcnt
    )
    SELECT CAST(k AS BIGINT) AS p_partkey, kind,
      CAST(CASE WHEN m = 0 THEN 0 ELSE
        (CAST(10*{big_a} + l*({big_b} - {big_a}) AS BIGINT) * 1000000)
        // (10*{big_b}) END AS BIGINT) AS jw_micro
    FROM pre
    """


@register("jaro_winkler_part_names", _jaro_winkler_oracle())
def jaro_winkler_part_names_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler similarity as an EXACT integer (micro-units) —
    operators/entity.py jaro_winkler_micro: the greedy window
    matching runs as a single int64 bitmask `aggregate` fold (bit i
    = a[i] matched, bit 32+j = b[j] consumed), transpositions are
    recovered from the masks, and the Winkler boost is folded into
    one exact fraction evaluated with truncating integer division —
    no floats anywhere, so Spark and DuckDB agree bit-for-bit where
    float jaro_winkler built-ins differ at the ulp level. Pairs:
    each part name vs a deterministically perturbed copy of itself
    (adjacent-char swap at a mix32-chosen position, plus a dropped
    last char for every 4th key — the record-linkage 'self' class)
    and vs the next key's perturbed name (the 'next' negatives).
    Row-local projection — zero shuffle; candidate generation is the
    blocking operators' job (fuzzy_join_ed1 / sorted-neighborhood)."""
    from dpe_energy_performance_analysis_etl_spark.operators.entity import jaro_winkler_micro
    from dpe_energy_performance_analysis_etl_spark.operators.graph import _portable_mix32

    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("k"), F.substring("p_name", 1, 30).alias("nm")
    )
    q = _portable_mix32(F.col("k"), F.lit(21), F.lit(0)) % (F.length("nm") - 1)
    pe = F.concat(
        F.expr("substr(nm, 1, CAST(q AS INT))"),
        F.expr("substr(nm, CAST(q + 2 AS INT), 1)"),
        F.expr("substr(nm, CAST(q + 1 AS INT), 1)"),
        F.expr("substr(nm, CAST(q + 3 AS INT))"),
    )
    pertd = (
        p.withColumn("q", q)
        .withColumn("pe0", pe)
        .select(
            "k",
            "nm",
            F.when(
                F.col("k") % 4 == 0,
                F.expr("substr(pe0, 1, CAST(length(pe0) - 1 AS INT))"),
            )
            .otherwise(F.col("pe0"))
            .alias("pe"),
        )
    )
    self_pairs = pertd.select(
        "k", F.lit("self").alias("kind"), F.col("nm").alias("a"), F.col("pe").alias("b")
    )
    nxt = pertd.select(F.col("k").alias("k2"), F.col("pe").alias("pe2"))
    next_pairs = (
        pertd.where(F.col("k") % 2 == 1)
        .join(nxt, F.col("k2") == F.col("k") + 1)
        .select(
            "k",
            F.lit("next").alias("kind"),
            F.col("nm").alias("a"),
            F.col("pe2").alias("b"),
        )
    )
    pairs = self_pairs.unionByName(next_pairs)
    return jaro_winkler_micro(pairs, "a", "b").select(
        F.col("k").alias("p_partkey"), "kind", "jw_micro"
    )


def _als_oracle(rounds: int) -> str:
    half = (
        "(CAST(SUM(r.r * {prev}.f) AS BIGINT) << 20) // "
        "GREATEST(CAST(SUM({prev}.f * {prev}.f) AS BIGINT) >> 20, 1)"
    )
    steps = []
    prev_y, prev_x = "y0", None
    for t in range(1, rounds + 1):
        steps.append(
            f"""x{t} AS MATERIALIZED (
      SELECT r.u, {half.format(prev=prev_y)} AS f
      FROM r JOIN {prev_y} ON {prev_y}.i = r.i GROUP BY r.u
    )"""
        )
        prev_x = f"x{t}"
        steps.append(
            f"""y{t} AS MATERIALIZED (
      SELECT r.i, {half.format(prev=prev_x)} AS f
      FROM r JOIN {prev_x} ON {prev_x}.u = r.u GROUP BY r.i
    )"""
        )
        prev_y = f"y{t}"
    body = ", ".join(steps)
    return f"""
    WITH r AS MATERIALIZED (
      SELECT o.o_custkey AS u, l.l_partkey AS i,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS r
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), y0 AS MATERIALIZED (
      SELECT DISTINCT i, CAST(1048576 AS BIGINT) AS f FROM r
    ), {body}
    SELECT 'user' AS kind, CAST(u AS BIGINT) AS id,
           CAST(f AS BIGINT) AS factor_scaled FROM {prev_x}
    UNION ALL
    SELECT 'item' AS kind, CAST(i AS BIGINT) AS id,
           CAST(f AS BIGINT) AS factor_scaled FROM {prev_y}
    """


@register("als_rank1_factors", _als_oracle(2))
def als_rank1_factors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 ALS over the customer×part implicit-rating matrix
    (operators/ml.py als_rank1_rounds — closed-form alternations as
    keyed aggregations, factors ×2^20, every half-step a
    shift/truncating-div over int64 so the trajectory is
    bit-reproducible; 2 rounds unrolled in the oracle). The portable
    twin of the float ALS a recommender would run (same join/agg
    plan shape, engine-exact arithmetic)."""
    from dpe_energy_performance_analysis_etl_spark.operators.ml import als_rank1_rounds

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ratings = o.join(li, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.col("o_custkey").alias("u"),
        F.col("l_partkey").alias("i"),
        F.col("l_quantity").cast("bigint").alias("r"),
    )
    return als_rank1_rounds(ratings, rounds=2)


def _isotonic_oracle() -> str:
    return """
    WITH pts AS MATERIALIZED (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS cents,
             CASE WHEN substr(o_orderpriority, 1, 1) IN ('1','2')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ), bins AS MATERIALIZED (
      SELECT LEAST(cents // 3000000, 19) AS bin,
             CAST(SUM(y) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
      FROM pts GROUP BY 1
    ), pref AS MATERIALIZED (
      SELECT bin, s, c,
             CAST(SUM(s) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs,
             CAST(SUM(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc
      FROM bins
    ), segs AS MATERIALIZED (
      SELECT l.bin AS i, h.bin AS j,
             (CAST(1000000000000 AS BIGINT) * (h.cs - (l.cs - l.s)))
             // GREATEST(h.cc - (l.cc - l.c), 1) AS mean_scaled
      FROM pref l JOIN pref h ON l.bin <= h.bin
    ), inner_min AS MATERIALIZED (
      SELECT s2.i, k.bin AS k, MIN(s2.mean_scaled) AS im
      FROM segs s2 JOIN pref k ON s2.i <= k.bin AND s2.j >= k.bin
      GROUP BY 1, 2
    ), fitted AS MATERIALIZED (
      SELECT k, MAX(im) AS fitted_scaled FROM inner_min GROUP BY k
    )
    SELECT CAST(p.bin AS BIGINT) AS bin, p.c AS n, p.s AS s,
           CAST(f.fitted_scaled AS BIGINT) AS fitted_scaled
    FROM pref p JOIN fitted f ON f.k = p.bin
    """


@register("isotonic_urgent_rate", _isotonic_oracle())
def isotonic_urgent_rate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone) calibration of urgent-priority rate vs
    order-value bin (operators/ml.py isotonic_fit_minimax — the PAVA
    solution via the minimax identity over a BOUNDED 20-bin table:
    O(B²) contiguous segments, O(B³) association joins, all integer-
    scaled truncating divisions so max-of-min is engine-exact). The
    one data-sized pass is the binning aggregation (exact cents,
    integer bin ids); everything after runs on ≤20 rows."""
    from dpe_energy_performance_analysis_etl_spark.operators.exact import scaled_long
    from dpe_energy_performance_analysis_etl_spark.operators.ml import isotonic_fit_minimax

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    binned = (
        o.select(
            F.least(
                F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) div 3000000"),
                F.lit(19).cast("bigint"),
            ).alias("bin"),
            F.substring("o_orderpriority", 1, 1)
            .isin("1", "2")
            .cast("int")
            .alias("y"),
        )
        .groupBy("bin")
        .agg(F.sum("y").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    return isotonic_fit_minimax(binned)


def _naive_bayes_oracle() -> str:
    noise = _walk_mix_sql("k", "31", 0)
    counts = []
    liks = []
    for j in range(4):
        for c in (0, 1):
            for v in (0, 1):
                counts.append(
                    f"CAST(SUM(CASE WHEN y = {c} AND f{j} = {v} THEN 1 ELSE 0 END)"
                    f" AS BIGINT) AS c_{j}_{c}_{v}"
                )
                liks.append(
                    f"1000 * (c_{j}_{c}_{v} + 1) // (n{c} + 2) AS l_{j}_{c}_{v}"
                )
    odds = {}
    for c in (0, 1):
        terms = [f"p{c}"]
        for j in range(4):
            terms.append(
                f"(CASE WHEN f{j} = 1 THEN l_{j}_{c}_1 ELSE l_{j}_{c}_0 END)"
            )
        odds[c] = " * ".join(terms)
    return f"""
    WITH feat AS MATERIALIZED (
      SELECT k, CASE WHEN f0 + f1 + f2 + {noise} % 2 >= 2
                        THEN 1 ELSE 0 END AS y,
             f0, f1, f2, f3
      FROM (
        SELECT o_orderkey AS k,
               CASE WHEN CAST(o_totalprice AS DECIMAL(30,2)) > 150000
                    THEN 1 ELSE 0 END AS f0,
               CASE WHEN substr(o_orderpriority, 1, 1) IN ('1','2')
                    THEN 1 ELSE 0 END AS f1,
               CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 0 END AS f2,
               CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END AS f3
        FROM orders)
    ), m AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS n0,
             {", ".join(counts)}
      FROM feat WHERE k % 3 <> 0
    ), lik AS MATERIALIZED (
      SELECT 1000 * n1 // n AS p1, 1000 * n0 // n AS p0,
             {", ".join(liks)}
      FROM m
    )
    SELECT pred, actual, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT CASE WHEN {odds[1]} >= {odds[0]} THEN 1 ELSE 0 END AS pred,
             y AS actual
      FROM feat CROSS JOIN lik WHERE k % 3 = 0
    ) GROUP BY pred, actual
    """


@register("naive_bayes_status_gate", _naive_bayes_oracle())
def naive_bayes_status_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli naive Bayes train+score with the decision as an
    exact INTEGER odds product (operators/ml.py
    naive_bayes_odds_gate — Laplace likelihoods scaled to fixed
    precision div(1000·(n+1), n_c+2), so the model is independent of
    training-set size; the O(features) model is a bounded scalar
    pull and scoring compiles to literal CASE codegen, zero joins).
    Train = orderkeys % 3 != 0, score = the rest; label = status F,
    features: high value, urgent priority, early year, odd key. Output
    is the confusion matrix."""
    from dpe_energy_performance_analysis_etl_spark.operators.ml import naive_bayes_odds_gate

    from dpe_energy_performance_analysis_etl_spark.operators.graph import _portable_mix32

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    feat = o.select(
        F.col("o_orderkey").alias("k"),
        (F.expr("CAST(o_totalprice AS DECIMAL(30,2))") > 150000)
        .cast("int")
        .alias("f0"),
        F.substring("o_orderpriority", 1, 1).isin("1", "2").cast("int").alias("f1"),
        (F.year("o_orderdate") <= 1997).cast("int").alias("f2"),
        (F.col("o_orderkey") % 2 == 1).cast("int").alias("f3"),
    ).withColumn(
        # planted label: noisy majority vote of f0..f2 (f3 is a
        # decoy) — the synthetic o_orderstatus is uniform hash noise
        # with no learnable signal, so a real-data label would make
        # "always predict majority" the correct model
        "y",
        (
            F.col("f0")
            + F.col("f1")
            + F.col("f2")
            + _portable_mix32(F.col("k"), F.lit(31), F.lit(0)) % 2
            >= 2
        ).cast("int"),
    )
    return naive_bayes_odds_gate(
        feat.where(F.col("k") % 3 != 0),
        feat.where(F.col("k") % 3 == 0),
        ["f0", "f1", "f2", "f3"],
    )


@register(
    "rolling_median_revenue",
    """
    WITH daily AS MATERIALIZED (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)) * 100) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1
    ), lists AS MATERIALIZED (
      SELECT day, rev_cents,
             list(rev_cents) OVER (ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS l
      FROM daily
    )
    SELECT day, rev_cents,
           CAST(list_sort(l)[(len(l) + 1) // 2] AS BIGINT) AS roll_median_cents
    FROM lists
    """,
)
def rolling_median_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day LOWER-median of daily revenue — the robust
    moving-average variant (median absolute to spikes). Daily
    revenue is the one data-sized aggregation (exact integer cents);
    the rolling median then runs over the BOUNDED day table (~2.4k
    rows — the documented global-window-on-aggregate-table design
    rule) as collect_list over a ROWS frame + array_sort + the
    deterministic lower-median rank pick ((n+1) div 2 — order
    statistics, not interpolation: the round-3 float-parity rule)."""
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"))
        .cast("bigint")
        .alias("rev_cents")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return (
        daily.withColumn("__l", F.collect_list("rev_cents").over(w))
        .select(
            "day",
            "rev_cents",
            F.expr(
                "element_at(array_sort(__l), CAST((size(__l) + 1) div 2 AS INT))"
            ).alias("roll_median_cents"),
        )
    )


def _kmv_overlap_oracle(k: int) -> str:
    hash_expr = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(regexp_extract_all(rpad(term, 16, '#'), '.'), "
        "c -> CAST(ascii(c) AS BIGINT))), "
        "(acc, x) -> (acc * 131 + x) % 1000000000000000)"
    )
    km1_m = float(k - 1) * 1e15
    return f"""
    WITH tokA AS MATERIALIZED (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents WHERE doc_id % 2 = 0
    ), tokB AS MATERIALIZED (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents WHERE doc_id % 3 = 0
    ), hA AS MATERIALIZED (SELECT DISTINCT {hash_expr} AS h FROM tokA),
    hB AS MATERIALIZED (SELECT DISTINCT {hash_expr} AS h FROM tokB),
    sA AS MATERIALIZED (
      SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS pos FROM hA)
      WHERE pos <= {k}
    ), sB AS MATERIALIZED (
      SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS pos FROM hB)
      WHERE pos <= {k}
    ), sU AS MATERIALIZED (
      SELECT h FROM (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS pos
        FROM (SELECT DISTINCT h FROM (SELECT h FROM sA UNION ALL SELECT h FROM sB))
      ) WHERE pos <= {k}
    ), sh AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS shared FROM sU
      WHERE h IN (SELECT h FROM sA) AND h IN (SELECT h FROM sB)
    ), ag AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_held, MAX(h) AS h_k FROM sU
    ), ex AS MATERIALIZED (
      SELECT CAST((SELECT COUNT(*) FROM (SELECT term FROM tokA UNION SELECT term FROM tokB)) AS BIGINT) AS exact_union,
             CAST((SELECT COUNT(*) FROM tokA WHERE term IN (SELECT term FROM tokB)) AS BIGINT) AS exact_inter
    )
    SELECT n_held, shared,
           CASE WHEN n_held < {k} THEN CAST(n_held AS DOUBLE)
                ELSE CAST({km1_m} AS DOUBLE) / CAST(h_k AS DOUBLE) END AS union_est,
           CASE WHEN n_held < {k}
                THEN CAST(1000000 * shared AS BIGINT) // GREATEST(n_held, 1)
                ELSE CAST(1000000 * shared AS BIGINT) // {k} END AS jaccard_ppm,
           CASE WHEN n_held < {k} THEN CAST(shared AS DOUBLE)
                ELSE CAST(shared * {k - 1} * 1000000000000000 AS DOUBLE)
                     / CAST({k} * h_k AS DOUBLE) END AS inter_est,
           exact_union, exact_inter
    FROM ag CROSS JOIN sh CROSS JOIN ex
    """


@register("kmv_overlap_docs", _kmv_overlap_oracle(16))
def kmv_overlap_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation estimates between two token corpora
    (operators/sketch.py kmv_set_ops — Beyer SIGMOD'07: union /
    Jaccard / intersection from the k-min sketches ONLY, membership
    tested sketch-against-sketch, one IEEE division per estimator)
    next to the exact answers — the sketch-side counterpart of
    `source_overlap_matrix` for corpora too large to join exactly.
    k=16 < vocabulary so the gate exercises the estimator branch."""
    from dpe_energy_performance_analysis_etl_spark.operators.sketch import kmv_set_ops
    from dpe_energy_performance_analysis_etl_spark.text import tokens_expr

    docs = read_documents(spark, sf_dir)
    # each token set feeds THREE consumers (sketch build, exact
    # intersection, exact union) — vocabulary-bounded, so cache per
    # the repeated-subtree rule (else the scan+tokenize re-runs 3x)
    tok_a = (
        docs.where(F.col("doc_id") % 2 == 0)
        .select(F.explode(tokens_expr("text")).alias("term"))
        .distinct()
        .cache()
    )
    tok_b = (
        docs.where(F.col("doc_id") % 3 == 0)
        .select(F.explode(tokens_expr("text")).alias("term"))
        .distinct()
        .cache()
    )
    est = kmv_set_ops(tok_a, tok_b, "term", k=16)
    exact_inter = tok_a.join(tok_b, "term", "semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_inter")
    )
    exact_union = (
        tok_a.unionByName(tok_b)
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_union"))
    )
    return est.crossJoin(exact_union).crossJoin(exact_inter)


@register(
    "decayed_heavy_users",
    """
    WITH ev AS MATERIALIZED (
      SELECT user_id, (epoch_us(ts) // 1000000) // 86400 AS day FROM events
    ), mx AS MATERIALIZED (
      SELECT MAX(day) AS t FROM ev
    ), wts AS MATERIALIZED (
      SELECT user_id,
             CAST(SUM(CASE WHEN mx.t - day <= 40
                           THEN CAST(1 AS BIGINT) << CAST(40 - (mx.t - day) AS INT)
                           ELSE 0 END) AS BIGINT) AS decayed,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM ev CROSS JOIN mx GROUP BY user_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, decayed, n_events
    FROM wts ORDER BY decayed DESC, user_id ASC LIMIT 20
    """,
)
def decayed_heavy_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed heavy hitters: per-user activity
    weight Σ 2^(40 − age_days), zeroed past 40 days — the dyadic
    half-life form (one-day half-life) that stays EXACT int64 where
    a float e^{-λt} would diverge across engines. One data-sized
    aggregation keyed on user, a broadcast 1-row max-day, and a
    global top-20 via orderBy+limit (TakeOrdered — only 20 rows per
    partition reach the driver-side merge; no global window, no full
    sort). The streaming analogue decays per trigger with the same
    shift arithmetic."""
    ev = read_events(spark, sf_dir).select(
        "user_id", (epoch_seconds("ts") / 86400).cast("bigint").alias("day")
    )
    mx = ev.agg(F.max("day").alias("t"))
    wts = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("t") - F.col("day") <= 40,
                    F.expr("shiftleft(1L, CAST(40 - (t - day) AS INT))"),
                ).otherwise(F.lit(0).cast("bigint"))
            )
            .cast("bigint")
            .alias("decayed"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    return (
        wts.select(F.col("user_id").cast("bigint").alias("user_id"), "decayed", "n_events")
        .orderBy(F.col("decayed").desc(), F.col("user_id").asc())
        .limit(20)
    )


def _cc_doubling_rounds_sql(edges: str, lab0: str, rounds: int) -> str:
    """Unrolled hash-min + pointer-jump label rounds (MATERIALIZED):
    reach 2^rounds, so `rounds`=12 certifies any component structure
    up to 4096 nodes regardless of topology. `edges` must be a CTE
    name with (a, b) BOTH directions; `lab0` a CTE (node, lab)."""
    parts = []
    prev = lab0
    for r in range(1, rounds + 1):
        parts.append(
            f"""lab{r} AS MATERIALIZED (
      SELECT l.node,
             LEAST(l.lab, COALESCE(nb.m, l.lab), COALESCE(j.lab, l.lab)) AS lab
      FROM {prev} l
      LEFT JOIN (SELECT e.a AS node, MIN(x.lab) AS m
                 FROM {edges} e JOIN {prev} x ON x.node = e.b
                 GROUP BY e.a) nb ON nb.node = l.node
      LEFT JOIN {prev} j ON j.node = l.lab
    )"""
        )
        prev = f"lab{r}"
    return ", ".join(parts), prev


def _single_linkage_oracle(threshold: int, rounds: int = 12) -> str:
    labs, last = _cc_doubling_rounds_sql("kept", "lab0", rounds)
    return f"""
    WITH pairs AS MATERIALIZED (
      SELECT x.l_partkey AS src, y.l_partkey AS dst,
             1000 - CAST(COUNT(*) AS BIGINT) AS weight
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT v FROM (
        SELECT src AS v FROM pairs UNION ALL SELECT dst FROM pairs)
    ), kept AS MATERIALIZED (
      SELECT src AS a, dst AS b FROM pairs WHERE weight <= {threshold}
      UNION ALL
      SELECT dst AS a, src AS b FROM pairs WHERE weight <= {threshold}
    ), lab0 AS MATERIALIZED (
      SELECT v AS node, v AS lab FROM nodes
    ), {labs}
    SELECT CAST(node AS BIGINT) AS part, CAST(lab AS BIGINT) AS cluster
    FROM {last}
    """


@register("single_linkage_parts", _single_linkage_oracle(997))
def single_linkage_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-linkage clustering as MST + dendrogram cut
    (operators/graph.py boruvka_mst → drop forest edges above the
    distance threshold → connected components): the scalable
    hierarchical-clustering path — the MST is computed ONCE and any
    number of thresholds replay as cheap filters + CC, instead of
    re-running a threshold join per cut. The oracle computes the
    clusters DIRECTLY as components of the θ-thresholded graph
    (12 unrolled hash-min+jump rounds — reach 4096 ≥ |V|), so the
    green row certifies the single-linkage/MST-cut equivalence
    end-to-end on real data, not just the plumbing."""
    from dpe_energy_performance_analysis_etl_spark.dedup.cluster import connected_components
    from dpe_energy_performance_analysis_etl_spark.operators.graph import boruvka_mst

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        cooccurrence_pairs,
    )

    # basket-array pair build (r12, see cooccurrence_pairs)
    pairs = (
        cooccurrence_pairs(
            li.select("l_orderkey", "l_partkey"), "l_orderkey", "l_partkey"
        )
        .select("src", "dst", (F.lit(1000) - F.col("n")).alias("weight"))
        .localCheckpoint()
    )
    forest = boruvka_mst(pairs)
    kept = forest.where(F.col("weight") <= 997)
    nodes = pairs.select(
        F.explode(F.array("src", "dst")).alias("part")
    ).distinct()
    labels = connected_components(kept, src="a", dst="b", nodes=nodes, node_col="part")
    return labels.select(
        F.col("node").cast("bigint").alias("part"),
        F.col("comp").cast("bigint").alias("cluster"),
    )


def _ransac_oracle(n_models: int) -> str:
    def mx(node: str, walk: str, k: str) -> str:
        return f"({_walk_mix_sql(node, walk, k)})"

    y_line = f"7 * c_custkey + 13 + {mx('c_custkey', '61', 0)} % 3 - 1"
    y_out = f"{mx('c_custkey', '62', 0)} % 8000000"
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT CAST(c_custkey AS BIGINT) AS x,
             CAST(CASE WHEN c_custkey % 5 = 0 THEN {y_out}
                  ELSE {y_line} END AS BIGINT) AS y
      FROM customer
    ), mids AS MATERIALIZED (
      SELECT unnest(generate_series(0, {n_models - 1})) AS mid
    ), seeds AS MATERIALIZED (
      SELECT mid,
             MIN({{'k': {mx('p.x', 'p.y', '(2 * m.mid)')}, 'x': p.x, 'y': p.y}}) AS p1,
             MIN({{'k': {mx('p.x', 'p.y', '(2 * m.mid + 1)')}, 'x': p.x, 'y': p.y}}) AS p2
      FROM pts p CROSS JOIN mids m GROUP BY mid
    ), models AS MATERIALIZED (
      SELECT mid, p1.x AS x1, p1.y AS y1, p2.x AS x2, p2.y AS y2
      FROM seeds WHERE p1.x <> p2.x
    ), scored AS MATERIALIZED (
      SELECT m.mid, m.x1, m.y1, m.x2, m.y2, CAST(COUNT(*) AS BIGINT) AS n_inliers
      FROM pts p CROSS JOIN models m
      WHERE ABS((p.y - m.y1) * (m.x2 - m.x1) - (p.x - m.x1) * (m.y2 - m.y1))
            <= ABS(m.x2 - m.x1)
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT CAST(mid AS BIGINT) AS model_id, x1, y1, x2, y2, n_inliers
    FROM scored ORDER BY n_inliers DESC, mid ASC LIMIT 1
    """


@register("ransac_line_custkeys", _ransac_oracle(64))
def ransac_line_custkeys_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC robust line fit (operators/stats.py ransac_line_fit —
    Fischler-Bolles 1981 with deterministic per-model hash-argmin
    seeding instead of an RNG, and the inlier test cross-multiplied
    to pure int64, no division). Planted data: y = 7x + 13 ± 1 for
    80% of customers, uniform outliers for the rest — the winning
    model must recover the line (n_inliers ≈ 0.8·n where Theil-Sen's
    O(n²) pair enumeration would not scale past small series).
    Model seeding is a map-side-combinable argmin pass — rank-free
    (no data-sized global window)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import _portable_mix32
    from dpe_energy_performance_analysis_etl_spark.operators.stats import ransac_line_fit

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ck = F.col("c_custkey")
    pts = c.select(
        ck.cast("bigint").alias("x"),
        F.when(
            ck % 5 == 0, _portable_mix32(ck, F.lit(62), F.lit(0)) % 8000000
        )
        .otherwise(
            7 * ck + 13 + _portable_mix32(ck, F.lit(61), F.lit(0)) % 3 - 1
        )
        .cast("bigint")
        .alias("y"),
    )
    return ransac_line_fit(pts, n_models=64, tol_num=1, tol_den=1)


@register(
    "sq8_recall_embeddings",
    """
    WITH base AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), qz AS MATERIALIZED (
      SELECT vec_id,
             list_transform(v, x -> CAST(GREATEST(LEAST(FLOOR(x * 128), 127), -127)
                                         AS DOUBLE)) AS qv
      FROM base
    ), sq_scored AS MATERIALIZED (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS qscore
      FROM qz q JOIN qz c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 10
    ), sq_top AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY qscore DESC, neighbor_id) AS rank
        FROM sq_scored) WHERE rank <= 5
    ), n AS MATERIALIZED (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base
    ), ex_top AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                          c.vec_id) AS rank
        FROM n q JOIN n c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 10) WHERE rank <= 5
    )
    SELECT e.query_id,
           CAST(COUNT(s.neighbor_id) AS BIGINT) AS sq8_hits,
           CAST(COUNT(s.neighbor_id) * 20 AS BIGINT) AS recall_pct
    FROM ex_top e LEFT JOIN sq_top s
      ON s.query_id = e.query_id AND s.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
)
def sq8_recall_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized search with recall@5 against the exact
    float baseline (similarity/sq.py — floor(x·128) dyadic quantizer,
    engine-exact; integer dot products; same broadcast+window plan
    as brute force). The output is the quality gate a 4×-compressed
    index must pass before it replaces float vectors at scale —
    recall here is a DETERMINISTIC oracle-checkable quantity, not a
    sampled estimate."""
    from dpe_energy_performance_analysis_etl_spark.similarity import brute_force_topk
    from dpe_energy_performance_analysis_etl_spark.similarity.sq import sq8_topk

    emb = read_embeddings(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 10)
    sq = sq8_topk(emb, queries_df, k=5).select(
        "query_id", F.col("neighbor_id").alias("sq_n")
    )
    ex = brute_force_topk(emb, queries_df, k=5).select(
        "query_id", "neighbor_id"
    )
    return (
        ex.join(
            sq,
            (ex["query_id"] == sq["query_id"]) & (ex["neighbor_id"] == sq["sq_n"]),
            "left",
        )
        .groupBy(ex["query_id"].alias("query_id"))
        .agg(
            F.count("sq_n").cast("bigint").alias("sq8_hits"),
            (F.count("sq_n") * 20).cast("bigint").alias("recall_pct"),
        )
    )


def _markov_attr_oracle(rounds: int, channels: tuple[str, ...]) -> str:
    scen = {"full": None, **{c: c for c in channels}}
    parts = []
    for name, rm in scen.items():
        if rm is None:
            csel = "SELECT src, dst, n FROM counts"
        else:
            csel = (
                f"SELECT src, CASE WHEN dst = '{rm}' THEN 'null' ELSE dst END AS dst, "
                f"CAST(SUM(n) AS BIGINT) AS n FROM counts WHERE src <> '{rm}' "
                f"GROUP BY 1, 2"
            )
        parts.append(f"c_{name} AS MATERIALIZED ({csel})")
        parts.append(
            f"""q_{name} AS MATERIALIZED (
      SELECT c.src, c.dst, (1000000 * c.n) // t.tot AS q
      FROM c_{name} c JOIN (SELECT src, CAST(SUM(n) AS BIGINT) AS tot
                            FROM c_{name} GROUP BY src) t ON t.src = c.src
    )"""
        )
        parts.append(
            f"p_{name}_0 AS MATERIALIZED (SELECT DISTINCT src AS state, "
            f"CAST(0 AS BIGINT) AS p FROM q_{name})"
        )
        for r in range(1, rounds + 1):
            parts.append(
                f"""p_{name}_{r} AS MATERIALIZED (
      SELECT q.src AS state,
             CAST(SUM(q.q * COALESCE(pa.p,
               CASE WHEN q.dst = 'purchase' THEN 1000000000000 ELSE 0 END))
               // 1000000 AS BIGINT) AS p
      FROM q_{name} q LEFT JOIN p_{name}_{r - 1} pa ON pa.state = q.dst
      GROUP BY q.src
    )"""
            )
        parts.append(
            f"start_{name} AS MATERIALIZED (SELECT p FROM p_{name}_{rounds} "
            f"WHERE state = 'start')"
        )
    chan_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, (SELECT p FROM start_{c}) AS p_removed"
        for c in channels
    )
    return f"""
    WITH ev AS MATERIALIZED (
      SELECT user_id AS u, event_type AS d,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rk
      FROM events
    ), conv AS MATERIALIZED (
      SELECT u, MIN(rk) AS crk FROM ev WHERE d = 'purchase' GROUP BY u
    ), kept AS MATERIALIZED (
      SELECT e.u, e.d, e.rk, c.crk FROM ev e LEFT JOIN conv c ON c.u = e.u
      WHERE c.crk IS NULL OR e.rk <= c.crk
    ), trans AS MATERIALIZED (
      SELECT COALESCE(LAG(d) OVER (PARTITION BY u ORDER BY rk), 'start') AS src,
             d AS dst
      FROM kept
      UNION ALL
      SELECT arg_max(d, rk) AS src, 'null' AS dst
      FROM kept GROUP BY u HAVING MAX(crk) IS NULL
    ), counts AS MATERIALIZED (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n FROM trans GROUP BY 1, 2
    ), {", ".join(parts)}, rems AS MATERIALIZED (
      SELECT channel, p_removed,
             GREATEST(1000000 - (p_removed * 1000000)
               // GREATEST((SELECT p FROM start_full), 1), 0) AS rem
      FROM ({chan_rows})
    ), remsum AS MATERIALIZED (
      SELECT GREATEST(CAST(SUM(rem) AS BIGINT), 1) AS s FROM rems
    )
    SELECT r.channel,
           CAST((SELECT p FROM start_full) AS BIGINT) AS p_full_scaled,
           CAST(r.p_removed AS BIGINT) AS p_removed_scaled,
           CAST(r.rem AS BIGINT) AS removal_ppm,
           CAST((r.rem * 1000000) // rs.s AS BIGINT) AS attribution_ppm
    FROM rems r CROSS JOIN remsum rs
    """


@register(
    "markov_attribution_events",
    _markov_attr_oracle(25, ("click", "error", "signup", "view")),
)
def markov_attribution_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution over user event paths
    (operators/temporal.py markov_removal_attribution — Anderl 2014
    semantics, START→…→{purchase, null} absorbing chain, 25
    fixed-round integer value iterations per scenario). The one
    data-sized pass extracts transitions (per-user window, cut at
    first purchase, null absorber for non-converters); the chain
    solves on the O(states²) BOUNDED matrix — a driver-side exact-
    int model like naive Bayes — and the oracle unrolls every
    scenario's 25 rounds as MATERIALIZED CTEs, so the gate checks
    the full trajectory, not just the plumbing."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        markov_removal_attribution,
    )

    ev = read_events(spark, sf_dir)
    return markov_removal_attribution(ev)


@register(
    "nelson_aalen_orders",
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
      SELECT t, d,
             CAST(SUM(d + c) OVER () -
                  COALESCE(SUM(d + c) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n
      FROM tiers
    )
    SELECT t, n AS n_at_risk, d AS d_events,
           CAST(SUM(d * (1000000000000 // GREATEST(n, 1))
                    + (d * (1000000000000 % GREATEST(n, 1)))
                      // GREATEST(n, 1)) OVER (
             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS hazard_scaled
    FROM ranked
    """,
)
def nelson_aalen_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard over the SAME order-lifetime
    tiers as `kaplan_meier_orders` (operators/stats.py nelson_aalen):
    H(t) = Σ d/n as a windowed sum of per-tier integer-scaled
    divisions — KM's additive sibling, and the exactness argument is
    even simpler (no sequential fold: each term is engine-exact and
    addition is order-free)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import nelson_aalen

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    subj = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("t"),
        (F.col("o_orderstatus") == "F").cast("int").alias("ev"),
    )
    return nelson_aalen(subj, "t", "ev")


def _jenks_oracle(k: int, n_bins: int) -> str:
    # DP levels unrolled: d1..dk over the bounded costs table
    lvls = []
    for m in range(2, k + 1):
        lvls.append(
            f"""d{m} AS MATERIALIZED (
      SELECT c.j,
             MIN({{'total': p.total + c.cost, 'arg': c.i}}) AS best
      FROM costs c JOIN (SELECT j + 1 AS i, total FROM d{m - 1}f) p
        ON p.i = c.i
      GROUP BY c.j
    ), d{m}f AS MATERIALIZED (
      SELECT j, best.total AS total, best.arg AS arg FROM d{m}
    )"""
        )
    # backtrace: e_k = B; e_{m-1} = arg_m(e_m) - 1
    bt = ["eK AS MATERIALIZED (SELECT MAX(j) AS e FROM costs)"]
    prev = "eK"
    for m in range(k, 1, -1):
        bt.append(
            f"""e{m - 1} AS MATERIALIZED (
      SELECT CAST(d.arg - 1 AS BIGINT) AS e
      FROM d{m}f d JOIN {prev} p ON d.j = p.e
    )"""
        )
        prev = f"e{m - 1}"
    spans = []
    for m in range(1, k + 1):
        lo = "(SELECT 0 AS e)" if m == 1 else f"e{m - 1}"
        hi = "eK" if m == k else f"e{m}"
        spans.append(
            f"SELECT {m} AS class, l.e + 1 AS lo_r, h.e AS hi_r "
            f"FROM {lo} l CROSS JOIN {hi} h WHERE h.e >= l.e + 1"
        )
    return f"""
    WITH vals AS MATERIALIZED (
      SELECT LEAST(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
                   // 1000000, {n_bins - 1}) AS y
      FROM orders
    ), bins AS MATERIALIZED (
      SELECT y AS bin, CAST(SUM(y) AS BIGINT) AS s,
             CAST(SUM(y * y) AS BIGINT) AS ss,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM vals GROUP BY 1
    ), pref AS MATERIALIZED (
      SELECT bin, s, ss, c,
             CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS r,
             CAST(SUM(s) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs,
             CAST(SUM(ss) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS css,
             CAST(SUM(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc
      FROM bins
    ), costs AS MATERIALIZED (
      SELECT l.r AS i, h.r AS j, l.bin AS lo_bin, h.bin AS hi_bin,
             h.cs - (l.cs - l.s) AS seg_s, h.cc - (l.cc - l.c) AS seg_c,
             (h.css - (l.css - l.ss))
               - ((h.cs - (l.cs - l.s)) * (h.cs - (l.cs - l.s)))
                 // GREATEST(h.cc - (l.cc - l.c), 1) AS cost
      FROM pref l JOIN pref h ON l.r <= h.r
    ), d1f AS MATERIALIZED (
      SELECT j, cost AS total, CAST(1 AS BIGINT) AS arg
      FROM costs WHERE i = 1
    ), {", ".join(lvls)}, {", ".join(bt)}, spans AS MATERIALIZED (
      {" UNION ALL ".join(spans)}
    )
    SELECT CAST(sp.class AS BIGINT) AS class, c.lo_bin, c.hi_bin,
           c.seg_c AS n, c.seg_s AS s
    FROM spans sp JOIN costs c ON c.i = sp.lo_r AND c.j = sp.hi_r
    """


@register("jenks_breaks_totalprice", _jenks_oracle(4, 24))
def jenks_breaks_totalprice_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher-Jenks natural breaks of order value into 4 classes
    (operators/quantiles.py jenks_breaks_binned — the OPTIMAL 1-D
    k-segmentation by within-class squared deviation, exact DP over
    a 24-bin table; segment cost SS − div(S², C) keeps the argmin
    engine-exact with one truncating division per segment). The
    histogram trick bounds everything after the one binning pass;
    values are in 10k$ units so S² stays int64 at any SF. The exact
    complement to the heuristic `kmeans_lloyd_portable` in 1-D."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        jenks_breaks_binned,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # exact cents first: a direct DECIMAL->BIGINT cast ROUNDS on
    # DuckDB but TRUNCATES on Spark (caught by the gate: one order on
    # a .5 boundary shifted a bin)
    y = F.least(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) div 1000000"
        ),
        F.lit(23).cast("bigint"),
    )
    binned = (
        o.select(y.alias("bin"), y.alias("y"))
        .groupBy("bin")
        .agg(
            F.sum("y").alias("s"),
            F.sum(F.col("y") * F.col("y")).alias("ss"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    return jenks_breaks_binned(binned, k=4)


def _textrank_oracle(rounds: int, topk: int) -> str:
    its = []
    prev = "r0"
    for i in range(1, rounds + 1):
        its.append(
            f"""i{i} AS MATERIALIZED (
      SELECT n.node,
             CAST(150000000000 + (85 * coalesce(x.inc, 0)) // 100 AS BIGINT) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum({prev}.r // deg.deg) AS BIGINT) AS inc
        FROM {prev} JOIN deg ON {prev}.node = deg.src JOIN e ON e.src = deg.src
        GROUP BY e.dst
      ) x ON n.node = x.node
    )"""
        )
        prev = f"i{i}"
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, unnest(ts) AS w,
             unnest(range(1, len(ts) + 1)) AS pos
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
            FROM documents)
    ), pairs AS MATERIALIZED (
      SELECT DISTINCT a.w AS src, b.w AS dst
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id
       AND b.pos - a.pos BETWEEN 1 AND 2
       AND a.w <> b.w
    ), e AS MATERIALIZED (
      SELECT src, dst FROM pairs
      UNION
      SELECT dst AS src, src AS dst FROM pairs
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM e
    ), deg AS MATERIALIZED (
      SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
    ), r0 AS MATERIALIZED (
      SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM nodes
    ), {", ".join(its)}
    SELECT node AS keyword, r AS rank_scaled
    FROM {prev} ORDER BY r DESC, node ASC LIMIT {topk}
    """


@register("textrank_keywords_docs", _textrank_oracle(3, 20))
def textrank_keywords_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea-Tarau EMNLP'04):
    PageRank over the word co-occurrence graph (window 2, symmetric,
    distinct) — the graph-centrality counterpart to the frequency-
    based `rake_keywords_docs`, reusing operators/graph.py
    pagerank_fixed verbatim (exact integer ranks, 3 rounds, so the
    iterative trajectory sits behind the value-hash gate). Graph
    build is one posexplode + position self-join per doc (window ≤2
    keeps the join equi-keyed on doc with a 2-row band); top-20 via
    orderBy+limit (TakeOrdered)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import pagerank_fixed
    from dpe_energy_performance_analysis_etl_spark.text import tokens_expr

    docs = read_documents(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.posexplode(tokens_expr("text")).alias("pos", "w")
    )
    a = toks.select("doc_id", F.col("pos").alias("pa"), F.col("w").alias("src"))
    b = toks.select("doc_id", F.col("pos").alias("pb"), F.col("w").alias("dst"))
    pairs = (
        a.join(b, "doc_id")
        .where(
            (F.col("pb") - F.col("pa")).between(1, 2)
            & (F.col("src") != F.col("dst"))
        )
        .select("src", "dst")
        .distinct()
    )
    # symmetrize via explode(array(...)) — a unionAll of two selects
    # over `pairs` would re-run the position join per branch (the
    # repeated-subtree rule; audit measured 136 static exchanges)
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    ranks = pagerank_fixed(sym, iterations=3)
    return (
        ranks.select(F.col("node").alias("keyword"), "rank_scaled")
        .orderBy(F.col("rank_scaled").desc(), F.col("keyword").asc())
        .limit(20)
    )


@register(
    "encoding_advisor_lineitem",
    """
    WITH long_form AS MATERIALIZED (
      SELECT l_orderkey AS pk, l_linenumber AS ok, kv.col, kv.v
      FROM lineitem, LATERAL (
        SELECT * FROM (VALUES
          ('l_linenumber', CAST(l_linenumber AS BIGINT)),
          ('l_suppkey', CAST(l_suppkey AS BIGINT)),
          ('l_quantity', CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100 AS BIGINT)),
          ('l_discount', CAST(CAST(l_discount AS DECIMAL(30,2)) * 100 AS BIGINT))
        ) AS t(col, v)
      ) kv
    ), flagged AS MATERIALIZED (
      SELECT col, v,
             CASE WHEN LAG(v) OVER (PARTITION BY pk, col ORDER BY ok, v) IS NULL
                       OR LAG(v) OVER (PARTITION BY pk, col ORDER BY ok, v) <> v
                  THEN 1 ELSE 0 END AS chg
      FROM long_form
    ), stats AS MATERIALIZED (
      SELECT col, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
             CAST(length(bin(MAX(v) - MIN(v))) AS BIGINT) AS bit_width,
             CAST(SUM(chg) AS BIGINT) AS rle_runs
      FROM flagged GROUP BY col
    )
    SELECT col AS column, n, n_distinct, bit_width, rle_runs,
           CASE WHEN n_distinct <= 256 AND rle_runs <= n // 4 THEN 'rle-dict'
                WHEN n_distinct <= 256 THEN 'dict'
                WHEN rle_runs <= n // 8 THEN 'rle'
                WHEN bit_width <= 20 THEN 'bitpack'
                ELSE 'plain' END AS recommendation
    FROM stats
    """,
)
def encoding_advisor_lineitem_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-encoding advisor over lineitem (operators/quality.py
    encoding_advisor_int): exact cardinality / range bit width (via
    length(bin(range)) — no libm) / RLE runs under the table's
    natural (orderkey, linenumber) sort, with a deterministic
    recommendation CASE — the profiling pass that picks parquet
    encodings before a 100 TB rewrite. Decimal columns enter as
    exact cents (the DECIMAL→BIGINT cast-rounding trap)."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        encoding_advisor_int,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.expr("CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "l_quantity"
        ),
        F.expr("CAST(CAST(l_discount AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "l_discount"
        ),
    )
    return encoding_advisor_int(
        li,
        "l_orderkey",
        "l_linenumber",
        ["l_linenumber", "l_suppkey", "l_quantity", "l_discount"],
    )


@register(
    "dtw_user_value_series",
    """
    WITH ev AS MATERIALIZED (
      SELECT user_id AS u,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rk
      FROM events
    ), series AS MATERIALIZED (
      SELECT u, list(v ORDER BY rk) AS s
      FROM ev WHERE rk <= 12 GROUP BY u
    ), pairs AS MATERIALIZED (
      SELECT x.u AS user_a, y.u AS user_b, x.s AS a, y.s AS b
      FROM series x JOIN series y ON y.u = x.u + 1
    )
    SELECT CAST(user_a AS BIGINT) AS user_a, CAST(user_b AS BIGINT) AS user_b,
           CAST(list_reduce(
             list_prepend(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, len(a) + 1),
                                i -> CAST(1099511627776 AS BIGINT))),
               list_transform(b, x -> [x])
             ),
             (acc, bj) -> list_reduce(
               list_prepend([CAST(1099511627776 AS BIGINT)],
                            list_transform(range(1, len(a) + 1), i -> [i])),
               (acc2, el) -> list_append(acc2,
                 abs(a[CAST(el[1] AS INT)] - bj[1])
                 + LEAST(acc[CAST(el[1] AS INT)],
                         acc[CAST(el[1] AS INT) + 1],
                         acc2[CAST(len(acc2) AS INT)]))
             )
           )[CAST(len(a) AS INT) + 1] AS BIGINT) AS dtw_cents
    FROM pairs
    """,
)
def dtw_user_value_series_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic Time Warping distance between consecutive users' event
    value series (operators/temporal.py dtw_distance — the full
    O(n·m) DP evaluated as NESTED `aggregate` folds inside
    whole-stage codegen; DuckDB twin via nested list_reduce with
    single-item-list elements to satisfy its acc/element type rule).
    Series = each user's first 12 event values in exact cents; the
    candidate pairing (consecutive user ids) stands in for whatever
    blocking a real warped-similarity join would use — the point
    under the gate is the bit-exact DP itself."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import dtw_distance

    ev = read_events(spark, sf_dir).select(
        F.col("user_id").alias("u"),
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("v"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("u").orderBy("ts", "event_id")
    series = (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 12)
        .groupBy("u")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rk", "v"))),
                lambda s: s["v"],
            ).alias("s")
        )
        .cache()  # bounded (one <=12-element row per user) and
        # consumed by BOTH sides of the self-join — uncached, the
        # per-user window + collect re-runs per side (the shuffle is
        # exchange-reused but the post-shuffle work is not)
    )
    a = series.select(F.col("u").alias("user_a"), F.col("s").alias("a"))
    b = series.select(F.col("u").alias("user_b"), F.col("s").alias("b"))
    return (
        a.join(b, F.col("user_b") == F.col("user_a") + 1)
        .select(
            F.col("user_a").cast("bigint").alias("user_a"),
            F.col("user_b").cast("bigint").alias("user_b"),
            dtw_distance(F.col("a"), F.col("b")).alias("dtw_cents"),
        )
    )
