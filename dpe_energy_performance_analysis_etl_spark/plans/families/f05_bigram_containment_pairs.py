"""Query-registry family chunk 5 (auto-split from the
historical plans/queries.py lines 9099-10885; registration
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
    "bigram_containment_pairs",
    """
    WITH paired AS (
      SELECT doc_id, doc_id // 2 AS pair_id, doc_id % 2 AS side,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), g AS (
      SELECT doc_id, pair_id, side,
             unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS gram
      FROM paired WHERE len(t) >= 2
    ), cnts AS MATERIALIZED (
      SELECT pair_id, side, gram, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM g GROUP BY 1, 2, 3
    ), c AS (
      SELECT pair_id, gram, cnt FROM cnts WHERE side = 0
    ), r AS (
      SELECT pair_id, gram, cnt AS rcnt FROM cnts WHERE side = 1
    ), agg AS (
      SELECT c.pair_id,
             CAST(SUM(LEAST(c.cnt, COALESCE(r.rcnt, 0))) AS BIGINT) AS pn_num,
             CAST(SUM(c.cnt) AS BIGINT) AS pn_den
      FROM c LEFT JOIN r ON r.pair_id = c.pair_id AND r.gram = c.gram
      GROUP BY 1
    )
    SELECT pair_id AS doc_id, pn_num, pn_den,
           CASE WHEN pn_den > 0
                THEN CAST(pn_num AS DOUBLE) / CAST(pn_den AS DOUBLE) END AS precision
    FROM agg
    """,
)
def bigram_containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipped bigram precision (text/evaluation.py ngram_precision —
    the BLEU component, Papineni ACL'02; equivalently Broder's
    directional CONTAINMENT on bigram multisets) of each even doc
    against its odd pair: integer clipped-match sums, one guarded
    division. BLEU's geometric mean is libm and stays out of checked
    outputs by design — the components carry the information."""
    from dpe_energy_performance_analysis_etl_spark.text.evaluation import ngram_precision

    docs = read_documents(spark, sf_dir)
    cand = docs.where(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("bigint").alias("doc_id"), "text"
    )
    ref = docs.where(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") / 2).cast("bigint").alias("doc_id"), "text"
    )
    return ngram_precision(cand, ref, n=2)


@register(
    "distinct_n_docs",
    """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), g AS (
      SELECT doc_id, unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS gram
      FROM tok WHERE len(t) >= 2
    ), cnts AS (
      SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(cnt) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS distinct_ratio
    FROM cnts GROUP BY 1
    """,
)
def distinct_n_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-2 diversity per document (text/evaluation.py
    distinct_n, Li NAACL'16): distinct bigrams over total bigrams —
    the degenerate-repetition screen for generated or crawled text.
    One (doc, gram) count aggregation."""
    from dpe_energy_performance_analysis_etl_spark.text.evaluation import distinct_n

    return distinct_n(read_documents(spark, sf_dir), n=2)


@register(
    "simpson_user_events",
    """
    WITH counts AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), agg AS (
      SELECT user_id,
             CAST(SUM(c) AS BIGINT) AS n_items,
             CAST(COUNT(*) AS BIGINT) AS n_values,
             CAST(SUM(c * (c - 1)) AS BIGINT) AS pairs
      FROM counts GROUP BY 1
    )
    SELECT user_id, n_items, n_values,
           CASE WHEN n_items > 1
                THEN CAST(pairs AS DOUBLE)
                     / CAST(n_items * (n_items - 1) AS DOUBLE) END AS simpson
    FROM agg
    """,
)
def simpson_user_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration of event types per user
    (text/evaluation.py simpson_concentration): Σ n_i(n_i−1)/(N(N−1))
    — the log-free diversity index (Shannon entropy's ln is libm and
    cross-engine-unsafe; Simpson is an exact rational). Behavioral
    concentration screen over the events table."""
    from dpe_energy_performance_analysis_etl_spark.text.evaluation import (
        simpson_concentration,
    )

    ev = read_events(spark, sf_dir).select("user_id", "event_type")
    return simpson_concentration(ev, "user_id", "event_type")


def _ppr_oracle(iterations: int, n_seeds: int) -> str:
    base_seed = 15 * 10**12 // (100 * n_seeds)
    init_seed = 10**12 // n_seeds
    blocks = [
        f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS MATERIALIZED (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM e
      UNION
      SELECT DISTINCT dst AS node FROM e
    ), deg AS MATERIALIZED (
      SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
    ), seeds AS MATERIALIZED (
      SELECT node FROM (SELECT node FROM nodes ORDER BY node LIMIT {n_seeds})
    ), r0 AS MATERIALIZED (
      SELECT n.node,
             CAST(CASE WHEN s.node IS NOT NULL THEN {init_seed} ELSE 0 END AS BIGINT) AS r
      FROM nodes n LEFT JOIN seeds s ON n.node = s.node
    )"""
    ]
    for i in range(1, iterations + 1):
        blocks.append(
            f""", r{i} AS MATERIALIZED (
      SELECT n.node,
             CAST(CASE WHEN s.node IS NOT NULL THEN {base_seed} ELSE 0 END
                  + (85 * coalesce(x.inc, 0)) // 100 AS BIGINT) AS r
      FROM nodes n
      LEFT JOIN seeds s ON n.node = s.node
      LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(r{i - 1}.r // deg.deg) AS BIGINT) AS inc
        FROM r{i - 1} JOIN deg ON r{i - 1}.node = deg.src JOIN e ON e.src = deg.src
        GROUP BY e.dst
      ) x ON n.node = x.node
    )"""
        )
    blocks.append(f"\n    SELECT node, r AS rank_scaled FROM r{iterations}\n    ")
    return "".join(blocks)


@register("ppr_supplier_graph", _ppr_oracle(3, 4))
def ppr_supplier_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (operators/graph.py personalized_pagerank,
    Jeh & Widom WWW'03) on the customer-supplier trade graph, teleport
    confined to the 4 smallest node ids: proximity-to-seeds
    centrality in the same bit-portable scaled-integer arithmetic as
    the global variant — per round one src-keyed join + one dst-keyed
    agg, |E|-bounded."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        personalized_pagerank,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    # symmetrize via explode(array(...)) — unionAll-of-selects re-runs
    # the orders⋈lineitem distinct per branch (repeated-subtree rule)
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return personalized_pagerank(edges, n_seeds=4, iterations=3)


def _hits_oracle(iterations: int) -> str:
    S = 10**6  # HITS_SCALE: S^2 * max_degree must stay in int64
    blocks = [
        f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS MATERIALIZED (
      SELECT c AS src, s AS dst FROM pairs
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM e
      UNION
      SELECT DISTINCT dst AS node FROM e
    ), h0 AS MATERIALIZED (
      SELECT node, CAST({S} AS BIGINT) AS h FROM nodes
    )"""
    ]
    for r in range(1, iterations + 1):
        blocks.append(
            f""", araw{r} AS MATERIALIZED (
      SELECT e.dst AS node, CAST(SUM(h{r - 1}.h) AS BIGINT) AS a
      FROM e JOIN h{r - 1} ON h{r - 1}.node = e.src GROUP BY e.dst
    ), a{r} AS MATERIALIZED (
      SELECT node,
             CAST((a * {S}) // greatest((SELECT MAX(a) FROM araw{r}), 1) AS BIGINT) AS a
      FROM araw{r}
    ), hraw{r} AS MATERIALIZED (
      SELECT e.src AS node, CAST(SUM(a{r}.a) AS BIGINT) AS h
      FROM e JOIN a{r} ON a{r}.node = e.dst GROUP BY e.src
    ), h{r} AS MATERIALIZED (
      SELECT node,
             CAST((h * {S}) // greatest((SELECT MAX(h) FROM hraw{r}), 1) AS BIGINT) AS h
      FROM hraw{r}
    )"""
        )
    blocks.append(
        f"""
    SELECT n.node,
           CAST(COALESCE(h{iterations}.h, 0) AS BIGINT) AS hub_scaled,
           CAST(COALESCE(a{iterations}.a, 0) AS BIGINT) AS auth_scaled
    FROM nodes n
    LEFT JOIN h{iterations} ON h{iterations}.node = n.node
    LEFT JOIN a{iterations} ON a{iterations}.node = n.node
    """
    )
    return "".join(blocks)


@register("hits_supplier_graph", _hits_oracle(2))
def hits_supplier_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (operators/graph.py hits_fixed,
    Kleinberg JACM'99) on the DIRECTED customer→supplier trade graph:
    customers score as hubs, suppliers as authorities, re-normalized
    to max = 10^6 (HITS_SCALE; 10^12 overflowed int64 in the
    score×weight products) per half-round by integer floor division
    (L∞ norm
    — the exact-arithmetic choice; L2's sqrt-of-a-sum would be
    order-sensitive). Two |E|-keyed join+aggs per round plus scalar
    max attaches via broadcast crossJoin."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import hits_fixed

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return hits_fixed(edges, iterations=2)


@register("scene_cuts_rawvideo")
def scene_cuts_rawvideo_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over REAL rawvideo bytes (multimodal/
    media.py frame_luma_features + scene_cut_detect): deterministic
    synthetic videos (hard level changes at known frames, drift
    elsewhere), decoded by the rawvideo slicer, cuts found by a pure
    SQL lag window over integer mean-luma. Rows-only by design —
    byte decode isn't SQL (the dHash precedent); the detector layer
    itself is relational and unit-tested against ground truth."""
    import numpy as np

    from dpe_energy_performance_analysis_etl_spark.multimodal.media import (
        frame_luma_features,
        scene_cut_detect,
    )

    w = h = 16
    rows = []
    for vid in range(6):
        frames = []
        for i in range(20):
            seg = i // (4 + vid % 3)
            level = (37 * (vid + 1) + 83 * seg) % 200 + 20
            frames.append(np.full((h, w, 3), level, dtype=np.uint8))
        rows.append((vid, bytearray(b"".join(f.tobytes() for f in frames))))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    feats = frame_luma_features(df, width=w, height=h)
    return scene_cut_detect(feats, threshold=20)


@register("audio_fp_match_clip")
def audio_fp_match_clip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shazam-style audio identity (multimodal/audiofp.py, Wang ISMIR
    2003) over REAL WAV bytes: deterministic tone-sequence tracks, a
    mid-track clip as the query, constellation hashes joined +
    offset-voted. Rows-only by design — FFT/decode aren't SQL; the
    join+vote matcher is relational and the tests pin the
    correct-track/correct-offset ground truth."""
    import numpy as np

    from dpe_energy_performance_analysis_etl_spark.multimodal.audiofp import (
        audio_fingerprints,
        audio_match,
    )
    from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import encode_wav

    rate = 8000

    def track(seed: int) -> np.ndarray:
        rng = np.random.default_rng(seed)
        t = np.arange(rate // 2) / rate
        segs = []
        for i in range(6):
            freqs = rng.integers(200, 3600, 3)
            seg = sum(
                np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28)) for f in freqs
            )
            segs.append(seg / 3.0)
        return np.concatenate(segs)

    db_rows = [(i, bytearray(encode_wav(track(i), rate))) for i in range(1, 4)]
    clip = track(2)[rate : 2 * rate]
    q_rows = [(99, bytearray(encode_wav(clip, rate)))]
    db = spark.createDataFrame(db_rows, "media_id long, content binary")
    q = spark.createDataFrame(q_rows, "media_id long, content binary")
    return audio_match(audio_fingerprints(db), audio_fingerprints(q), min_votes=5)


# =====================================================================
# Round 5, wave 11: graph structure analytics — clustering coefficient,
# degree assortativity, community modularity (operators/graph.py)
# =====================================================================

@register(
    "clustering_coeff_parts",
    """
    WITH e AS MATERIALIZED (
      SELECT least(a.l_partkey, b.l_partkey) AS a,
             greatest(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
      ) GROUP BY 1
    ), tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e1.b = e2.a
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ), corners AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
        UNION ALL SELECT z AS v FROM tri
      ) GROUP BY 1
    )
    SELECT deg.v, deg.deg,
           COALESCE(n_triangles, 0) AS n_triangles,
           CASE WHEN deg.deg < 2 THEN CAST(0 AS DOUBLE)
                ELSE CAST(2 * COALESCE(n_triangles, 0) AS DOUBLE)
                     / CAST(deg.deg * (deg.deg - 1) AS DOUBLE) END
             AS clustering_coeff
    FROM deg LEFT JOIN corners ON deg.v = corners.v
    """,
)
def clustering_coeff_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficients (operators/graph.py
    clustering_coefficients) over the recurring co-purchase part
    graph (same support>=2 edges as triangle_count_parts — the
    scale-stable graph). 2T/(deg·(deg−1)) with both sides int64 and
    ONE double division per node keeps an inherently fractional
    statistic bit-portable across engines — no float sums exist in
    the plan. Scale shape is triangle_counts' (arboricity-bounded
    wedge join) plus a free projection."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        clustering_coefficients,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        cooccurrence_pairs,
    )

    # basket-array pair build (r12, see cooccurrence_pairs)
    edges = cooccurrence_pairs(li, "l_orderkey", "l_partkey").select(
        "src", "dst"
    )
    return clustering_coefficients(edges)


@register(
    "degree_assortativity_trade",
    """
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS MATERIALIZED (
      SELECT DISTINCT least(c, s) AS a, greatest(c, s) AS b FROM pairs
    ), deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
      ) GROUP BY 1
    ), bidir AS (
      SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e
    ), j AS (
      SELECT da.deg AS dx, db.deg AS dy
      FROM bidir JOIN deg da ON da.v = bidir.a JOIN deg db ON db.v = bidir.b
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m_directed,
             CAST(SUM(dx) AS BIGINT) AS sum_x,
             CAST(SUM(dx * dy) AS BIGINT) AS sum_xy,
             CAST(SUM(dx * dx) AS BIGINT) AS sum_x2
      FROM j
    )
    SELECT m_directed, sum_x, sum_xy, sum_x2,
           CASE WHEN m_directed * sum_x2 - sum_x * sum_x = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(m_directed * sum_xy - sum_x * sum_x AS DOUBLE)
                     / CAST(m_directed * sum_x2 - sum_x * sum_x AS DOUBLE) END
             AS assortativity
    FROM s
    """,
)
def degree_assortativity_trade_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (operators/graph.py degree_assortativity)
    of the customer<->supplier trade graph — bipartite trade networks
    are canonically DISASSORTATIVE (big buyers connect to small
    suppliers and vice versa); the single-row coefficient quantifies
    it. All four Pearson sums are int64 over integer degree products;
    the symmetric-edge identity removes the sqrt, so one double
    division is the only float op — hash-gate exact."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        degree_assortativity,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return degree_assortativity(pairs)


@register(
    "community_modularity_nations",
    """
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS MATERIALIZED (
      SELECT DISTINCT least(c, s) AS a, greatest(c, s) AS b FROM pairs
    ), lab AS (
      SELECT c_custkey * 2 AS n, c_nationkey AS com FROM customer
      UNION ALL
      SELECT s_suppkey * 2 + 1 AS n, s_nationkey AS com FROM supplier
    ), labeled AS MATERIALIZED (
      SELECT e.a, e.b, la.com AS ca, lb.com AS cb
      FROM e JOIN lab la ON la.n = e.a JOIN lab lb ON lb.n = e.b
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m FROM labeled
    ), degc AS (
      SELECT community, CAST(COUNT(*) AS BIGINT) AS degree_sum FROM (
        SELECT ca AS community FROM labeled UNION ALL SELECT cb FROM labeled
      ) GROUP BY 1
    ), intra AS (
      SELECT ca AS community, CAST(COUNT(*) AS BIGINT) AS intra_edges
      FROM labeled WHERE ca = cb GROUP BY 1
    ), nn AS (
      SELECT com AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM (
        SELECT DISTINCT v FROM (
          SELECT a AS v FROM labeled UNION ALL SELECT b FROM labeled
        )
      ) JOIN lab ON lab.n = v GROUP BY 1
    )
    SELECT d.community,
           COALESCE(n_nodes, 0) AS n_nodes,
           d.degree_sum,
           COALESCE(intra_edges, 0) AS intra_edges,
           CAST(4 * m.m * COALESCE(intra_edges, 0)
                - d.degree_sum * d.degree_sum AS BIGINT) AS q_contrib_num,
           CAST(4 * m.m * m.m AS BIGINT) AS modularity_den,
           CASE WHEN m.m = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(4 * m.m * COALESCE(intra_edges, 0)
                          - d.degree_sum * d.degree_sum AS DOUBLE)
                     / CAST(4 * m.m * m.m AS DOUBLE) END AS q_contrib
    FROM degc d LEFT JOIN intra USING (community)
                LEFT JOIN nn USING (community)
                CROSS JOIN m
    """,
)
def community_modularity_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity decomposition (operators/graph.py
    community_modularity) of the NATION partition over the trade
    graph: does geography explain the wiring better than random? Per
    community: intra-edge count, degree sum, and the exact-integer
    contribution (4·m·m_c − d_c²); q_contrib is the one double
    division. Global Q = the caller's fixed-order sum over ≤25 rows
    (the chi2-cells contract). Labels join as a broadcast dimension;
    everything else is |E|-keyed."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        community_modularity,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    communities = (
        cust.select(
            (F.col("c_custkey") * 2).alias("node"),
            F.col("c_nationkey").alias("community"),
        )
        .unionAll(
            supp.select(
                (F.col("s_suppkey") * 2 + 1).alias("node"),
                F.col("s_nationkey").alias("community"),
            )
        )
    )
    return community_modularity(pairs, communities)


# =====================================================================
# Round 5, wave 12: exact-portable statistics — lag autocorrelation,
# Mann-Kendall trend, key-skew Gini, quantized Cramér's V
# (operators/stats.py)
# =====================================================================

@register(
    "lag_autocorr_revenue",
    """
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) * 100 AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), series AS (
      SELECT month, cents // 100000 AS x FROM monthly
    ), lagged AS (
      SELECT x,
             lag(x, 1) OVER (ORDER BY month) AS l1,
             lag(x, 2) OVER (ORDER BY month) AS l2,
             lag(x, 3) OVER (ORDER BY month) AS l3
      FROM series
    ), pairs AS (
      SELECT 1 AS lag_k, x, l1 AS y FROM lagged WHERE l1 IS NOT NULL
      UNION ALL SELECT 2, x, l2 FROM lagged WHERE l2 IS NOT NULL
      UNION ALL SELECT 3, x, l3 FROM lagged WHERE l3 IS NOT NULL
    ), s AS (
      SELECT lag_k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
             CAST(SUM(x * y) AS BIGINT) AS sum_xy,
             CAST(SUM(x * x) AS BIGINT) AS sum_x2,
             CAST(SUM(y * y) AS BIGINT) AS sum_y2
      FROM pairs GROUP BY 1
    )
    SELECT lag_k, n_pairs, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
           CASE WHEN n_pairs * sum_x2 - sum_x * sum_x <= 0
                  OR n_pairs * sum_y2 - sum_y * sum_y <= 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(n_pairs * sum_xy - sum_x * sum_y AS DOUBLE)
                     / (sqrt(CAST(n_pairs * sum_x2 - sum_x * sum_x AS DOUBLE))
                        * sqrt(CAST(n_pairs * sum_y2 - sum_y * sum_y AS DOUBLE)))
           END AS autocorr
    FROM s
    """,
)
def lag_autocorr_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1/2/3 autocorrelation of the monthly revenue series
    (operators/stats.py lag_autocorrelation) — the seasonality probe a
    forecasting pipeline runs before choosing a model. Revenue is
    exact integer cents (scaled_long sum) quantized to k$ by floor
    division, so every Pearson sum is int64 and the statistic is
    bit-portable: two sqrt + one division are the only float ops. The
    window runs over the 80-row MONTH table, not the fact scan."""
    from dpe_energy_performance_analysis_etl_spark.operators.exact import exact_cents_sum
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        lag_autocorrelation,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(exact_cents_sum("o_totalprice", 2).alias("cents"))
        .select("month", F.expr("cents div 100000").alias("x"))
    )
    return lag_autocorrelation(monthly, "x", "month", lags=[1, 2, 3])


@register(
    "mann_kendall_user_values",
    """
    WITH ev AS MATERIALIZED (
      SELECT user_id, ts, event_id, value FROM events
    ), pairs AS (
      SELECT a.user_id AS k, CAST(sign(b.value - a.value) AS BIGINT) AS sg
      FROM ev a JOIN ev b ON a.user_id = b.user_id
       AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
    ), s AS (
      SELECT k, CAST(SUM(sg) AS BIGINT) AS s_stat FROM pairs GROUP BY 1
    ), nt AS (
      SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1
    ), ties AS (
      SELECT k, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (
        SELECT user_id AS k, value, CAST(COUNT(*) AS BIGINT) AS t
        FROM ev GROUP BY 1, 2
      ) WHERE t > 1 GROUP BY 1
    ), out AS (
      SELECT nt.k AS user_id, nt.n,
             COALESCE(s_stat, 0) AS s_stat,
             CAST(nt.n * (nt.n - 1) * (2 * nt.n + 5)
                  - COALESCE(tie_term, 0) AS BIGINT) AS var_x18
      FROM nt LEFT JOIN s ON s.k = nt.k LEFT JOIN ties ON ties.k = nt.k
    )
    SELECT user_id, n, s_stat, var_x18,
           CASE WHEN var_x18 = 0 OR s_stat = 0 THEN CAST(0 AS DOUBLE)
                WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                     / sqrt(CAST(var_x18 AS DOUBLE) / 1.8e1)
                ELSE CAST(s_stat + 1 AS DOUBLE)
                     / sqrt(CAST(var_x18 AS DOUBLE) / 1.8e1)
           END AS z
    FROM out
    """,
)
def mann_kendall_user_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test per user over the event-value
    series (operators/stats.py mann_kendall) — the nonparametric
    drift monitor. S and the tie-corrected Var·18 are pure int64
    (sign comparisons only touch the raw doubles — no float
    arithmetic); z is one division by one sqrt. The O(n²) pair
    enumeration is a self-join EQUI-KEYED on user_id — per-user series
    are bounded (~70 events), so the quadratic sits inside a key,
    never across the corpus."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import mann_kendall

    ev = read_events(spark, sf_dir)
    out = mann_kendall(ev, "user_id", "value", ["ts", "event_id"])
    return out.select(
        F.col("key").alias("user_id"), "n", "s_stat", "var_x18", "z"
    )


@register(
    "key_skew_gini_partkey",
    """
    WITH counts AS (
      SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT c, CAST(row_number() OVER (ORDER BY c, k) AS BIGINT) AS r
      FROM counts
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(c) AS BIGINT) AS total_rows,
             CAST(SUM(r * c) AS BIGINT) AS rank_weighted_sum
      FROM ranked
    )
    SELECT n_keys, total_rows, rank_weighted_sum,
           CASE WHEN total_rows = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(2 * rank_weighted_sum - (n_keys + 1) * total_rows AS DOUBLE)
                     / CAST(n_keys * total_rows AS DOUBLE)
           END AS gini
    FROM s
    """,
)
def key_skew_gini_partkey_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of the l_partkey row distribution
    (operators/stats.py gini_concentration) — the one-number skew
    diagnostic a shuffle planner reads before picking salting/AQE
    strategies for a join on this key. One histogram aggregation over
    the fact table; the global rank-sort runs over the 2000-row
    HISTOGRAM. Exact int64 sums, one double division."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        gini_concentration,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return gini_concentration(li, "l_partkey")


@register(
    "cramers_v_priority_status",
    """
    WITH cells AS MATERIALIZED (
      SELECT o_orderpriority AS rv, o_orderstatus AS cv,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM orders GROUP BY 1, 2
    ), rt AS (
      SELECT rv, CAST(SUM(obs) AS BIGINT) AS rtot FROM cells GROUP BY 1
    ), ct AS (
      SELECT cv, CAST(SUM(obs) AS BIGINT) AS ctot FROM cells GROUP BY 1
    ), nn AS (
      SELECT CAST(SUM(obs) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT rv) AS BIGINT) AS n_rowcats,
             CAST(COUNT(DISTINCT cv) AS BIGINT) AS n_colcats
      FROM cells
    ), j AS (
      SELECT COALESCE(obs, 0) AS obs, n, n_rowcats, n_colcats,
             (rtot * ctot) // n AS eq,
             greatest((rtot * ctot) // n, 1) AS d
      FROM rt CROSS JOIN ct
        LEFT JOIN cells ON cells.rv = rt.rv AND cells.cv = ct.cv
        CROSS JOIN nn
    ), kk AS (
      SELECT n, n_rowcats, n_colcats,
             CAST(SUM(((obs - eq) * (obs - eq) // d) * 1000
                      + ((obs - eq) * (obs - eq) % d) * 1000 // d)
                  AS BIGINT) AS chi2_xscale
      FROM j GROUP BY 1, 2, 3
    )
    SELECT n, n_rowcats, n_colcats, chi2_xscale,
           CASE WHEN least(n_rowcats - 1, n_colcats - 1) <= 0 THEN CAST(0 AS DOUBLE)
                ELSE sqrt(CAST(chi2_xscale AS DOUBLE)
                          / CAST(1000 * n * least(n_rowcats - 1, n_colcats - 1) AS DOUBLE))
           END AS cramers_v
    FROM kk
    """,
)
def cramers_v_priority_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association strength for order priority × status
    (operators/stats.py cramers_v_quantized) — the global effect-size
    companion to contingency_chi2_cells, made hash-gate exact by
    integer-quantizing each cell's chi² contribution (floor divisions
    only, two-step long division for overflow headroom) so the SUM is
    an integer; √ and one division are the only float ops."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        cramers_v_quantized,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return cramers_v_quantized(o, "o_orderpriority", "o_orderstatus", scale=1000)


# =====================================================================
# Round 5, wave 13: AMS F2 sketch, sorted-neighborhood blocking,
# integer geohash cells (operators/sketch.py, entity.py, spatial.py)
# =====================================================================

@register(
    "ams_f2_tokens",
    """
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), counts AS MATERIALIZED (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1
    ), h0t AS (
      SELECT c,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(regexp_extract_all(rpad(term, 16, '#'), '.'),
                               ch -> CAST(ascii(ch) AS BIGINT))),
                (acc, ch) -> (acc * 131 + ch) % 2147483647) AS h0
      FROM counts
    ), h2 AS (
      SELECT c, xor(s1, s1 >> 16) AS h32 FROM (
        SELECT c, (xor(h0, h0 >> 16) * 73244475) % 4294967296 AS s1 FROM h0t
      )
    ), t0s AS (
      SELECT c, j, (h32 + j * 40503) % 4294967296 AS t0
      FROM h2 CROSS JOIN (SELECT unnest(range(16)) AS j)
    ), sg AS (
      SELECT c, j, 1 - 2 * (xor(t1, t1 >> 16) % 2) AS s FROM (
        SELECT c, j, (xor(t0, t0 >> 16) * 73244475) % 4294967296 AS t1 FROM t0s
      )
    ), sk AS (
      SELECT j, CAST(SUM(c * s) AS BIGINT) AS sv FROM sg GROUP BY 1
    ), gs AS (
      SELECT j // 4 AS g, CAST(SUM(sv * sv) AS BIGINT) AS gsum FROM sk GROUP BY 1
    ), med AS (
      SELECT gsum AS f2_est_x4 FROM (
        SELECT gsum, row_number() OVER (ORDER BY gsum, g) AS rn FROM gs
      ) WHERE rn = 2
    ), ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(c * c) AS BIGINT) AS exact_f2
      FROM counts
    )
    SELECT n_terms, exact_f2, f2_est_x4,
           CAST(f2_est_x4 AS DOUBLE) / (4.0e0 * CAST(exact_f2 AS DOUBLE))
             AS est_over_exact
    FROM ex CROSS JOIN med
    """,
)
def ams_f2_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war F2 sketch (operators/sketch.py ams_f2,
    Alon-Matias-Szegedy STOC'96) over the corpus token stream, next to
    the exact second moment — the constant-state answer to "how big
    is the self-join on this key". 16 deterministic sign-hash
    estimators, 4 median-of-means groups, lower-median rank pick ×4
    so nothing ever divides until the final calibration ratio; the
    whole sketch is int64 and bit-portable."""
    from dpe_energy_performance_analysis_etl_spark.operators.sketch import ams_f2

    docs = read_documents(spark, sf_dir)
    tok = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("term")
    )
    return ams_f2(tok, "term")


@register(
    "sorted_neighborhood_matches",
    """
    WITH clean AS (
      SELECT c_custkey AS r_id, c_nationkey AS block, c_name AS name
      FROM customer
    ), dirty AS (
      SELECT c_custkey + 1000000 AS r_id, c_nationkey AS block,
             substring(c_name, 1, 9 + c_custkey % 9)
               || substring(c_name, 11 + c_custkey % 9) AS name
      FROM customer
    ), rec AS (
      SELECT * FROM clean UNION ALL SELECT * FROM dirty
    ), ranked AS MATERIALIZED (
      SELECT block, r_id, name,
             row_number() OVER (PARTITION BY block ORDER BY name, r_id) AS rn
      FROM rec
    )
    SELECT a.block, a.r_id AS id_a, b.r_id AS id_b,
           CAST(b.rn - a.rn AS INT) AS rank_gap,
           CAST(levenshtein(a.name, b.name) AS INT) AS edit_dist
    FROM ranked a JOIN ranked b
      ON a.block = b.block AND b.rn BETWEEN a.rn + 1 AND a.rn + 3
    WHERE levenshtein(a.name, b.name) <= 2
    """,
)
def sorted_neighborhood_matches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage (operators/entity.py
    sorted_neighborhood_candidates, Hernández-Stolfo SIGMOD'95):
    clean + key-perturbed customer records, sorted by name WITHIN the
    nation block, width-3 window candidates via 3 explode-built
    equi-joins on (block, rank+k) — O(n·w) candidates, never a range
    self-join — verified with levenshtein ≤ 2 (JVM codegen on both
    engines). The complementary blocking strategy to the FastSS
    deletion variants (entity_match_ed1) and FS blocking
    (record_linkage_fs)."""
    from dpe_energy_performance_analysis_etl_spark.operators.entity import (
        sorted_neighborhood_candidates,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    p = F.col("c_custkey") % 9
    clean = cust.select(
        F.col("c_custkey").alias("r_id"),
        F.col("c_nationkey").alias("block"),
        F.col("c_name").alias("name"),
    )
    dirty = cust.select(
        (F.col("c_custkey") + 1000000).alias("r_id"),
        F.col("c_nationkey").alias("block"),
        F.concat(
            F.substring(F.col("c_name"), F.lit(1), F.lit(9) + p),
            F.substr(F.col("c_name"), F.lit(11) + p),
        ).alias("name"),
    )
    rec = clean.unionAll(dirty)
    return sorted_neighborhood_candidates(
        rec, "r_id", ["name"], "block", window=3, verify_col="name", max_edit=2
    ).select("block", "id_a", "id_b", "rank_gap", "edit_dist")


def _geohash_oracle_sql(precision: int = 5) -> str:
    """DuckDB twin of operators/spatial.py geohash_encode_micro: the
    same integer cell math and MSB-first lon-lat bit interleave,
    unrolled to explicit shift/mask terms."""
    total_bits = 5 * precision
    lon_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    terms = []
    for i in range(lon_bits):
        terms.append(f"((cx >> {lon_bits - 1 - i}) % 2) * {1 << (total_bits - 1 - 2 * i)}")
    for i in range(lat_bits):
        terms.append(f"((cy >> {lat_bits - 1 - i}) % 2) * {1 << (total_bits - 2 - 2 * i)}")
    interleave = "\n               + ".join(terms)
    chars = " || ".join(
        f"substr('0123456789bcdefghjkmnpqrstuvwxyz',"
        f" CAST((code >> {total_bits - 5 * (d + 1)}) % 32 AS INT) + 1, 1)"
        for d in range(precision)
    )
    mix_lat = _walk_mix_sql("c_custkey", "7", 0)
    mix_lon = _walk_mix_sql("c_custkey", "11", 0)
    return f"""
    WITH coords AS (
      SELECT c_custkey,
             CAST(({mix_lat}) % 180000000 - 90000000 AS BIGINT) AS lat_micro,
             CAST(({mix_lon}) % 360000000 - 180000000 AS BIGINT) AS lon_micro
      FROM customer
    ), cells AS (
      SELECT c_custkey, lat_micro, lon_micro,
             LEAST(((lon_micro + 180000000) * {1 << lon_bits}) // 360000000,
                   {(1 << lon_bits) - 1}) AS cx,
             LEAST(((lat_micro + 90000000) * {1 << lat_bits}) // 180000000,
                   {(1 << lat_bits) - 1}) AS cy
      FROM coords
    ), code AS (
      SELECT c_custkey,
             ({interleave}) AS code
      FROM cells
    ), gh AS (
      SELECT c_custkey, {chars} AS geohash5
      FROM code
    )
    SELECT substr(geohash5, 1, 2) AS geohash2,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(DISTINCT geohash5) AS BIGINT) AS n_cells5,
           min(geohash5) AS min_h5, max(geohash5) AS max_h5
    FROM gh GROUP BY 1
    """


@register("geohash_cells_customers", _geohash_oracle_sql(5))
def geohash_cells_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash spatial binning (operators/spatial.py
    geohash_encode_micro): key-derived integer-microdegree customer
    coordinates (the tables carry no geo columns — same synthesis
    convention as spatial_radius_join, dispersed by the portable
    mix32) encoded to geohash-5 cells in PURE integer arithmetic
    (floor-div cells + unrolled bit interleave + base-32 chars), then
    rolled up to geohash-2 regions with per-region cell stats. The
    encode is a row-local codegen expression — zero shuffle before
    the final cell aggregation — and the integer cell math cannot
    round across a cell boundary (the numeric_range_lookup lesson
    applied to geospatial bucketing)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        _portable_mix32,
    )
    from dpe_energy_performance_analysis_etl_spark.operators.spatial import (
        geohash_encode_micro,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    coords = cust.select(
        "c_custkey",
        (
            _portable_mix32(F.col("c_custkey"), F.lit(7), F.lit(0))
            % F.lit(180_000_000)
            - F.lit(90_000_000)
        ).alias("lat_micro"),
        (
            _portable_mix32(F.col("c_custkey"), F.lit(11), F.lit(0))
            % F.lit(360_000_000)
            - F.lit(180_000_000)
        ).alias("lon_micro"),
    )
    gh = coords.select(
        geohash_encode_micro(F.col("lat_micro"), F.col("lon_micro"), 5).alias(
            "geohash5"
        )
    )
    return gh.groupBy(F.substring("geohash5", 1, 2).alias("geohash2")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.countDistinct("geohash5").cast("bigint").alias("n_cells5"),
        F.min("geohash5").alias("min_h5"),
        F.max("geohash5").alias("max_h5"),
    )


# =====================================================================
# Round 5, wave 14: classic-ML primitives in exact arithmetic —
# portable k-means Lloyd twin, histogram decision stump
# (operators/ml.py)
# =====================================================================

@register(
    "kmeans_lloyd_portable",
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
      SELECT vid, cluster, dist FROM (
        SELECT vid, cluster, dist,
               row_number() OVER (PARTITION BY vid ORDER BY dist, cluster) AS rn
        FROM a2
      ) WHERE rn = 1
    ), c2 AS MATERIALIZED (
      SELECT b.cluster, v.d, CAST(SUM(v.x) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS cd
      FROM b2 b JOIN vecs v ON v.vid = b.vid
      GROUP BY 1, 2
    ), stats AS (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(SUM(dist) AS BIGINT) AS inertia
      FROM b2 GROUP BY 1
    ), csum AS (
      SELECT cluster, CAST(SUM(cd) AS BIGINT) AS centroid_sum
      FROM c2 GROUP BY 1
    )
    SELECT cluster, n_members, inertia, centroid_sum
    FROM stats JOIN csum USING (cluster)
    """,
)
def kmeans_lloyd_portable_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd k-means rounds (operators/ml.py
    kmeans_lloyd_portable, k=8) over integer-scaled embeddings — the
    oracle-checkable twin of the float IVF trainer
    (similarity/ivf.py train_ivf_centroids): floor(x·2^10)+offset
    coordinates, int64 distances, min-struct argmin with id
    tie-break, non-negative integer-division centroid means — every
    round a pure function of the last, so the unrolled SQL replays
    bit-identically (the PageRank portability recipe for
    clustering)."""
    from dpe_energy_performance_analysis_etl_spark.operators.ml import (
        kmeans_lloyd_portable,
    )

    emb = read_embeddings(spark, sf_dir)
    return kmeans_lloyd_portable(emb, k=8, iterations=2)


@register(
    "decision_stump_totalprice",
    """
    WITH b AS (
      SELECT CAST(min(o_totalprice) AS DOUBLE) AS lo,
             CAST(max(o_totalprice) AS DOUBLE) AS hi
      FROM orders
    ), lab AS (
      SELECT o_totalprice AS val,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ), bins AS (
      SELECT CASE WHEN hi = lo THEN 0
                  ELSE least(greatest(CAST(floor((CAST(val AS DOUBLE) - lo)
                                           / ((hi - lo) / 256)) AS BIGINT),
                             0), 255) END AS bucket,
             lo, hi,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM(1 - y) AS BIGINT) AS neg
      FROM lab CROSS JOIN b GROUP BY 1, 2, 3
    ), cum AS (
      SELECT bucket, lo, hi,
             CAST(SUM(pos) OVER w AS BIGINT) AS pl,
             CAST(SUM(neg) OVER w AS BIGINT) AS nl
      FROM bins
      WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ), tot AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS tp, CAST(SUM(neg) AS BIGINT) AS tn
      FROM bins
    ), cand AS (
      SELECT bucket, lo, hi, pl, nl, tp - pl AS pr, tn - nl AS nr
      FROM cum CROSS JOIN tot
    ), scored AS (
      SELECT bucket, lo, hi, pl, nl, pr, nr,
             CAST(pl * nl AS DOUBLE) / CAST(pl + nl AS DOUBLE)
             + CAST(pr * nr AS DOUBLE) / CAST(pr + nr AS DOUBLE) AS gini_score
      FROM cand WHERE pl + nl > 0 AND pr + nr > 0
    )
    SELECT bucket AS split_bucket,
           lo + CAST(bucket + 1 AS DOUBLE) * ((hi - lo) / 256) AS split_value,
           pl AS pos_left, nl AS neg_left, pr AS pos_right, nr AS neg_right,
           gini_score
    FROM (
      SELECT *, row_number() OVER (ORDER BY gini_score, bucket) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def decision_stump_totalprice_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact best Gini split of o_totalprice against the urgent-order
    label (operators/ml.py decision_stump_binned) — the histogram-
    split inner loop of boosted-tree training (the LightGBM binning
    trick is precisely what makes split search scale: cumulative
    class counts over a 256-bin table, never a sort of the raw
    rows). Counts are int64; each candidate's score is a fixed
    two-term sum of single divisions — deterministic, so even the
    argmin rank pick replays exactly."""
    from dpe_energy_performance_analysis_etl_spark.operators.ml import (
        decision_stump_binned,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return decision_stump_binned(
        o,
        "o_totalprice",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        n_bins=256,
    )


# =====================================================================
# Round 5, wave 15: robust trend, burstiness, trigram transitions,
# URL hierarchy rollup, categorical drift
# =====================================================================

@register(
    "theil_sen_spend_trend",
    """
    WITH base AS MATERIALIZED (
      SELECT o_custkey AS k,
             CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS x,
             CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5) AS BIGINT) AS y
      FROM orders
    ), pairs AS (
      SELECT a.k, a.x AS xa, b.x AS xb,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      FROM base a JOIN base b ON a.k = b.k
       AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
      WHERE a.x <> b.x
    ), ranked AS (
      SELECT k, slope,
             CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT) AS n_pairs,
             row_number() OVER (PARTITION BY k ORDER BY slope, xa, xb) AS rn
      FROM pairs
    ), med AS (
      SELECT k, n_pairs, slope AS theil_slope
      FROM ranked WHERE rn = (n_pairs + 1) // 2
    ), npts AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_points FROM base GROUP BY 1
    )
    SELECT npts.k AS c_custkey, n_points, n_pairs, theil_slope
    FROM npts JOIN med ON med.k = npts.k
    WHERE n_points >= 3
    """,
)
def theil_sen_spend_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust spend trend per customer (operators/stats.py
    theil_sen_slope): median pairwise slope of order cents over order
    day — outlier-proof where the per-group OLS
    (group_linregress_qty_disc) is not. Slopes are single divisions
    of int64 deltas; the median is a lower-median RANK PICK (order
    statistics, never interpolation — the engine-parity rule); the
    O(n²) pair join is equi-keyed on the customer (bounded ~10-order
    series)."""
    from dpe_energy_performance_analysis_etl_spark.operators.exact import scaled_long
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        theil_sen_slope,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).alias(
            "x"
        ),
        scaled_long("o_totalprice", 2).alias("y"),
    )
    return theil_sen_slope(o, "o_custkey", "x", "y", min_points=3).select(
        F.col("key").alias("c_custkey"), "n_points", "n_pairs", "theil_slope"
    )


@register(
    "fano_event_bursts",
    """
    WITH counts AS (
      SELECT event_type AS key, date_trunc('day', ts) AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), sums AS (
      SELECT key, CAST(COUNT(*) AS BIGINT) AS n_buckets,
             CAST(SUM(c) AS BIGINT) AS total,
             CAST(SUM(c * c) AS BIGINT) AS sum_sq
      FROM counts GROUP BY 1
    )
    SELECT key, n_buckets, total, sum_sq,
           CASE WHEN n_buckets < 2 OR total = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(n_buckets * sum_sq - total * total AS DOUBLE)
                     / CAST((n_buckets - 1) * total AS DOUBLE)
           END AS fano
    FROM sums
    """,
)
def fano_event_bursts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean of daily counts) per event type
    (operators/stats.py fano_factor) — the burstiness index: ≈1
    Poisson-like, >1 bursty. The variance/mean collapses to
    (n·Σx²−S²)/((n−1)·S) — int64 numerator and denominator, ONE
    double division, no float sums."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import fano_factor

    ev = read_events(spark, sf_dir)
    return fano_factor(ev, "event_type", F.date_trunc("day", F.col("ts")))


@register(
    "event_trigram_probs",
    """
    WITH ordered AS (
      SELECT event_type,
             lag(event_type, 2) OVER w AS t0,
             lag(event_type, 1) OVER w AS t1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tri AS MATERIALIZED (
      SELECT t0, t1, event_type AS t2, CAST(COUNT(*) AS BIGINT) AS n
      FROM ordered WHERE t0 IS NOT NULL AND t1 IS NOT NULL
      GROUP BY 1, 2, 3
    ), ctx AS (
      SELECT t0, t1, CAST(SUM(n) AS BIGINT) AS context_n FROM tri GROUP BY 1, 2
    )
    SELECT tri.t0, tri.t1, tri.t2, n, context_n,
           CAST(n AS DOUBLE) / CAST(context_n AS DOUBLE) AS prob
    FROM tri JOIN ctx USING (t0, t1)
    """,
)
def event_trigram_probs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order Markov model of user event sequences
    (operators/temporal.py event_trigrams): P(next | last two) — the
    trigram upgrade of event_transition_matrix. One window pass (two
    lags share the shuffle), one trigram aggregation; context totals
    broadcast from the tiny trigram table; prob divides two exact
    BIGINTs."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        event_trigrams,
    )

    return event_trigrams(read_events(spark, sf_dir))


@register(
    "url_path_rollup_docs",
    """
    WITH raw AS (
      SELECT doc_id, source || '.example.com' AS host,
             CASE WHEN doc_id % 4 = 0
                  THEN '/cat' || (doc_id % 5) || '/sub' || (doc_id % 3)
                  ELSE '/cat' || (doc_id % 5) || '/sub' || (doc_id % 3)
                       || '/p' || (doc_id % 7) END AS path
      FROM documents
    ), segs AS (
      SELECT host, list_filter(string_split(path, '/'), s -> s <> '') AS segs
      FROM raw
    ), pref AS (
      SELECT host, d AS depth,
             '/' || array_to_string(segs[1:d], '/') || '/' AS path_prefix,
             CASE WHEN d = len(segs) THEN 1 ELSE 0 END AS is_leaf
      FROM segs, (SELECT unnest(range(1, 20)) AS d) ds
      WHERE d <= len(segs)
    )
    SELECT host, path_prefix, CAST(depth AS INT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(is_leaf) AS BIGINT) AS n_leaf_pages
    FROM pref GROUP BY 1, 2, 3
    """,
)
def url_path_rollup_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical URL path rollup (text/urls.py url_path_rollup):
    every page aggregated into each ancestor directory — the crawl
    site-structure audit. Pure codegen prefix explode (fan-out =
    path depth, never a join), one (host, prefix) aggregation. URLs
    are key-derived with mixed 2- and 3-segment paths so leaf/dir
    accounting is exercised."""
    from dpe_energy_performance_analysis_etl_spark.text.urls import url_path_rollup

    docs = read_documents(spark, sf_dir)
    path = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            F.lit("/cat"), (F.col("doc_id") % 5).cast("string"),
            F.lit("/sub"), (F.col("doc_id") % 3).cast("string"),
        ),
    ).otherwise(
        F.concat(
            F.lit("/cat"), (F.col("doc_id") % 5).cast("string"),
            F.lit("/sub"), (F.col("doc_id") % 3).cast("string"),
            F.lit("/p"), (F.col("doc_id") % 7).cast("string"),
        )
    )
    urls = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com"), path).alias(
            "url"
        )
    )
    return url_path_rollup(urls, "url")


@register(
    "category_drift_halves",
    """
    WITH cells AS MATERIALIZED (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1995-06-17 00:00:00'
                  THEN 'H1' ELSE 'H2' END AS rv,
             o_orderpriority AS cv,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM orders GROUP BY 1, 2
    ), rt AS (
      SELECT rv, CAST(SUM(obs) AS BIGINT) AS rtot FROM cells GROUP BY 1
    ), ct AS (
      SELECT cv, CAST(SUM(obs) AS BIGINT) AS ctot FROM cells GROUP BY 1
    ), nn AS (
      SELECT CAST(SUM(obs) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT rv) AS BIGINT) AS n_rowcats,
             CAST(COUNT(DISTINCT cv) AS BIGINT) AS n_colcats
      FROM cells
    ), j AS (
      SELECT COALESCE(obs, 0) AS obs, n, n_rowcats, n_colcats,
             (rtot * ctot) // n AS eq,
             greatest((rtot * ctot) // n, 1) AS d
      FROM rt CROSS JOIN ct
        LEFT JOIN cells ON cells.rv = rt.rv AND cells.cv = ct.cv
        CROSS JOIN nn
    ), kk AS (
      SELECT n, n_rowcats, n_colcats,
             CAST(SUM(((obs - eq) * (obs - eq) // d) * 1000
                      + ((obs - eq) * (obs - eq) % d) * 1000 // d)
                  AS BIGINT) AS chi2_xscale
      FROM j GROUP BY 1, 2, 3
    )
    SELECT n, n_rowcats, n_colcats, chi2_xscale,
           CASE WHEN least(n_rowcats - 1, n_colcats - 1) <= 0 THEN CAST(0 AS DOUBLE)
                ELSE sqrt(CAST(chi2_xscale AS DOUBLE)
                          / CAST(1000 * n * least(n_rowcats - 1, n_colcats - 1) AS DOUBLE))
           END AS cramers_v
    FROM kk
    """,
)
def category_drift_halves_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical distribution drift between the first and second
    half of the order history — the production data-drift check,
    computed as the quantized Cramér's V of (period × priority)
    (operators/stats.py cramers_v_quantized composed over a derived
    period label). V ≈ 0 means the priority mix is time-stable;
    exact-integer chi² keeps the drift score hash-portable."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        cramers_v_quantized,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.when(
            F.col("o_orderdate")
            < F.lit("1995-06-17 00:00:00").cast("timestamp"),
            F.lit("H1"),
        )
        .otherwise(F.lit("H2"))
        .alias("period"),
        "o_orderpriority",
    )
    return cramers_v_quantized(o, "period", "o_orderpriority", scale=1000)


# =====================================================================
# Round 5, wave 16: bigram LM scoring (Stupid Backoff) + vocabulary
# coverage curve (text/retrieval.py)
# =====================================================================

@register(
    "stupid_backoff_docs",
    """
    WITH tok AS MATERIALIZED (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
             CAST(unnest(range(0, len(regexp_extract_all(lower(text), '[a-z0-9]+'))))
                  AS BIGINT) AS pos
      FROM documents
    ), trbg AS MATERIALIZED (
      SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      WHERE a.doc_id % 10 <> 0
      GROUP BY 1, 2
    ), c1t AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE doc_id % 10 <> 0 GROUP BY 1
    ), nt AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_train FROM c1t
    ), tebg AS (
      SELECT a.doc_id, a.w AS w1, b.w AS w2
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      WHERE a.doc_id % 10 = 0
    ), j AS (
      SELECT t.doc_id,
             CASE WHEN c12 IS NOT NULL THEN (c12 * 1000000) // u1.c
                  WHEN u2.c IS NOT NULL THEN (2 * u2.c * 1000000) // (5 * n_train)
                  ELSE 0 END AS sq,
             CASE WHEN c12 IS NULL AND u2.c IS NOT NULL THEN 1 ELSE 0 END AS bo,
             CASE WHEN u2.c IS NULL THEN 1 ELSE 0 END AS oov
      FROM tebg t
      LEFT JOIN trbg ON trbg.w1 = t.w1 AND trbg.w2 = t.w2
      LEFT JOIN c1t u1 ON u1.w = t.w1
      LEFT JOIN c1t u2 ON u2.w = t.w2
      CROSS JOIN nt
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(bo) AS BIGINT) AS n_backoff,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST(SUM(sq) AS BIGINT) AS score_q_sum,
           CAST(SUM(sq) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1000000)
             AS mean_score
    FROM j GROUP BY 1
    """,
)
def stupid_backoff_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out document fluency under a Stupid Backoff bigram LM
    (text/retrieval.py stupid_backoff_scores, Brants EMNLP'07) —
    train on 90% of the corpus, score every 10th document: the
    pretraining quality gate in its web-scale (unnormalized,
    log-free) form. Scores are integer-quantized ((c₁₂·10⁶) div c₁ /
    (2·c₂·10⁶) div (5N)) so per-doc sums are exact int64 — the
    unigram_lm_scores recipe extended to a backoff chain. Test
    bigrams join the train bigram table equi-keyed on (w1,w2); the
    unigram vocab broadcasts."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        stupid_backoff_scores,
    )

    docs = read_documents(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    test = docs.filter(F.col("doc_id") % 10 == 0)
    return stupid_backoff_scores(train, test)


@register(
    "vocab_coverage_curve",
    """
    WITH trv AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents WHERE doc_id % 10 <> 0
      ) GROUP BY 1
    ), ranked AS (
      SELECT w, CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS r
      FROM trv
    ), tev AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS tc FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents WHERE doc_id % 10 = 0
      ) GROUP BY 1
    ), j AS MATERIALIZED (
      SELECT tc, r FROM tev LEFT JOIN ranked USING (w)
    ), per_k AS (
      SELECT k, tc, r
      FROM j CROSS JOIN (SELECT unnest([100, 1000, 10000]) AS k)
    )
    SELECT CAST(k AS INT) AS k,
           CAST(SUM(tc) AS BIGINT) AS n_test_tokens,
           CAST(SUM(CASE WHEN r IS NOT NULL AND r <= k THEN tc ELSE 0 END)
                AS BIGINT) AS n_covered,
           CAST(SUM(CASE WHEN r IS NOT NULL AND r <= k THEN tc ELSE 0 END)
                AS DOUBLE) / CAST(SUM(tc) AS DOUBLE) AS coverage
    FROM per_k GROUP BY 1
    """,
)
def vocab_coverage_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out token coverage of the top-k training vocabulary at
    k ∈ {100, 1000, 10000} (text/retrieval.py vocab_coverage_curve) —
    the curve that sizes a tokenizer vocab. Rank window runs over the
    train VOCAB (never the corpus); the test side joins vocab-sized
    tables; one exact division per k."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        vocab_coverage_curve,
    )

    docs = read_documents(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    test = docs.filter(F.col("doc_id") % 10 == 0)
    return vocab_coverage_curve(train, test, ks=[100, 1000, 10000])


# =====================================================================
# Round 6, wave 1: inter-rater agreement, Kneser-Ney smoothing,
# UniMax language budgets (operators/stats.py, text/retrieval.py,
# text/mixing.py)
# =====================================================================

@register(
    "cohens_kappa_raters",
    """
    WITH lab AS (
      SELECT CASE WHEN length(text) >= 250 THEN 'keep' ELSE 'drop' END AS la,
             CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 45
                  THEN 'keep' ELSE 'drop' END AS lb
      FROM documents
    ), cells AS MATERIALIZED (
      SELECT la, lb, CAST(COUNT(*) AS BIGINT) AS obs FROM lab GROUP BY 1, 2
    ), rt AS (
      SELECT la, CAST(SUM(obs) AS BIGINT) AS rtot FROM cells GROUP BY 1
    ), ct AS (
      SELECT lb, CAST(SUM(obs) AS BIGINT) AS ctot FROM cells GROUP BY 1
    ), s AS (
      SELECT CAST(COALESCE(SUM(rtot * ctot), 0) AS BIGINT) AS s
      FROM rt JOIN ct ON rt.la = ct.lb
    ), b AS (
      SELECT CAST(SUM(obs) AS BIGINT) AS n,
             CAST(COALESCE(SUM(CASE WHEN la = lb THEN obs END), 0) AS BIGINT)
               AS n_agree
      FROM cells
    )
    SELECT n, n_agree, s AS pe_num,
           CASE WHEN n * n = s THEN CAST(0 AS DOUBLE)
                ELSE CAST(n_agree * n - s AS DOUBLE) / CAST(n * n - s AS DOUBLE)
           END AS kappa
    FROM b CROSS JOIN s
    """,
)
def cohens_kappa_raters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic curation raters — a
    char-length gate vs a token-count gate — over the documents
    corpus (operators/stats.py cohens_kappa_exact): the
    beyond-chance-agreement check a pipeline runs before trusting
    two quality heuristics' intersection. κ = (A·n − S)/(n² − S) is
    one double division of exact int64s — no quantization needed."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        cohens_kappa_exact,
    )

    docs = read_documents(spark, sf_dir)
    a = F.when(F.length("text") >= 250, "keep").otherwise("drop")
    b = F.when(
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")) >= 45,
        "keep",
    ).otherwise("drop")
    return cohens_kappa_exact(docs, a, b)


@register(
    "kneser_ney_bigrams",
    """
    WITH tok AS MATERIALIZED (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
             CAST(unnest(range(0, len(regexp_extract_all(lower(text), '[a-z0-9]+'))))
                  AS BIGINT) AS pos
      FROM documents
    ), c12 AS MATERIALIZED (
      SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2
    ), c1 AS MATERIALIZED (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS n1p_fwd
      FROM c12 GROUP BY 1
    ), nb AS MATERIALIZED (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_bwd FROM c12 GROUP BY 1
    ), tt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS t_types FROM c12
    )
    SELECT c12.w1, c12.w2, c12.c12, c1.c1, c1.n1p_fwd, nb.n1p_bwd,
           CAST(((greatest(4 * c12.c12 - 3, 0) * t_types
                  + 3 * c1.n1p_fwd * nb.n1p_bwd) * 1000000)
                // (4 * c1.c1 * t_types) AS BIGINT) AS p_kn_scaled
    FROM c12
    JOIN c1 ON c1.w1 = c12.w1
    JOIN nb ON nb.w2 = c12.w2
    CROSS JOIN tt
    WHERE c12.c12 >= 3
    """,
)
def kneser_ney_bigrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities, discount 3/4
    (text/retrieval.py kneser_ney_bigram_probs) — the
    Chen-Goodman/KenLM-default smoothing next to the registry's
    Stupid Backoff. The dyadic discount clears every fraction when
    multiplied through by 4·c1·T, so p·10⁶ is one exact integer
    floor division — bit-identical in SQL."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        kneser_ney_bigram_probs,
    )

    return kneser_ney_bigram_probs(read_documents(spark, sf_dir), min_count=3)


@register(
    "unimax_lang_budget",
    """
    WITH sizes AS MATERIALIZED (
      SELECT lang AS grp, CAST(SUM(n_chars) AS BIGINT) AS available
      FROM documents GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT grp, available, CAST(available * 4 AS BIGINT) AS cap,
             CAST(row_number() OVER (ORDER BY available * 4, grp) AS BIGINT) AS i,
             CAST(COALESCE(SUM(available * 4) OVER (
               ORDER BY available * 4, grp
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_prev,
             CAST(COUNT(*) OVER () AS BIGINT) AS g_total
      FROM sizes
    ), marked AS MATERIALIZED (
      SELECT *,
             cap * (g_total - i + 1) <= 500000 - cum_prev AS is_capped
      FROM ranked
    ), scal AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN is_capped THEN cap END), 0) AS BIGINT)
               AS capped_sum,
             CAST(COUNT(*) FILTER (WHERE NOT is_capped) AS BIGINT) AS n_uncapped
      FROM marked
    )
    SELECT grp AS lang, available, cap,
           CAST(CASE WHEN is_capped THEN cap
                ELSE least(cap, (500000 - capped_sum)
                           // greatest(n_uncapped, 1)) END AS BIGINT) AS allocated,
           CAST(CASE WHEN is_capped THEN cap
                ELSE least(cap, (500000 - capped_sum)
                           // greatest(n_uncapped, 1)) END AS DOUBLE)
             / CAST(greatest(available, 1) AS DOUBLE) AS epochs
    FROM marked CROSS JOIN scal
    """,
)
def unimax_lang_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax character-budget allocation across the corpus languages
    (text/mixing.py unimax_budget_allocation; Chung ICLR'23): cap
    every language at 4 epochs of its available chars, waterfill the
    500k-char budget as uniformly as possible among the rest — the
    closed-form capped-prefix rule over the bounded language table,
    all int64 floor divisions."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import (
        unimax_budget_allocation,
    )

    docs = read_documents(spark, sf_dir)
    return unimax_budget_allocation(
        docs, "lang", "n_chars", budget=500_000, max_epochs=4
    )


def _power_iter_oracle(iterations: int) -> str:
    """DuckDB twin of operators/ml.py principal_direction_power:
    exact integer Gram (n·Σxx − S·S'), deterministic dynamic rescale
    (// 2^36 + 1), and unrolled matvec+renorm rounds. DuckDB BIGINT
    `//` truncates toward zero like Spark `div` (measured −3//2 = −1
    on the in-env build), so the negative Gram entries divide
    identically."""
    blocks = [
        """
    WITH vecs AS MATERIALIZED (
      SELECT vec_id AS vid,
             CAST(unnest(range(0, len(embedding))) AS BIGINT) AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024) AS BIGINT) AS x
      FROM embeddings
    ), sums AS MATERIALIZED (
      SELECT d, CAST(SUM(x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM vecs GROUP BY 1
    ), sxx AS MATERIALIZED (
      SELECT a.d AS i, b.d AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS sxx
      FROM vecs a JOIN vecs b ON a.vid = b.vid GROUP BY 1, 2
    ), gram AS MATERIALIZED (
      SELECT i, j, si.n * sxx.sxx - si.s * sj.s AS g
      FROM sxx JOIN sums si ON si.d = sxx.i JOIN sums sj ON sj.d = sxx.j
    ), gq AS MATERIALIZED (
      SELECT i, j,
             g // ((SELECT MAX(abs(g)) FROM gram) // 68719476736 + 1) AS g
      FROM gram
    ), v0 AS MATERIALIZED (
      SELECT d AS dim, CAST(1048576 AS BIGINT) AS v FROM sums
    )"""
    ]
    for r in range(1, iterations + 1):
        blocks.append(
            f""", w{r} AS MATERIALIZED (
      SELECT gq.i AS dim, CAST(SUM(gq.g * v{r - 1}.v) AS BIGINT) AS w
      FROM gq JOIN v{r - 1} ON v{r - 1}.dim = gq.j GROUP BY 1
    ), v{r} AS MATERIALIZED (
      SELECT dim,
             CAST(w // ((SELECT MAX(abs(w)) FROM w{r}) // 1048576 + 1)
                  AS BIGINT) AS v
      FROM w{r}
    )"""
        )
    blocks.append(
        f"""
    SELECT dim, v AS component_scaled FROM v{iterations}
    """
    )
    return "".join(blocks)


@register("principal_direction_power", _power_iter_oracle(3))
def principal_direction_power_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by 3 rounds of
    bit-portable power iteration (operators/ml.py
    principal_direction_power) — exact integer scatter covariance
    from a row-local d² explode, deterministic dynamic rescales, the
    HITS renorm recipe adapted to signed values (divide-FIRST renorm
    to dodge the w·S overflow). 64 scalar rows."""
    from dpe_energy_performance_analysis_etl_spark.operators.ml import (
        principal_direction_power,
    )

    emb = read_embeddings(spark, sf_dir)
    return principal_direction_power(emb, iterations=3)


@register("gif_compression_stats")
def gif_compression_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF/LZW compressibility as a per-document redundancy feature
    (multimodal/gif.py — pure-numpy GIF87a codec, the fifth real
    container after PNG/BMP/PPM/JPEG): documents render to
    deterministic 24×24 16-color images (text bytes mod the palette),
    encode through the variable-width LZW pipeline, decode back, and
    report compressed size + bit-exact roundtrip per doc — LZW ratio
    is the classic cheap proxy for repeated-content detection
    (the compression_ratio zlib feature's sibling, exercising
    dictionary coding instead of deflate). Rows-only by design (LZW
    decode is not SQL); the codec itself is pinned by a hand-derived
    spec byte anchor and width-change/KwKwK/table-reset roundtrips
    (tests/test_gif.py)."""
    import numpy as np
    import pandas as pd

    docs = read_documents(spark, sf_dir)

    def work(batches):
        from dpe_energy_performance_analysis_etl_spark.multimodal.gif import (
            decode_gif,
            encode_gif,
        )

        pal = (np.arange(16, dtype=np.uint8)[:, None] * np.array([17, 13, 7])).astype(
            np.uint8
        )
        for pdf in batches:
            rows = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                raw = t.encode()[: 24 * 24]
                buf = np.zeros(24 * 24, dtype=np.uint8)
                buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
                px = pal[(buf % 16).reshape(24, 24)]
                payload = encode_gif(px)
                ok = bool((decode_gif(payload) == px).all())
                rows.append(
                    (
                        int(did),
                        len(payload),
                        24 * 24 * 3,
                        int(np.unique(buf % 16).size),
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "gif_bytes", "raw_bytes", "n_colors", "roundtrip_ok"],
            )

    out = docs.select("doc_id", "text").mapInPandas(
        work,
        schema=(
            "doc_id long, gif_bytes long, raw_bytes long,"
            " n_colors long, roundtrip_ok boolean"
        ),
    )
    return out.select(
        "doc_id",
        "gif_bytes",
        "n_colors",
        "roundtrip_ok",
        (F.col("gif_bytes").cast("double") / F.col("raw_bytes").cast("double")).alias(
            "lzw_ratio"
        ),
    )
