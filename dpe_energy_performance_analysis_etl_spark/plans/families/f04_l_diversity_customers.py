"""Query-registry family chunk 4 (auto-split from the
historical plans/queries.py lines 7303-9096; registration
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
    "l_diversity_customers",
    """
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT c_acctbal) AS BIGINT) AS l_diversity,
           CAST(CASE WHEN COUNT(DISTINCT c_acctbal) < 3 THEN 1 ELSE 0 END
                AS BIGINT) AS violates_l
    FROM customer
    GROUP BY 1, 2
    ORDER BY l_diversity, c_nationkey, c_mktsegment
    LIMIT 10
    """,
)
def l_diversity_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (operators/quality.py l_diversity_audit,
    Machanavajjhala 2007): the ten LEAST-diverse quasi-groups
    (nation, segment) by distinct sensitive values (account balance),
    flagged against l=3 — the leak k-anonymity alone misses (a
    50-anonymous cohort sharing one balance still discloses it).
    Reported as a bottom-10 margin audit rather than a violations
    filter so the row is non-trivial at every SF (on well-mixed data
    the violations set is empty — a 0-row green driver record checks
    nothing). Deterministic: the quasi tuple is unique per group, so
    (l_diversity, nation, segment) is a total order."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        l_diversity_audit,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return l_diversity_audit(
        cust, ["c_nationkey", "c_mktsegment"], "c_acctbal", l=3, bottom=10
    )


@register(
    "time_embargo_split_events",
    """
    WITH tagged AS (
      SELECT user_id, event_id,
             CASE WHEN epoch_us(ts) < 1705708800000000 THEN 'train'
                  WHEN epoch_us(ts) < 1705881600000000 THEN 'embargo'
                  ELSE 'test' END AS split
      FROM events
    )
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM tagged GROUP BY split
    """,
)
def time_embargo_split_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe temporal split with embargo (operators/temporal.py
    time_embargo_split, the purged-split discipline): train before
    2024-01-20, a 2-day embargo absorbing trailing-window lookahead,
    test after. Integer-microsecond comparisons on both engines;
    per-split event and user counts."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        time_embargo_split,
    )

    ev = read_events(spark, sf_dir)
    out = time_embargo_split(
        ev, "ts", cutoff_us=1705708800000000, embargo_us=172800000000
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "join_view_delta_orders",
    """
    WITH bl AS (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 10 <> 0
    ), dl AS (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
    ), br AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 20 <> 0
    ), dr AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 20 = 0
    ), fullv AS (
      SELECT o.c_custkey, o.o_orderkey, o.o_totalprice, c.c_mktsegment
      FROM (SELECT * FROM bl UNION ALL SELECT * FROM dl) o
      JOIN (SELECT * FROM br UNION ALL SELECT * FROM dr) c USING (c_custkey)
    ), basev AS (
      SELECT bl.c_custkey, bl.o_orderkey, bl.o_totalprice, br.c_mktsegment
      FROM bl JOIN br USING (c_custkey)
    )
    SELECT * FROM fullv EXCEPT ALL SELECT * FROM basev
    """,
)
def join_view_delta_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental inner-join view maintenance
    (operators/incremental.py join_view_delta): the rows a batch of
    order + customer inserts ADDS to the orders⋈customer view,
    computed as dL⋈R ∪ L⋈dR ∪ dL⋈dR — O(|delta|) probe work instead
    of re-joining the snapshots. The ORACLE is the spec: full
    recompute EXCEPT ALL old view — equality proves the delta algebra
    exact."""
    from dpe_energy_performance_analysis_etl_spark.operators.incremental import (
        join_view_delta,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    bl = orders.where(F.col("o_orderkey") % 10 != 0)
    dl = orders.where(F.col("o_orderkey") % 10 == 0)
    br = cust.where(F.col("c_custkey") % 20 != 0)
    dr = cust.where(F.col("c_custkey") % 20 == 0)
    return join_view_delta(bl, dl, br, dr, on="c_custkey").select(
        "c_custkey", "o_orderkey", "o_totalprice", "c_mktsegment"
    )


@register(
    "target_mixture_weights_docs",
    """
    WITH sizes AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS size
      FROM documents GROUP BY source
    ), shares AS (
      SELECT source, size,
             CAST(size AS DOUBLE)
               / CAST(CAST(SUM(size) OVER () AS BIGINT) AS DOUBLE) AS natural_share,
             CASE source WHEN 'src0' THEN 3.0e-1 WHEN 'src1' THEN 3.0e-1
                         WHEN 'src2' THEN 4.0e-1 ELSE 0.0e0 END AS target_share
      FROM sizes
    )
    SELECT source, size, natural_share, target_share,
           target_share / natural_share AS weight
    FROM shares
    """,
)
def target_mixture_weights_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture reweighting (text/mixing.py
    target_mixture_weights — the DoReMi/data-mixing deployment step):
    per-source token-budget sizes (n_chars), natural vs target share,
    and the sampling weight that reshapes the corpus to the target.
    Exact integer sums; two double divisions; sources outside the
    target spec get weight 0 (dropped)."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import target_mixture_weights

    docs = read_documents(spark, sf_dir)
    return target_mixture_weights(
        docs, {"src0": 0.3, "src1": 0.3, "src2": 0.4}, "source", size_col="n_chars"
    )


@register(
    "rrf_hybrid_retrieval",
    """
    WITH tok AS (
      SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_toks,
             len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS n_uniq
      FROM documents
    ), r1 AS (
      SELECT 0 AS query_id, doc_id,
             row_number() OVER (ORDER BY n_toks DESC, doc_id) AS rank
      FROM tok QUALIFY rank <= 20
    ), r2 AS (
      SELECT 0 AS query_id, doc_id,
             row_number() OVER (ORDER BY n_uniq DESC, doc_id) AS rank
      FROM tok QUALIFY rank <= 20
    ), slots AS (
      SELECT query_id, doc_id,
             MAX(CASE WHEN ranker = 0 THEN rank END) AS s0,
             MAX(CASE WHEN ranker = 1 THEN rank END) AS s1
      FROM (
        SELECT query_id, doc_id, 0 AS ranker, rank FROM r1
        UNION ALL
        SELECT query_id, doc_id, 1 AS ranker, rank FROM r2
      ) GROUP BY query_id, doc_id
    ), scored AS (
      SELECT query_id, doc_id,
             (0.0e0 + (CASE WHEN s0 IS NOT NULL THEN 1.0e0 / (6.0e1 + s0) ELSE 0.0e0 END))
               + (CASE WHEN s1 IS NOT NULL THEN 1.0e0 / (6.0e1 + s1) ELSE 0.0e0 END) AS rrf_score
      FROM slots
    )
    SELECT query_id, doc_id, rrf_score,
           CAST(fused_rank AS INTEGER) AS fused_rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id) AS fused_rank
      FROM scored
    ) WHERE fused_rank <= 10
    """,
)
def rrf_hybrid_retrieval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (text/retrieval.py, Cormack SIGIR'09 —
    the hybrid sparse+dense merge that needs no score calibration) of
    two document rankers (token-count and distinct-token top-20),
    fused top-10. The RRF sum is an ORDERED row-local fold over
    per-ranker slots (one pivot aggregation) — never a shuffle-order
    SUM of doubles — so scores hash-match across engines."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        reciprocal_rank_fusion,
    )
    from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        take_ordered_ranked,
    )

    docs = read_documents(spark, sf_dir).select(
        "doc_id",
        F.size(tokens_expr("text")).alias("n_toks"),
        F.size(F.array_distinct(tokens_expr("text"))).alias("n_uniq"),
    )
    # Each ranker's top-20 is TakeOrderedAndProject over the FULL docs
    # table (per-partition 20-row heaps) — never a global row_number
    # window over a corpus-sized input (VERDICT r10 ask #1 named this
    # site the worst of the class: two such windows).
    r1 = take_ordered_ranked(
        docs, [F.col("n_toks").desc(), F.col("doc_id").asc()], 20
    ).select(F.lit(0).alias("query_id"), "doc_id", "rank")
    r2 = take_ordered_ranked(
        docs, [F.col("n_uniq").desc(), F.col("doc_id").asc()], 20
    ).select(F.lit(0).alias("query_id"), "doc_id", "rank")
    return reciprocal_rank_fusion([r1, r2], k=60, top_k=10)


@register(
    "ranking_metrics_by_source",
    """
    WITH ranked AS (
      SELECT source AS query_id, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
      FROM documents
    ), results AS (
      SELECT query_id, doc_id, rank FROM ranked WHERE rank <= 10
    ), qrels AS (
      SELECT source AS query_id, doc_id FROM documents WHERE doc_id % 3 = 0
    ), hits AS (
      SELECT r.query_id, r.doc_id, r.rank
      FROM results r JOIN qrels q ON q.query_id = r.query_id AND q.doc_id = r.doc_id
    ), n_rel AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_relevant FROM qrels GROUP BY query_id
    ), per_q AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
             CAST(MIN(rank) AS BIGINT) AS first_rel_rank
      FROM hits GROUP BY query_id
    )
    SELECT n.query_id,
           COALESCE(p.n_hits, 0) AS n_hits,
           n.n_relevant,
           CAST(COALESCE(p.n_hits, 0) AS DOUBLE) / CAST(n.n_relevant AS DOUBLE) AS recall_at_k,
           CAST(COALESCE(p.n_hits, 0) AS DOUBLE) / 1.0e1 AS precision_at_k,
           COALESCE(CAST(2520 // p.first_rel_rank AS BIGINT), 0) AS mrr_scaled,
           COALESCE(1.0e0 / CAST(p.first_rel_rank AS DOUBLE), 0.0e0) AS reciprocal_rank
    FROM n_rel n LEFT JOIN per_q p USING (query_id)
    """,
)
def ranking_metrics_by_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact retrieval evaluation (text/retrieval.py ranking_metrics):
    recall@10 / precision@10 / MRR per query (source) against
    synthetic qrels. MRR's reciprocal is emitted integer-scaled by
    lcm(1..10)=2520 — exact — beside the double convenience column;
    counts are BIGINT-exact; the only doubles are final divisions."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import ranking_metrics

    docs = read_documents(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    results = (
        docs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(F.col("source").alias("query_id"), "doc_id", "rank")
    )
    qrels = docs.where(F.col("doc_id") % 3 == 0).select(
        F.col("source").alias("query_id"), "doc_id"
    )
    return ranking_metrics(results, qrels, k=10)


@register(
    "cusum_changepoint_revenue",
    """
    WITH per AS (
      SELECT date_trunc('month', o_orderdate) AS period,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), t AS (
      SELECT period, cents,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(SUM(cents) OVER () AS BIGINT) AS total
      FROM per
    ), c AS (
      SELECT period, cents,
             CAST(SUM(n * cents - total) OVER (ORDER BY period) AS BIGINT) AS cusum_scaled
      FROM t
    )
    SELECT period, cents, cusum_scaled,
           abs(cusum_scaled) = CAST(MAX(abs(cusum_scaled)) OVER () AS BIGINT) AS is_peak
    FROM c
    """,
)
def cusum_changepoint_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point screen (operators/temporal.py, Page 1954)
    over monthly revenue: integer-scaled deviations (n*c_i - total —
    the mean never becomes a float) accumulate bit-exactly; the
    |cumulative| peak flags the most likely mean shift. The raw table
    collapses to one row per MONTH before any window, so the ordered
    scan runs over ~80 rows, never the fact table."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import cusum_changepoint

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return cusum_changepoint(
        orders,
        F.date_trunc("month", F.col("o_orderdate")),
        F.floor(F.col("o_totalprice") * 100 + 0.5),
    )


@register(
    "fd_violation_orders",
    """
    WITH groups AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS rows_in_group,
             CAST(COUNT(DISTINCT o_orderpriority)
                  + MAX(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rhs
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(count_if(n_rhs > 1) AS BIGINT) AS n_violating_groups,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN rows_in_group ELSE 0 END) AS BIGINT) AS n_violating_rows,
           count_if(n_rhs > 1) = 0 AS holds
    FROM groups
    """,
)
def fd_violation_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (operators/quality.py
    fd_violation_report): does o_custkey -> o_orderpriority hold?
    (It doesn't — the violating-group and violating-row counts size
    the repair.) One LHS groupBy + one bounded aggregation."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import fd_violation_report

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return fd_violation_report(orders, ["o_custkey"], "o_orderpriority")


def _walk_mix_sql(node: str, walk: str, k: int) -> str:
    """SQL twin of operators.graph._portable_mix32 for (node, walk, k).
    Multipliers ≤ 0x45d9f3b keep every reduced-term product < 3.1e17
    (int64-safe on both engines — the ADVICE r4 overflow fix)."""
    s0 = (
        f"((({node}) % 4294967296) + (({walk}) % 4294967296) * 40503"
        f" + {k} * 73244475) % 4294967296"
    )
    s1 = f"(xor({s0}, ({s0}) >> 16) * 73244475) % 4294967296"
    return f"xor({s1}, ({s1}) >> 16)"


def _walks_oracle(walk_len: int, walks_per_node: int) -> str:
    blocks = [
        f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS MATERIALIZED (
      SELECT c AS u, s AS v FROM pairs
      UNION ALL
      SELECT s AS u, c AS v FROM pairs
    ), nbrs AS MATERIALIZED (
      SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS idx FROM e
    ), degs AS MATERIALIZED (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM nbrs GROUP BY u
    ), x0 AS MATERIALIZED (
      SELECT d.u AS start, CAST(w.walk AS INTEGER) AS walk, 0 AS step, d.u AS node
      FROM degs d, (SELECT unnest(generate_series(0, {walks_per_node - 1})) AS walk) w
    )"""
    ]
    for k in range(1, walk_len):
        mix = _walk_mix_sql(f"x{k - 1}.node", f"x{k - 1}.walk", k)
        blocks.append(
            f""", x{k} AS MATERIALIZED (
      SELECT x{k - 1}.start, x{k - 1}.walk, {k} AS step, n.v AS node
      FROM x{k - 1}
      JOIN degs d ON d.u = x{k - 1}.node
      JOIN nbrs n ON n.u = x{k - 1}.node AND n.idx = ({mix}) % d.deg
    )"""
        )
    union = "\n      UNION ALL\n      ".join(
        f"SELECT start, walk, CAST(step AS INTEGER) AS step, node FROM x{k}"
        for k in range(walk_len)
    )
    blocks.append(f"\n    {union}")
    return "".join(blocks)


@register("deterministic_walks_supplier", _walks_oracle(4, 2))
def deterministic_walks_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk-style walk corpus (operators/graph.py
    deterministic_random_walks, Perozzi KDD'14) over the
    customer-supplier bipartite graph: 2 walks of length 4 per node,
    neighbor choice = portable-hash(node, walk, step) mod degree —
    identical corpus on every engine/rerun/partitioning (the training
    data feeding skip-gram/SGNS embedding ops). Every step is two
    equi-keyed joins (degree lookup, indexed-neighbor lookup) on
    O(#walkers) rows; the indexed neighbor/degree tables build once
    and serve all steps (cached)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        deterministic_random_walks,
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
    # symmetrize via ONE explode — the unionAll form re-ran the
    # orders x lineitem distinct once per branch (r12)
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return deterministic_random_walks(edges, walk_len=4, walks_per_node=2)


@register(
    "pareto_front_parts",
    """
    WITH base AS (
      SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
      FROM part
    ), tiers AS (
      SELECT p_retailprice AS x, MAX(p_size) AS ty FROM base GROUP BY 1
    ), ft AS (
      SELECT x, ty FROM (
        SELECT x, ty,
               MAX(ty) OVER (ORDER BY x DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bp
        FROM tiers
      ) WHERE bp IS NULL OR ty > bp
    )
    SELECT b.p_partkey, b.p_retailprice, b.p_size
    FROM base b JOIN ft ON b.p_retailprice = ft.x AND b.p_size = ft.ty
    """,
)
def pareto_front_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (operators/relational.py pareto_front_2d,
    Börzsönyi ICDE'01): parts not dominated on (retailprice, size)
    maximizing both. Tier aggregation (one row per distinct x) + a
    ROWS-frame running max over the tier table — exact for any x
    spacing, global sort over distinct values only."""
    from dpe_energy_performance_analysis_etl_spark.operators.relational import pareto_front_2d

    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("bigint").alias("p_size")
    )
    return pareto_front_2d(part, "p_retailprice", "p_size", "p_partkey")


@register(
    "interval_coverage_users",
    """
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e FROM events
    ), tagged AS (
      SELECT user_id, s, e,
             CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
                    OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS brk
      FROM iv
    ), grp AS (
      SELECT user_id, s, e,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e) AS gid
      FROM tagged
    ), islands AS (
      SELECT user_id, gid, MIN(s) AS i_s, MAX(e) AS i_e
      FROM grp GROUP BY user_id, gid
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(i_e - i_s) AS BIGINT) AS covered_length
    FROM islands GROUP BY user_id
    """,
)
def interval_coverage_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-interval coverage (operators/temporal.py
    interval_coverage): each event opens a 5-minute activity window;
    per user, overlap-deduplicated total active time + merged-island
    count (a plain SUM of window lengths double-counts every
    overlap). Gaps-and-islands with a running max end; integer
    microseconds throughout."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import epoch_micros
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import interval_coverage

    ev = read_events(spark, sf_dir)
    iv = ev.select(
        "user_id",
        epoch_micros("ts").alias("s"),
        (epoch_micros("ts") + 300_000_000).alias("e"),
    )
    return interval_coverage(iv, "s", "e", "user_id")


@register("image_dhash_near_dups")
def image_dhash_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs (multimodal/media.py
    image_dhash + dhash_near_dup_groups): documents render to small
    deterministic PPM images (text bytes fill the pixel grid; docs
    sharing a duplicated prefix produce near-identical images), then
    64-bit dHash → exact-hash clusters collapse first (a cluster of
    m identical images has m²/2 raw pairs — the sf5 measurement:
    8.1 M pairs, output-bound) → band candidates over DISTINCT
    hashes (pigeonhole over hamming <= 2) → popcount verify;
    output rows carry cluster sizes + the implied pair_count. Rows-only by design — PNG/PPM
    decode is not SQL — but the dHash integer pipeline and the banded
    join are pinned by ground-truth hamming tests and the codecs by
    pixel-exact roundtrips."""
    import numpy as np
    import pandas as pd

    from dpe_energy_performance_analysis_etl_spark.multimodal.media import (
        dhash_near_dup_groups,
    )

    docs = read_documents(spark, sf_dir)

    def render(batches):
        from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import encode_ppm

        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode()[: 24 * 24]
                buf = np.zeros(24 * 24, dtype=np.uint8)
                buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
                img = np.stack([buf.reshape(24, 24)] * 3, axis=2)
                payloads.append(encode_ppm(img))
            yield pd.DataFrame({"path": pdf["doc_id"].astype(str), "content": payloads})

    imgs = docs.select("doc_id", "text").mapInPandas(
        render, schema="path string, content binary"
    )
    from dpe_energy_performance_analysis_etl_spark.multimodal.media import dhash_dup_summary

    return dhash_dup_summary(imgs, id_col="path", max_hamming=2)


@register(
    "join_view_delta_signed_orders",
    """
    WITH bl AS (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 10 <> 0
    ), br AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 20 <> 0
    ), dl AS (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice, 1 AS w
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_custkey, o_orderkey, o_totalprice, -1
      FROM orders WHERE o_orderkey % 10 = 5
    ), dr AS (
      SELECT c_custkey, c_mktsegment, 1 AS w FROM customer WHERE c_custkey % 20 = 0
    ), newl AS (
      SELECT c_custkey, o_orderkey, o_totalprice, CAST(1 AS BIGINT) AS w FROM bl
      UNION ALL SELECT c_custkey, o_orderkey, o_totalprice, CAST(w AS BIGINT) FROM dl
    ), newr AS (
      SELECT c_custkey, c_mktsegment, CAST(1 AS BIGINT) AS w FROM br
      UNION ALL SELECT c_custkey, c_mktsegment, CAST(w AS BIGINT) FROM dr
    ), newv AS (
      SELECT l.c_custkey, l.o_orderkey, l.o_totalprice, r.c_mktsegment,
             CAST(SUM(l.w * r.w) AS BIGINT) AS w
      FROM newl l JOIN newr r USING (c_custkey)
      GROUP BY 1, 2, 3, 4
    ), oldv AS (
      SELECT bl.c_custkey, bl.o_orderkey, bl.o_totalprice, br.c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM bl JOIN br USING (c_custkey)
      GROUP BY 1, 2, 3, 4
    )
    SELECT c_custkey, o_orderkey, o_totalprice, c_mktsegment,
           CAST(SUM(w) AS BIGINT) AS w
    FROM (
      SELECT * FROM newv
      UNION ALL
      SELECT c_custkey, o_orderkey, o_totalprice, c_mktsegment, -w FROM oldv
    ) GROUP BY 1, 2, 3, 4 HAVING SUM(w) <> 0
    """,
)
def join_view_delta_signed_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed (insert + delete) incremental join-view maintenance
    (operators/incremental.py join_view_delta_signed — the
    differential-dataflow / DBSP Z-set identity: join is bilinear, so
    d(L⋈R) = dL⋈R + L⋈dR + dL⋈dR with weight products). Deltas here
    insert the %10==0 orders, DELETE the %10==5 ones, and insert a
    customer batch; the oracle is the spec — new-view multiset minus
    old-view multiset, net-nonzero rows only."""
    from dpe_energy_performance_analysis_etl_spark.operators.incremental import (
        join_view_delta_signed,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    bl = orders.where(F.col("o_orderkey") % 10 != 0)
    br = cust.where(F.col("c_custkey") % 20 != 0)
    dl = (
        orders.where(F.col("o_orderkey") % 10 == 0)
        .withColumn("w", F.lit(1).cast("bigint"))
        .unionByName(
            orders.where(F.col("o_orderkey") % 10 == 5).withColumn(
                "w", F.lit(-1).cast("bigint")
            )
        )
    )
    dr = cust.where(F.col("c_custkey") % 20 == 0).withColumn("w", F.lit(1).cast("bigint"))
    return join_view_delta_signed(bl, dl, br, dr, on="c_custkey")


@register(
    "flesch_readability_docs",
    """
    WITH m AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(lower(text), '[.!?]+')), 1) AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS vg
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences,
           greatest(vg, n_words) AS n_syllables,
           2.06835e2
             - 1.015e0 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 8.46e1 * (CAST(greatest(vg, n_words) AS DOUBLE)
                         / CAST(greatest(n_words, 1) AS DOUBLE)) AS flesch_score
    FROM m
    """,
)
def flesch_readability_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease quality gate (text/analysis.py
    flesch_reading_ease): integer regexp counts (words, sentence
    terminators, vowel-group syllables), one fixed-order double
    expression — engine-portable readability scores (e-notation
    constants in the oracle; plain decimals would parse as DECIMAL
    and double-round)."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import flesch_reading_ease

    docs = read_documents(spark, sf_dir)
    cols = flesch_reading_ease("text")
    return docs.select("doc_id", *[v.alias(k) for k, v in cols.items()])


@register("compression_ratio_docs")
def compression_ratio_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal (text/analysis.py
    compression_ratio — the Gopher/RedPajama repetitiveness screen:
    both tails are filter candidates). Rows-only by design: zlib is
    engine-external (deterministic for a fixed level, pinned by unit
    tests on known-ratio fixtures); Arrow-batched mapInPandas, zero
    shuffle."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import compression_ratio

    return compression_ratio(read_documents(spark, sf_dir))


_PRICE_TIERS = [
    ("budget", 0, 4_999_999),
    ("mid", 5_000_000, 14_999_999),
    ("upper", 15_000_000, 29_999_999),
    ("premium", 30_000_000, 44_999_999),
    ("luxury", 45_000_000, 99_999_999),
]


@register(
    "range_lookup_order_tiers",
    """
    WITH tiers(tier, lo, hi) AS (
      VALUES ('budget', 0, 4999999), ('mid', 5000000, 14999999),
             ('upper', 15000000, 29999999), ('premium', 30000000, 44999999),
             ('luxury', 45000000, 99999999)
    ), facts AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders
    )
    SELECT t.tier, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(f.cents) AS BIGINT) AS revenue_cents
    FROM facts f JOIN tiers t ON f.cents BETWEEN t.lo AND t.hi
    GROUP BY t.tier
    """,
)
def range_lookup_order_tiers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric range-lookup join (operators/relational.py
    numeric_range_lookup — IP→geo / tax-bracket / price-tier shape):
    non-uniform [lo, hi] tiers explode into integer buckets, facts
    equi-join on bucket, exact BETWEEN after — candidates bounded by
    bucket occupancy, never the BroadcastNestedLoop a naive BETWEEN
    theta-join plans. The oracle IS the BETWEEN spec."""
    from dpe_energy_performance_analysis_etl_spark.operators.relational import (
        numeric_range_lookup,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents")
    )
    tiers = spark.createDataFrame(_PRICE_TIERS, "tier string, lo long, hi long")
    joined = numeric_range_lookup(
        orders, tiers, "cents", bucket_width=1 << 22
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("revenue_cents"),
    )


@register(
    "abc_classification_brands",
    """
    WITH per AS (
      SELECT p.p_brand AS key,
             CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ), r AS (
      SELECT key, value_cents,
             CAST(SUM(value_cents) OVER (ORDER BY value_cents DESC, key) AS BIGINT) AS cum_cents,
             CAST(row_number() OVER (ORDER BY value_cents DESC, key) AS BIGINT) AS rank,
             CAST(SUM(value_cents) OVER () AS BIGINT) AS total
      FROM per
    )
    SELECT key AS p_brand, value_cents, cum_cents, rank,
           CASE WHEN cum_cents * 100 <= 80 * total THEN 'A'
                WHEN cum_cents * 100 <= 95 * total THEN 'B'
                ELSE 'C' END AS abc_class
    FROM r
    """,
)
def abc_classification_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto-share classification (operators/relational.py
    abc_classification) of part brands by revenue: class boundaries
    compared in INTEGER cents (cum*100 <= pct*total — no float share
    ever decides a boundary); the window runs over the 25-brand
    aggregate, never raw lineitem."""
    from dpe_energy_performance_analysis_etl_spark.operators.relational import (
        abc_classification,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_brand")
    joined = li.join(part, li["l_partkey"] == part["p_partkey"])
    return abc_classification(
        joined, "p_brand", F.floor(F.col("l_extendedprice") * 100 + 0.5)
    )


@register(
    "dictionary_encode_priority",
    """
    WITH mapping AS (
      SELECT value, CAST(row_number() OVER (ORDER BY value) - 1 AS BIGINT) AS id
      FROM (SELECT DISTINCT o_orderpriority AS value FROM orders
            WHERE o_orderpriority IS NOT NULL)
    )
    SELECT m.value AS o_orderpriority, m.id AS o_orderpriority_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM orders o JOIN mapping m ON o.o_orderpriority = m.value
    GROUP BY 1, 2
    """,
)
def dictionary_encode_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary encoding (operators/relational.py
    encode_dictionary): string keys to dense sort-ordered longs —
    the measured key-width lever (long ids 1.5x over strings per
    iterative round at sf5). Ids assigned by a window over the
    DISTINCT-value table only; the encode join broadcasts the
    dictionary. Output: per (value, id) row counts."""
    from dpe_energy_performance_analysis_etl_spark.operators.relational import (
        encode_dictionary,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    encoded, _mapping = encode_dictionary(orders, "o_orderpriority")
    return encoded.groupBy("o_orderpriority", "o_orderpriority_id").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


@register(
    "curation_funnel_docs",
    """
    WITH raw AS (
      SELECT doc_id, text,
             'HTTPS://WWW.' || source || '.Example.COM:443/p' || (doc_id % 7)
               || '?utm_source=feed&b=2&a=1&id=' || (doc_id % 5) || '#frag' AS url
      FROM documents
    ), nf AS (
      SELECT doc_id, text, regexp_replace(url, '#.*$', '') AS u FROM raw
    ), parts AS (
      SELECT doc_id, text,
             lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
             lower(regexp_extract(u, '^[^:]+://([^/?#]*)', 1)) AS hostport,
             regexp_extract(u, '^[^:]+://[^/?#]*(.*)$', 1) AS rest
      FROM nf
    ), canon AS (
      SELECT doc_id, text,
             scheme || '://' ||
             (CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
                   WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                   ELSE hostport END) ||
             (CASE WHEN regexp_extract(rest, '^([^?]*)', 1) = '' THEN '/'
                   ELSE regexp_extract(rest, '^([^?]*)', 1) END) ||
             (CASE WHEN len(list_sort(list_filter(string_split(regexp_extract(rest, '\\?(.*)$', 1), '&'),
                     p -> p <> '' AND NOT regexp_matches(p, '^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|ref)=.*$')))) > 0
                   THEN '?' || array_to_string(list_sort(list_filter(string_split(regexp_extract(rest, '\\?(.*)$', 1), '&'),
                     p -> p <> '' AND NOT regexp_matches(p, '^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|ref)=.*$'))), '&')
                   ELSE '' END) AS c
      FROM parts
    ), base AS (
      SELECT doc_id, c,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS k,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_toks,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
                                   t -> CAST(len(t) AS BIGINT))),
                  (a, b) -> a + b) AS DOUBLE)
               / CAST(greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1) AS DOUBLE) AS mwl
      FROM canon
    ), f1 AS (
      SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY c) AS url_ok FROM base
    ), f2 AS (
      SELECT *, url_ok AND doc_id = MIN(CASE WHEN url_ok THEN doc_id END)
                            OVER (PARTITION BY k) AS exact_ok
      FROM f1
    ), f3 AS (
      SELECT *, exact_ok AND n_toks >= 20 AND mwl < 12 AS quality_ok FROM f2
    ), f4 AS (
      SELECT *, quality_ok AND ((doc_id * 2654435761) % 4294967296) % 10000 < 8000 AS sample_ok
      FROM f3
    ), flags AS (
      SELECT *, CASE WHEN sample_ok AND n_toks > 0
                     THEN (n_toks - 1) // 24 + 1 ELSE 0 END AS n_chunks
      FROM f4
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS s_input,
             CAST(count_if(url_ok) AS BIGINT) AS s_url,
             CAST(count_if(exact_ok) AS BIGINT) AS s_exact,
             CAST(count_if(quality_ok) AS BIGINT) AS s_quality,
             CAST(count_if(sample_ok) AS BIGINT) AS s_sample,
             CAST(SUM(n_chunks) AS BIGINT) AS s_chunks
      FROM flags
    )
    SELECT 0 AS stage, 'input' AS stage_name, s_input AS n_rows FROM agg
    UNION ALL SELECT 1, 'url_dedup', s_url FROM agg
    UNION ALL SELECT 2, 'exact_dedup', s_exact FROM agg
    UNION ALL SELECT 3, 'quality_gate', s_quality FROM agg
    UNION ALL SELECT 4, 'subsample', s_sample FROM agg
    UNION ALL SELECT 5, 'chunks', s_chunks FROM agg
    """,
)
def curation_funnel_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation composition as one query
    (pipelines/curation.py curation_funnel): URL keep-first dedup →
    exact content dedup → quality gate → deterministic 80% subsample
    → chunk accounting — the per-stage funnel every curation run is
    judged by, computed as ONE aggregation over per-document survival
    flags (keep-first winners via per-key window minima; no unionAll
    of per-stage counts re-running the chain)."""
    from dpe_energy_performance_analysis_etl_spark.pipelines.curation import curation_funnel

    docs = read_documents(spark, sf_dir).select(
        "doc_id",
        "text",
        F.concat(
            F.lit("HTTPS://WWW."),
            F.col("source"),
            F.lit(".Example.COM:443/p"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("?utm_source=feed&b=2&a=1&id="),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("#frag"),
        ).alias("url"),
    )
    _chunks, summary = curation_funnel(docs, url_col="url")
    return summary


@register(
    "link_graph_domains",
    """
    WITH html AS (
      SELECT doc_id,
             '<a href="https://' || source || '.example.com/p' || (doc_id % 5) || '">x</a>'
               || CASE WHEN doc_id % 3 = 0
                       THEN '<a href=''https://news.' || source || '.co.uk/q''>y</a>'
                       ELSE '' END
               || '<a href="/relative/path">z</a>' AS h
      FROM documents
    ), links AS (
      SELECT doc_id, unnest(regexp_extract_all(h, 'href\\s*=\\s*["'']([^"''<>]+)["'']', 1)) AS href
      FROM html
    ), absolute AS (
      SELECT doc_id,
             lower(regexp_extract(href, '^[^:]+://([^/?#]*)', 1)) AS host
      FROM links WHERE href LIKE 'http%'
    ), dom AS (
      SELECT doc_id, host, string_split(host, '.') AS labels FROM absolute
    ), tagged AS (
      SELECT doc_id,
             CASE WHEN len(labels) >= 3
                       AND (labels[-2] || '.' || labels[-1]) IN
                           ('co.uk','ac.uk','gov.uk','com.au','co.jp','co.in','com.br','co.nz')
                  THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
                  WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
                  ELSE host END AS domain
      FROM dom
    )
    SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_inlinks,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_linking_docs
    FROM tagged GROUP BY domain
    """,
)
def link_graph_domains_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph extraction (text/urls.py extract_links): hrefs
    regexp-exploded from deterministic HTML, absolute links resolved
    to registered domains (both suffix rules exercised), per-domain
    inlink counts — the crawl-frontier / domain-authority input that
    composes with pagerank_fixed for domain ranking. Relative links
    pass through extraction and are excluded from the host graph."""
    from dpe_energy_performance_analysis_etl_spark.text.urls import (
        extract_links,
        registered_domain,
        url_host,
    )

    docs = read_documents(spark, sf_dir)
    html = docs.select(
        "doc_id",
        F.concat(
            F.lit('<a href="https://'),
            F.col("source"),
            F.lit(".example.com/p"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit('">x</a>'),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit("<a href='https://news."),
                    F.col("source"),
                    F.lit(".co.uk/q'>y</a>"),
                ),
            ).otherwise(F.lit("")),
            F.lit('<a href="/relative/path">z</a>'),
        ).alias("html"),
    )
    links = extract_links(html)
    absolute = links.where(F.col("href").startswith("http"))
    tagged = absolute.select(
        "doc_id", registered_domain(url_host(F.col("href"))).alias("domain")
    )
    return tagged.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.countDistinct("doc_id").alias("n_linking_docs"),
    )


@register(
    "asof_join_forward_events",
    """
    SELECT l.user_id, l.ts, l.event_id, l.click_value, r.view_value
    FROM (SELECT user_id, ts, event_id, value AS click_value,
                 -epoch_us(ts) AS nts
          FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT user_id, -epoch_us(ts) AS nts, value AS view_value
                    FROM events WHERE event_type = 'view') r
    ON l.user_id = r.user_id AND l.nts >= r.nts
    """,
)
def asof_join_forward_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click gets the user's EARLIEST view
    AT-OR-AFTER it (the look-ahead direction — next-quote matching,
    next-checkpoint attribution). Same union-and-window single-shuffle
    implementation, descending order. DuckDB's native ASOF is
    backward-only, so the oracle replays forward semantics by
    negating epoch micros (l.nts >= r.nts ⟺ r.ts >= l.ts, and the
    asof max over nts is the min over ts)."""
    from dpe_energy_performance_analysis_etl_spark.operators import asof_join

    ev = read_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("value").alias("click_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    return asof_join(
        clicks, views, on="user_id", right_payload=["view_value"],
        suffix="", direction="forward",
    )


# =====================================================================
# Round-5 wave: evaluation, forecasting, graph-embedding prep
# =====================================================================

@register(
    "roc_auc_by_priority",
    """
    WITH r AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             2 * rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice)
               + count(*) OVER (PARTITION BY o_orderpriority, o_totalprice) - 1 AS mr2
      FROM orders
    ), a AS (
      SELECT o_orderpriority,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(SUM(1 - y) AS BIGINT) AS n_neg,
             CAST(SUM(mr2 * y) AS BIGINT) AS r2
      FROM r GROUP BY 1
    )
    SELECT o_orderpriority, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
                     / CAST(2 * n_pos * n_neg AS DOUBLE) END AS auc
    FROM a
    """,
)
def roc_auc_by_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC (operators/stats.py roc_auc_exact) of
    o_totalprice as a separator of finished vs open orders, per
    priority class: Mann-Whitney midrank sums in BIGINT (one rank
    window + one aggregation per group — never the O(n²) pairwise
    definition), one final exact-integer division."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import roc_auc_exact

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return roc_auc_exact(
        orders.select(
            "o_orderpriority",
            (F.col("o_orderstatus") == "F").alias("is_final"),
            "o_totalprice",
        ),
        "is_final",
        "o_totalprice",
        by="o_orderpriority",
    )


@register(
    "seasonal_naive_mase",
    """
    WITH m AS (
      SELECT o_orderpriority, date_trunc('month', o_orderdate) AS mth,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
      FROM orders GROUP BY 1, 2
    ), lagd AS (
      SELECT o_orderpriority,
             abs(v - lag(v, 12) OVER (PARTITION BY o_orderpriority ORDER BY mth)) AS es,
             abs(v - lag(v, 1) OVER (PARTITION BY o_orderpriority ORDER BY mth)) AS en
      FROM m
    ), a AS (
      SELECT o_orderpriority,
             CAST(COUNT(es) AS BIGINT) AS n_eval,
             CAST(SUM(es) AS BIGINT) AS sae_seasonal,
             CAST(COUNT(en) AS BIGINT) AS nn,
             CAST(SUM(en) AS BIGINT) AS sae_naive
      FROM lagd GROUP BY 1
    )
    SELECT o_orderpriority, n_eval, sae_seasonal, sae_naive,
           CASE WHEN n_eval > 0 AND sae_naive > 0
                THEN CAST(sae_seasonal * nn AS DOUBLE)
                     / CAST(sae_naive * n_eval AS DOUBLE) END AS mase
    FROM a
    """,
)
def seasonal_naive_mase_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast + MASE (operators/temporal.py
    seasonal_naive_eval) over monthly revenue CENTS per priority:
    the no-model forecasting baseline, error sums exact BIGINT, MASE
    one division of integer products. Series are pre-aggregated to
    one row per (key, month) before the lag windows, so window state
    is bounded by series length, not raw row count."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        seasonal_naive_eval,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate")).alias("mth"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    return seasonal_naive_eval(
        monthly, "mth", "v", season=12, by="o_orderpriority"
    )


@register(
    "walk_skipgram_pairs",
    f"""
    WITH corpus AS MATERIALIZED (
      SELECT * FROM ({_walks_oracle(4, 2)}
      ) w
    )
    SELECT a.node AS center, b.node AS context,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM corpus a JOIN corpus b
      ON a.start = b.start AND a.walk = b.walk
     AND a.step != b.step AND abs(a.step - b.step) <= 2
    GROUP BY 1, 2
    """,
)
def walk_skipgram_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context, count) pairs from the
    deterministic walk corpus (operators/graph.py walk_skipgram_pairs
    — the DeepWalk step feeding SGNS embedding training): self-join
    on the walk id with |Δstep| ≤ 2, fan-out bounded at walk_len² per
    walk, walk table cached across both join sides."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        deterministic_random_walks,
        walk_skipgram_pairs,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    # symmetrize via ONE explode — the unionAll form re-ran the
    # orders x lineitem distinct once per branch (r12)
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    walks = deterministic_random_walks(edges, walk_len=4, walks_per_node=2)
    return walk_skipgram_pairs(walks, window=2)


@register(
    "t_closeness_customers",
    """
    WITH g AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_g FROM customer GROUP BY 1
    ), v AS (
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS c_v FROM customer GROUP BY 1
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer
    ), gv AS (
      SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS c_gv
      FROM customer GROUP BY 1, 2
    ), grid AS (
      SELECT g.c_nationkey, g.n_g, v.c_mktsegment, v.c_v,
             COALESCE(gv.c_gv, 0) AS c_gv, tot.n
      FROM g CROSS JOIN v CROSS JOIN tot
      LEFT JOIN gv ON gv.c_nationkey = g.c_nationkey
                  AND gv.c_mktsegment = v.c_mktsegment
    ), o AS (
      SELECT c_nationkey, n_g, n,
             CAST(SUM(abs(c_gv * n - c_v * n_g)) AS BIGINT) AS emd_num
      FROM grid GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, n_g AS group_size, emd_num,
           CAST(emd_num AS DOUBLE) / CAST(2 * n AS DOUBLE)
             / CAST(n_g AS DOUBLE) AS t_closeness,
           emd_num * 20 > 2 * n_g * n AS violates
    FROM o
    """,
)
def t_closeness_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (operators/quality.py t_closeness_audit, Li
    ICDE'07): per-nation market-segment distribution vs the global
    one, EMD-as-total-variation decided ENTIRELY in integer
    arithmetic (|c_gv·n − c_v·n_g| sums; threshold 1/20 compared
    cross-multiplied) — the privacy leak k-anonymity and l-diversity
    both miss. The group×value completion grid is a join of tiny
    aggregate tables, never a fact-table cross."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        t_closeness_audit,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return t_closeness_audit(
        cust, ["c_nationkey"], "c_mktsegment", t_num=1, t_den=20
    )


@register(
    "link_prediction_parts",
    """
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
      SELECT z, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1
    ), wedges AS (
      SELECT l.nbr AS u, r.nbr AS v, d.deg
      FROM adj l JOIN adj r ON l.z = r.z AND l.nbr < r.nbr
      JOIN deg d ON d.z = l.z
    ), scored AS (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
             CAST(SUM(1000000000 // deg) AS BIGINT) AS ra_scaled
      FROM wedges GROUP BY 1, 2
    ), non_edges AS (
      SELECT s.* FROM scored s ANTI JOIN e ON s.u = e.a AND s.v = e.b
    )
    SELECT ne.u, ne.v, ne.common_neighbors,
           CAST(du.deg * dv.deg AS BIGINT) AS preferential_attachment,
           ne.ra_scaled
    FROM non_edges ne
    JOIN deg du ON du.z = ne.u
    JOIN deg dv ON dv.z = ne.v
    WHERE ne.common_neighbors >= 2
    """,
)
def link_prediction_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction (operators/graph.py link_prediction_scores,
    Liben-Nowell CIKM'03) on the recurring-pair part graph: common
    neighbors / preferential attachment / integer-scaled resource
    allocation for every non-adjacent distance-2 pair with >= 2
    shared neighbors. Wedge join equi-keyed on the middle; RA sums
    are BIGINT floor divisions (no float accumulation)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        link_prediction_scores,
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
    return link_prediction_scores(pairs, min_common=2)


_RAKE_STOPS = "'the','a','an','and','or','of','to','in','is','on','for','with','at','by','from','as','it','this','that'"


@register(
    "rake_keywords_docs",
    f"""
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), pos AS (
      SELECT doc_id, unnest(range(1, len(t) + 1)) AS p, unnest(t) AS tok FROM tok
    ), tagged AS (
      SELECT doc_id, p, tok,
             tok IN ({_RAKE_STOPS}) AS stop,
             SUM(CASE WHEN tok IN ({_RAKE_STOPS}) THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY p) AS gid
      FROM pos
    ), ph AS MATERIALIZED (
      SELECT doc_id, gid, string_agg(tok, ' ' ORDER BY p) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS n_words
      FROM tagged WHERE NOT stop GROUP BY doc_id, gid
      HAVING COUNT(*) <= 4
    ), words AS (
      SELECT unnest(string_split(phrase, ' ')) AS word, n_words FROM ph
    ), stats AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(n_words) AS BIGINT) AS deg
      FROM words GROUP BY 1
    ), occ AS (
      SELECT phrase, n_words, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM ph GROUP BY 1, 2
    ), sw AS (
      SELECT phrase, n_words, n_occurrences,
             unnest(string_split(phrase, ' ')) AS word
      FROM occ
    )
    SELECT sw.phrase, sw.n_words, sw.n_occurrences,
           CAST(SUM((s.deg * 1000000) // s.freq) AS BIGINT) AS score_scaled
    FROM sw JOIN stats s ON s.word = sw.word
    GROUP BY 1, 2, 3
    """,
)
def rake_keywords_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (text/analysis.py rake_keywords, Rose
    2010): stopword-split candidate phrases, word degree/frequency
    stats, phrase score = Σ integer-scaled deg·10^6 div freq — an
    order-free BIGINT sum, no float accumulation. Phrase building is
    one doc-bounded window; scoring re-joins a broadcast word-stat
    table."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import rake_keywords

    return rake_keywords(read_documents(spark, sf_dir))


_CDC_SPANS_SQL = """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), whs AS (
      SELECT doc_id, t, len(t) AS n,
             list_transform(t, w -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(w, '.'), c -> CAST(ascii(c) AS BIGINT))),
                 (acc, c) -> (acc * 131 + c) % 2147483647)) AS wh
      FROM tok
    ), cuts AS (
      SELECT doc_id, t, n,
             list_filter(CASE WHEN n >= 4 THEN range(3, n) ELSE [] END,
               p -> (  (wh[p + 1] * 1 % 2147483647)
                     + (wh[p] * 131 % 2147483647)
                     + (wh[p - 1] * 17161 % 2147483647)
                     + (wh[p - 2] * 2248091 % 2147483647)
                    ) % 2147483647 % 16 = 0) AS cut
      FROM whs
    ), ends_t AS (
      SELECT doc_id, t, n,
             CASE WHEN n = 0 THEN []
                  WHEN len(cut) > 0 AND cut[-1] = n - 1 THEN cut
                  ELSE list_append(cut, n - 1) END AS ends
      FROM cuts
    ), se AS MATERIALIZED (
      SELECT doc_id, t,
             list_prepend(0, list_transform(ends[1:len(ends)-1], e -> e + 1)) AS starts,
             ends
      FROM ends_t WHERE n > 0
    ), chunks AS (
      SELECT doc_id, t, starts, ends, unnest(range(1, len(ends) + 1)) AS ci
      FROM se
    ), spans AS (
      SELECT doc_id, CAST(ci - 1 AS BIGINT) AS chunk_idx,
             CAST(starts[ci] AS BIGINT) AS start_tok,
             CAST(ends[ci] - starts[ci] + 1 AS BIGINT) AS n_tokens,
             md5(array_to_string(t[starts[ci]+1 : ends[ci]+1], ' ')) AS chunk_md5
      FROM chunks
    )"""


@register(
    "cdc_chunk_spans",
    _CDC_SPANS_SQL
    + """
    SELECT doc_id, chunk_idx, start_tok, n_tokens, chunk_md5 FROM spans
    """,
)
def cdc_chunk_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (text/chunking.py cdc_chunks, the
    LBFS/rsync primitive at word granularity): boundaries where the
    trailing-4-token rolling hash ≡ 0 mod 16, so chunk identity
    survives insertions/deletions outside the edit — all row-local
    array arithmetic (zero shuffle), Mersenne-2^31 modulus keeps
    every product int64-safe under ANSI."""
    from dpe_energy_performance_analysis_etl_spark.text.chunking import cdc_chunks

    return cdc_chunks(read_documents(spark, sf_dir))


@register(
    "cdc_chunk_dedup",
    _CDC_SPANS_SQL
    + """
    SELECT chunk_md5, n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM spans GROUP BY 1, 2
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def cdc_chunk_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated CDC chunks (text/chunking.py
    cdc_chunk_dedup): shared boilerplate collapses to equal md5 keys,
    found by ONE hash groupBy over the chunk table — sub-document
    dedup at exact-dedup cost, no pair enumeration."""
    from dpe_energy_performance_analysis_etl_spark.text.chunking import cdc_chunk_dedup

    return cdc_chunk_dedup(read_documents(spark, sf_dir))


@register(
    "record_linkage_fs",
    """
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
    ), cand AS (
      SELECT l.c_custkey AS left_id, r.c_custkey AS right_id,
             (l.name = r.name) AS a1, (l.seg = r.seg) AS a2,
             (CAST(floor(l.bal * 100 + 0.5) AS BIGINT) // 100000
              = CAST(floor(r.bal * 100 + 0.5) AS BIGINT) // 100000) AS a3
      FROM l JOIN r ON l.c_nationkey = r.c_nationkey
                   AND l.name[-3:] = r.name[-3:]
    ), scored AS (
      SELECT left_id, right_id,
             CAST(CASE WHEN a1 THEN 40 ELSE -10 END
                + CASE WHEN a2 THEN 10 ELSE -8 END
                + CASE WHEN a3 THEN 20 ELSE -6 END AS BIGINT) AS score,
             CAST(CAST(a1 AS INT) + CAST(a2 AS INT) + CAST(a3 AS INT) AS BIGINT) AS n_agree
      FROM cand
    )
    SELECT left_id, right_id, score, n_agree,
           CASE WHEN score >= 50 THEN 'match'
                WHEN score < 0 THEN 'non_match'
                ELSE 'possible' END AS link_class
    FROM scored
    """,
)
def record_linkage_fs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (operators/entity.py
    fellegi_sunter_link, FS JASA'69): customers linked to a
    deterministically perturbed copy (1/7 corrupted names, 1/5 masked
    segments, 1/3 shifted balances) — blocked on (nation, name digit
    tail) so candidates stay equi-keyed, scored by integer log-odds
    weights (name 40/-10, segment 10/-8, $1000-balance-bucket 20/-6),
    classified at the 50/0 thresholds."""
    from dpe_energy_performance_analysis_etl_spark.operators.entity import (
        fellegi_sunter_link,
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
        "c_custkey",
        F.col("c_name").alias("name"),
        "c_nationkey",
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    bucket = F.expr("floor(bal * 100 + 0.5) div 100000")
    return fellegi_sunter_link(
        left,
        right,
        block_cols=[
            (F.col("c_nationkey"), F.col("c_nationkey")),
            (F.substring("name", -3, 3), F.substring("name", -3, 3)),
        ],
        comparisons=[
            ("name", F.col("name"), F.col("name"), 40, -10),
            ("segment", F.col("seg"), F.col("seg"), 10, -8),
            ("balance_bucket", bucket, bucket, 20, -6),
        ],
        left_id="c_custkey",
        right_id="c_custkey",
        upper=50,
        lower=0,
    )


def _bfs_oracle(n_landmarks: int, max_depth: int) -> str:
    blocks = [
        f"""
    WITH co AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ), e AS MATERIALIZED (
      SELECT a, b FROM co WHERE n >= 2
    ), adj AS MATERIALIZED (
      SELECT a AS z, b AS nbr FROM e UNION ALL SELECT b AS z, a AS nbr FROM e
    ), lm AS MATERIALIZED (
      SELECT z AS landmark FROM (SELECT DISTINCT z FROM adj ORDER BY z LIMIT {n_landmarks})
    ), d0 AS MATERIALIZED (
      SELECT landmark, landmark AS node, 0 AS dist FROM lm
    )"""
    ]
    for r in range(1, max_depth + 1):
        blocks.append(
            f""", d{r} AS MATERIALIZED (
      SELECT * FROM d{r - 1}
      UNION ALL
      SELECT DISTINCT f.landmark, a.nbr AS node, {r} AS dist
      FROM d{r - 1} f JOIN adj a ON a.z = f.node
      WHERE f.dist = {r - 1}
        AND NOT EXISTS (SELECT 1 FROM d{r - 1} v
                        WHERE v.landmark = f.landmark AND v.node = a.nbr)
    )"""
        )
    blocks.append(
        f"""
    SELECT landmark, node, CAST(dist AS BIGINT) AS dist FROM d{max_depth}
    """
    )
    return "".join(blocks)


@register("landmark_bfs_parts", _bfs_oracle(4, 4))
def landmark_bfs_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source landmark BFS (operators/graph.py
    landmark_bfs_distances, Potamias CIKM'09) on the recurring-pair
    part graph: exact hop distances from the 4 smallest node ids out
    to 4 hops — frontier⋈adjacency + visited anti-join per round, all
    landmarks advancing in one pass, per-round re-cache with bounded
    lineage. The shortest-path family the graph suite lacked."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        landmark_bfs_distances,
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
    return landmark_bfs_distances(pairs, n_landmarks=4, max_depth=4)


@register(
    "pass_at_k_customers",
    """
    WITH a AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_samples,
             CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_success
      FROM orders GROUP BY 1
    )
    SELECT o_custkey, n_samples, n_success,
           CASE WHEN n_samples >= 3 THEN
             CASE WHEN n_samples - n_success >= 3 THEN
               CAST(n_samples * (n_samples - 1) * (n_samples - 2)
                    - (n_samples - n_success) * (n_samples - n_success - 1)
                      * (n_samples - n_success - 2) AS DOUBLE)
               / CAST(n_samples * (n_samples - 1) * (n_samples - 2) AS DOUBLE)
             ELSE 1.0e0 END
           END AS pass_at_k
    FROM a
    """,
)
def pass_at_k_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k estimator (operators/stats.py pass_at_k, Chen
    2021 eq. 1) with k=3 over per-customer order outcomes: falling-
    factorial products in BIGINT, one exact-integer division — the
    LLM sampling-eval metric in its hash-stable form."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import pass_at_k

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", (F.col("o_orderstatus") == "F").alias("ok")
    )
    return pass_at_k(orders, "o_custkey", "ok", k=3)


@register(
    "hll_distinct_orders",
    """
    WITH items AS (
      SELECT l_returnflag, rpad(CAST(l_orderkey AS VARCHAR), 16, '#') AS s
      FROM lineitem
    ), h AS (
      SELECT l_returnflag,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(regexp_extract_all(s, '.'),
                               c -> CAST(ascii(c) AS BIGINT))),
                (acc, c) -> (acc * 131 + c) % 2147483647) AS h0
      FROM items
    ), mx AS (
      SELECT l_returnflag, xor(s1, s1 >> 16) AS h32 FROM (
        SELECT l_returnflag,
               (xor(h0, h0 >> 16) * 73244475) % 4294967296 AS s1
        FROM h)
    ), br AS (
      SELECT l_returnflag, h32 % 64 AS b,
             CASE WHEN h32 // 64 = 0 THEN 27
                  ELSE 27 - length(bin(h32 // 64)) END AS rho
      FROM mx
    ), regs AS (
      SELECT l_returnflag, b, MAX(rho) AS mreg FROM br GROUP BY 1, 2
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_buckets_hit,
           CAST(SUM(1 << (27 - mreg)) AS BIGINT) AS register_sum_x2p,
           (7.0937e-1 * 4096) /
             (SUM(1.0e0 / CAST(1 << mreg AS DOUBLE))
              + CAST(64 - COUNT(*) AS DOUBLE)) AS hll_estimate
    FROM regs GROUP BY 1
    """,
)
def hll_distinct_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog (operators/sketch.py hll_portable,
    Flajolet'07) distinct orders per returnflag — the oracle-checked
    twin of the rows-only ``approx_distinct`` (engine sketch bytes):
    char-fold hash → 32-bit finalizer, 64 registers, ranks via
    length(bin(w)) (no libm log), 2^-M as exact dyadic doubles so the
    register sum is order-free exact; one multiply + one divide."""
    from dpe_energy_performance_analysis_etl_spark.operators.sketch import hll_portable

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return hll_portable(li, "l_orderkey", by="l_returnflag")


def _bellman_oracle(n_sources: int, rounds: int) -> str:
    blocks = [
        f"""
    WITH co AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ), ew AS MATERIALIZED (
      SELECT a AS u, b AS v, CAST(n AS BIGINT) AS w FROM co WHERE n >= 2
      UNION ALL
      SELECT b AS u, a AS v, CAST(n AS BIGINT) AS w FROM co WHERE n >= 2
    ), srcs AS MATERIALIZED (
      SELECT node AS source FROM (
        SELECT DISTINCT u AS node FROM ew ORDER BY node LIMIT {n_sources})
    ), d0 AS MATERIALIZED (
      SELECT source, source AS node, CAST(0 AS BIGINT) AS dist FROM srcs
    )"""
    ]
    for r in range(1, rounds + 1):
        blocks.append(
            f""", d{r} AS MATERIALIZED (
      SELECT source, node, MIN(dist) AS dist FROM (
        SELECT * FROM d{r - 1}
        UNION ALL
        SELECT d.source, e.v AS node, d.dist + e.w AS dist
        FROM d{r - 1} d JOIN ew e ON e.u = d.node
      ) GROUP BY 1, 2
    )"""
        )
    blocks.append(f"\n    SELECT source, node, dist FROM d{rounds}\n    ")
    return "".join(blocks)


@register("bellman_ford_parts", _bellman_oracle(4, 4))
def bellman_ford_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-source Bellman-Ford (operators/graph.py
    bounded_bellman_ford) on the recurring-pair part graph with the
    co-occurrence support as the integer edge weight: cheapest
    ≤4-hop cost from the 4 smallest nodes — per round ONE
    frontier-keyed join + one (source, node) MIN aggregation,
    BIGINT-exact distances, unrolled-CTE oracle replay."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        bounded_bellman_ford,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        cooccurrence_pairs,
    )

    # basket-array pair build (r12, see cooccurrence_pairs);
    # symmetrize via ONE explode — the unionAll-of-selects form
    # re-ran the uncached pair aggregation once per branch
    co = cooccurrence_pairs(
        li.select("l_orderkey", "l_partkey"), "l_orderkey", "l_partkey"
    )
    edges = co.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src"), F.col("dst"), F.col("n").alias("w")
                ),
                F.struct(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    F.col("n").alias("w"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.w")
    return bounded_bellman_ford(edges, n_sources=4, rounds=4)


def _coverage_oracle(k: int) -> str:
    blocks = [
        """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), p AS MATERIALIZED (
      SELECT DISTINCT doc_id AS id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS item
      FROM tok WHERE len(t) >= 3
    ), cov0 AS MATERIALIZED (
      SELECT item FROM p WHERE 1 = 0
    ), picked0 AS MATERIALIZED (
      SELECT id FROM p WHERE 1 = 0
    )"""
    ]
    for r in range(1, k + 1):
        blocks.append(
            f""", pick{r} AS MATERIALIZED (
      SELECT {r} AS round, id, CAST(COUNT(*) AS BIGINT) AS gain
      FROM p ANTI JOIN cov{r - 1} USING (item)
      WHERE id NOT IN (SELECT id FROM picked{r - 1})
      GROUP BY id
      ORDER BY gain DESC, id LIMIT 1
    ), cov{r} AS MATERIALIZED (
      SELECT item FROM cov{r - 1}
      UNION
      SELECT item FROM p JOIN pick{r} USING (id)
    ), picked{r} AS MATERIALIZED (
      SELECT id FROM picked{r - 1} UNION SELECT id FROM pick{r}
    )"""
        )
    union = "\n      UNION ALL\n      ".join(
        f"SELECT CAST(round AS BIGINT) AS round, id AS doc_id, gain FROM pick{r} WHERE gain > 0"
        for r in range(1, k + 1)
    )
    blocks.append(f"\n    {union}\n    ")
    return "".join(blocks)


@register("coverage_select_docs", _coverage_oracle(5))
def coverage_select_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage selection of 5 exemplar documents by
    distinct word-3-gram coverage (text/curation.py
    greedy_max_coverage — the (1-1/e) submodular greedy behind
    coverage-driven training-data subset selection): per round one
    anti-join + per-doc count + a 1-row argmax pull; covered set
    checkpointed per round; unrolled-CTE oracle replays every pick."""
    from dpe_energy_performance_analysis_etl_spark.text.curation import greedy_max_coverage
    from dpe_energy_performance_analysis_etl_spark.text.analysis import ngrams_expr

    docs = read_documents(spark, sf_dir)
    pairs = docs.select(
        "doc_id", F.explode(ngrams_expr("text", 3)).alias("item")
    )
    return greedy_max_coverage(pairs, k=5)


@register(
    "vocab_growth_docs",
    """
    WITH mx AS (
      SELECT CAST(MAX(doc_id) AS BIGINT) // 20 + 1 AS width FROM documents
    ), tok AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS term
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
            FROM documents) WHERE len(t) >= 3
    ), first AS (
      SELECT term, MIN(doc_id) AS first_doc FROM tok GROUP BY 1
    ), pb AS (
      SELECT CAST(first_doc // mx.width AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_new_terms,
             CAST(ANY_VALUE(mx.width) AS BIGINT) AS width
      FROM first, mx GROUP BY 1
    )
    SELECT bucket, CAST(bucket * width AS BIGINT) AS bucket_start_doc,
           n_new_terms,
           CAST(SUM(n_new_terms) OVER (ORDER BY bucket) AS BIGINT) AS vocab_cum
    FROM pb
    """,
)
def vocab_growth_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth (text/analysis.py vocab_growth):
    first occurrence per term = one term-keyed min aggregation over
    word 3-grams (the synthetic unigram vocabulary saturates in the
    first bucket); curve buckets into 20 doc-id ranges so the running
    total windows over ≤ 20 rows — never a global per-document
    window."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import vocab_growth

    return vocab_growth(read_documents(spark, sf_dir), n_buckets=20, ngram_n=3)
