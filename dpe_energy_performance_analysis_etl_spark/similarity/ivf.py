"""IVF (inverted-file) approximate nearest neighbor: k-means coarse
quantizer + cluster-probed search — the classic alternative to LSH
bucketing (``ann.py``) when the corpus has cluster structure.

Everything is DataFrame ops:
  - training is Lloyd's algorithm with a deterministic seed set
    (smallest xxhash64(vec_id) order), assignment via ``min_by`` over
    a broadcast centroid table, centroid update via posexplode +
    EXACT decimal-mean per (cluster, dim) — exact sums make training
    runs bit-reproducible regardless of partition order;
  - the index is just (vec_id, cluster) — O(n) rows;
  - a query probes its ``nprobe`` nearest centroids and scores only
    those clusters: candidate volume ≈ nprobe/k of the corpus.

At 100 TB: train on a sample, broadcast the k×dim centroid table
(tiny), and the per-query work is an equi-join on cluster id —
shuffle-bounded like every other operator in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dpe_energy_performance_analysis_etl_spark.dedup.embedding import dot_double, norm2_double


def _sq_dist(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def train_ivf_centroids(
    df: DataFrame,
    k: int = 16,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd's k-means; returns (cluster, centroid array<double>)."""
    vecs = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # top-k + driver merge of k rows — no global sort of the corpus);
    # the unpartitioned row_number then numbers only these k seed rows,
    # so the single-partition WindowExec warning it triggers is benign.
    seeds = (
        vecs.orderBy(F.xxhash64(F.col("vid").cast("string")))
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(F.xxhash64(F.col("vid").cast("string")))).alias("cluster"),
            F.transform("v", lambda x: x.cast("double")).alias("centroid"),
        )
    )
    cents = seeds
    for _ in range(iterations):
        assigned = (
            vecs.crossJoin(F.broadcast(cents))
            .groupBy("vid")
            .agg(
                F.min_by("cluster", _sq_dist(F.col("v"), F.col("centroid"))).alias("cluster"),
                F.first("v").alias("v"),
            )
        )
        # exact decimal mean per (cluster, dim): reproducible centroids
        elems = assigned.select(
            "cluster", F.posexplode(F.col("v")).alias("pos", "val")
        )
        cents = (
            elems.groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(30,10)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate cosine top-k via IVF: probe the ``nprobe`` nearest
    clusters per query, score only their members."""
    cents = train_ivf_centroids(corpus, n_clusters, iterations, vec_col, id_col).cache()
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("cnorm"),
    )
    indexed = (
        c.crossJoin(F.broadcast(cents))
        .groupBy("neighbor_id")
        .agg(
            F.min_by("cluster", _sq_dist(F.col("cvec"), F.col("centroid"))).alias("cluster"),
            F.first("cvec").alias("cvec"),
            F.first("cnorm").alias("cnorm"),
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("qnorm"),
    )
    wq = Window.partitionBy("query_id").orderBy("dist", "cluster")
    probed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("dist", _sq_dist(F.col("qvec"), F.col("centroid")))
        .withColumn("cr", F.row_number().over(wq))
        .filter(F.col("cr") <= nprobe)
        .select("query_id", "qvec", "qnorm", "cluster")
    )
    scored = (
        indexed.join(F.broadcast(probed), on="cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", dot_double(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def seeded_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic IVF: centroids are the raw vectors with
    ``id < n_clusters`` (no Lloyd iterations), assignment and probing
    by cosine with (cosine DESC, cluster) tie-break. Every step is a
    pure function of the input — replayable bit-exactly in portable
    SQL, making this the oracle-checked correctness twin of
    ``ivf_topk`` (whose k-means training is Spark-specific). The plan
    shape is identical: broadcast centroids, argmax assignment,
    cluster-probed candidate join, windowed top-k."""
    cents = corpus.filter(F.col(id_col) < n_clusters).select(
        F.col(id_col).alias("cluster"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("centnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("cnorm"),
    )
    # argmax via partial-aggregating max(struct): (cosine, -cluster)
    # orders identically to the oracle's (cosine DESC, cluster)
    # row_number — no per-vector window sort needed.
    ccos = dot_double(F.col("cvec"), F.col("centroid")) / (F.col("cnorm") * F.col("centnorm"))
    indexed = (
        c.crossJoin(F.broadcast(cents))
        .groupBy("neighbor_id")
        .agg(
            (-F.max(F.struct(ccos.alias("s"), (-F.col("cluster")).alias("nc"))).getField("nc")).alias("cluster"),
            F.first("cvec").alias("cvec"),
            F.first("cnorm").alias("cnorm"),
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("qnorm"),
    )
    qcos = dot_double(F.col("qvec"), F.col("centroid")) / (F.col("qnorm") * F.col("centnorm"))
    wq = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), "cluster")
    probed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("qcos", qcos)
        .withColumn("qr", F.row_number().over(wq))
        .filter(F.col("qr") <= nprobe)
        .select("query_id", "qvec", "qnorm", "cluster")
    )
    scored = (
        indexed.join(F.broadcast(probed), on="cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", dot_double(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
