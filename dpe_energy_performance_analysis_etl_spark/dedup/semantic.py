"""SemDeDup-style semantic deduplication: cluster the embedding
space with a coarse quantizer, then remove near-duplicates WITHIN
each cluster (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication").

Why this shape at 100 TB: all-pairs cosine over n documents is
O(n²) and unshardable; clustering first bounds the pairwise work to
O(Σ m_c²) over cluster sizes m_c — with k clusters sized n/k, that is
n²/k, and k scales with the corpus (FAISS-style: k ≈ n/5000 keeps the
per-cluster quadratic term constant). Every step here is an
equi-join/aggregate on the cluster id, so the shuffle is keyed and
bounded like the MinHash/SimHash paths (``dedup/minhash.py``) — the
same candidate-generation discipline, but in embedding space, which
catches paraphrase-level duplicates that shingle hashing cannot.

Pipeline:
  1. assign: argmax-cosine against a broadcast centroid table
     (seeded deterministic centroids by default — bit-reproducible
     and oracle-replayable, same contract as ``seeded_ivf_topk``; or
     pass centroids trained by ``similarity.ivf.train_ivf_centroids``).
  2. pair: per-cluster self-join (lower-id side < higher-id side),
     keep pairs with cosine ≥ threshold.
  3. resolve: a vector is REMOVED iff some lower-id member of its
     cluster sits within the threshold — the deterministic
     keep-lowest-id representative rule (the paper keeps one point
     per duplicate set; low-id is the reproducible choice, matching
     ``dedup_keep_first``).

Output is one row per input vector — (id, cluster, kept,
dup_cosine) — so callers either filter ``kept`` or audit what was
dropped and why.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dpe_energy_performance_analysis_etl_spark.dedup.embedding import (
    dot_double,
    norm2_double,
)


def seeded_centroids(
    vectors: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse quantizer: the raw vectors with
    ``id < n_clusters`` act as centroids — a pure function of the
    input, replayable in portable SQL (the ``seeded_ivf_topk``
    convention). Production path: swap in k-means centroids from
    ``similarity.ivf.train_ivf_centroids`` (same schema)."""
    return vectors.filter(F.col(id_col) < n_clusters).select(
        F.col(id_col).alias("cluster"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("centnorm"),
    )


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, v, nrm, cluster): argmax cosine against the broadcast
    centroid table via a partial-aggregating ``max(struct)`` —
    (cosine, -cluster) orders exactly like the oracle's
    (cosine DESC, cluster) row_number, and no per-vector window sort
    is needed."""
    c = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("nrm"),
    )
    cos = dot_double(F.col("v"), F.col("centroid")) / (
        F.col("nrm") * F.col("centnorm")
    )
    return (
        c.crossJoin(F.broadcast(centroids))
        .groupBy("id")
        .agg(
            (
                -F.max(F.struct(cos.alias("s"), (-F.col("cluster")).alias("nc")))
                .getField("nc")
            ).alias("cluster"),
            F.first("v").alias("v"),
            F.first("nrm").alias("nrm"),
        )
    )


def semantic_dedup(
    vectors: DataFrame,
    n_clusters: int | None = 8,
    threshold: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    target_cluster_size: int | None = None,
    auto_train_threshold: int = 1_000_000,
    train_sample_size: int = 65_536,
) -> DataFrame:
    """One row per input vector: (id, cluster, kept, dup_cosine).
    ``kept`` is false iff a LOWER-id vector in the same cluster has
    cosine ≥ threshold; ``dup_cosine`` is the strongest such match
    (null for survivors). The within-cluster self-join is the only
    super-linear step and its volume is Σ m_c² — size ``n_clusters``
    so average cluster size stays in the thousands (the SemDeDup /
    FAISS operating point), and the join itself is a plain
    cluster-keyed shuffle that AQE skew-splits if one cluster runs
    hot.

    ``n_clusters`` must GROW with the corpus — a pinned k turns m_c
    into n/k and the pair stage quadratic again (measured: 10× the
    vectors at fixed k=8 cost 18× the time; at k=10×8 it cost ~1.3×).
    Pass ``target_cluster_size`` to derive k = ⌈n / size⌉ from a
    count (one cheap action) instead of hand-picking.

    Above ``auto_train_threshold`` rows (default 10⁶ — where the
    seeded quantizer's n·k = n²/size assignment cosines stop being
    affordable relative to real k-means quality), centroids are
    trained AUTOMATICALLY by Lloyd iterations on a deterministic
    hash-sample of ~``train_sample_size`` vectors
    (``similarity.ivf.train_ivf_centroids``) — training cost is
    bounded by the sample, not the corpus, and the sample is a pure
    function of the ids (replayable). The seeded path remains the
    sub-threshold default and the oracle twin. (Past ~10⁵ centroids
    the broadcast argmax itself needs a two-level coarse/fine
    quantizer — out of scope here; documented, not silently hit,
    since k = n/size reaches 10⁵ only past 5·10⁸ vectors.)"""
    n: int | None = None
    if target_cluster_size is not None:
        n = vectors.count()
        n_clusters = max(2, -(-n // target_cluster_size))
    cents = centroids
    if cents is None:
        if n is None:
            n = vectors.count()
        if n > auto_train_threshold:
            from dpe_energy_performance_analysis_etl_spark.similarity.ivf import (
                train_ivf_centroids,
            )

            denom = max(1, n // train_sample_size)
            sample = vectors.filter(
                F.pmod(
                    F.xxhash64(F.col(id_col).cast("string")), F.lit(denom)
                )
                == 0
            )
            cents = train_ivf_centroids(
                sample, k=n_clusters, iterations=2, vec_col=vec_col, id_col=id_col
            ).select(
                "cluster",
                "centroid",
                F.sqrt(norm2_double(F.col("centroid"))).alias("centnorm"),
            )
        else:
            cents = seeded_centroids(vectors, n_clusters, id_col, vec_col)
    # assignment feeds three consumers (both pair sides + the final
    # join) — uncached, each re-runs the broadcast-argmax over the
    # corpus (plan audit: 18 static exchanges, 3x the scan)
    assigned = assign_clusters(vectors, cents, id_col, vec_col).cache()

    lo = assigned.select(
        F.col("cluster"),
        F.col("id").alias("lo_id"),
        F.col("v").alias("lo_v"),
        F.col("nrm").alias("lo_nrm"),
    )
    hi = assigned.select(
        F.col("cluster"),
        F.col("id").alias("hi_id"),
        F.col("v").alias("hi_v"),
        F.col("nrm").alias("hi_nrm"),
    )
    pair_cos = dot_double(F.col("lo_v"), F.col("hi_v")) / (
        F.col("lo_nrm") * F.col("hi_nrm")
    )
    dominated = (
        lo.join(hi, on="cluster")
        .where(F.col("lo_id") < F.col("hi_id"))
        .withColumn("cos", pair_cos)
        .where(F.col("cos") >= threshold)
        .groupBy(F.col("hi_id").alias("id"))
        .agg(F.max("cos").alias("dup_cosine"))
    )
    return (
        assigned.join(dominated, on="id", how="left")
        .select(
            "id",
            "cluster",
            F.col("dup_cosine").isNull().alias("kept"),
            "dup_cosine",
        )
    )
