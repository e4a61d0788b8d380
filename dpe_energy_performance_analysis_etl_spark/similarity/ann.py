"""Similarity search over embedding columns.

``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
set against the corpus; one pass over the corpus per batch of queries,
top-k via window. This is the oracle-checkable baseline and is also
the right plan whenever |queries| is small: the corpus never shuffles.

``hyperplane_lsh_buckets`` / ``lsh_topk`` — the scale path: random-
hyperplane (sign) LSH with ``num_tables`` independent tables of
``num_planes`` planes each; candidates are the union of same-bucket
pairs across tables (multi-table is what makes recall usable: one
table of 8 planes has P[all planes agree] ≈ 0.025 for a 0.4-cosine
neighbor — measured ZERO recall; 12 tables × 4 planes ≈ 0.87).
The hyperplanes are a deterministic ±1 matrix derived from a seeded
generator and baked into the plan as literals, so bucket ids are
reproducible across runs and engines. Tune planes ↑ as corpus grows
(selectivity) and tables ↑ for recall; tests measure recall against
brute force.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window, functions as F

from dpe_energy_performance_analysis_etl_spark.dedup.embedding import dot_double, norm2_double


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k neighbors (excluding self) for each query
    vector. Queries are broadcast; the corpus is scanned once."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("cnorm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("qnorm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot_double(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_signs(num_planes: int, dim: int, seed: int = 7) -> list[list[int]]:
    rng = random.Random(seed)
    return [[1 if rng.random() < 0.5 else -1 for _ in range(dim)] for _ in range(num_planes)]


def _bucket_expr(planes: list[list[int]], vec_col: str) -> Column:
    """Bucket id for one table: bit p = [dot(vec, plane_p) > 0]; the
    ±1 plane matrix is constant-folded into the projection."""

    def plane_bit(p: int) -> Column:
        signed = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(s)) for s in planes[p]]),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(signed > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )

    bucket = plane_bit(0)
    for p in range(1, len(planes)):
        bucket = bucket.bitwiseOR(plane_bit(p))
    return bucket


def hyperplane_lsh_buckets(
    df: DataFrame,
    dim: int,
    num_planes: int = 12,
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Add a ``bucket`` column for a single LSH table."""
    return df.withColumn(
        "bucket", _bucket_expr(_plane_signs(num_planes, dim, seed), vec_col)
    )


def _multi_table_buckets(
    df: DataFrame,
    dim: int,
    num_tables: int,
    num_planes: int,
    vec_col: str,
    seed: int,
) -> DataFrame:
    """Explode each row into (table, bucket) pairs — one bucket per
    LSH table, each table's planes independently seeded. All L bucket
    ids are computed in ONE pass and posexploded: the previous
    union-of-L-branches formulation rescanned the input L times (the
    round-3 plan audit flagged 24 scan branches at L=12); this is one
    scan, one explode, zero extra exchanges — at 100 TB that is the
    difference between reading the corpus once and twelve times."""
    pairs = [
        F.struct(
            F.lit(t).alias("table"),
            _bucket_expr(
                _plane_signs(num_planes, dim, seed + 1000 * t), vec_col
            ).alias("tbucket"),
        )
        for t in range(num_tables)
    ]
    return df.withColumn("__tb", F.explode(F.array(*pairs))).select(
        *df.columns,
        F.col("__tb.table").alias("table"),
        F.col("__tb.tbucket").alias("tbucket"),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 4,
    num_tables: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates limited to vectors sharing an LSH
    bucket with the query in ≥1 of ``num_tables`` tables (equi-join on
    (table, bucket) — shuffle volume O(n·L), never O(n²))."""
    c = _multi_table_buckets(corpus, dim, num_tables, num_planes, vec_col, seed).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("cnorm"),
        "table",
        "tbucket",
    )
    q = _multi_table_buckets(queries, dim, num_tables, num_planes, vec_col, seed).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("qnorm"),
        "table",
        "tbucket",
    )
    candidates = (
        c.join(F.broadcast(q), on=["table", "tbucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qvec", "qnorm", "cvec", "cnorm")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.withColumn(
        "cosine", dot_double(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
    ).select("query_id", "neighbor_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive / retrieval training: for
    each query vector, the top-k most-similar corpus vectors with a
    DIFFERENT label (the negatives closest to the decision boundary —
    the ones worth training on).

    Same plan shape as ``brute_force_topk``: the (small) query set is
    broadcast with its labels, the corpus streams past it once, never
    shuffling; per-query top-k via window over the scored pairs. The
    label inequality rides the broadcast join condition, so mismatched
    pairs are dropped before any scoring fan-out materializes. At
    corpus scale the same label-aware scoring rides the LSH/IVF
    candidate generators instead of the cross score.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neg_label"),
        F.col(vec_col).alias("cvec"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("cnorm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("qvec"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("qnorm"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("query_label") != F.col("neg_label")),
        )
        .withColumn(
            "cosine",
            dot_double(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")),
        )
        .select("query_id", "query_label", "neighbor_id", "neg_label", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "query_label", "neighbor_id", "neg_label", "cosine", "rank")
    )
