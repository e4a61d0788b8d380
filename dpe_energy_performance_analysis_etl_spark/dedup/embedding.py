"""Embedding-cosine near-duplicate detection.

Exact variant: all-pairs cosine ≥ threshold via cross self-join —
quadratic, the correctness baseline. Scale variant: pre-bucket with
random-hyperplane LSH (``similarity/ann.py``) and compare only within
buckets.

Float determinism: dot products accumulate left-to-right in double
(``F.aggregate``), which matches DuckDB's ``list_dot_product`` on
DOUBLE[] bit-for-bit — this is what makes the oracle check exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dot_double(a: Column, b: Column) -> Column:
    """Sequential-double dot product of two float array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2_double(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot_double(a, b) / (F.sqrt(norm2_double(a)) * F.sqrt(norm2_double(b)))


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact all-pairs cosine near-dups (doc_a < doc_b). Norms are
    precomputed once per row (projection), so the join computes only
    the dot product per pair."""
    base = df.select(
        F.col(id_col).alias("doc"),
        F.col(vec_col).alias("vec"),
        F.sqrt(norm2_double(F.col(vec_col))).alias("norm"),
    )
    a = base.alias("a")
    b = base.alias("b")
    return (
        a.join(b, F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            (dot_double(F.col("a.vec"), F.col("b.vec")) / (F.col("a.norm") * F.col("b.norm"))).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
    )
