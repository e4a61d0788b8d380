"""Scalar quantization (SQ8) for embedding search: each float
coordinate compresses to an int8-range integer, dot products become
small exact integers, and the index shrinks 4x vs float32 — the
cheapest ANN compression tier below PQ (`pq.py`), and the one
production vector stores reach for first.

Portability: the quantizer is floor(x * 128) clamped to [-127, 127]
— a DYADIC scale, so the multiply is exact in binary floating point
and the floor is engine-exact (the `_int_vec` recipe from
operators/ml.py); quantized dot products are sums of |q| <= 127
int64 terms, order-free exact. Recall against the float brute-force
top-k is therefore a deterministic, oracle-checkable quantity — the
quality gate a quantized index must pass before deployment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

SQ8_SCALE = 128  # dyadic: x*128 exact in fp, floor engine-exact


def sq8_quantize(vec: Column) -> Column:
    """float array -> int8-range BIGINT array (floor(x*128), clamped)."""
    return F.transform(
        vec,
        lambda x: F.greatest(
            F.least(
                F.floor(x.cast("double") * F.lit(float(SQ8_SCALE))).cast("bigint"),
                F.lit(127).cast("bigint"),
            ),
            F.lit(-127).cast("bigint"),
        ),
    )


def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k neighbors by QUANTIZED dot product (ties -> smaller
    neighbor id). Same plan shape as the float brute-force baseline:
    broadcast the query side, one corpus scan, per-query window
    top-k — the quantization changes arithmetic, not the plan.

    Returns (query_id, neighbor_id, qscore, rank).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), sq8_quantize(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), sq8_quantize(F.col(vec_col)).alias("qv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _int_dot(F.col("qv"), F.col("cv")).alias("qscore"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qscore").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "qscore", F.col("rank").cast("bigint").alias("rank"))
    )
