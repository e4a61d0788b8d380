"""Word-shingle construction and exact n-gram Jaccard similarity.

``shingle_pairs_jaccard`` is the EXACT baseline (and the oracle-checked
one): explode distinct shingles, self-join on shingle equality,
count intersections, Jaccard from per-doc set sizes. Cost is
O(sum of postings^2 per shingle) — fine when shingles are selective
(word 3-grams are), quadratic-blowup-prone when they aren't; the
MinHash LSH path (``minhash.py``) is the approximate scale-out that
bounds candidate generation regardless of skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dpe_energy_performance_analysis_etl_spark.operators.scaling import scan_fanout

from dpe_energy_performance_analysis_etl_spark.text import tokens_expr


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the lowercased text."""
    toks = tokens_expr(col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)])
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_pairs_jaccard(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    fanout: int | None = None,
    hash_shingle_key: bool = True,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold.

    Plan: posting list (id, shingle) → self-equi-join on shingle
    (this is the only shuffle; Catalyst hashes on the shingle) →
    per-pair intersection counts → join tiny per-doc size table →
    filter. Returns (doc_a, doc_b, n_common, jaccard), doc_a < doc_b.

    ``hash_shingle_key`` (default) replaces the shingle string with
    its xxhash64 before the self-join: the shuffle moves 8-byte longs
    instead of ~n-word strings (~3× fewer shuffle bytes, cheaper key
    compare). Exact up to 64-bit collisions — negligible below ~10⁹
    distinct shingles; pass False for strict string equality.
    """
    if fanout is None:
        fanout = df.sparkSession.sparkContext.defaultParallelism
    df = scan_fanout(df, fanout)
    # cache the posting list: the self-join consumes it twice, and
    # without materialization Spark recomputes the shingle explosion
    # for both sides (at cluster scale: checkpoint to storage instead)
    sh = df.select(
        F.col(id_col).alias("doc"), F.explode(word_shingles(text_col, n)).alias("shingle")
    )
    if hash_shingle_key:
        sh = sh.select("doc", F.xxhash64("shingle").alias("shingle"))
    sh = sh.cache()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, on="shingle")
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    out = (
        common.join(F.broadcast(sa), on="doc_a")
        .join(F.broadcast(sb), on="doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
    return out
