"""Exact deduplication: hash-groupBy on a content fingerprint.

Scale shape: ONE shuffle on the md5 fingerprint (a uniform 128-bit
key — no skew), map-side partial aggregation, output is the winner
per group. This is the pattern that holds at 100 TB: never compare
documents pairwise when equality is the predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dpe_energy_performance_analysis_etl_spark.text import md5_fingerprint


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per distinct (normalized) content: the minimum id
    wins — deterministic, unlike dropDuplicates."""
    fp = df.withColumn("content_fp", md5_fingerprint(text_col))
    winners = fp.groupBy("content_fp").agg(F.min(id_col).alias(id_col))
    return fp.join(winners, on=["content_fp", id_col], how="inner").drop("content_fp")


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fingerprint → (representative id, group size). ``n_dups > 1``
    rows are the duplicate clusters."""
    return (
        df.withColumn("content_fp", md5_fingerprint(text_col))
        .groupBy("content_fp")
        .agg(F.min(id_col).alias("representative_id"), F.count(F.lit(1)).alias("n_docs"))
    )
