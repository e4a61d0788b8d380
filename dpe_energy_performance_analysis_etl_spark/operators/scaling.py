"""Scan-parallelism guard for expression-heavy operators.

A few-file parquet input (one 7 MB documents file, one row group)
yields one or two scan tasks, and any expensive per-row expression
chained onto it — rolling hashes, gram explodes, char aggregates —
runs serial no matter how many cores exist (measured 27× on the gram
tagger, 10× on document fingerprinting). At real scale the same table
arrives as thousands of files and needs no help.

``scan_fanout`` bridges both regimes: round-robin repartition ONLY
when the current scan parallelism is below the cluster's, a no-op
(zero shuffle) otherwise. The shuffle it may introduce moves just the
raw input bytes — strictly cheaper than serializing the downstream
expression onto a handful of tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scan_fanout(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` to cluster parallelism iff it currently has
    fewer partitions than that (e.g. a small-file scan); otherwise
    return it untouched — many-file scans at scale must not pay an
    extra shuffle."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
