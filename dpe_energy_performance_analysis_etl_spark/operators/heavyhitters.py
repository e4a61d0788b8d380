"""Misra–Gries heavy hitters: top-k frequent items with BOUNDED state
(Misra & Gries 1982; the merge rule is Agarwal et al. 2012,
"Mergeable Summaries").

Exact per-item counts need vocabulary-sized state; over a 100 TB
corpus whose item domain is unbounded (URLs, n-grams, user agents)
that state itself becomes the problem. A Misra–Gries summary keeps at
most ``k`` counters and guarantees, for every item x with true count
c(x):  ĉ(x) ≤ c(x)  and  c(x) - ĉ(x) ≤ (n - m̂)/(k+1)  (n = stream
length, m̂ = surviving counter mass) — every item with frequency above
n/(k+1) is guaranteed present. The count-min sketch
(``operators/sketch.py``) answers point lookups with OVERcounts; MG
answers "what are the frequent items" with UNDERcounts and no
per-query hashing — they are complements, both monoids.

Distributed shape:
  1. per-partition summaries via ``mapInPandas`` — each Arrow batch
     is reduced with pandas ``value_counts`` (C-speed hashing, never
     a Python per-row loop) and folded into a ≤ k-entry dict; the
     batched decrement subtracts the (k+1)-th largest counter value
     from everything, which removes ≥ (k+1)·t mass while costing any
     single item ≤ t — the classic error accounting, vectorized.
  2. one bounded groupBy: ≤ k·P partial rows (P = #partitions) sum
     map-side — the ONLY shuffle, fixed-width keys.
  3. a distributed compress back to ≤ k entries: the (k+1)-th largest
     merged count comes from a TakeOrdered(k+1) (k+1 rows cross the
     driver boundary, never data), broadcast back as a one-row
     threshold, subtract-and-filter in codegen.

Merging partition summaries then compressing doubles the error term
(≤ 2n/(k+1)); the summary stays a summary. When ``k`` exceeds the
true distinct count NO decrement ever fires and the result is the
exact count table regardless of partitioning — the deterministic
regime the driver-gate query runs in (the same exact-under-k contract
as the KMV sketch).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def _mg_fold(counts: dict, batch: pd.Series, k: int) -> None:
    """Fold a batch's value_counts into the running ≤ k-entry dict."""
    for item, cnt in batch.items():
        counts[item] = counts.get(item, 0) + int(cnt)
    if len(counts) > k:
        t = sorted(counts.values(), reverse=True)[k]  # (k+1)-th largest
        for item in list(counts):
            c = counts[item] - t
            if c > 0:
                counts[item] = c
            else:
                del counts[item]


def mg_partials(df: DataFrame, item_col: str, k: int = 64) -> DataFrame:
    """Per-partition Misra–Gries summaries → (item, cnt), ≤ k rows per
    partition. Items are carried as strings (the unbounded-domain
    assumption)."""
    out_schema = T.StructType(
        [
            T.StructField("item", T.StringType(), True),
            T.StructField("cnt", T.LongType(), False),
        ]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for batch in batches:
            _mg_fold(counts, batch[item_col].astype(str).value_counts(), k)
        yield pd.DataFrame(
            {"item": list(counts.keys()), "cnt": list(counts.values())},
            columns=["item", "cnt"],
        )

    return df.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        work, schema=out_schema
    )


def mg_compress(summed: DataFrame, k: int = 64) -> DataFrame:
    """Compress a merged (item, cnt) table back to ≤ k entries with
    the MG decrement, fully in the plan: threshold = the (k+1)-th
    largest count (0 when fewer than k+1 entries exist — i.e. the
    exact regime passes through untouched)."""
    topk1 = summed.orderBy(F.col("cnt").desc(), "item").limit(k + 1)
    thr = topk1.agg(
        F.when(F.count(F.lit(1)) >= k + 1, F.min("cnt"))
        .otherwise(F.lit(0))
        .alias("t")
    )
    return (
        summed.crossJoin(F.broadcast(thr))
        .select("item", (F.col("cnt") - F.col("t")).alias("cnt"))
        .where(F.col("cnt") > 0)
    )


def heavy_hitters(df: DataFrame, item_col: str, k: int = 64) -> DataFrame:
    """End-to-end: partition summaries → one bounded shuffle →
    compress. Returns (item, cnt) with ĉ ≤ c and c - ĉ ≤ 2n/(k+1);
    exact when k ≥ distinct(item)."""
    partials = mg_partials(df, item_col, k)
    summed = partials.groupBy("item").agg(F.sum("cnt").alias("cnt"))
    return mg_compress(summed, k)


def mg_merge(s1: DataFrame, s2: DataFrame, k: int = 64) -> DataFrame:
    """Merge two summaries built with the same k (sum matching items,
    compress) — associative up to the summary guarantee, so per-batch
    / per-day summaries roll up like the CMS/KMV/bloom monoids."""
    summed = (
        s1.unionByName(s2).groupBy("item").agg(F.sum("cnt").alias("cnt"))
    )
    return mg_compress(summed, k)
