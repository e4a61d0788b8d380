"""Bloom-filter join pruning (operators/bloomjoin.py): no false
negatives, bounded false-positive rate, merge == whole, end-to-end
join equality, and the at-scale plan property (the probe is a
broadcast-riding filter on the fact side — no shuffle join, no
Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.operators.bloomjoin import (
    bloom_build,
    bloom_merge,
    bloom_prefilter,
    bloom_pruned_join,
    packed_words,
)

N_BITS = 1 << 14
K = 6


def test_no_false_negatives(spark):
    """Every build-side key passes its own filter — the property that
    makes prefilter->join exact."""
    dim = spark.range(0, 2000, 3).withColumnRenamed("id", "key")
    kept = bloom_prefilter(dim, dim, "key", n_bits=N_BITS, k=K).count()
    assert kept == dim.count()


def test_false_positive_rate_bounded(spark):
    """667 keys in 2^14 bits ≈ 3.9 bits set per key-hash → theoretical
    fpp ~2.4%; assert a loose 10% ceiling on disjoint probe keys."""
    dim = spark.range(0, 2000, 3).withColumnRenamed("id", "key")
    probes = spark.range(100_000, 110_000).withColumnRenamed("id", "key")
    fp = bloom_prefilter(probes, dim, "key", n_bits=N_BITS, k=K).count()
    assert fp / 10_000 < 0.10


def test_merge_equals_whole(spark):
    """Filters over disjoint batches OR-merge to the union's filter —
    the monoid contract shared with the CMS/KMV sketches."""
    a = spark.range(0, 500).withColumnRenamed("id", "key")
    b = spark.range(500, 1000).withColumnRenamed("id", "key")
    whole = spark.range(0, 1000).withColumnRenamed("id", "key")
    merged = bloom_merge(
        bloom_build(a, "key", N_BITS, K), bloom_build(b, "key", N_BITS, K)
    )
    assert packed_words(merged, N_BITS) == packed_words(
        bloom_build(whole, "key", N_BITS, K), N_BITS
    )


def test_pruned_join_equals_plain_join(spark):
    """bloom_pruned_join ≡ plain inner join, including duplicate fact
    keys and fact keys absent from dim."""
    fact = spark.createDataFrame(
        [(i % 700, f"f{i}") for i in range(3000)], "key long, payload string"
    )
    dim = (
        spark.range(0, 700, 7)
        .withColumnRenamed("id", "dkey")
        .withColumn("dval", F.col("dkey") * 10)
    )
    got = (
        bloom_pruned_join(fact, dim, "key", "dkey", N_BITS, K)
        .select("key", "payload", "dval")
        .orderBy("key", "payload")
        .collect()
    )
    want = (
        fact.join(dim, fact["key"] == dim["dkey"])
        .select("key", "payload", "dval")
        .orderBy("key", "payload")
        .collect()
    )
    assert got == want


def test_outer_join_rejected(spark):
    fact = spark.range(5).withColumnRenamed("id", "key")
    with pytest.raises(ValueError, match="left"):
        bloom_pruned_join(fact, fact, "key", how="left")


def test_prefilter_plan_shape(spark, tmp_path):
    """The at-scale contract: the probe rides a single-row
    BroadcastNestedLoopJoin + Filter — the fact side is never
    shuffle-joined and no Python evaluation appears; the only hash
    exchange in the plan is the bounded dim-side bitset build."""
    path = str(tmp_path / "fact.parquet")
    spark.range(10_000).withColumnRenamed("id", "key").write.parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.range(0, 100).withColumnRenamed("id", "key")
    plan = bloom_prefilter(fact, dim, "key", n_bits=N_BITS)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_selectivity_prunes_most_rows(spark):
    """With a selective dim (1% of keys), the prefilter drops ~99% of
    fact rows — the shuffle-volume win, measured not asserted exactly
    (false positives add a bounded tail)."""
    fact = spark.range(100_000).withColumnRenamed("id", "key")
    dim = spark.range(0, 100_000, 100).withColumnRenamed("id", "key")
    kept = bloom_prefilter(fact, dim, "key", n_bits=1 << 17).count()
    assert kept < 100_000 * 0.05  # 1% true + small fp tail
