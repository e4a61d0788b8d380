"""Histogram quantiles (operators/quantiles.py): accuracy vs numpy,
error bound, merge == whole, pinned-bounds mode, determinism."""

from __future__ import annotations

import numpy as np

from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
    histogram_buckets,
    histogram_quantiles,
    merge_histograms,
)

PROBS = [0.1, 0.5, 0.9]


def _df(spark, vals, parts=8):
    return spark.createDataFrame([(float(v),) for v in vals], "v double").repartition(parts)


def test_within_bucket_width_of_true_quantile(spark):
    rng = np.random.default_rng(3)
    vals = rng.lognormal(mean=10, sigma=1, size=20_000)  # heavy-tailed
    got = {
        r["prob"]: r["q_est"]
        for r in histogram_quantiles(_df(spark, vals), "v", PROBS, 2048).collect()
    }
    width = (vals.max() - vals.min()) / 2048
    for p in PROBS:
        true = np.quantile(vals, p)
        assert abs(got[p] - true) <= width + 1e-9, (p, got[p], true, width)


def test_uniform_data_near_exact(spark):
    vals = np.arange(10_000) / 10.0
    got = {
        r["prob"]: r["q_est"]
        for r in histogram_quantiles(_df(spark, vals), "v", PROBS, 1000).collect()
    }
    for p in PROBS:
        assert abs(got[p] - np.quantile(vals, p)) < (vals.max() - vals.min()) / 1000


def test_merge_equals_whole_with_pinned_bounds(spark):
    rng = np.random.default_rng(5)
    vals = rng.uniform(0, 100, 5000)
    bounds = (0.0, 100.0)
    h1 = histogram_buckets(_df(spark, vals[:2500]), "v", 256, bounds)
    h2 = histogram_buckets(_df(spark, vals[2500:]), "v", 256, bounds)
    whole = histogram_buckets(_df(spark, vals), "v", 256, bounds)
    merged = {
        r["bucket"]: r["cnt"] for r in merge_histograms(h1, h2).collect()
    }
    assert merged == {r["bucket"]: r["cnt"] for r in whole.collect()}


def test_partitioning_invariance(spark):
    vals = np.arange(3000) * 7 % 1000
    a = sorted(histogram_quantiles(_df(spark, vals, 2), "v", PROBS, 128).collect())
    b = sorted(histogram_quantiles(_df(spark, vals, 31), "v", PROBS, 128).collect())
    assert a == b  # bit-exact, not approximately


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,)], "v double"
    )
    got = histogram_quantiles(df, "v", [0.5], 4).collect()
    # median of 1,2,3 (null ignored) within one bucket width (0.5)
    assert abs(got[0]["q_est"] - 2.0) <= 0.5


class TestGroupedKthSmallest:
    def test_matches_python_order_statistic(self, spark):
        import random

        from pyspark.sql import functions as F

        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_kth_smallest,
        )

        rng = random.Random(7)
        rows = [(g, rng.randint(0, 50)) for g in ("a", "b", "c") for _ in range(200)]
        rows += [("d", 9)]  # singleton group
        df = spark.createDataFrame(rows, "g string, v long")
        ks = [("a", 1), ("b", 100), ("c", 200), ("d", 1)]
        k_df = spark.createDataFrame(ks, "g string, k long")
        got = {r["g"]: r["kth_value"] for r in grouped_kth_smallest(df, "g", "v", k_df).collect()}
        by_g = {}
        for g, v in rows:
            by_g.setdefault(g, []).append(v)
        expect = {g: sorted(by_g[g])[k - 1] for g, k in ks}
        assert got == expect

    def test_k_beyond_group_size_returns_no_row(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_kth_smallest,
        )

        df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, v long")
        k_df = spark.createDataFrame([("a", 3)], "g string, k long")
        assert grouped_kth_smallest(df, "g", "v", k_df).count() == 0
