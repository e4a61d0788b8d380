"""Wave-15: Theil-Sen, Fano factor, event trigrams, URL path rollup,
drift composition — hand-computed ground truths."""

from __future__ import annotations

from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.operators.stats import (
    cramers_v_quantized,
    fano_factor,
    theil_sen_slope,
)
from dpe_energy_performance_analysis_etl_spark.operators.temporal import event_trigrams
from dpe_energy_performance_analysis_etl_spark.text.urls import url_path_rollup


class TestTheilSen:
    def test_hand_computed_median_slope(self, spark):
        # slopes: (0,1)->2, (0,2)->1, (1,2)->0; lower median = 1
        df = spark.createDataFrame(
            [("u", 0, 0), ("u", 1, 2), ("u", 2, 2)], "k string, x long, y long"
        )
        r = theil_sen_slope(df, "k", "x", "y").collect()[0]
        assert (r["n_points"], r["n_pairs"]) == (3, 3)
        assert r["theil_slope"] == 1.0

    def test_outlier_robustness(self, spark):
        # clean slope 1 with one wild outlier: median still 1
        df = spark.createDataFrame(
            [("u", 0, 0), ("u", 1, 1), ("u", 2, 2), ("u", 3, 300)],
            "k string, x long, y long",
        )
        r = theil_sen_slope(df, "k", "x", "y").collect()[0]
        assert r["theil_slope"] == 1.0

    def test_min_points_filter_and_equal_x_excluded(self, spark):
        df = spark.createDataFrame(
            [("a", 0, 0), ("a", 1, 5), ("b", 0, 0), ("b", 0, 9), ("b", 1, 1), ("b", 2, 2)],
            "k string, x long, y long",
        )
        got = {r["key"]: r for r in theil_sen_slope(df, "k", "x", "y").collect()}
        assert "a" not in got  # only 2 points
        # b: the (x=0,y=0)-(x=0,y=9) pair is excluded (equal x)
        assert got["b"]["n_pairs"] == 5


class TestFanoFactor:
    def test_regular_counts_zero(self, spark):
        rows = [("t", d, i) for d in range(3) for i in range(2)]
        df = spark.createDataFrame(rows, "et string, day int, i int")
        r = fano_factor(df, "et", F.col("day")).collect()[0]
        assert (r["n_buckets"], r["total"], r["sum_sq"]) == (3, 6, 12)
        assert r["fano"] == 0.0

    def test_bursty_hand_computed(self, spark):
        # counts [1, 5]: F = (2*26 - 36)/(1*6) = 16/6
        rows = [("t", 0, 0)] + [("t", 1, i) for i in range(5)]
        df = spark.createDataFrame(rows, "et string, day int, i int")
        r = fano_factor(df, "et", F.col("day")).collect()[0]
        assert r["fano"] == 16.0 / 6.0

    def test_single_bucket_guarded(self, spark):
        df = spark.createDataFrame([("t", 0, i) for i in range(4)], "et string, day int, i int")
        assert fano_factor(df, "et", F.col("day")).collect()[0]["fano"] == 0.0


class TestEventTrigrams:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, event_type string"
        )

    def test_sequence_and_context_probs(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)

        def row(u, i, et):
            return (u, t0 + dt.timedelta(minutes=i), i, et)

        rows = [row(1, i, et) for i, et in enumerate("abc")] + [
            row(2, i, et) for i, et in enumerate("abd")
        ]
        got = {
            (r["t0"], r["t1"], r["t2"]): r
            for r in event_trigrams(self._ev(spark, rows)).collect()
        }
        assert got[("a", "b", "c")]["n"] == 1
        assert got[("a", "b", "c")]["context_n"] == 2
        assert got[("a", "b", "c")]["prob"] == 0.5
        assert got[("a", "b", "d")]["prob"] == 0.5

    def test_users_isolate(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 0, "a"),
            (1, t0 + dt.timedelta(1), 1, "b"),
            (2, t0 + dt.timedelta(2), 2, "c"),
        ]
        assert event_trigrams(self._ev(spark, rows)).count() == 0


class TestUrlPathRollup:
    def test_hand_hierarchy(self, spark):
        urls = [
            ("https://H.com/a/b",),
            ("https://h.com/a",),
            ("https://h.com/a/b/c",),
        ]
        df = spark.createDataFrame(urls, "url string")
        got = {
            (r["path_prefix"]): (r["depth"], r["n_pages"], r["n_leaf_pages"])
            for r in url_path_rollup(df).collect()
        }
        assert got["/a/"] == (1, 3, 1)
        assert got["/a/b/"] == (2, 2, 1)
        assert got["/a/b/c/"] == (3, 1, 1)

    def test_root_only_urls_dropped(self, spark):
        df = spark.createDataFrame([("https://h.com/",), ("https://h.com",)], "url string")
        assert url_path_rollup(df).count() == 0


class TestDriftComposition:
    def test_identical_halves_zero_drift(self, spark):
        rows = [(p, c) for p in ("H1", "H2") for c in ("a", "b") for _ in range(10)]
        df = spark.createDataFrame(rows, "period string, cat string")
        r = cramers_v_quantized(df, "period", "cat").collect()[0]
        assert r["chi2_xscale"] == 0
        assert r["cramers_v"] == 0.0

    def test_shifted_halves_positive_drift(self, spark):
        rows = [("H1", "a")] * 15 + [("H1", "b")] * 5 + [("H2", "a")] * 5 + [("H2", "b")] * 15
        df = spark.createDataFrame(rows, "period string, cat string")
        r = cramers_v_quantized(df, "period", "cat").collect()[0]
        assert r["cramers_v"] > 0.3
