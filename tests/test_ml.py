"""operators/ml.py: portable k-means Lloyd and histogram decision
stump — hand-computed ground truths."""

from __future__ import annotations

from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.operators.ml import (
    decision_stump_binned,
    kmeans_lloyd_portable,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestKmeansLloydPortable:
    def test_two_cluster_hand_computed(self, spark):
        # scaled coords: 0→1024, 0.1→1126, 0.9→1945, 1.0→2048
        df = _vecs(
            spark,
            [
                (0, [0.0, 0.0]),
                (1, [1.0, 1.0]),
                (2, [0.1, 0.1]),
                (3, [0.9, 0.9]),
            ],
        )
        got = {
            r["cluster"]: r
            for r in kmeans_lloyd_portable(df, k=2, iterations=2).collect()
        }
        assert set(got) == {0, 1}
        assert got[0]["n_members"] == 2 and got[1]["n_members"] == 2
        # c1_0 = (1024+1126)//2 = 1075 per dim -> dists 2*51^2 each
        assert got[0]["inertia"] == 2 * (2 * 51 * 51)
        # c1_1 = (2048+1945)//2 = 1996 -> dists 2*52^2 and 2*51^2
        assert got[1]["inertia"] == 2 * 52 * 52 + 2 * 51 * 51
        assert got[0]["centroid_sum"] == 2 * 1075
        assert got[1]["centroid_sum"] == 2 * 1996

    def test_partitioning_invariance(self, spark):
        rows = [
            (i, [float((i * 13) % 7) / 7.0, float((i * 29) % 11) / 11.0])
            for i in range(60)
        ]
        a = sorted(
            map(tuple, kmeans_lloyd_portable(_vecs(spark, rows).repartition(3), 4, 2).collect())
        )
        b = sorted(
            map(tuple, kmeans_lloyd_portable(_vecs(spark, rows).repartition(13), 4, 2).collect())
        )
        assert a == b

    def test_separated_clusters_stay_separated(self, spark):
        rows = [(i, [0.01 * i, 0.0]) for i in range(5)] + [
            (10 + i, [0.9 + 0.01 * i, 0.9]) for i in range(5)
        ]
        # seeds 0 and 1 both sit in the left cluster; after the first
        # update one centroid absorbs the right group
        got = kmeans_lloyd_portable(_vecs(spark, rows), k=2, iterations=2).collect()
        counts = sorted(r["n_members"] for r in got)
        assert sum(counts) == 10
        assert len(got) == 2


class TestDecisionStump:
    def test_perfectly_separable(self, spark):
        rows = [(float(v), 1 if v >= 5 else 0) for v in range(10)]
        df = spark.createDataFrame(rows, "val double, y int")
        r = decision_stump_binned(df, "val", F.col("y") == 1, n_bins=16).collect()[0]
        assert r["gini_score"] == 0.0
        assert r["pos_left"] == 0 and r["neg_left"] == 5
        assert r["pos_right"] == 5 and r["neg_right"] == 0
        # split value lies in (4, 5]
        assert 4.0 < r["split_value"] <= 5.0

    def test_unsplittable_uniform_label(self, spark):
        rows = [(float(v), 1) for v in range(10)]
        df = spark.createDataFrame(rows, "val double, y int")
        r = decision_stump_binned(df, "val", F.col("y") == 1, n_bins=8).collect()[0]
        # all-positive: every split scores 0; argmin tie-break picks
        # the lowest bucket
        assert r["gini_score"] == 0.0
        assert r["split_bucket"] == 0

    def test_constant_feature_returns_empty_not_nan(self, spark):
        # hi == lo makes bin width 0; the guard pins bucket 0 so the
        # plan never evaluates floor(NaN) — the correct "no split
        # exists" answer for a constant feature is an empty result.
        rows = [(5.0, 1), (5.0, 0), (5.0, 1)]
        df = spark.createDataFrame(rows, "val double, y int")
        got = decision_stump_binned(df, "val", F.col("y") == 1, n_bins=8).collect()
        assert got == []

    def test_hand_computed_mixed(self, spark):
        # left bin: 1 pos 3 neg, right bin: 3 pos 1 neg
        rows = [(0.0, 1)] + [(0.0, 0)] * 3 + [(10.0, 1)] * 3 + [(10.0, 0)]
        df = spark.createDataFrame(rows, "val double, y int")
        r = decision_stump_binned(df, "val", F.col("y") == 1, n_bins=2).collect()[0]
        assert (r["pos_left"], r["neg_left"]) == (1, 3)
        assert (r["pos_right"], r["neg_right"]) == (3, 1)
        assert r["gini_score"] == (1 * 3) / 4.0 + (3 * 1) / 4.0
