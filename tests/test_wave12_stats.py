"""Wave-12 exact-portable statistics: lag autocorrelation,
Mann-Kendall trend, Gini key-skew, quantized Cramér's V — all
hand-computed ground truths."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.operators.stats import (
    cramers_v_quantized,
    gini_concentration,
    lag_autocorrelation,
    mann_kendall,
)


class TestLagAutocorrelation:
    def test_linear_series_is_perfectly_correlated(self, spark):
        df = spark.createDataFrame([(i, i + 10) for i in range(10)], "t int, x long")
        rows = {r["lag_k"]: r for r in lag_autocorrelation(df, "x", "t", [1, 2]).collect()}
        assert rows[1]["n_pairs"] == 9
        assert rows[1]["autocorr"] == 1.0
        assert rows[2]["autocorr"] == 1.0

    def test_alternating_series_lag1_negative(self, spark):
        df = spark.createDataFrame(
            [(i, 1 if i % 2 == 0 else -1) for i in range(10)], "t int, x long"
        )
        rows = {r["lag_k"]: r for r in lag_autocorrelation(df, "x", "t", [1, 2]).collect()}

        # bit-identical to the operator's IEEE form: sqrt(v)*sqrt(v)
        # is one ulp off v, so compare against the same expression,
        # not the algebraic ±1
        def pearson(xs, ys):
            m = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            sx2, sy2 = sum(a * a for a in xs), sum(b * b for b in ys)
            return (m * sxy - sx * sy) / (
                math.sqrt(m * sx2 - sx * sx) * math.sqrt(m * sy2 - sy * sy)
            )

        series = [1 if i % 2 == 0 else -1 for i in range(10)]
        assert rows[1]["autocorr"] == pearson(series[1:], series[:-1])
        assert abs(rows[1]["autocorr"] + 1.0) < 1e-12
        assert rows[2]["autocorr"] == pearson(series[2:], series[:-2])

    def test_constant_series_guarded_zero(self, spark):
        df = spark.createDataFrame([(i, 7) for i in range(6)], "t int, x long")
        rows = lag_autocorrelation(df, "x", "t", [1]).collect()
        assert rows[0]["autocorr"] == 0.0

    def test_hand_computed_sums(self, spark):
        # series 1, 3, 2: lag-1 pairs (3,1), (2,3)
        df = spark.createDataFrame([(0, 1), (1, 3), (2, 2)], "t int, x long")
        r = {r["lag_k"]: r for r in lag_autocorrelation(df, "x", "t", [1]).collect()}[1]
        assert (r["sum_x"], r["sum_y"], r["sum_xy"]) == (5, 4, 9)
        assert (r["sum_x2"], r["sum_y2"]) == (13, 10)
        # r = (2*9 - 20) / (sqrt(2*13-25) * sqrt(2*10-16)) = -2/2 = -1
        assert r["autocorr"] == -1.0


class TestMannKendall:
    def test_strictly_increasing(self, spark):
        df = spark.createDataFrame(
            [("u", i, float(i)) for i in range(5)], "k string, t int, v double"
        )
        r = mann_kendall(df, "k", "v", ["t"]).collect()[0]
        assert r["n"] == 5
        assert r["s_stat"] == 10  # all C(5,2) pairs concordant
        assert r["var_x18"] == 5 * 4 * 15
        assert r["z"] == 9.0 / math.sqrt(300.0 / 18.0)

    def test_strictly_decreasing_symmetric(self, spark):
        df = spark.createDataFrame(
            [("u", i, float(-i)) for i in range(5)], "k string, t int, v double"
        )
        r = mann_kendall(df, "k", "v", ["t"]).collect()[0]
        assert r["s_stat"] == -10
        assert r["z"] == -9.0 / math.sqrt(300.0 / 18.0)

    def test_all_tied_is_zero_variance_and_zero_z(self, spark):
        df = spark.createDataFrame(
            [("u", i, 5.0) for i in range(4)], "k string, t int, v double"
        )
        r = mann_kendall(df, "k", "v", ["t"]).collect()[0]
        assert r["s_stat"] == 0
        # var18 = 4*3*13 - 4*3*13 = 0
        assert r["var_x18"] == 0
        assert r["z"] == 0.0

    def test_tie_correction_hand_computed(self, spark):
        # values 1, 1, 2: pairs (1,1)=0, (1,2)=+1, (1,2)=+1 -> S=2
        # var18 = 3*2*11 - 2*1*9 = 66 - 18 = 48
        df = spark.createDataFrame(
            [("u", 0, 1.0), ("u", 1, 1.0), ("u", 2, 2.0)],
            "k string, t int, v double",
        )
        r = mann_kendall(df, "k", "v", ["t"]).collect()[0]
        assert r["s_stat"] == 2
        assert r["var_x18"] == 48

    def test_per_key_isolation(self, spark):
        rows = [("a", i, float(i)) for i in range(4)] + [
            ("b", i, float(-i)) for i in range(4)
        ]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        got = {r["key"]: r["s_stat"] for r in mann_kendall(df, "k", "v", ["t"]).collect()}
        assert got == {"a": 6, "b": -6}


class TestGiniConcentration:
    def test_uniform_counts_is_zero(self, spark):
        rows = [(k,) for k in ["a", "b", "c", "d"] for _ in range(5)]
        df = spark.createDataFrame(rows, "k string")
        r = gini_concentration(df, "k").collect()[0]
        assert (r["n_keys"], r["total_rows"]) == (4, 20)
        assert r["gini"] == 0.0

    def test_hand_computed_skew(self, spark):
        # counts sorted [1, 1, 8]: W = 1 + 2 + 24 = 27
        # G = (54 - 4*10) / (3*10) = 14/30
        rows = [("a",)] + [("b",)] + [("c",)] * 8
        df = spark.createDataFrame(rows, "k string")
        r = gini_concentration(df, "k").collect()[0]
        assert r["rank_weighted_sum"] == 27
        assert r["gini"] == 14.0 / 30.0

    def test_single_key_is_zero(self, spark):
        df = spark.createDataFrame([("a",)] * 9, "k string")
        assert gini_concentration(df, "k").collect()[0]["gini"] == 0.0


class TestCramersVQuantized:
    def test_perfect_association_2x2(self, spark):
        # diagonal-only 2x2, 5+5 rows: E_q = 25//10 = 2 everywhere;
        # diag cells dev 3 -> contrib 9*1000//2 = 4500 exactly;
        # zero cells dev -2 -> contrib 4*1000//2 = 2000.
        rows = [("a", "x")] * 5 + [("b", "y")] * 5
        df = spark.createDataFrame(rows, "r string, c string")
        got = cramers_v_quantized(df, "r", "c", scale=1000).collect()[0]
        assert got["n"] == 10
        assert got["chi2_xscale"] == 2 * 4500 + 2 * 2000
        assert got["cramers_v"] == math.sqrt(13000.0 / 10000.0)

    def test_independent_grid_is_zero(self, spark):
        # perfectly independent 2x2 with equal counts: O == E exactly
        rows = [(r, c) for r in ("a", "b") for c in ("x", "y") for _ in range(4)]
        df = spark.createDataFrame(rows, "r string, c string")
        got = cramers_v_quantized(df, "r", "c").collect()[0]
        assert got["chi2_xscale"] == 0
        assert got["cramers_v"] == 0.0

    def test_single_category_guard(self, spark):
        df = spark.createDataFrame([("a", "x")] * 5, "r string, c string")
        got = cramers_v_quantized(df, "r", "c").collect()[0]
        assert got["cramers_v"] == 0.0
