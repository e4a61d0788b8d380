"""Round-8 wave-2 operators: IPS off-policy value, ratio-to-parent,
RFM segmentation, XYZ volatility, rolling correlation, seasonal
outlier audit."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


class TestIpsPolicyValue:
    def test_hand_case_exact_ips_terms(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.ml import ips_policy_value

        # context 'c': train has a(n=3, mean 10) and b(n=1, mean 100)
        # -> policy picks b; propensity(b|c) = 1/4
        rows = (
            [("c", "a", 10, 0)] * 3
            + [("c", "b", 100, 0)]
            + [("c", "b", 50, 1), ("c", "a", 10, 1), ("d", "a", 5, 1)]
        )
        df = spark.createDataFrame(rows, "x string, a string, r long, sp int")
        got = ips_policy_value(df, "x", "a", "r", "sp").collect()[0]
        assert got["n_eval"] == 3
        assert got["n_matched"] == 1  # the (c, b, 50) row
        assert got["n_unsupported"] == 1  # context 'd' unseen in train
        # IPS term: r * n_x / n_xa = 50 * 4 / 1, at scale 1e6
        assert got["ips_value_scaled"] == 50 * 4 * 1_000_000 // 1
        assert got["matched_reward"] == 50

    def test_tie_breaks_to_lexicographic_action(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.ml import ips_policy_value

        rows = [("c", "z", 10, 0), ("c", "a", 10, 0), ("c", "a", 10, 1)]
        df = spark.createDataFrame(rows, "x string, a string, r long, sp int")
        got = ips_policy_value(df, "x", "a", "r", "sp").collect()[0]
        assert got["n_matched"] == 1  # policy = 'a' on the mean tie


class TestRatioToParent:
    def test_shares_sum_and_exact_ppm(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.aggregate import (
            ratio_to_parent,
        )

        rows = [
            ("r1", "n1", 30),
            ("r1", "n2", 70),
            ("r2", "n3", 100),
        ]
        df = spark.createDataFrame(rows, "region string, nation string, v long")
        got = {
            r["nation"]: r
            for r in ratio_to_parent(df, ["region", "nation"], "v").collect()
        }
        assert got["n1"]["share_of_region_ppm"] == 300_000
        assert got["n2"]["share_of_region_ppm"] == 700_000
        assert got["n3"]["share_of_region_ppm"] == 1_000_000
        assert got["n1"]["share_of_total_ppm"] == 150_000


class TestRfmSegments:
    def test_quintile_bounds_and_order(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.aggregate import (
            rfm_segments,
        )

        # 10 customers, one order each: day k, amount 100*k
        rows = [(k, k, 100 * (k + 1)) for k in range(10)]
        df = spark.createDataFrame(rows, "cust long, day long, amt long")
        got = {r["cust"]: r for r in rfm_segments(df, "cust", "day", "amt").collect()}
        # with n=10 and 5 bins, two customers per bin in metric order
        assert got[0]["m_score"] == 1 and got[1]["m_score"] == 1
        assert got[8]["m_score"] == 5 and got[9]["r_score"] == 5
        assert all(1 <= r["f_score"] <= 5 for r in got.values())
        assert got[9]["rfm"] == 100 * 5 + 10 * got[9]["f_score"] + 5


class TestXyzVolatility:
    def test_steady_vs_erratic_classification(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.aggregate import (
            xyz_volatility,
        )

        rows = [("steady", p, 100) for p in range(8)]
        rows += [("erratic", p, [1, 1000][p % 2]) for p in range(8)]
        df = spark.createDataFrame(rows, "k string, p long, y long")
        got = {r["k"]: r for r in xyz_volatility(df, "k", "p", "y").collect()}
        assert got["steady"]["xyz"] == "X" and got["steady"]["cv2_ppm2"] == 0
        assert got["erratic"]["xyz"] == "Y"  # cv just under 1 for 50/50 two-point
        # exact cv^2: mean 500.5, var*n = n*ss - s^2
        n, s, ss = 8, 8 * 500 + 4, 4 * 1 + 4 * 1000000
        expect = (n * ss - s * s) * 10**12 // (s * s)
        assert got["erratic"]["cv2_ppm2"] == expect


class TestRollingCorr:
    def test_perfect_positive_and_negative(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            rolling_corr,
        )

        rows = [(t, 10 + t, 100 - 2 * t) for t in range(8)]
        df = spark.createDataFrame(rows, "t long, x long, y long")
        got = rolling_corr(df, "t", "x", "y", window=4).collect()
        assert len(got) == 5  # full windows at t = 3..7
        for r in got:
            assert math.isclose(r["corr"], -1.0, abs_tol=1e-12)

    def test_zero_variance_yields_null(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            rolling_corr,
        )

        rows = [(t, 5, t) for t in range(4)]
        df = spark.createDataFrame(rows, "t long, x long, y long")
        got = rolling_corr(df, "t", "x", "y", window=4).collect()
        assert len(got) == 1 and got[0]["corr"] is None


class TestSeasonalOutliers:
    def test_injected_shock_ranks_first_and_flags(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            seasonal_outliers,
        )

        period = 4
        seas = [40, -20, -40, 20]
        rows = []
        for t in range(24):
            y = 1000 + 10 * t + seas[t % 4]
            if t == 11:
                y += 100_000  # the shock
            rows.append((t, y))
        df = spark.createDataFrame(rows, "t long, y long")
        got = seasonal_outliers(df, "t", "y", period=4, k_mad=5, top_n=3).collect()
        assert len(got) == 3
        assert got[0]["t"] in (11, 10, 12, 13, 9)  # shock distorts its MA window
        assert got[0]["is_outlier"] == 1
        # a clean series flags nothing but still reports margins
        clean = spark.createDataFrame(
            [(t, 1000 + 10 * t + seas[t % 4]) for t in range(24)], "t long, y long"
        )
        got2 = seasonal_outliers(clean, "t", "y", period=4, k_mad=5, top_n=3).collect()
        assert len(got2) == 3
        assert all(r["is_outlier"] == 0 for r in got2)


class TestRankPrimitiveRebuildStability:
    def test_second_build_in_one_session_identical(self, spark):
        """r8 row-gate catch: correctness-by-cache. The rank recipe's
        range-partitioned intermediate used .cache(); unpersisting a
        plan-identical entry (previous invocation's retirement, or a
        bare clearCache between build and action) left TWO physical
        instantiations of repartitionByRange sampling DIFFERENT
        boundaries — offsets from one, local ranks from the other,
        silently wrong ranks (116 -> 8 segments at sf1). Pinning via
        eager localCheckpoint makes every rebuild identical."""
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            cumulative_gains,
        )

        rows = [((i * 37) % 1009, i % 4 == 0, i) for i in range(5000)]
        df = spark.createDataFrame(rows, "score long, y boolean, tb long")
        results = []
        for _ in range(2):
            spark.catalog.clearCache()
            got = sorted(
                map(tuple, cumulative_gains(df, "score", "y", "tb").collect())
            )
            results.append(got)
        assert results[0] == results[1]
