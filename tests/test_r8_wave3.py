"""Round-8 wave-3 operators: windowed funnel, weighted median,
Croston intermittent demand, cumulative gains."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(day: int, sec: int = 0):
    return dt.datetime(2020, 1, day, 0, 0, sec)


class TestWindowFunnel:
    def test_in_window_chain_counts_full_depth(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import window_funnel

        day_us = 86_400_000_000
        rows = [
            # user 1: full chain within 3 days
            (1, _ts(1), "signup", 1),
            (1, _ts(2), "view", 2),
            (1, _ts(3), "purchase", 3),
            # user 2: purchase outside the window of the signup
            (2, _ts(1), "signup", 4),
            (2, _ts(2), "view", 5),
            (2, _ts(20), "purchase", 6),
            # user 3: out of order (purchase first) -> depth 1 via signup
            (3, _ts(1), "purchase", 7),
            (3, _ts(2), "signup", 8),
            # user 4: no step events at all -> not counted (no rows)
            (4, _ts(1), "click", 9),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string, event_id long"
        )
        got = {
            r["depth"]: r["n_users"]
            for r in window_funnel(
                df, ["signup", "view", "purchase"], window_us=5 * day_us
            ).collect()
        }
        assert got == {0: 0, 1: 1, 2: 1, 3: 1}

    def test_later_anchor_rescues_deep_chain(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import window_funnel

        day_us = 86_400_000_000
        # early signup would expire; the SECOND signup anchors a
        # full in-window chain — the max-anchor DP must find it
        rows = [
            (1, _ts(1), "signup", 1),
            (1, _ts(10), "signup", 2),
            (1, _ts(11), "view", 3),
            (1, _ts(12), "purchase", 4),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string, event_id long"
        )
        got = {
            r["depth"]: r["n_users"]
            for r in window_funnel(
                df, ["signup", "view", "purchase"], window_us=3 * day_us
            ).collect()
        }
        assert got[3] == 1


class TestGroupedWeightedMedian:
    def test_hand_case(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_weighted_median,
        )

        rows = [
            ("a", 10, 1),
            ("a", 20, 1),
            ("a", 30, 8),  # W=10, half=5 -> first value with 2*cumw>=10 is 30
            ("b", 5, 3),
            ("b", 7, 1),  # W=4 -> 2*3 >= 4 at v=5
        ]
        df = spark.createDataFrame(rows, "g string, v long, w long")
        got = {
            r["g"]: (r["w_total"], r["weighted_median"])
            for r in grouped_weighted_median(df, "g", "v", "w").collect()
        }
        assert got == {"a": (10, 30), "b": (4, 5)}

    def test_duplicate_values_aggregate_weights(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_weighted_median,
        )

        rows = [("g", 1, 1)] * 3 + [("g", 2, 1)] * 2
        df = spark.createDataFrame(rows, "g string, v long, w long")
        got = grouped_weighted_median(df, "g", "v", "w").collect()[0]
        assert (got["w_total"], got["weighted_median"]) == (5, 1)


class TestCroston:
    def test_dyadic_updates_match_hand_fold(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            croston_intermittent,
        )

        # demands at periods 1(y=10), 4(y=20), 10(y=6)
        rows = [("k", 1, 10), ("k", 4, 20), ("k", 10, 6), ("k", 5, 0)]
        df = spark.createDataFrame(rows, "k string, p long, y long")
        got = croston_intermittent(df, "k", "p", "y").collect()[0]
        # init: z=10; 2nd: z=(10+20)//2=15, p=3; 3rd: z=(15+6)//2=10,
        # p=(3+6)//2=4
        assert (got["n_demands"], got["z_smoothed"], got["p_smoothed"]) == (3, 10, 4)
        assert got["rate_ppm"] == 10 * 1_000_000 // 4

    def test_single_demand_key_emits_no_row(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            croston_intermittent,
        )

        df = spark.createDataFrame([("k", 1, 10)], "k string, p long, y long")
        assert croston_intermittent(df, "k", "p", "y").count() == 0


class TestCumulativeGains:
    def test_perfect_model_front_loads_positives(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            cumulative_gains,
        )

        # 100 rows, top-20 scores are the only positives
        rows = [(100 - i, 1 if i < 20 else 0, i) for i in range(100)]
        df = spark.createDataFrame(rows, "score long, y int, tb long")
        got = {r["bucket"]: r for r in cumulative_gains(df, "score", "y", "tb").collect()}
        assert len(got) == 10
        assert all(r["n_rows"] == 10 for r in got.values())
        assert got[1]["positives"] == 10 and got[2]["positives"] == 10
        assert got[2]["gain_ppm"] == 1_000_000  # all positives by decile 2
        assert got[10]["cum_positives"] == 20

    def test_random_labels_gain_is_monotone(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            cumulative_gains,
        )

        rows = [(i * 37 % 101, i % 3 == 0, i) for i in range(101)]
        df = spark.createDataFrame(rows, "score long, y boolean, tb long")
        got = sorted(
            cumulative_gains(df, "score", "y", "tb").collect(),
            key=lambda r: r["bucket"],
        )
        gains = [r["gain_ppm"] for r in got]
        assert gains == sorted(gains) and gains[-1] == 1_000_000
