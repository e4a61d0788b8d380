"""Round-9 wave-5/6 tests: Wilson lower bound, two-sweep diameter."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


class TestWilsonLowerBound:
    def test_matches_python_and_orders_correctly(self, spark):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import (
            _WILSON_LOWER,
        )

        cases = [
            ("tiny_hot", 3, 2),       # 67% on n=3
            ("big_warm", 1300, 400),  # 31% on n=1300
            ("zero", 50, 0),
            ("all", 7, 7),
        ]
        df = spark.createDataFrame(cases, "g string, n bigint, x bigint")
        got = {
            r["g"]: r["w"]
            for r in df.select(
                "g", F.expr(f"{_WILSON_LOWER} AS w")
            ).collect()
        }
        for g, n, x in cases:
            ref = math.floor(
                (x + 2 - 2 * math.sqrt((x * (n - x)) / n + 1)) * 1e6 / (n + 4)
            )
            assert got[g] == ref, (g, got[g], ref)
        # the whole point: the small-sample 67% ranks BELOW the
        # well-supported 31%
        assert got["tiny_hot"] < got["big_warm"]
        assert got["zero"] >= 0 or got["zero"] < 0  # defined, no error
        # bound is a lower bound on the rate
        for g, n, x in cases:
            assert got[g] <= x * 1_000_000 // n


class TestDiameterTwoSweep:
    def _run(self, spark, edges, max_depth=6):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import (
            diameter_two_sweep,
        )

        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        return diameter_two_sweep(df, max_depth=max_depth).collect()[0]

    def test_path_graph_exact(self, spark):
        # path 0-1-2-3-4: diameter 4; max degree node = 1 (deg 2,
        # smallest id among the internal nodes)
        r = self._run(spark, [(i, i + 1) for i in range(4)])
        assert r["diameter_lb"] == 4
        assert r["start_node"] == 1
        # farthest from node 1 at dist 3 is node 4; from 4 ecc = 4
        assert r["far_node"] == 4
        assert (r["n_reached_start"], r["n_reached_far"]) == (5, 5)

    def test_star_graph(self, spark):
        # star: center 0, leaves 1..6 -> diameter 2, start = center
        r = self._run(spark, [(0, i) for i in range(1, 7)])
        assert (r["start_node"], r["ecc_start"], r["diameter_lb"]) == (0, 1, 2)

    def test_cap_reports_at_least(self, spark):
        # path of length 10 with cap 3: bound saturates at the cap
        r = self._run(spark, [(i, i + 1) for i in range(10)], max_depth=3)
        assert r["diameter_lb"] == 3
        assert r["n_reached_far"] < 11  # periphery unreached under cap

    def test_two_components_stays_in_start_component(self, spark):
        # component A: triangle 0-1-2; component B: path 10-11-12-13
        # max-degree start is in A (degree 2 everywhere but tie ->
        # node 0); BFS never crosses components
        edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (12, 13)]
        r = self._run(spark, edges)
        assert r["start_node"] == 0
        assert r["n_reached_start"] == 3
        assert r["diameter_lb"] == 1


class TestCupedRational:
    def test_adjusted_mean_matches_fraction_reference(self, spark, tmp_path):
        """Build a tiny events table where variant 1 has an inflated
        PRE-period (covariate imbalance): CUPED must pull its adjusted
        post mean back toward variant 0's, matching an exact Fraction
        computation of th = cov/var and y_adj = y_v - th*(x_v - x)."""
        import datetime as dt
        import os
        from fractions import Fraction

        base = dt.datetime(2024, 5, 1, tzinfo=dt.timezone.utc)
        rows = []
        eid = 0
        # users 0..19; even = variant 0, odd = variant 1. Give user u
        # (u // 2 + 1) pre events; odd users get 3 extra pre events
        # (imbalance) and the SAME post counts as their even neighbor.
        for u in range(20):
            pre = u // 2 + 1 + (3 if u % 2 else 0)
            post = u // 2 + 2
            for _ in range(pre):
                eid += 1
                rows.append((u, eid, base, "view", 0.0, "{}"))
            for _ in range(post):
                eid += 1
                rows.append(
                    (u, eid, base + dt.timedelta(days=20), "view", 0.0, "{}")
                )
        df = spark.createDataFrame(
            rows,
            "user_id long, event_id long, ts timestamp, event_type string,"
            " value double, props string",
        )
        p = str(tmp_path / "events.parquet")
        df.write.parquet(p)
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        got = {
            r["variant"]: r
            for r in QUERIES["cuped_adjusted_lift_events"](
                spark, os.path.dirname(p)
            ).collect()
        }
        # Fraction reference
        xs = {u: u // 2 + 1 + (3 if u % 2 else 0) for u in range(20)}
        ys = {u: u // 2 + 2 for u in range(20)}
        n = 20
        sx, sy = sum(xs.values()), sum(ys.values())
        sxy = sum(xs[u] * ys[u] for u in range(20))
        sxx = sum(x * x for x in xs.values())
        cov = Fraction(n * sxy - sx * sy)
        var = Fraction(n * sxx - sx * sx)
        th = cov / var
        for v in (0, 1):
            us = [u for u in range(20) if u % 2 == v]
            nv = len(us)
            xv = Fraction(sum(xs[u] for u in us), nv)
            yv = Fraction(sum(ys[u] for u in us), nv)
            adj = yv - th * (xv - Fraction(sx, n))
            val = adj * 1000
            exp = (1 if val >= 0 else -1) * (
                abs(val.numerator) // val.denominator
            )
            assert got[v]["adjusted_mean_y_milli"] == exp
        # raw post means are equal by construction; the covariate
        # imbalance makes variant 1's ADJUSTED mean lower
        assert got[0]["mean_y_milli"] == got[1]["mean_y_milli"]
        assert got[1]["adjusted_mean_y_milli"] < got[0]["adjusted_mean_y_milli"]


class TestAsofNearest:
    def test_direction_pick_and_ties(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            asof_join_nearest,
        )

        left = spark.createDataFrame(
            [
                ("u1", 100),  # clicks at 90 (d=10) and 105 (d=5) -> forward
                ("u2", 100),  # clicks at 95 (d=5) and 105 (d=5) -> TIE -> backward
                ("u3", 100),  # only a forward click at 200
                ("u4", 100),  # no clicks at all
                ("u5", 100),  # click exactly AT 100 -> backward, delta 0
            ],
            "k string, ts long",
        )
        right = spark.createDataFrame(
            [
                ("u1", 90), ("u1", 105),
                ("u2", 95), ("u2", 105),
                ("u3", 200),
                ("u5", 100),
            ],
            "k string, rts long",
        )
        got = {
            r["k"]: (r["rts_near"], r["__direction"])
            for r in asof_join_nearest(
                left, right, on="k", left_ts="ts", right_ts="rts",
                right_payload=[],
            ).collect()
        }
        assert got == {
            "u1": (105, "f"),
            "u2": (95, "b"),
            "u3": (200, "f"),
            "u4": (None, None),
            "u5": (100, "b"),
        }
