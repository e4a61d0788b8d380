"""Round-8 wave-4 operators: exact sliding distinct (boundary diff),
Z-order key."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


class TestSlidingDistinctDaily:
    def test_matches_naive_recount(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            sliding_distinct_daily,
        )

        # users with overlapping, gapped activity; W=3 days
        active = {
            1: [0, 1, 5],
            2: [0, 10],
            3: [4, 5, 6, 12],
        }
        pairs = [(u, d) for u, days in active.items() for d in days]
        rows = [
            (u, dt.datetime(2020, 1, 1) + dt.timedelta(days=d), i)
            for i, (u, d) in enumerate(pairs)
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
        got = {
            r["day"]: (r["dau"], r["mau"])
            for r in sliding_distinct_daily(df, window_days=3).collect()
        }
        days = sorted(got)
        assert len(days) == 13  # gap-filled grid: offsets 0..12
        # naive recount oracle, indexed by day offset
        for i, day in enumerate(days):
            dau = sum(1 for u, ds in active.items() if i in ds)
            mau = sum(
                1
                for u, ds in active.items()
                if any(i - 2 <= d <= i for d in ds)
            )
            assert got[day] == (dau, mau), f"day offset {i}"

    def test_stickiness_is_exact_ppm(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            sliding_distinct_daily,
        )

        rows = [
            (1, dt.datetime(2020, 1, 1), 1),
            (2, dt.datetime(2020, 1, 1), 2),
            (2, dt.datetime(2020, 1, 3), 3),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
        got = sorted(
            sliding_distinct_daily(df, window_days=30).collect(),
            key=lambda r: r["day"],
        )
        assert [(r["dau"], r["mau"]) for r in got] == [(2, 2), (0, 2), (1, 2)]
        assert got[2]["stickiness_ppm"] == 500_000


class TestZorderKey:
    def test_interleave_matches_python(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            zorder_key,
        )

        def z_py(a, b, bits=6):
            z = 0
            for i in range(bits):
                z |= ((a >> i) & 1) << (2 * i)
                z |= ((b >> i) & 1) << (2 * i + 1)
            return z

        rows = [(a, b) for a in range(0, 64, 7) for b in range(0, 64, 9)]
        df = spark.createDataFrame(rows, "a long, b long")
        got = df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
        for r in got:
            assert r["z"] == z_py(r["a"], r["b"])

    def test_locality_better_than_single_column_sort(self, spark):
        """The point of z-order: consecutive z-runs bound BOTH dims.
        Sorting 4096 grid cells by z, every 64-cell run spans at most
        a 16x16 quadrant-ish box; sorting by a alone, each run spans
        the FULL b range."""
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            zorder_key,
        )

        rows = [(a, b) for a in range(64) for b in range(64)]
        df = spark.createDataFrame(rows, "a long, b long")
        zed = df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z"))
        spans = (
            zed.selectExpr("a", "b", "z div 64 AS pfx")
            .groupBy("pfx")
            .agg(
                (F.max("a") - F.min("a") + 1).alias("sa"),
                (F.max("b") - F.min("b") + 1).alias("sb"),
            )
            .collect()
        )
        assert all(r["sa"] * r["sb"] <= 64 for r in spans)  # tight boxes
