"""Round-9 wave-3 tests: LIS patience fold, conversion-latency
median."""

from __future__ import annotations

import bisect
import random

from pyspark.sql import functions as F


def _lis_ref(vals):
    tails = []
    for y in vals:
        i = bisect.bisect_left(tails, y)  # strict LIS
        if i == len(tails):
            tails.append(y)
        else:
            tails[i] = y
    return len(tails)


class TestLisFold:
    def test_matches_patience_reference(self, spark):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import _LIS_FOLD

        rng = random.Random(31)
        cases = [
            [rng.randint(0, 50) for _ in range(rng.randint(1, 60))]
            for _ in range(40)
        ]
        cases += [
            [1, 2, 3, 4, 5],          # fully increasing
            [5, 4, 3, 2, 1],          # fully decreasing -> 1
            [7, 7, 7],                # ties break strict chains -> 1
            [3, 1, 2, 1, 2, 3],       # classic
        ]
        df = spark.createDataFrame(
            [(i, vals) for i, vals in enumerate(cases)],
            "i int, vals array<bigint>",
        )
        got = {
            r["i"]: r["lis"]
            for r in df.select(
                "i", F.expr(f"CAST({_LIS_FOLD} AS BIGINT)").alias("lis")
            ).collect()
        }
        for i, vals in enumerate(cases):
            assert got[i] == _lis_ref(vals), (i, vals, got[i])


class TestTimeToConvertMedian:
    def test_lower_median_of_first_conversion(self, spark, tmp_path):
        import datetime as dt
        import os

        base = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
        rows = []
        eid = 0
        # 3 converting views on one day with deltas 60s, 120s, 600s
        # (user 3's view has purchases at 600s AND 900s -> first wins);
        # one non-converting view; one purchase-only user
        for u, deltas in ((1, [60]), (2, [120]), (3, [600, 900])):
            eid += 1
            rows.append((u, eid, base, "view", 0.0, "{}"))
            for d in deltas:
                eid += 1
                rows.append(
                    (u, eid, base + dt.timedelta(seconds=d), "purchase", 0.0, "{}")
                )
        eid += 1
        rows.append((4, eid, base, "view", 0.0, "{}"))
        eid += 1
        rows.append((5, eid, base, "purchase", 0.0, "{}"))
        df = spark.createDataFrame(
            rows,
            "user_id long, event_id long, ts timestamp, event_type string,"
            " value double, props string",
        )
        p = str(tmp_path / "events.parquet")
        df.write.parquet(p)
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        out = QUERIES["time_to_convert_median"](
            spark, os.path.dirname(p)
        ).collect()
        assert len(out) == 1
        r = out[0]
        # deltas 60s, 120s, 600s -> lower median 120s = 120000 ms
        assert (r["n_conversions"], r["median_delta_ms"]) == (3, 120000)
