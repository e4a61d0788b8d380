"""Round-9 wave-22 tests: partial correlation, lead-lag CCF, Mood's
median test."""

from __future__ import annotations

import datetime as dt
import math


def _lineitem_parquet(spark, tmp_path, monthly_rows):
    """monthly_rows: list of (price_cents, qty, disc_cents) — one
    lineitem per month."""
    rows = []
    for k, (pc, q, dc) in enumerate(monthly_rows):
        y, m = divmod(k, 12)
        rows.append(
            (
                dt.date(1995 + y, m + 1, 5),
                float(pc) / 100.0,
                float(q),
                float(dc) / 100.0,
            )
        )
    spark.createDataFrame(
        rows,
        "l_shipdate date, l_extendedprice double, l_quantity double,"
        " l_discount double",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


class TestPartialCorrelation:
    def _run(self, spark, tmp_path, monthly_rows):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        return QUERIES["partial_corr_rev_qty_disc"](
            spark, _lineitem_parquet(spark, tmp_path, monthly_rows)
        ).collect()[0]

    @staticmethod
    def _ref(xs, ys, zs):
        n = len(xs)

        def ctr(v):
            s = sum(v)
            return [n * a - s for a in v]

        dx, dy, dz = ctr(xs), ctr(ys), ctr(zs)

        def r(a, b):
            return sum(p * q for p, q in zip(a, b)) / math.sqrt(
                sum(p * p for p in a) * sum(q * q for q in b)
            )

        rxy, rxz, ryz = r(dx, dy), r(dx, dz), r(dy, dz)
        part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
        return (
            math.floor(rxy * 1e6),
            math.floor(rxz * 1e6),
            math.floor(ryz * 1e6),
            math.floor(part * 1e6),
        )

    def test_matches_reference(self, spark, tmp_path):
        import random

        rng = random.Random(9)
        rows = []
        for _ in range(24):
            z = rng.randint(100, 500)
            x = 3 * z + rng.randint(-50, 50)
            y = 2 * z + rng.randint(-40, 40)
            rows.append((x, y, z))
        r = self._run(spark, tmp_path, rows)
        exp = self._ref(*zip(*rows))
        assert (
            r["r_xy_ppm"],
            r["r_xz_ppm"],
            r["r_yz_ppm"],
            r["partial_xy_given_z_ppm"],
        ) == exp
        # x and y correlate mostly THROUGH z: partial far below raw
        assert r["partial_xy_given_z_ppm"] < r["r_xy_ppm"] - 100_000


class TestLeadLagCcf:
    def _run(self, spark, tmp_path, xy_rows):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = [(x, y, 0) for x, y in xy_rows]
        out = QUERIES["lead_lag_ccf_rev_qty"](
            spark, _lineitem_parquet(spark, tmp_path, rows)
        ).collect()
        return {r["lag"]: r for r in out}

    def test_planted_lead_detected(self, spark, tmp_path):
        # y at month t predicts x at month t+2: x_t = y_{t-2} pattern
        import random

        rng = random.Random(4)
        ys = [rng.randint(100, 900) for _ in range(30)]
        xs = [0, 0] + [10 * v for v in ys[:-2]]
        got = self._run(spark, tmp_path, list(zip(xs, ys)))
        assert len(got) == 13
        peaks = [k for k, r in got.items() if r["is_peak"]]
        assert peaks == [-2]  # dx at i correlates with dy at i-2 (lag -2)
        assert got[-2]["ccf_ppm"] > 700_000

    def test_contemporaneous_peak_at_zero(self, spark, tmp_path):
        import random

        rng = random.Random(6)
        ys = [rng.randint(100, 900) for _ in range(24)]
        got = self._run(spark, tmp_path, [(3 * v, v) for v in ys])
        assert [k for k, r in got.items() if r["is_peak"]] == [0]
        assert got[0]["ccf_ppm"] >= 999_999


class TestMoodsMedian:
    def _run(self, spark, tmp_path, groups):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        i = 0
        for g, vals in groups.items():
            for v in vals:
                i += 1
                rows.append((i, g, float(v) / 100.0))
        spark.createDataFrame(
            rows, "o_orderkey bigint, o_orderstatus string, o_totalprice double"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        out = QUERIES["moods_median_status"](spark, str(tmp_path)).collect()
        return {r["o_orderstatus"]: r for r in out}

    def test_counts_and_contributions(self, spark, tmp_path):
        groups = {
            "LO": [100, 110, 120, 130],
            "HI": [900, 910, 920, 930],
            "MIX": [105, 905],
        }
        got = self._run(spark, tmp_path, groups)
        # pooled sorted: grand lower median = 5th of 10 -> 130
        assert got["LO"]["above"] == 0 and got["LO"]["at_or_below"] == 4
        assert got["HI"]["above"] == 4
        assert got["MIX"]["above"] == 1 and got["MIX"]["at_or_below"] == 1
        # reference contribution for LO: O=0, n_g=4, ta=5, N=10
        n, ta, tb = 10, 5, 5
        o_above, ng = 0, 4
        c1 = ((o_above * n - ng * ta) ** 2 * 10**6) // (ng * ta * n)
        o_below = 4
        c2 = ((o_below * n - ng * tb) ** 2 * 10**6) // (ng * tb * n)
        assert got["LO"]["chi2_contrib_ppm"] == c1 + c2

    def test_identical_groups_near_zero(self, spark, tmp_path):
        vals = list(range(100, 120))
        got = self._run(spark, tmp_path, {"A": vals, "B": vals})
        for r in got.values():
            assert r["chi2_contrib_ppm"] < 20_000
