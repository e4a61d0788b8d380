"""Round-10 wave-10 tests: PACF lag-2, seasonal strength, median
polish."""

from __future__ import annotations

import datetime as dt
import math


def _orders_parquet(spark, tmp_path, monthly_dollars):
    rows = []
    for k, dollars in enumerate(monthly_dollars):
        y, m = divmod(k, 12)
        rows.append((dt.date(1995 + y, m + 1, 10), float(dollars)))
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


class TestPACF:
    def _run(self, spark, tmp_path, ys):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        return QUERIES["pacf_lag2_revenue"](
            spark, _orders_parquet(spark, tmp_path, ys)
        ).collect()[0]

    @staticmethod
    def _ref(ys):
        n = len(ys)
        sy = sum(ys)
        e = [n * y - sy for y in ys]
        g0 = sum(v * v for v in e)
        g1 = sum(e[t] * e[t - 1] for t in range(1, n))
        g2 = sum(e[t] * e[t - 2] for t in range(2, n))
        s1 = 1 if g1 >= 0 else -1
        phi11 = s1 * ((abs(g1) * 10**6) // g0) if g0 > 0 else None
        den = float(g0) * float(g0) - float(g1) * float(g1)
        phi22 = (
            math.floor(
                (float(g2) * float(g0) - float(g1) * float(g1)) / den * 1e6
            )
            if den > 0
            else None
        )
        return phi11, phi22

    def test_alternating_ar1_signature(self, spark, tmp_path):
        ys = [100 + (30 if k % 2 else -30) for k in range(20)]
        r = self._run(spark, tmp_path, ys)
        phi11, phi22 = self._ref(ys)
        assert (r["phi11_ppm"], r["phi22_ppm"]) == (phi11, phi22)
        assert r["phi11_ppm"] < -700_000  # strong negative lag-1

    def test_period2_vs_ar2(self, spark, tmp_path):
        # period-4 cycle: phi22 strongly negative (AR(2)-ish signature)
        ys = [100 + [40, 0, -40, 0][k % 4] for k in range(24)]
        r = self._run(spark, tmp_path, ys)
        phi11, phi22 = self._ref(ys)
        assert (r["phi11_ppm"], r["phi22_ppm"]) == (phi11, phi22)
        assert r["phi22_ppm"] < -500_000


class TestSeasonalStrength:
    def _run(self, spark, tmp_path, ys):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        return QUERIES["seasonal_strength_revenue"](
            spark, _orders_parquet(spark, tmp_path, ys)
        ).collect()[0]

    def test_strong_seasonality(self, spark, tmp_path):
        season = [50, -20, 30, -40, 10, 0, -10, 20, -30, 40, -50, 0]
        # noise period 5 is co-prime to the period-12 seasonal, so it
        # survives into the remainder (a k%2 wiggle would be absorbed
        # by the seasonal medians exactly and zero the remainder)
        ys = [1000 + season[k % 12] + (k % 5) - 2 for k in range(48)]
        r = self._run(spark, tmp_path, ys)
        assert r["seasonal_strength_ppm"] > 900_000
        # no trend: trend+remainder is ~noise, strength near 0 (can
        # be negative — the honest no-clamp contract)
        assert r["trend_strength_ppm"] < 500_000

    def test_strong_trend(self, spark, tmp_path):
        ys = [1000 + 25 * k + (k % 5) - 2 for k in range(48)]
        r = self._run(spark, tmp_path, ys)
        assert r["trend_strength_ppm"] > 900_000


class TestMedianPolish:
    def _run(self, spark, tmp_path, blocks):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        orows, crows, nrows = [], [], []
        for bi, (name, vals) in enumerate(sorted(blocks.items())):
            nrows.append((bi, name))
            crows.append((bi + 1, bi))
            for pr, dollars in enumerate(vals, start=1):
                orows.append(
                    (bi + 1, f"{pr}-X", dt.date(1995, 1, 5), float(dollars))
                )
        spark.createDataFrame(
            orows,
            "o_custkey bigint, o_orderpriority string,"
            " o_orderdate date, o_totalprice double",
        ).write.parquet(str(tmp_path / "orders.parquet"))
        spark.createDataFrame(
            crows, "c_custkey bigint, c_nationkey bigint"
        ).write.parquet(str(tmp_path / "customer.parquet"))
        spark.createDataFrame(
            nrows, "n_nationkey bigint, n_name string"
        ).write.parquet(str(tmp_path / "nation.parquet"))
        out = QUERIES["median_polish_nation_priority"](
            spark, str(tmp_path)
        ).collect()
        return {(r["n_name"], r["priority"]): r for r in out}

    @staticmethod
    def _lowmed(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    def test_one_sweep_decomposition(self, spark, tmp_path):
        blocks = {
            "A": [10, 20, 30, 40, 50],
            "B": [110, 120, 130, 140, 150],
            "C": [15, 25, 31, 47, 55],
        }
        got = self._run(spark, tmp_path, blocks)
        cents = {
            (b, j + 1): v * 100
            for b, vals in blocks.items()
            for j, v in enumerate(vals)
        }
        row_eff = {b: self._lowmed([cents[(b, j)] for j in range(1, 6)])
                   for b in blocks}
        col_eff = {
            j: self._lowmed([cents[(b, j)] - row_eff[b] for b in blocks])
            for j in range(1, 6)
        }
        for (b, j), r in got.items():
            assert r["row_effect_cents"] == row_eff[b]
            assert r["col_effect_cents"] == col_eff[j]
            assert (
                r["resid_cents"]
                == cents[(b, j)] - row_eff[b] - col_eff[j]
            )
        # additive-table sanity: identical shifted rows polish to
        # zero residual everywhere for A and B
        assert all(
            got[("A", j)]["resid_cents"] == got[("B", j)]["resid_cents"]
            for j in range(1, 6)
        )
