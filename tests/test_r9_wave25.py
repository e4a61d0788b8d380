"""Round-9 wave-25 tests: Haar wavelet energy decomposition."""

from __future__ import annotations

import datetime as dt
import math


def _orders_parquet(spark, tmp_path, monthly_cents):
    rows = []
    for k, cents in enumerate(monthly_cents):
        y, m = divmod(k, 12)
        rows.append((dt.date(1995 + y, m + 1, 1), float(cents) / 100.0))
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _ref(series, levels=4):
    """Unnormalized Haar pyramid on the first 64 values with the
    query's 2^(L-l) energy rescale."""
    cur = series[:64]
    out = {}
    for lvl in range(1, levels + 1):
        d = [cur[2 * i] - cur[2 * i + 1] for i in range(len(cur) // 2)]
        s = [cur[2 * i] + cur[2 * i + 1] for i in range(len(cur) // 2)]
        e = sum(x * x for x in d) * (1 << (levels - lvl))
        out[lvl] = (len(d), e)
        cur = s
    te = sum(e for _, e in out.values())
    return {
        lvl: (n, float(e), (e * 10**6) // te if te > 0 else None)
        for lvl, (n, e) in out.items()
    }


class TestHaarEnergy:
    def _run(self, spark, tmp_path, cents):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        out = QUERIES["haar_energy_revenue"](
            spark, _orders_parquet(spark, tmp_path, cents)
        ).collect()
        return {r["level"]: r for r in out}

    def test_matches_reference(self, spark, tmp_path):
        import random

        rng = random.Random(17)
        cents = [1000 + rng.randint(-400, 400) for _ in range(70)]
        got = self._run(spark, tmp_path, cents)
        ref = _ref(cents)
        for lvl, (n, e, share) in ref.items():
            r = got[lvl]
            assert r["n_coeffs"] == n
            assert r["energy_scaled"] == e
            assert r["share_ppm"] == share

    def test_alternating_signal_all_energy_at_level1(self, spark, tmp_path):
        cents = [1000 + (100 if k % 2 == 0 else -100) for k in range(64)]
        got = self._run(spark, tmp_path, cents)
        assert got[1]["share_ppm"] == 1_000_000
        assert all(got[l]["share_ppm"] == 0 for l in (2, 3, 4))

    def test_period16_square_wave_peaks_at_level4(self, spark, tmp_path):
        # a 16-month square wave: constant within every 8-month half,
        # so levels 1-3 see zero differences and level 4 carries all
        cents = [1000 + (200 if (k // 8) % 2 == 0 else -200) for k in range(64)]
        got = self._run(spark, tmp_path, cents)
        assert got[4]["share_ppm"] == 1_000_000
        assert all(got[l]["share_ppm"] == 0 for l in (1, 2, 3))

    def test_short_series_truncates_pyramid(self, spark, tmp_path):
        got = self._run(spark, tmp_path, [1000 + k * 7 for k in range(20)])
        # 20 months -> 10, 5, 2, 1 coefficients per level
        assert [got[l]["n_coeffs"] for l in (1, 2, 3, 4)] == [10, 5, 2, 1]
