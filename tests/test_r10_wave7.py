"""Round-10 wave-7 tests: dominant ACF period, Engle-Granger
cointegration, arc elasticity."""

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


class TestDominantPeriod:
    def _run(self, spark, tmp_path, ys):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        return QUERIES["dominant_period_revenue"](
            spark, _orders_parquet(spark, tmp_path, ys)
        ).collect()[0]

    @staticmethod
    def _ref(ys):
        n = len(ys)
        sy = sum(ys)
        e = [n * y - sy for y in ys]
        g0 = sum(v * v for v in e)
        best = None
        for j in range(2, 13):
            g = sum(e[t] * e[t - j] for t in range(j, n))
            if best is None or g > best[1]:
                best = (j, g)
        sign = 1 if best[1] >= 0 else -1
        ppm = sign * ((abs(best[1]) * 1_000_000) // g0) if g0 > 0 else None
        return best[0], ppm

    def test_period_4_cycle_found(self, spark, tmp_path):
        ys = [100 + [50, 0, -50, 0][k % 4] for k in range(24)]
        r = self._run(spark, tmp_path, ys)
        j, ppm = self._ref(ys)
        assert r["dominant_lag"] == j == 4
        assert r["acf_ppm"] == ppm
        assert r["acf_ppm"] > 700_000

    def test_period_12_cycle_found(self, spark, tmp_path):
        ys = [100 + (80 if k % 12 == 0 else 0) for k in range(36)]
        r = self._run(spark, tmp_path, ys)
        j, ppm = self._ref(ys)
        assert r["dominant_lag"] == j == 12
        assert r["acf_ppm"] == ppm


class TestEngleGranger:
    def _run(self, spark, tmp_path, monthly):
        """monthly: list of (price_dollars_total, qty_total)."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for k, (price, qty) in enumerate(monthly):
            y, m = divmod(k, 12)
            rows.append(
                (dt.date(1995 + y, m + 1, 10), float(price), float(qty))
            )
        spark.createDataFrame(
            rows, "l_shipdate date, l_extendedprice double, l_quantity double"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        return QUERIES["engle_granger_rev_qty"](spark, str(tmp_path)).collect()[0]

    @staticmethod
    def _ref(monthly):
        xs = [int(p) for p, _ in monthly]
        qs = [int(q) for _, q in monthly]
        n = len(xs)
        sq, sx = sum(qs), sum(xs)
        sq2 = sum(q * q for q in qs)
        sqx = sum(q * x for q, x in zip(qs, xs))
        nb = n * sqx - sq * sx
        anum = sx * sq2 - sq * sqx
        d = n * sq2 - sq * sq
        if d <= 0:
            return None
        e = []
        for x, q in zip(xs, qs):
            raw = d * x - anum - nb * q
            sign = 1 if raw >= 0 else -1
            e.append(sign * (abs(raw) // d))
        sxy = sum(e[t - 1] * (e[t] - e[t - 1]) for t in range(1, n))
        sxx = sum(e[t - 1] ** 2 for t in range(1, n))
        sdd = sum((e[t] - e[t - 1]) ** 2 for t in range(1, n))
        m = n - 1
        if sxx <= 0 or m <= 1:
            return None
        arg = float(sdd) - float(sxy) * float(sxy) / float(sxx)
        if arg <= 0:
            return None
        rho = float(sxy) / float(sxx)
        se = math.sqrt(arg / (float(m) - 1.0) / float(sxx))
        return math.floor(rho / se * 1000)

    def test_cointegrated_strongly_negative_t(self, spark, tmp_path):
        # revenue tracks 10*qty with bounded alternating noise: the
        # residual mean-reverts hard -> DF t << 0
        monthly = [
            (10 * (1000 + 13 * k) + (40 if k % 2 else -40), 1000 + 13 * k)
            for k in range(24)
        ]
        r = self._run(spark, tmp_path, monthly)
        assert r["n_months"] == 24 and r["n_diffs"] == 23
        assert r["adf_t_milli"] == self._ref(monthly)
        assert r["adf_t_milli"] < -3000

    def test_spurious_trend_weak_t(self, spark, tmp_path):
        # revenue drifts away from the qty relation (quadratic gap
        # with wiggle): residuals trend, |t| small
        monthly = [
            (
                10 * 1000 + 3 * k * k + (11 if k % 2 else -11),
                1000 + 17 * k,
            )
            for k in range(24)
        ]
        r = self._run(spark, tmp_path, monthly)
        assert r["adf_t_milli"] == self._ref(monthly)
        assert r["adf_t_milli"] > -2500


class TestArcElasticity:
    def _run(self, spark, tmp_path, brand_halves):
        """brand_halves: brand -> ((q1, unit_price1), (q2, unit_price2));
        one lineitem per unit keeps revenue = qty * price exact."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        lrows, prows = [], []
        pk = 0
        for bi, (brand, (h1, h2)) in enumerate(sorted(brand_halves.items())):
            pk += 1
            prows.append((pk, brand))
            for h, (q, price) in enumerate((h1, h2)):
                day = dt.date(1995, 1, 5) if h == 0 else dt.date(1997, 12, 20)
                lrows.append((pk, float(q), float(price * q), day))
        spark.createDataFrame(
            lrows,
            "l_partkey bigint, l_quantity double,"
            " l_extendedprice double, l_shipdate date",
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        spark.createDataFrame(
            prows, "p_partkey bigint, p_brand string"
        ).write.parquet(str(tmp_path / "part.parquet"))
        out = QUERIES["arc_elasticity_brands"](spark, str(tmp_path)).collect()
        return {r["p_brand"]: r for r in out}

    @staticmethod
    def _ref(q1, r1c, q2, r2c):
        num = (q2 - q1) * (r1c * q2 + r2c * q1)
        den = (r2c * q1 - r1c * q2) * (q1 + q2)
        if den == 0:
            return None
        sign = 1 if num * den >= 0 else -1
        return sign * ((abs(num) * 1_000_000) // abs(den))

    def test_unit_elastic(self, spark, tmp_path):
        # price doubles, quantity halves -> arc elasticity = -1
        got = self._run(spark, tmp_path, {"B#1": ((100, 10), (50, 20))})
        r = got["B#1"]
        ref = self._ref(100, 100 * 10 * 100, 50, 50 * 20 * 100)
        assert r["arc_elasticity_ppm"] == ref == -1_000_000

    def test_inelastic_good(self, spark, tmp_path):
        # price doubles, quantity dips 10% -> |E| << 1
        got = self._run(spark, tmp_path, {"B#2": ((100, 10), (90, 20))})
        ref = self._ref(100, 100 * 10 * 100, 90, 90 * 20 * 100)
        assert got["B#2"]["arc_elasticity_ppm"] == ref
        assert -400_000 < got["B#2"]["arc_elasticity_ppm"] < 0

    def test_no_price_change_null(self, spark, tmp_path):
        got = self._run(spark, tmp_path, {"B#3": ((100, 10), (80, 10))})
        assert got["B#3"]["arc_elasticity_ppm"] is None
