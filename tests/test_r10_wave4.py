"""Round-10 wave-4 tests: HL two-sample shift, KPSS, average
precision."""

from __future__ import annotations

import datetime as dt


def _orders_parquet(spark, tmp_path, monthly_dollars):
    rows = []
    for k, dollars in enumerate(monthly_dollars):
        y, m = divmod(k, 12)
        rows.append((dt.date(1995 + y, m + 1, 10), float(dollars)))
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


class TestHLShift:
    def _run(self, spark, tmp_path, ys):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        return QUERIES["hl_shift_monthly"](
            spark, _orders_parquet(spark, tmp_path, ys)
        ).collect()[0]

    @staticmethod
    def _ref_cents(ys):
        n = len(ys)
        cut = (n + 1) // 2
        a = [y * 100 for y in ys[:cut]]
        b = [y * 100 for y in ys[cut:]]
        diffs = sorted(vb - va for va in a for vb in b)
        return diffs[(len(diffs) + 1) // 2 - 1]

    def test_constant_shift_recovered(self, spark, tmp_path):
        ys = [100, 110, 105, 95, 100, 102, 350, 360, 355, 345, 350, 352]
        r = self._run(spark, tmp_path, ys)
        assert r["n_first"] == 6 and r["n_second"] == 6
        assert r["n_pairs"] == 36
        assert r["hl_shift_cents"] == self._ref_cents(ys)
        assert 24000 <= r["hl_shift_cents"] <= 26500  # ~ +250 dollars

    def test_odd_months(self, spark, tmp_path):
        ys = [100, 120, 110, 300, 310, 290, 305]
        r = self._run(spark, tmp_path, ys)
        assert r["n_first"] == 4 and r["n_second"] == 3
        assert r["hl_shift_cents"] == self._ref_cents(ys)


class TestKPSS:
    def _run(self, spark, tmp_path, ys):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        return QUERIES["kpss_level_revenue"](
            spark, _orders_parquet(spark, tmp_path, ys)
        ).collect()[0]

    @staticmethod
    def _ref(ys):
        n = len(ys)
        sy = sum(ys)
        e = [n * y - sy for y in ys]
        cs, s = [], 0
        for v in e:
            s += v
            cs.append(s)
        ssum = sum(v * v for v in cs)
        se2 = sum(v * v for v in e)
        wg = 0
        for j in range(1, 5):
            g = sum(e[t] * e[t - j] for t in range(j, n))
            wg += (5 - j) * g
        den = n * (5 * se2 + 2 * wg)
        return (5 * ssum * 1_000_000) // den if den > 0 else None

    def test_level_stationary_small(self, spark, tmp_path):
        ys = [100 + (7 if k % 2 else -7) for k in range(16)]
        r = self._run(spark, tmp_path, ys)
        assert r["kpss_ppm"] == self._ref(ys)
        assert r["kpss_ppm"] < 300_000  # stationary around the level

    def test_random_walkish_large(self, spark, tmp_path):
        # strongly trending = partial sums blow up vs short-run var
        ys = [100 + 20 * k + (3 if k % 2 else -3) for k in range(16)]
        r = self._run(spark, tmp_path, ys)
        assert r["kpss_ppm"] == self._ref(ys)
        # clearly above the stationary case (and above the 0.01-level
        # KPSS critical value 0.216)
        assert r["kpss_ppm"] > 400_000

    def test_constant_series_null(self, spark, tmp_path):
        ys = [500] * 10
        r = self._run(spark, tmp_path, ys)
        assert r["kpss_ppm"] is None


class TestAveragePrecision:
    def _run(self, spark, tmp_path, rows):
        """rows: (orderkey, price_dollars, priority_first_char)."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            [
                (k, float(p), f"{c}-X", dt.date(1995, 1, 5))
                for k, p, c in rows
            ],
            "o_orderkey bigint, o_totalprice double,"
            " o_orderpriority string, o_orderdate date",
        ).write.parquet(str(tmp_path / "orders.parquet"))
        return QUERIES["average_precision_priority"](
            spark, str(tmp_path)
        ).collect()[0]

    def test_perfect_ranking_ap_1(self, spark, tmp_path):
        rows = [(1, 900, 1), (2, 800, 1), (3, 700, 2), (4, 600, 3)]
        r = self._run(spark, tmp_path, rows)
        assert r["n_relevant"] == 2 and r["n_ranked"] == 4
        assert r["ap_qppm"] == 1_000_000

    def test_interleaved_matches_reference(self, spark, tmp_path):
        rows = [
            (1, 900, 2), (2, 800, 1), (3, 700, 3),
            (4, 600, 1), (5, 500, 2), (6, 400, 1),
        ]
        r = self._run(spark, tmp_path, rows)
        # relevant at ranks 2, 4, 6 -> precisions 1/2, 2/4, 3/6
        exp_sum = (1 * 10**6) // 2 + (2 * 10**6) // 4 + (3 * 10**6) // 6
        assert r["ap_qppm_sum"] == exp_sum
        assert r["ap_qppm"] == exp_sum // 3

    def test_price_tie_broken_by_orderkey(self, spark, tmp_path):
        rows = [(2, 500, 1), (1, 500, 2), (3, 400, 1)]
        r = self._run(spark, tmp_path, rows)
        # tie at 500: orderkey 1 (irrelevant) ranks first, then 2
        exp_sum = (1 * 10**6) // 2 + (2 * 10**6) // 3
        assert r["ap_qppm_sum"] == exp_sum
