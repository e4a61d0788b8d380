"""Round-10 wave-11 tests: GMD/Gini, VaR/ES, Bowley skewness."""

from __future__ import annotations

import datetime as dt


class TestGMD:
    def _run(self, spark, tmp_path, brand_vals):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        lrows, prows = [], []
        pk = 0
        for brand, vals in sorted(brand_vals.items()):
            pk += 1
            prows.append((pk, brand))
            for v in vals:
                lrows.append((pk, float(v)))
        spark.createDataFrame(
            lrows, "l_partkey bigint, l_extendedprice double"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        spark.createDataFrame(
            prows, "p_partkey bigint, p_brand string"
        ).write.parquet(str(tmp_path / "part.parquet"))
        out = QUERIES["gmd_dispersion_brands"](spark, str(tmp_path)).collect()
        return {r["p_brand"]: r for r in out}

    @staticmethod
    def _ref(vals):
        cents = sorted(int(round(v * 100)) for v in vals)
        n = len(cents)
        s = sum((2 * (i + 1) - n - 1) * v for i, v in enumerate(cents))
        gmd = (2 * s) // (n * (n - 1)) if n > 1 else None
        sv = sum(cents)
        gini = (s * 10**6) // (sv * (n - 1)) if sv > 0 and n > 1 else None
        return gmd, gini

    def test_matches_pairwise_definition(self, spark, tmp_path):
        vals = [10, 20, 20, 35, 50, 110]
        got = self._run(spark, tmp_path, {"B#1": vals})["B#1"]
        gmd, gini = self._ref(vals)
        assert (got["gmd_cents"], got["gini_ppm"]) == (gmd, gini)
        # brute-force pairwise check of the identity
        cents = [v * 100 for v in vals]
        n = len(cents)
        brute = sum(
            abs(a - b) for i, a in enumerate(cents) for b in cents[i + 1:]
        )
        assert got["gmd_cents"] == (2 * brute) // (n * (n - 1))

    def test_constant_values_zero(self, spark, tmp_path):
        got = self._run(spark, tmp_path, {"B#2": [50] * 6})["B#2"]
        assert got["gmd_cents"] == 0 and got["gini_ppm"] == 0


class TestVarES:
    def _run(self, spark, tmp_path, monthly_dollars):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for k, d in enumerate(monthly_dollars):
            y, m = divmod(k, 12)
            rows.append((dt.date(1995 + y, m + 1, 10), float(d)))
        spark.createDataFrame(
            rows, "o_orderdate date, o_totalprice double"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        return QUERIES["var_es_monthly_revenue"](spark, str(tmp_path)).collect()[0]

    def test_tail_pick_and_mean(self, spark, tmp_path):
        # 21 months -> 20 deltas; k = ceil(20/10) = 2: VaR = 2nd worst
        ys = [1000]
        deltas = [50, -300, 40, 30, -500, 20, 10, 60, -100, 25,
                  15, 45, 35, -50, 55, 65, 5, 70, 80, -200]
        for d in deltas:
            ys.append(ys[-1] + d)
        r = self._run(spark, tmp_path, ys)
        assert r["n_deltas"] == 20 and r["n_tail"] == 2
        worst = sorted(deltas)[:2]  # [-500, -300]
        assert r["var10_cents"] == worst[1] * 100
        tail_sum = sum(worst) * 100
        sign = 1 if tail_sum >= 0 else -1
        assert r["es10_cents"] == sign * (abs(tail_sum) // 2)


class TestBowley:
    def _run(self, spark, tmp_path, status_vals):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for st, vals in sorted(status_vals.items()):
            for v in vals:
                rows.append((st, float(v), dt.date(1995, 1, 5)))
        spark.createDataFrame(
            rows, "o_orderstatus string, o_totalprice double, o_orderdate date"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        out = QUERIES["bowley_skewness_status"](spark, str(tmp_path)).collect()
        return {r["o_orderstatus"]: r for r in out}

    @staticmethod
    def _ref(vals):
        cents = sorted(v * 100 for v in vals)
        n = len(cents)
        q1 = cents[(n + 3) // 4 - 1]
        q2 = cents[(n + 1) // 2 - 1]
        q3 = cents[(3 * n + 1) // 4 - 1]
        if q3 <= q1:
            return q1, q2, q3, None
        num = q3 + q1 - 2 * q2
        sign = 1 if num >= 0 else -1
        return q1, q2, q3, sign * ((abs(num) * 10**6) // (q3 - q1))

    def test_right_skewed_positive(self, spark, tmp_path):
        vals = [10, 11, 12, 13, 14, 15, 16, 30, 60, 120, 240]
        got = self._run(spark, tmp_path, {"F": vals})["F"]
        q1, q2, q3, b = self._ref(vals)
        assert (got["q1"], got["q2"], got["q3"], got["bowley_ppm"]) == (
            q1, q2, q3, b,
        )
        assert got["bowley_ppm"] > 300_000

    def test_symmetric_near_zero(self, spark, tmp_path):
        vals = list(range(10, 101, 10))
        got = self._run(spark, tmp_path, {"O": vals})["O"]
        q1, q2, q3, b = self._ref(vals)
        assert got["bowley_ppm"] == b
        assert abs(got["bowley_ppm"]) < 200_000

    def test_degenerate_null(self, spark, tmp_path):
        got = self._run(spark, tmp_path, {"P": [42] * 9})["P"]
        assert got["bowley_ppm"] is None
