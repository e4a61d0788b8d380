"""Round-10 wave-13 tests: Blomqvist beta, NRR, GK lambda."""

from __future__ import annotations

import datetime as dt


class TestBlomqvist:
    def _run(self, spark, tmp_path, monthly):
        """monthly: list of (price_total, qty_total)."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for k, (p, q) in enumerate(monthly):
            y, m = divmod(k, 12)
            rows.append((dt.date(1995 + y, m + 1, 10), float(p), float(q)))
        spark.createDataFrame(
            rows, "l_shipdate date, l_extendedprice double, l_quantity double"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        return QUERIES["blomqvist_beta_rev_qty"](spark, str(tmp_path)).collect()[0]

    def test_comonotone_beta_1(self, spark, tmp_path):
        monthly = [(100 + 10 * k, 50 + 5 * k) for k in range(11)]
        r = self._run(spark, tmp_path, monthly)
        # 11 points: the median point sits ON both medians -> excluded;
        # remaining 10 all concordant
        assert (r["conc"], r["disc"]) == (10, 0)
        assert r["beta_ppm"] == 1_000_000

    def test_antitone_beta_minus_1(self, spark, tmp_path):
        monthly = [(100 + 10 * k, 500 - 5 * k) for k in range(11)]
        r = self._run(spark, tmp_path, monthly)
        assert r["beta_ppm"] == -1_000_000

    def test_mixed_counts(self, spark, tmp_path):
        # construct quadrant counts directly: medians at x=400, y=200
        pts = [(400, 200)]  # the double-median point, excluded
        pts += [(500 + i, 300 + i) for i in range(3)]   # ++ conc
        pts += [(300 - i, 100 - i) for i in range(3)]   # -- conc
        pts += [(500 + i, 100 - i) for i in range(2)]   # +- disc
        pts += [(300 - i, 300 + i) for i in range(2)]   # -+ disc
        r = self._run(spark, tmp_path, pts)
        assert (r["conc"], r["disc"]) == (6, 4)
        assert r["beta_ppm"] == ((6 - 4) * 10**6) // 10


class TestNRR:
    def _run(self, spark, tmp_path, orders):
        """orders: list of (custkey, month_index, dollars)."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for cust, m, d in orders:
            y, mm = divmod(m, 12)
            rows.append((cust, dt.date(1992 + y, mm + 1, 10), float(d)))
        spark.createDataFrame(
            rows, "o_custkey bigint, o_orderdate date, o_totalprice double"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        out = QUERIES["nrr_monthly_customers"](spark, str(tmp_path)).collect()
        return {r["month_index"]: r for r in out}

    def test_retention_and_expansion(self, spark, tmp_path):
        orders = [
            (1, 0, 100), (2, 0, 200), (3, 0, 300),
            (1, 1, 150),              # expansion
            (2, 1, 100),              # contraction
            # cust 3 churns
            (4, 1, 999),              # new customer, not in base 0
        ]
        got = self._run(spark, tmp_path, orders)
        m0 = got[0]
        assert m0["n_base"] == 3 and m0["n_retained"] == 2
        assert m0["base_rev"] == 60000 and m0["retained_rev"] == 25000
        assert m0["nrr_ppm"] == (25000 * 10**6) // 60000
        assert m0["logo_retention_ppm"] == (2 * 10**6) // 3
        # month 1's base includes cust 4; no month 2 -> zero retained
        m1 = got[1]
        assert m1["n_base"] == 3 and m1["retained_rev"] == 0


class TestGKLambda:
    def _run(self, spark, tmp_path, cells):
        """cells: dict (status, priority) -> count."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for (s, p), n in sorted(cells.items()):
            for _ in range(n):
                rows.append((s, p, dt.date(1995, 1, 5)))
        spark.createDataFrame(
            rows, "o_orderstatus string, o_orderpriority string, o_orderdate date"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        return QUERIES["gk_lambda_status_priority"](
            spark, str(tmp_path)
        ).collect()[0]

    def test_perfect_prediction_lambda_1(self, spark, tmp_path):
        cells = {("F", "1-U"): 10, ("O", "3-M"): 20, ("P", "5-L"): 5}
        r = self._run(spark, tmp_path, cells)
        # summax = 35, maxcol = 20, n = 35 -> (35-20)/(35-20) = 1
        assert r["lambda_ppm"] == 1_000_000

    def test_independent_rows_lambda_0(self, spark, tmp_path):
        # every row has the same modal column -> knowing the row
        # never changes the guess
        cells = {
            ("F", "1-U"): 10, ("F", "2-H"): 4,
            ("O", "1-U"): 20, ("O", "2-H"): 8,
        }
        r = self._run(spark, tmp_path, cells)
        assert r["lambda_ppm"] == 0

    def test_partial_reduction(self, spark, tmp_path):
        cells = {
            ("F", "1-U"): 12, ("F", "2-H"): 3,
            ("O", "2-H"): 9, ("O", "1-U"): 6,
        }
        r = self._run(spark, tmp_path, cells)
        n = 30
        summax = 12 + 9
        maxcol = 18  # priority 1-U: 12 + 6
        assert r["lambda_ppm"] == ((summax - maxcol) * 10**6) // (n - maxcol)
