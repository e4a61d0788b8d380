"""Round-9 wave-11 tests: HL pseudo-median, Cramér-von Mises,
Moran's I."""

from __future__ import annotations

import datetime as dt
from fractions import Fraction


class TestHlPseudomedian:
    def _run(self, spark, tmp_path, monthly_cents):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for k, cents in enumerate(monthly_cents):
            y, m = divmod(k, 12)
            rows.append((dt.date(1995 + y, m + 1, 1), float(cents) / 100.0))
        spark.createDataFrame(
            rows, "o_orderdate date, o_totalprice double"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        return QUERIES["hl_pseudomedian_revenue"](spark, str(tmp_path)).collect()[0]

    def test_matches_brute_force(self, spark, tmp_path):
        vals = [100, 500, 300, 900, 200]
        r = self._run(spark, tmp_path, vals)
        walsh2 = sorted(
            vals[i] + vals[j]
            for i in range(len(vals))
            for j in range(i, len(vals))
        )
        n = len(walsh2)
        expect = walsh2[(n + 1) // 2 - 1]
        assert r["n_months"] == 5
        assert r["n_walsh_pairs"] == n == 15
        assert r["pseudo_median_2x_cents"] == expect
        assert r["pseudo_median_cents"] == expect // 2

    def test_outlier_robustness(self, spark, tmp_path):
        # one wild month barely moves the pseudo-median
        base = [100, 110, 120, 130, 140, 150]
        r0 = self._run(spark, tmp_path, base)
        spiked = base[:-1] + [1_000_000]
        # fresh dir for the second parquet
        import tempfile, pathlib

        d2 = pathlib.Path(tempfile.mkdtemp())
        r1 = self._run(spark, d2, spiked)
        assert abs(r1["pseudo_median_2x_cents"] - r0["pseudo_median_2x_cents"]) <= 60


class TestCramerVonMises:
    def _run(self, spark, rows):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            cramer_von_mises_2samp,
        )

        df = spark.createDataFrame(rows, "g string, f boolean, v bigint")
        return {
            r["g"]: r for r in cramer_von_mises_2samp(df, "g", "f", "v").collect()
        }

    @staticmethod
    def _ref(sample1, sample2):
        """T = nm/N^2 * sum over all points of (F - G)^2, then the
        operator's two fixed-order floors at ppm scale."""
        n, m = len(sample1), len(sample2)
        pts = sorted(sample1 + sample2)
        vals = sorted(set(pts))
        t_num = 0
        for v in vals:
            c = pts.count(v)
            a = sum(1 for x in sample1 if x <= v)
            b = sum(1 for x in sample2 if x <= v)
            t_num += c * (m * a - n * b) ** 2
        step1 = t_num // ((n + m) * (n + m))
        return (step1 * 1_000_000) // (n * m)

    def test_identical_samples_near_zero(self, spark):
        s = [1, 2, 3, 4, 5, 6, 7, 8]
        rows = [("a", True, v) for v in s] + [("a", False, v) for v in s]
        got = self._run(spark, rows)
        assert got["a"]["cvm_ppm"] == self._ref(s, s)
        assert got["a"]["cvm_ppm"] < 100_000  # well below any rejection

    def test_disjoint_samples_large(self, spark):
        s1 = [1, 2, 3, 4]
        s2 = [10, 11, 12, 13]
        rows = [("a", True, v) for v in s1] + [("a", False, v) for v in s2]
        got = self._run(spark, rows)
        assert got["a"]["cvm_ppm"] == self._ref(s1, s2)
        assert got["a"]["cvm_ppm"] > 300_000

    def test_ties_and_unequal_sizes(self, spark):
        s1 = [1, 1, 2, 5, 5, 9]
        s2 = [1, 3, 5]
        rows = [("a", True, v) for v in s1] + [("a", False, v) for v in s2]
        got = self._run(spark, rows)
        assert got["a"]["n1"] == 6 and got["a"]["n2"] == 3
        assert got["a"]["cvm_ppm"] == self._ref(s1, s2)

    def test_empty_sample_null(self, spark):
        rows = [("a", True, v) for v in [1, 2, 3]]
        got = self._run(spark, rows)
        assert got["a"]["cvm_ppm"] is None


class TestMoransI:
    def _run(self, spark, cells):
        from dpe_energy_performance_analysis_etl_spark.operators.spatial import (
            morans_i_grid,
        )

        df = spark.createDataFrame(cells, "cx bigint, cy bigint, val bigint")
        return morans_i_grid(df, "cx", "cy", "val").collect()[0]

    @staticmethod
    def _ref(cells):
        n = len(cells)
        s = sum(v for _, _, v in cells)
        d = {(x, y): n * v - s for x, y, v in cells}
        pairs = [
            (d[(x, y)], d[k])
            for (x, y) in d
            for k in [(x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)]
            if k in d
        ]
        w = len(pairs)
        cross = sum(a * b for a, b in pairs)
        var = sum(v * v for v in d.values())
        sign = 1 if cross >= 0 else -1
        return w, sign * ((abs(cross) * n * 1_000_000) // (var * w))

    def test_checkerboard_is_negative(self, spark):
        cells = [(x, y, 100 if (x + y) % 2 == 0 else 0)
                 for x in range(4) for y in range(4)]
        r = self._run(spark, cells)
        w, expect = self._ref(cells)
        assert r["w_pairs"] == w
        assert r["morans_i_scaled"] == expect
        assert r["morans_i_scaled"] < -900_000  # near -1

    def test_gradient_is_positive(self, spark):
        cells = [(x, y, 10 * x + y) for x in range(4) for y in range(4)]
        r = self._run(spark, cells)
        _, expect = self._ref(cells)
        assert r["morans_i_scaled"] == expect
        assert r["morans_i_scaled"] > 500_000

    def test_constant_field_null(self, spark):
        cells = [(x, y, 7) for x in range(3) for y in range(3)]
        r = self._run(spark, cells)
        assert r["morans_i_scaled"] is None

    def test_isolated_cells_no_pairs(self, spark):
        cells = [(0, 0, 5), (5, 5, 9)]
        r = self._run(spark, cells)
        assert r["w_pairs"] == 0
        assert r["morans_i_scaled"] is None
