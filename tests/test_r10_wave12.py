"""Round-10 wave-12 tests: p-chart, Cp/Cpk, Benford second digit."""

from __future__ import annotations

import datetime as dt
import math


class TestPChart:
    def _run(self, spark, tmp_path, months):
        """months: list of (n, r)."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for k, (n, r) in enumerate(months):
            y, m = divmod(k, 12)
            day = dt.date(1995 + y, m + 1, 10)
            for i in range(n):
                rows.append((day, "R" if i < r else "N"))
        spark.createDataFrame(
            rows, "l_shipdate date, l_returnflag string"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        out = QUERIES["p_chart_monthly_returns"](spark, str(tmp_path)).collect()
        return sorted(out, key=lambda x: x["month"])

    def test_special_cause_flagged(self, spark, tmp_path):
        months = [(200, 20)] * 8 + [(200, 70)] + [(200, 20)] * 3
        out = self._run(spark, tmp_path, months)
        flags = [r["out_of_control"] for r in out]
        assert flags[8] is True
        assert sum(1 for f in flags if f) == 1
        # z matches the reference double-floor expression
        tn = sum(n for n, _ in months)
        tr = sum(r for _, r in months)
        pbar = tr / tn
        n, r = months[8]
        z = math.floor(
            (r / n - pbar) / math.sqrt(pbar * (1 - pbar) / n) * 1000
        )
        assert out[8]["z_milli"] == z
        assert out[8]["p_ppm"] == (r * 10**6) // n

    def test_stable_process_no_flags(self, spark, tmp_path):
        months = [(150, 15 + (k % 3)) for k in range(10)]
        out = self._run(spark, tmp_path, months)
        assert not any(r["out_of_control"] for r in out)


class TestProcessCapability:
    def _run(self, spark, tmp_path, qtys):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            [(float(q),) for q in qtys], "l_quantity double"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        return QUERIES["process_capability_quantity"](
            spark, str(tmp_path)
        ).collect()[0]

    @staticmethod
    def _ref(qtys):
        n = len(qtys)
        sx = sum(qtys)
        sx2 = sum(q * q for q in qtys)
        var_core = n * sx2 - sx * sx
        if n <= 1 or var_core <= 0:
            return None, None
        sigma = math.sqrt(float(var_core) / float(n) / (float(n) - 1.0))
        mu = float(sx) / float(n)
        cp = math.floor((50.0 - 1.0) / (6.0 * sigma) * 1000)
        cpk = math.floor(min(50.0 - mu, mu - 1.0) / (3.0 * sigma) * 1000)
        return cp, cpk

    def test_centered_tight_process(self, spark, tmp_path):
        qtys = [24, 25, 26, 25, 25, 24, 26, 25] * 5
        r = self._run(spark, tmp_path, qtys)
        cp, cpk = self._ref(qtys)
        assert (r["cp_milli"], r["cpk_milli"]) == (cp, cpk)
        assert r["cp_milli"] > 5000  # tiny spread vs the 49-wide spec
        # centered: cpk close to cp
        assert r["cp_milli"] - r["cpk_milli"] < r["cp_milli"] // 2

    def test_off_center_process_cpk_drops(self, spark, tmp_path):
        qtys = [45, 46, 47, 46, 45, 47, 46, 46] * 5
        r = self._run(spark, tmp_path, qtys)
        cp, cpk = self._ref(qtys)
        assert (r["cp_milli"], r["cpk_milli"]) == (cp, cpk)
        assert r["cpk_milli"] < r["cp_milli"] // 3  # near the USL

    def test_constant_null(self, spark, tmp_path):
        r = self._run(spark, tmp_path, [25.0] * 10)
        assert r["cp_milli"] is None and r["cpk_milli"] is None


class TestBenfordSecondDigit:
    def _run(self, spark, tmp_path, prices):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            [("R", float(p)) for p in prices],
            "l_returnflag string, l_extendedprice double",
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        return QUERIES["benford_second_digit_audit"](
            spark, str(tmp_path)
        ).collect()

    def test_all_ten_cells_and_counts(self, spark, tmp_path):
        # cents values 1234 (d=2), 5678 (d=6), 9012 (d=0), 9 (excluded
        # — only one significant digit)
        prices = [12.34, 56.78, 90.12, 0.09, 12.99]
        out = self._run(spark, tmp_path, prices)
        assert len(out) == 10  # every digit cell emitted
        by_digit = {r["digit"]: r for r in out}
        assert by_digit[2]["obs"] == 2  # 1234 and 1299
        assert by_digit[6]["obs"] == 1
        assert by_digit[0]["obs"] == 1
        assert by_digit[5]["obs"] == 0
        assert all(r["n"] == 4 for r in out)  # the 9-cent row excluded
        # expected uses the literal P2 table
        from dpe_energy_performance_analysis_etl_spark.operators.quality import (
            BENFORD_P2,
        )

        for r in out:
            assert r["expected"] == 4.0 * BENFORD_P2[r["digit"]]
