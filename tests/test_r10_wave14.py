"""Round-10 wave-14 tests: ANOVA F, Brown-Forsythe, ICC(1)."""

from __future__ import annotations

import datetime as dt
import math


def _ref_anova(groups):
    """groups: dict g -> list of int values. Returns f_milli with the
    quantized between-term (S_g^2 div n_g floors)."""
    g = len(groups)
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    q = sum(x * x for v in groups.values() for x in v)
    bq = sum((sum(v) ** 2) // len(v) for v in groups.values())
    if g <= 1 or n <= g or q - bq <= 0:
        return None
    ssb = float(bq) - float(s) * float(s) / float(n)
    ssw = float(q) - float(bq)
    return math.floor(
        ssb / (float(g) - 1.0) / (ssw / (float(n) - float(g))) * 1000
    )


class TestAnovaF:
    def _run(self, spark, tmp_path, nations):
        """nations: dict name -> list of order dollars."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        orows, crows, nrows = [], [], []
        ck = 0
        for bi, (name, vals) in enumerate(sorted(nations.items())):
            nrows.append((bi, name))
            ck += 1
            crows.append((ck, bi))
            for v in vals:
                orows.append((ck, dt.date(1995, 1, 5), float(v)))
        spark.createDataFrame(
            orows, "o_custkey bigint, o_orderdate date, o_totalprice double"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        spark.createDataFrame(
            crows, "c_custkey bigint, c_nationkey bigint"
        ).write.parquet(str(tmp_path / "customer.parquet"))
        spark.createDataFrame(
            nrows, "n_nationkey bigint, n_name string"
        ).write.parquet(str(tmp_path / "nation.parquet"))
        return QUERIES["anova_f_revenue_nations"](
            spark, str(tmp_path)
        ).collect()[0]

    def test_separated_means_large_f(self, spark, tmp_path):
        nations = {
            "A": [100 + (i % 3) for i in range(12)],
            "B": [500 + (i % 3) for i in range(12)],
            "C": [900 + (i % 3) for i in range(12)],
        }
        r = self._run(spark, tmp_path, nations)
        assert r["n_groups"] == 3 and r["n_rows"] == 36
        assert r["f_milli"] == _ref_anova(nations)
        assert r["f_milli"] > 100_000_000  # huge separation

    def test_identical_means_small_f(self, spark, tmp_path):
        nations = {k: [200 + ((i + j) % 7) for i in range(15)]
                   for j, k in enumerate("ABC")}
        r = self._run(spark, tmp_path, nations)
        assert r["f_milli"] == _ref_anova(nations)
        assert r["f_milli"] < 5_000  # F around 1 or below


class TestBrownForsythe:
    def _run(self, spark, tmp_path, statuses):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for st, vals in sorted(statuses.items()):
            for v in vals:
                rows.append((st, float(v), dt.date(1995, 1, 5)))
        spark.createDataFrame(
            rows, "o_orderstatus string, o_totalprice double, o_orderdate date"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        return QUERIES["brown_forsythe_status"](
            spark, str(tmp_path)
        ).collect()[0]

    @staticmethod
    def _ref(statuses):
        groups = {}
        for st, vals in statuses.items():
            cents = sorted(v * 100 for v in vals)
            med = cents[(len(cents) + 1) // 2 - 1]
            groups[st] = [abs(v * 100 - med) for v in vals]
        g = len(groups)
        n = sum(len(v) for v in groups.values())
        s = sum(sum(v) for v in groups.values())
        q = sum(z * z for v in groups.values() for z in v)
        bq = sum((sum(v) ** 2) // len(v) for v in groups.values())
        if q - bq <= 0:
            return None
        ssb = float(bq) - float(s) * float(s) / float(n)
        ssw = float(q) - float(bq)
        return math.floor(
            ssb / (float(g) - 1.0) / (ssw / (float(n) - float(g))) * 1000
        )

    def test_unequal_spreads_large_bf(self, spark, tmp_path):
        statuses = {
            "F": [100 + (i % 3) for i in range(14)],         # tight
            "O": [100 + 40 * (i % 5) - 80 for i in range(14)],  # wide
        }
        r = self._run(spark, tmp_path, statuses)
        assert r["bf_milli"] == self._ref(statuses)
        assert r["bf_milli"] > 20_000

    def test_equal_spreads_small_bf(self, spark, tmp_path):
        statuses = {
            "F": [100 + 10 * (i % 4) for i in range(16)],
            "O": [900 + 10 * (i % 4) for i in range(16)],  # shifted only
        }
        r = self._run(spark, tmp_path, statuses)
        assert r["bf_milli"] == self._ref(statuses)
        assert r["bf_milli"] < 2_000


class TestICC1:
    def _run(self, spark, tmp_path, custs):
        """custs: dict custkey -> list of order dollars."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for ck, vals in sorted(custs.items()):
            for v in vals:
                rows.append((ck, dt.date(1995, 1, 5), float(v)))
        spark.createDataFrame(
            rows, "o_custkey bigint, o_orderdate date, o_totalprice double"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        return QUERIES["icc1_orders_per_customer"](
            spark, str(tmp_path)
        ).collect()[0]

    @staticmethod
    def _ref(custs):
        groups = {k: v for k, v in custs.items() if len(v) >= 2}
        g = len(groups)
        n = sum(len(v) for v in groups.values())
        s = sum(sum(v) for v in groups.values())
        q = sum(x * x for v in groups.values() for x in v)
        bq = sum((sum(v) ** 2) // len(v) for v in groups.values())
        n2 = sum(len(v) ** 2 for v in groups.values())
        if g <= 1 or n <= g or q - bq <= 0:
            return None
        msb = (float(bq) - float(s) ** 2 / float(n)) / (float(g) - 1.0)
        msw = (float(q) - float(bq)) / (float(n) - float(g))
        k0m1 = (float(n) - float(n2) / float(n)) / (float(g) - 1.0) - 1.0
        return math.floor((msb - msw) / (msb + k0m1 * msw) * 1e6)

    def test_strong_clustering(self, spark, tmp_path):
        custs = {
            1: [100, 101, 102],
            2: [500, 501],
            3: [900, 902, 901, 903],
            4: [50],  # singleton excluded
        }
        r = self._run(spark, tmp_path, custs)
        assert r["n_customers"] == 3 and r["n_orders"] == 9
        assert r["icc1_ppm"] == self._ref(custs)
        assert r["icc1_ppm"] > 900_000

    def test_no_clustering_near_zero(self, spark, tmp_path):
        vals = [100, 900, 500, 300, 700, 200, 800, 400, 600, 350, 650, 150]
        custs = {i + 1: [vals[2 * i], vals[2 * i + 1]] for i in range(6)}
        r = self._run(spark, tmp_path, custs)
        assert r["icc1_ppm"] == self._ref(custs)
        assert r["icc1_ppm"] < 400_000  # can be negative — honest
