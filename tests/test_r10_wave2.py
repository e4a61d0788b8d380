"""Round-10 wave-2 tests: Anderson-Darling two-sample, variance
ratio, Page's trend test."""

from __future__ import annotations

import datetime as dt


class TestAndersonDarling:
    def _run(self, spark, rows):
        """rows: (group, side, value)."""
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            anderson_darling_two_sample,
        )

        df = spark.createDataFrame(
            rows, "g string, side int, v bigint"
        )
        out = anderson_darling_two_sample(df, "g", "side", "v").collect()
        return {r["g"]: r for r in out}

    @staticmethod
    def _ref(pairs, scale=1_000_000):
        """pairs: (side, value). Quantized-sum reference."""
        from collections import Counter

        n = len(pairs)
        n1 = sum(s for s, _ in pairs)
        tiers = sorted(Counter(v for _, v in pairs).items())
        ones = Counter(v for s, v in pairs if s)
        cum = cum1 = 0
        total = 0
        for v, l in tiers:
            cum += l
            cum1 += ones.get(v, 0)
            if cum >= n:
                break
            d = n * cum1 - n1 * cum
            total += (l * d * d * scale) // (cum * (n - cum) * n1 * (n - n1))
        return total

    def test_identical_distributions_small_a2(self, spark):
        rows = [("g", i % 2, (i // 2) * 10) for i in range(40)]
        got = self._run(spark, rows)["g"]
        assert got["n1"] == 20 and got["n2"] == 20
        pairs = [(s, v) for _, s, v in rows]
        assert got["a2_qscaled"] == self._ref(pairs)
        assert got["a2_qscaled"] < 1_000_000  # A2 << 1 for same dist

    def test_disjoint_supports_large_a2(self, spark):
        rows = [("g", 1, 100 + i) for i in range(10)]
        rows += [("g", 0, 500 + i) for i in range(10)]
        got = self._run(spark, rows)["g"]
        pairs = [(s, v) for _, s, v in rows]
        assert got["a2_qscaled"] == self._ref(pairs)
        assert got["a2_qscaled"] > 4_000_000  # strongly separated

    def test_empty_side_null(self, spark):
        rows = [("g", 1, i) for i in range(5)]
        got = self._run(spark, rows)["g"]
        assert got["a2_qscaled"] is None
        assert got["n1"] == 5 and got["n2"] == 0

    def test_ties_handled(self, spark):
        rows = [("g", 1, 1), ("g", 1, 1), ("g", 0, 1), ("g", 0, 2), ("g", 1, 2)]
        got = self._run(spark, rows)["g"]
        pairs = [(s, v) for _, s, v in rows]
        assert got["a2_qscaled"] == self._ref(pairs)


def _orders_parquet(spark, tmp_path, monthly_dollars):
    rows = []
    for k, dollars in enumerate(monthly_dollars):
        y, m = divmod(k, 12)
        rows.append((dt.date(1995 + y, m + 1, 10), float(dollars)))
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


class TestVarianceRatio:
    def _run(self, spark, tmp_path, ys):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        out = QUERIES["variance_ratio_revenue"](
            spark, _orders_parquet(spark, tmp_path, ys)
        ).collect()
        return {r["q"]: r for r in out}

    @staticmethod
    def _ref(ys, q):
        n = len(ys)
        drift = ys[-1] - ys[0]
        d1 = [(n - 1) * (ys[t] - ys[t - 1]) - drift for t in range(1, n)]
        dq = [(n - 1) * (ys[t] - ys[t - q]) - q * drift for t in range(q, n)]
        import math

        ss1, c1 = sum(v * v for v in d1), len(d1)
        ssq, cq = sum(v * v for v in dq), len(dq)
        if ss1 == 0 or cq == 0:
            return None
        return math.floor(
            float(ssq) * float(c1) * 1e6
            / (float(q) * float(cq) * float(ss1))
        )

    def test_trending_series_vr_above_1(self, spark, tmp_path):
        # pure trend + alternating wiggle: q-period sums smooth the
        # wiggle away relative to 1-period -> VR > 1 for the trend
        ys = [1000 + 50 * k + (7 if k % 2 else -7) for k in range(16)]
        got = self._run(spark, tmp_path, ys)
        assert set(got) == {2, 4}
        for q in (2, 4):
            assert got[q]["vr_ppm"] == self._ref(ys, q)

    def test_alternating_series_vr_below_1(self, spark, tmp_path):
        ys = [1000 + (100 if k % 2 else -100) for k in range(14)]
        got = self._run(spark, tmp_path, ys)
        assert got[2]["vr_ppm"] == self._ref(ys, 2)
        assert got[2]["vr_ppm"] < 600_000  # mean reversion
        assert got[4]["vr_ppm"] == self._ref(ys, 4)

    def test_perfect_line_null(self, spark, tmp_path):
        ys = [100 + 10 * k for k in range(12)]  # centered diffs all 0
        got = self._run(spark, tmp_path, ys)
        assert got[2]["vr_ppm"] is None


class TestPageTrend:
    def _run(self, spark, tmp_path, blocks):
        """blocks: dict block -> list of 5 per-priority dollar totals
        (priority 1..5 ordered)."""
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
        return QUERIES["page_trend_nations"](spark, str(tmp_path)).collect()[0]

    def test_perfect_increasing_trend(self, spark, tmp_path):
        blocks = {f"N{i}": [10, 20, 30, 40, 50] for i in range(4)}
        r = self._run(spark, tmp_path, blocks)
        # each block ranks 1..5 aligned with treatment: L = b * sum j*j
        assert r["n_blocks"] == 4 and r["n_treatments"] == 5
        assert r["l_stat"] == 4 * sum(j * j for j in range(1, 6))
        assert r["e_l"] == (4 * 5 * 36) // 4
        assert r["z_milli"] > 2500  # strong positive trend

    def test_reversed_trend_negative_z(self, spark, tmp_path):
        blocks = {f"N{i}": [50, 40, 30, 20, 10] for i in range(4)}
        r = self._run(spark, tmp_path, blocks)
        assert r["l_stat"] == 4 * sum(j * (6 - j) for j in range(1, 6))
        assert r["z_milli"] < -2500

    def test_l_matches_hand_ranks(self, spark, tmp_path):
        blocks = {"A": [30, 10, 20, 50, 40], "B": [10, 20, 30, 50, 40]}
        r = self._run(spark, tmp_path, blocks)
        # block A ranks by value: trt2=1,trt3=2,trt1=3,trt5=4,trt4=5
        la = 1 * 3 + 2 * 1 + 3 * 2 + 4 * 5 + 5 * 4
        lb = 1 * 1 + 2 * 2 + 3 * 3 + 4 * 5 + 5 * 4
        assert r["l_stat"] == la + lb
