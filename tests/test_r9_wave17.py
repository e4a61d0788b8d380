"""Round-9 wave-17 tests: Grubbs, Chao1, rescaled range."""

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


class TestGrubbs:
    def _run(self, spark, tmp_path, cents):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        return QUERIES["grubbs_outlier_month"](
            spark, _orders_parquet(spark, tmp_path, cents)
        ).collect()[0]

    def test_matches_textbook_formula(self, spark, tmp_path):
        cents = [100, 110, 105, 95, 500, 102, 98]
        r = self._run(spark, tmp_path, cents)
        n = len(cents)
        mean = sum(cents) / n
        s = math.sqrt(sum((x - mean) ** 2 for x in cents) / (n - 1))
        g = max(abs(x - mean) for x in cents) / s
        # the operator's integer path: |n*x - S| / sqrt(ss / (n-1))
        # equals g exactly up to float evaluation order
        assert r["rev_cents"] == 500
        assert abs(r["g_milli"] / 1000 - g) < 2e-3
        assert r["n_months"] == n

    def test_constant_series_null(self, spark, tmp_path):
        r = self._run(spark, tmp_path, [100] * 6)
        assert r["g_milli"] is None

    def test_tie_prefers_earlier_month(self, spark, tmp_path):
        # two symmetric extremes: deterministic pick = earlier month
        r = self._run(spark, tmp_path, [100, 200, 0, 100])
        assert r["rev_cents"] == 200  # |d| equal for 200 and 0; month 2 < month 3


class TestChao1:
    def _run(self, spark, tmp_path, source_docs):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = [
            (i, text, "en", src, len(text))
            for i, (src, text) in enumerate(source_docs)
        ]
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint"
        ).write.parquet(str(tmp_path / "documents.parquet"))
        out = QUERIES["chao1_vocab_richness"](spark, str(tmp_path)).collect()
        return {r["source"]: r for r in out}

    def test_formula_with_doubletons(self, spark, tmp_path):
        # a: once; b: once; c: twice; d: three times
        docs = [("s1", "a b c"), ("s1", "c d d d")]
        got = self._run(spark, tmp_path, docs)
        r = got["s1"]
        assert r["d_observed"] == 4
        assert r["f1"] == 2 and r["f2"] == 1
        assert r["chao1_estimate"] == 4 + (2 * 2) // (2 * 1)

    def test_bias_corrected_no_doubletons(self, spark, tmp_path):
        docs = [("s1", "a b c c c")]
        got = self._run(spark, tmp_path, docs)
        r = got["s1"]
        assert r["f1"] == 2 and r["f2"] == 0
        assert r["chao1_estimate"] == 3 + (2 * 1) // 2

    def test_saturated_vocab_no_lift(self, spark, tmp_path):
        docs = [("s1", "x x y y z z")]
        got = self._run(spark, tmp_path, docs)
        assert got["s1"]["chao1_estimate"] == 3  # f1 = 0


class TestRescaledRange:
    def _run(self, spark, tmp_path, cents):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        out = QUERIES["rescaled_range_revenue"](
            spark, _orders_parquet(spark, tmp_path, cents)
        ).collect()
        return {r["window_size"]: r for r in out}

    @staticmethod
    def _ref_block(vals):
        w = len(vals)
        bs = sum(vals)
        d = [w * x - bs for x in vals]
        cum, c = [], 0
        for x in d:
            c += x
            cum.append(c)
        r = max(cum) - min(min(cum), 0)
        ss = sum(x * x for x in d)
        if ss == 0:
            return None
        return math.floor(r * 1000 / math.sqrt(ss / w))

    def test_matches_reference(self, spark, tmp_path):
        import random

        rng = random.Random(11)
        cents = [1000 + rng.randint(-300, 300) for _ in range(40)]
        got = self._run(spark, tmp_path, cents)
        for w in (8, 16, 32):
            blocks = [cents[i : i + w] for i in range(0, len(cents) - w + 1, w)]
            blocks = [b for b in blocks if len(b) == w]
            rs = [self._ref_block(b) for b in blocks]
            rs = [x for x in rs if x is not None]
            assert got[w]["n_blocks"] == len(rs)
            assert got[w]["mean_rs_milli"] == sum(rs) // len(rs)

    def test_partial_blocks_dropped(self, spark, tmp_path):
        got = self._run(spark, tmp_path, [100 + i for i in range(20)])
        assert got[8]["n_blocks"] == 2   # 20 // 8
        assert got[16]["n_blocks"] == 1
        assert got[32]["n_blocks"] == 0
        assert got[32]["mean_rs_milli"] is None

    def test_trending_rs_grows_superlinearly(self, spark, tmp_path):
        # strong trend -> R/S at w=32 much larger than sqrt(32/8)x the w=8 one
        cents = [100 + 50 * k for k in range(64)]
        got = self._run(spark, tmp_path, cents)
        ratio = got[32]["mean_rs_milli"] / got[8]["mean_rs_milli"]
        # H = 0.5 scaling would give ratio ~= sqrt(4) = 2; a pure trend
        # (H -> 1) approaches 4 — require clearly above the random level
        assert ratio > 3.5
