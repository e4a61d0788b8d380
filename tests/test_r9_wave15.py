"""Round-9 wave-15 tests: Mood dispersion, Ljung-Box, Bowker."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter


class TestMoodDispersion:
    def _run(self, spark, rows):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            mood_dispersion_2samp,
        )

        df = spark.createDataFrame(rows, "g string, f boolean, v bigint")
        return {
            r["g"]: r
            for r in mood_dispersion_2samp(df, "g", "f", "v").collect()
        }

    @staticmethod
    def _ref(s1, s2):
        pts = sorted(s1 + s2)
        n = len(pts)
        cnt = Counter(pts)
        mr2, before = {}, 0
        for v in sorted(cnt):
            mr2[v] = 2 * before + cnt[v] + 1
            before += cnt[v]
        m1 = sum((mr2[v] - (n + 1)) ** 2 for v in s1)
        mt = sum((mr2[v] - (n + 1)) ** 2 for v in pts)
        return (m1 * 10**6) // mt, (len(s1) * 10**6) // n

    def test_wide_sample_gets_excess_share(self, spark):
        s1 = [1, 100]          # wide
        s2 = [50, 51, 52, 53]  # tight center
        rows = [("a", True, v) for v in s1] + [("a", False, v) for v in s2]
        got = self._run(spark, rows)
        mood, expect = self._ref(s1, s2)
        assert got["a"]["mood_ppm"] == mood
        assert got["a"]["expect_ppm"] == expect
        assert got["a"]["mood_ppm"] > got["a"]["expect_ppm"] * 2

    def test_identical_distributions_near_expectation(self, spark):
        s = list(range(1, 21))
        rows = [("a", True, v) for v in s] + [("a", False, v) for v in s]
        got = self._run(spark, rows)
        mood, expect = self._ref(s, s)
        assert got["a"]["mood_ppm"] == mood
        assert abs(got["a"]["mood_ppm"] - expect) < 10_000

    def test_ties_and_constant_group(self, spark):
        rows = [("c", True, 5), ("c", False, 5), ("c", False, 5)]
        got = self._run(spark, rows)
        # all values equal: every centered score is (2*0+3+1 - 4)^2 = 0
        assert got["c"]["mood_ppm"] is None
        assert got["c"]["expect_ppm"] == 333333


class TestLjungBox:
    def _run(self, spark, tmp_path, monthly_cents):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for k, cents in enumerate(monthly_cents):
            y, m = divmod(k, 12)
            rows.append((dt.date(1995 + y, m + 1, 1), float(cents) / 100.0))
        spark.createDataFrame(
            rows, "o_orderdate date, o_totalprice double"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        out = QUERIES["ljung_box_revenue"](spark, str(tmp_path)).collect()
        return sorted(out, key=lambda r: r["lag"])

    @staticmethod
    def _ref(series):
        n = len(series)
        s = sum(series)
        d = [n * x - s for x in series]
        c0 = sum(x * x for x in d)
        out = []
        cum = 0.0
        for k in range(1, 13):
            ck = sum(d[i] * d[i + k] for i in range(n - k))
            sign = 1 if ck >= 0 else -1
            r_ppm = sign * math.floor(abs(ck) * 1e6 / c0)
            cum += (ck / c0) * (ck / c0) / float(n - k)
            q = math.floor(float(n) * (n + 2) * 1e3 * cum)
            out.append((k, r_ppm, q))
        return out

    def test_matches_reference_on_seasonal_series(self, spark, tmp_path):
        series = [1000 + 300 * ((k % 12) in (10, 11)) + 7 * k for k in range(36)]
        got = self._run(spark, tmp_path, series)
        ref = self._ref(series)
        assert [(r["lag"], r["r_ppm"], r["q_milli"]) for r in got] == ref
        # seasonal lag-12 autocorrelation is strongly positive
        assert got[11]["r_ppm"] > 200_000

    def test_alternating_series_negative_lag1(self, spark, tmp_path):
        series = [1000 + (200 if k % 2 else -200) for k in range(30)]
        got = self._run(spark, tmp_path, series)
        ref = self._ref(series)
        assert [(r["lag"], r["r_ppm"], r["q_milli"]) for r in got] == ref
        assert got[0]["r_ppm"] < -800_000
        assert got[1]["r_ppm"] > 700_000


class TestBowkerSymmetry:
    def _run(self, spark, tmp_path, transitions):
        """transitions: list of (user, [event types in order])."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows, eid = [], 0
        base = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
        for u, seq in transitions:
            for j, t in enumerate(seq):
                eid += 1
                rows.append(
                    (u, eid, base + dt.timedelta(minutes=j), t, 0.0, "{}")
                )
        spark.createDataFrame(
            rows,
            "user_id long, event_id long, ts timestamp, event_type string,"
            " value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))
        out = QUERIES["bowker_symmetry_events"](spark, str(tmp_path)).collect()
        return {(r["t_lo"], r["t_hi"]): r for r in out}

    def test_counts_and_chi2(self, spark, tmp_path):
        # user 1: view->click x2 ; user 2: click->view x1 ;
        # user 3: view->purchase x3 (no reverse)
        trans = [
            (1, ["view", "click", "view", "click"]),  # v->c, c->v, v->c
            (2, ["click", "view"]),                   # c->v
            (3, ["view", "purchase", "view", "purchase", "view", "purchase"]),
        ]
        got = self._run(spark, tmp_path, trans)
        assert len(got) == 10
        r = got[("click", "view")]
        assert (r["n_lo_hi"], r["n_hi_lo"]) == (2, 2)  # c->v twice, v->c twice
        assert r["chi2_ppm"] == 0
        p = got[("purchase", "view")]
        # purchase->view twice (inside user 3's alternation), view->purchase 3x
        assert (p["n_lo_hi"], p["n_hi_lo"]) == (2, 3)
        assert p["chi2_ppm"] == (1 * 10**6) // 5
        dead = got[("error", "signup")]
        assert dead["chi2_ppm"] is None and dead["n_lo_hi"] == 0

    def test_symmetric_traffic_zero_everywhere(self, spark, tmp_path):
        trans = [(u, ["view", "click", "view"]) for u in range(3)]
        got = self._run(spark, tmp_path, trans)
        r = got[("click", "view")]
        assert r["n_lo_hi"] == r["n_hi_lo"] == 3
        assert r["chi2_ppm"] == 0
