"""Round-9 wave-13 tests: Cochran's Q, peaks with prominence."""

from __future__ import annotations

import datetime as dt


class TestCochranQ:
    def _run(self, spark, tmp_path, user_types):
        """user_types: dict user -> set of event types performed."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows, eid = [], 0
        base = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
        for u, types in user_types.items():
            for t in types:
                eid += 1
                rows.append((u, eid, base, t, 0.0, "{}"))
        spark.createDataFrame(
            rows,
            "user_id long, event_id long, ts timestamp, event_type string,"
            " value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))
        return QUERIES["cochran_q_event_types"](spark, str(tmp_path)).collect()[0]

    @staticmethod
    def _ref(user_types, k=5):
        types = ["view", "click", "purchase", "signup", "error"]
        t = [sum(1 for s in user_types.values() if ty in s) for ty in types]
        n = sum(t)
        us = [len(s & set(types)) for s in map(set, user_types.values())]
        den = k * (k * sum(us) - sum(u * u for u in us))
        if den <= 0:
            return None
        num = (k - 1) * sum((k * tj - n) ** 2 for tj in t)
        return (num * 10**6) // den

    def test_matches_reference(self, spark, tmp_path):
        ut = {
            1: {"view", "click"},
            2: {"view"},
            3: {"view", "click", "purchase"},
            4: {"view", "signup"},
            5: {"click", "error", "view"},
            6: {"view"},
        }
        r = self._run(spark, tmp_path, ut)
        assert r["n_users"] == 6
        assert r["t_view"] == 6 and r["t_click"] == 3
        assert r["q_ppm"] == self._ref(ut)
        assert r["q_ppm"] > 0

    def test_uniform_reach_zero_q(self, spark, tmp_path):
        # every user does exactly the same two types -> T_j equal
        # within {view, click}, but not across all five; construct
        # instead: every user does ALL five -> denominator zero -> NULL
        ut = {u: {"view", "click", "purchase", "signup", "error"} for u in range(4)}
        r = self._run(spark, tmp_path, ut)
        assert r["q_ppm"] is None

    def test_balanced_two_types_small_q(self, spark, tmp_path):
        # half the users do view, half do click (one type each):
        # T = (2,2,0,0,0) -> symmetric but nonzero Q vs the empty types
        ut = {1: {"view"}, 2: {"view"}, 3: {"click"}, 4: {"click"}}
        r = self._run(spark, tmp_path, ut)
        assert r["q_ppm"] == self._ref(ut)


class TestPeaksProminence:
    def _run(self, spark, tmp_path, monthly_cents):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for k, cents in enumerate(monthly_cents):
            y, m = divmod(k, 12)
            rows.append((dt.date(1995 + y, m + 1, 1), float(cents) / 100.0))
        spark.createDataFrame(
            rows, "o_orderdate date, o_totalprice double"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        out = QUERIES["peaks_monthly_revenue"](spark, str(tmp_path)).collect()
        return {r["rev_cents"]: r["prominence_cents"] for r in out}

    def test_matches_scipy_semantics(self, spark, tmp_path):
        series = [100, 300, 150, 500, 120, 260, 240, 700, 50, 400, 380]
        got = self._run(spark, tmp_path, series)
        try:
            import numpy as np
            from scipy.signal import find_peaks, peak_prominences
        except ImportError:
            # hand-computed scipy-definition values: base = min between
            # the peak and the nearest strictly-higher point per side
            # (whole side when none), prominence = peak - max(bases)
            assert got == {300: 150, 500: 380, 260: 20, 700: 600, 400: 20}
            return
        idx, _ = find_peaks(np.array(series))
        prom = peak_prominences(np.array(series), idx)[0]
        expect = {series[i]: int(p) for i, p in zip(idx, prom)}
        assert got == expect

    def test_monotone_series_no_peaks(self, spark, tmp_path):
        got = self._run(spark, tmp_path, [100, 200, 300, 400, 500])
        assert got == {}

    def test_plateau_not_a_strict_peak(self, spark, tmp_path):
        got = self._run(spark, tmp_path, [100, 300, 300, 100, 250, 90])
        # the 300-plateau has no strictly-greater-than-both-neighbors
        # point; only 250 qualifies
        assert set(got) == {250}
        # left base 100 (below the 300 plateau), right base 90 (no
        # higher point right): 250 - max(100, 90) = 150
        assert got[250] == 150
