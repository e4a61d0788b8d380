"""Round-9 wave-21 tests: actuarial life table."""

from __future__ import annotations

from fractions import Fraction


def _ref(tiers_input):
    """tiers_input: list of (t, d, c) sorted by t. Returns per-tier
    (n, q_ppm, surv_scaled) with the operator's exact floor fold."""
    total = sum(d + c for _, d, c in tiers_input)
    out = {}
    left = 0
    acc = 1_000_000
    for t, d, c in tiers_input:
        n = total - left
        b = 2 * n - c
        a = 2 * n - c - 2 * d
        q = (2 * d * 10**6) // b if b > 0 else None
        if b > 0:
            acc = (acc * a) // b
        out[t] = (n, q, acc)
        left += d + c
    return out


class TestLifeTable:
    def _run(self, spark, rows):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            life_table_actuarial,
        )

        df = spark.createDataFrame(rows, "t bigint, ev int")
        out = life_table_actuarial(df, "t", "ev").collect()
        return {r["t"]: r for r in out}

    def test_matches_fraction_reference(self, spark):
        # tier 0: 3 events, 1 censored; tier 1: 1 event, 2 censored;
        # tier 2: 2 events, 1 censored
        rows = (
            [(0, 1)] * 3 + [(0, 0)]
            + [(1, 1)] + [(1, 0)] * 2
            + [(2, 1)] * 2 + [(2, 0)]
        )
        got = self._run(spark, rows)
        ref = _ref([(0, 3, 1), (1, 1, 2), (2, 2, 1)])
        for t, (n, q, surv) in ref.items():
            r = got[t]
            assert r["n_at_risk"] == n
            assert r["q_ppm"] == q
            assert r["surv_scaled"] == surv

    def test_halved_censoring_vs_km(self, spark):
        """Censoring in the SAME tier as events reduces exposure by
        half a head: the life-table hazard must sit between the KM
        hazard with censors removed (d/(n-c)) and with censors fully
        at risk (d/n)."""
        rows = [(0, 1)] * 2 + [(0, 0)] * 2 + [(1, 1)]
        got = self._run(spark, rows)
        q = got[0]["q_ppm"] / 1e6
        assert 2 / 5 < q < 2 / 3  # d/n = 0.4 < q = 2/4.? < d/(n-c) = 1.0
        assert abs(q - Fraction(2, 4)) < 1e-6  # d/(n - c/2) = 2/(5-1)

    def test_all_events_survival_hits_zero(self, spark):
        rows = [(0, 1)] * 4
        got = self._run(spark, rows)
        assert got[0]["surv_scaled"] == 0
        assert got[0]["q_ppm"] == 1_000_000

    def test_survival_monotone_nonincreasing(self, spark):
        import random

        rng = random.Random(2)
        rows = [(t, rng.randint(0, 1)) for t in range(6) for _ in range(10)]
        got = self._run(spark, rows)
        surv = [got[t]["surv_scaled"] for t in sorted(got)]
        assert all(a >= b for a, b in zip(surv, surv[1:]))
