"""Round-9 wave-19 tests: Kendall tau-b via dominance counting."""

from __future__ import annotations

import math


def _ref_triple(pairs):
    """Brute-force C, D, tau-b, somers, gamma with the operator's
    exact floor conventions."""
    n = len(pairs)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            (x1, y1), (x2, y2) = pairs[i], pairs[j]
            s = (x1 - x2) * (y1 - y2)
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
    from collections import Counter

    tx = Counter(x for x, _ in pairs)
    ty = Counter(y for _, y in pairs)
    n02 = n * (n - 1)
    tx2 = sum(t * (t - 1) for t in tx.values())
    ty2 = sum(t * (t - 1) for t in ty.values())
    sgn = 1 if conc >= disc else -1
    tau = None
    if n02 > tx2 and n02 > ty2:
        tau = sgn * math.floor(
            abs(conc - disc) * 2e6 / math.sqrt((n02 - tx2) * (n02 - ty2))
        )
    som = sgn * ((abs(conc - disc) * 2_000_000) // (n02 - tx2)) if n02 > tx2 else None
    gam = (
        sgn * ((abs(conc - disc) * 1_000_000) // (conc + disc))
        if conc + disc > 0
        else None
    )
    return conc, disc, tau, som, gam


class TestKendallTauB:
    def _run(self, spark, rows, x_values):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            kendall_tau_b_bounded,
        )

        df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
        out = kendall_tau_b_bounded(df, "g", "x", "y", x_values).collect()
        return {r["g"]: r for r in out}

    def test_matches_brute_force_with_ties(self, spark):
        import random

        rng = random.Random(5)
        pairs = [
            (rng.randint(1, 5), rng.choice([10, 20, 30, 40, 50, 60]))
            for _ in range(40)
        ]
        got = self._run(
            spark, [("a", x, y) for x, y in pairs], list(range(1, 6))
        )
        conc, disc, tau, som, gam = _ref_triple(pairs)
        r = got["a"]
        assert r["concordant"] == float(conc)
        assert r["discordant"] == float(disc)
        assert r["tau_b_ppm"] == tau
        assert r["somers_d_ppm"] == som
        assert r["gamma_ppm"] == gam

    def test_perfect_monotone(self, spark):
        pairs = [(i, 100 * i) for i in range(1, 6)]
        got = self._run(spark, [("m", x, y) for x, y in pairs], list(range(1, 6)))
        r = got["m"]
        assert r["tau_b_ppm"] == 1_000_000
        assert r["somers_d_ppm"] == 1_000_000
        assert r["gamma_ppm"] == 1_000_000
        assert r["discordant"] == 0.0

    def test_perfect_inverse(self, spark):
        pairs = [(i, -7 * i) for i in range(1, 6)]
        got = self._run(spark, [("v", x, y) for x, y in pairs], list(range(1, 6)))
        assert got["v"]["tau_b_ppm"] == -1_000_000

    def test_all_tied_x_null(self, spark):
        rows = [("t", 3, y) for y in (1, 2, 3, 4)]
        got = self._run(spark, rows, [1, 2, 3])
        r = got["t"]
        assert r["tau_b_ppm"] is None and r["somers_d_ppm"] is None
        assert r["gamma_ppm"] is None  # no concordant or discordant pairs

    def test_groups_independent(self, spark):
        rows = [("up", 1, 1), ("up", 2, 2), ("dn", 1, 2), ("dn", 2, 1)]
        got = self._run(spark, rows, [1, 2])
        assert got["up"]["gamma_ppm"] == 1_000_000
        assert got["dn"]["gamma_ppm"] == -1_000_000
