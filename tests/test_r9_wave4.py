"""Round-9 wave-4 tests: exact quadratic fit (Cramer on integer
normal equations) vs a Fraction least-squares reference."""

from __future__ import annotations

import random
from fractions import Fraction


def _quad_ref(pts):
    """Exact least-squares quadratic via Fractions."""
    n = len(pts)
    s = [Fraction(sum(x**k for x, _ in pts)) for k in range(5)]
    s[0] = Fraction(n)
    t = [Fraction(sum(y * x**k for x, y in pts)) for k in range(3)]
    det = (
        s[0] * (s[2] * s[4] - s[3] ** 2)
        - s[1] * (s[1] * s[4] - s[2] * s[3])
        + s[2] * (s[1] * s[3] - s[2] ** 2)
    )
    if det == 0:
        return None
    na = (
        t[0] * (s[2] * s[4] - s[3] ** 2)
        - s[1] * (t[1] * s[4] - t[2] * s[3])
        + s[2] * (t[1] * s[3] - t[2] * s[2])
    )
    nb = (
        s[0] * (t[1] * s[4] - t[2] * s[3])
        - t[0] * (s[1] * s[4] - s[2] * s[3])
        + s[2] * (s[1] * t[2] - s[2] * t[1])
    )
    nc = (
        s[0] * (s[2] * t[2] - s[3] * t[1])
        - s[1] * (s[1] * t[2] - s[2] * t[1])
        + t[0] * (s[1] * s[3] - s[2] ** 2)
    )

    def trunc(num, scale=1000):
        v = num * scale / det
        sign = -1 if v < 0 else 1
        return sign * (abs(v.numerator) // v.denominator)

    return trunc(na), trunc(nb), trunc(nc)


class TestQuadraticFit:
    def test_recovers_exact_parabola(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            group_quadratic_fit,
        )

        # exact parabola y = 7 - 3x + 2x^2: residuals zero, so the
        # rational solution is exactly (7, -3, 2)
        rows = [("p", x, 7 - 3 * x + 2 * x * x) for x in range(10)]
        df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
        r = group_quadratic_fit(df, "g", "x", "y").collect()[0]
        assert (r["a_scaled"], r["b_scaled"], r["c_scaled"]) == (
            7000,
            -3000,
            2000,
        )

    def test_matches_fraction_reference_on_noisy_data(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            group_quadratic_fit,
        )

        rng = random.Random(41)
        groups = {}
        for g, (a, b, c) in (("up", (100, 5, 3)), ("down", (9000, 40, -7))):
            groups[g] = [
                (x, a + b * x + c * x * x + rng.randint(-200, 200))
                for x in range(60)
            ]
        groups["flat3"] = [(0, 5), (1, 5), (2, 5)]  # minimal n, det > 0
        rows = [(g, x, y) for g, pts in groups.items() for x, y in pts]
        df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
        got = {
            r["g"]: (r["n_points"], r["a_scaled"], r["b_scaled"], r["c_scaled"])
            for r in group_quadratic_fit(df, "g", "x", "y").collect()
        }
        for g, pts in groups.items():
            exp = _quad_ref(pts)
            assert got[g] == (len(pts),) + exp, (g, got[g], exp)
        # curvature signs recovered
        assert got["up"][3] > 0 > got["down"][3]

    def test_degenerate_x_emits_null_coefficients(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            group_quadratic_fit,
        )

        # 2 distinct x values: Gram matrix singular -> NULLs, not a
        # division error
        df = spark.createDataFrame(
            [("g", 1, 10), ("g", 1, 12), ("g", 2, 20)],
            "g string, x bigint, y bigint",
        )
        r = group_quadratic_fit(df, "g", "x", "y").collect()[0]
        assert (r["a_scaled"], r["b_scaled"], r["c_scaled"]) == (
            None,
            None,
            None,
        )
