"""Round-9 wave-2 operator tests: Kruskal-Wallis H, L-moments —
pure-Python references (no scipy in this container; the H reference
is the textbook formula, the L-moment reference the direct
order-statistics definition)."""

from __future__ import annotations

import random
from fractions import Fraction


def _midranks2(values):
    """value -> doubled mid-rank over the pooled sample."""
    s = sorted(values)
    out = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        # doubled mid-rank of the tie block [i, j): 2*i + (j-i) + 1
        out[s[i]] = 2 * i + (j - i) + 1
        i = j
    return out


class TestKruskalWallis:
    def test_matches_textbook_formula(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            kruskal_wallis_h,
        )

        rng = random.Random(17)
        samples = ["a", "b", "c"]
        rows = []
        for g, shift in (("g1", 25), ("g2", 0)):
            for s_i, s in enumerate(samples):
                for _ in range(120):
                    rows.append(
                        (g, s, rng.randint(0, 60) + (shift * s_i if g == "g1" else 0))
                    )
        df = spark.createDataFrame(rows, "g string, s string, v bigint")
        got = {
            r["g"]: (r["n"], r["k_nonempty"], r["h_scaled"])
            for r in kruskal_wallis_h(df, "g", "s", "v", samples).collect()
        }
        for g in ("g1", "g2"):
            sub = [(s, v) for gg, s, v in rows if gg == g]
            pooled = [v for _, v in sub]
            mr2 = _midranks2(pooled)
            n = len(pooled)
            a = 0
            for s in samples:
                vs = [v for ss, v in sub if ss == s]
                r2 = sum(mr2[v] for v in vs)
                a += (3_000_000 * r2 * r2) // len(vs)
            expect = a // (n * (n + 1)) - 3_000_000 * (n + 1)
            assert got[g] == (n, 3, expect)
        # shifted samples must score far higher than identical ones
        assert got["g1"][2] > got["g2"][2]
        # sanity vs the exact (float) textbook H for the shifted group
        sub = [(s, v) for gg, s, v in rows if gg == "g1"]
        pooled = [v for _, v in sub]
        mr = {v: m / 2 for v, m in _midranks2(pooled).items()}
        n = len(pooled)
        h = sum(
            (sum(mr[v] for ss, v in sub if ss == s)) ** 2
            / len([1 for ss, _ in sub if ss == s])
            for s in samples
        ) * 12 / (n * (n + 1)) - 3 * (n + 1)
        assert abs(got["g1"][2] / 1e6 - h) < 1e-3

    def test_empty_sample_and_unknown_class_ignored(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            kruskal_wallis_h,
        )

        df = spark.createDataFrame(
            [("g", "a", 1), ("g", "a", 2), ("g", "b", 3), ("g", "zzz", 9)],
            "g string, s string, v bigint",
        )
        row = kruskal_wallis_h(df, "g", "s", "v", ["a", "b", "c"]).collect()[0]
        # 'zzz' still pools into the ranks (n=4) but belongs to no
        # sample; 'c' is empty -> k_nonempty 2
        assert (row["n"], row["k_nonempty"]) == (4, 2)


def _l_moments_ref(values):
    """Exact Fractions via the direct probability-weighted-moment
    definition b_r = (1/n) Σ_i C(i, r)/C(n−1, r) · x_(i+1)."""
    from math import comb

    x = sorted(values)
    n = len(x)
    b = [
        sum(Fraction(comb(i, r), comb(n - 1, r)) * x[i] for i in range(n))
        / n
        for r in range(4)
    ]
    l1 = b[0]
    l2 = 2 * b[1] - b[0]
    l3 = 6 * b[2] - 6 * b[1] + b[0]
    l4 = 20 * b[3] - 30 * b[2] + 12 * b[1] - b[0]
    return l1, l2, l3, l4


def _trunc_scaled(frac: Fraction, scale: int) -> int:
    v = frac * scale
    sign = -1 if v < 0 else 1
    return sign * (abs(v.numerator) // v.denominator)


class TestLMoments:
    def test_matches_fraction_reference(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            grouped_l_moments,
        )

        rng = random.Random(29)
        rskew = [int(rng.expovariate(1.0) * 1000) for _ in range(300)]
        groups = {
            "sym": [rng.randint(-500, 500) for _ in range(300)],
            "rskew": rskew,
            "lskew": [-v for v in rskew],  # exact mirror
            "tiny": [4, 1, 9, 2],
        }
        rows = [(g, v) for g, vs in groups.items() for v in vs]
        df = spark.createDataFrame(rows, "g string, v bigint")
        got = {
            r["g"]: (r["n"], r["mean_milli"], r["l2_milli"], r["t3_ppm"], r["t4_ppm"])
            for r in grouped_l_moments(df, "g", "v").collect()
        }
        for g, vs in groups.items():
            l1, l2, l3, l4 = _l_moments_ref(vs)
            n = len(vs)
            exp = (
                n,
                _trunc_scaled(l1, 1000),
                _trunc_scaled(l2, 1000),
                _trunc_scaled(l3 / l2, 1_000_000) if l2 != 0 else None,
                _trunc_scaled(l4 / l2, 1_000_000) if l2 != 0 else None,
            )
            assert got[g] == exp, (g, got[g], exp)
        # skew signs: exponential right-skew -> t3 > 0, mirrored -> < 0
        assert got["rskew"][3] > 0 > got["lskew"][3]
        # mirrored distributions have t3 of opposite sign, same t4
        assert got["rskew"][4] == got["lskew"][4]

    def test_degenerate_groups(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            grouped_l_moments,
        )

        df = spark.createDataFrame(
            [("small", 1), ("small", 2), ("small", 3)]
            + [("const", 7)] * 10,
            "g string, v bigint",
        )
        got = {r["g"]: r for r in grouped_l_moments(df, "g", "v").collect()}
        assert "small" not in got  # n < 4 emits no row
        c = got["const"]
        # all-equal: l2 = 0, ratios NULL
        assert (c["l2_milli"], c["t3_ppm"], c["t4_ppm"]) == (0, None, None)
