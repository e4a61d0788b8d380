"""Round-9 wave-9 tests: Jonckheere-Terpstra pairwise U, grouped
Spearman, RSI momentum."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F


def _u2_brute(xs, ys):
    return sum(2 * (x < y) + (x == y) for x in xs for y in ys)


class TestJonckheerePairwiseU:
    def _run(self, spark, rows, samples=("1", "2", "3")):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            jonckheere_pairwise_u,
        )

        df = spark.createDataFrame(rows, "g string, s string, v bigint")
        out = jonckheere_pairwise_u(df, "g", "s", "v", list(samples))
        return {
            (r["g"], r["pr_lo"], r["pr_hi"]): r for r in out.collect()
        }

    def test_matches_brute_force_with_ties(self, spark):
        data = {
            "1": [1, 2, 2, 5],
            "2": [2, 3, 4],
            "3": [5, 6],
        }
        rows = [("A", s, v) for s, vs in data.items() for v in vs]
        got = self._run(spark, rows)
        assert len(got) == 3  # 3 ordered pairs
        for i, j in [("1", "2"), ("1", "3"), ("2", "3")]:
            r = got[("A", i, j)]
            assert r["u2"] == _u2_brute(data[i], data[j]), (i, j)
            assert r["e2"] == len(data[i]) * len(data[j])
            assert r["n_lo"] == len(data[i])
            assert r["n_hi"] == len(data[j])

    def test_monotone_shift_saturates_u(self, spark):
        # strictly increasing classes: every cross pair is a strict win
        rows = [("A", "1", 1), ("A", "1", 2), ("A", "2", 10), ("A", "3", 20)]
        got = self._run(spark, rows)
        assert got[("A", "1", "2")]["u2"] == 2 * 2 * 1
        assert got[("A", "1", "3")]["u2"] == 2 * 2 * 1
        assert got[("A", "2", "3")]["u2"] == 2 * 1 * 1

    def test_empty_sample_emits_zero_row(self, spark):
        rows = [("A", "1", 1), ("A", "3", 2)]
        got = self._run(spark, rows)
        r = got[("A", "1", "2")]
        assert (r["n_hi"], r["u2"], r["e2"]) == (0, 0, 0)

    def test_groups_independent(self, spark):
        rows = [
            ("A", "1", 1), ("A", "2", 2),
            ("B", "1", 9), ("B", "2", 3),
        ]
        got = self._run(spark, rows, samples=("1", "2"))
        assert got[("A", "1", "2")]["u2"] == 2  # 1 < 2 strict
        assert got[("B", "1", "2")]["u2"] == 0  # 9 > 3


def _spearman_ref(pairs):
    """Exact mirror of the operator's formula on doubled mid-ranks."""
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    n = len(pairs)

    def mr2_map(vals):
        cnt = Counter(vals)
        out, before = {}, 0
        for v in sorted(cnt):
            out[v] = 2 * before + cnt[v] + 1
            before += cnt[v]
        return out

    mx, my = mr2_map(xs), mr2_map(ys)
    sxy = sum(mx[a] * my[b] for a, b in pairs)
    sxx = sum(mx[a] * mx[a] for a in xs)
    syy = sum(my[b] * my[b] for b in ys)
    cn = n * (n + 1) * (n + 1)
    if sxx <= cn or syy <= cn:
        return None
    num = sxy - cn
    sign = 1 if num >= 0 else -1
    return sign * math.floor(
        abs(num) * 1e6 / math.sqrt((sxx - cn) * (syy - cn))
    )


class TestGroupedSpearman:
    def _run(self, spark, rows):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            grouped_spearman,
        )

        df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
        return {r["g"]: r for r in grouped_spearman(df, "g", "x", "y").collect()}

    def test_perfect_monotone_and_inverse(self, spark):
        rows = [("up", i, 10 * i) for i in range(1, 8)]
        rows += [("down", i, -3 * i) for i in range(1, 8)]
        got = self._run(spark, rows)
        assert got["up"]["rho_ppm"] == 1_000_000
        assert got["down"]["rho_ppm"] == -1_000_000

    def test_ties_match_reference(self, spark):
        pairs = [(1, 5), (1, 7), (2, 5), (3, 9), (3, 9), (4, 2), (5, 2)]
        rows = [("t", a, b) for a, b in pairs]
        got = self._run(spark, rows)
        assert got["t"]["rho_ppm"] == _spearman_ref(pairs)
        assert got["t"]["n"] == len(pairs)

    def test_constant_side_is_null(self, spark):
        rows = [("c", 1, i) for i in range(5)]
        got = self._run(spark, rows)
        assert got["c"]["rho_ppm"] is None

    def test_monotone_on_ranks_not_values(self, spark):
        # wildly nonlinear but monotone -> rho exactly 1 (Pearson
        # would not be): the whole point of Spearman
        rows = [("m", i, i**5 - 3) for i in range(1, 10)]
        got = self._run(spark, rows)
        assert got["m"]["rho_ppm"] == 1_000_000


class TestRsiMonthlyRevenue:
    def _orders(self, spark, tmp_path, monthly_cents):
        import datetime as dt

        rows = []
        for k, cents in enumerate(monthly_cents):
            y, m = divmod(k, 12)
            rows.append(
                (
                    dt.date(1995 + y, m + 1, 1),
                    float(cents) / 100.0,
                )
            )
        df = spark.createDataFrame(rows, "o_orderdate date, o_totalprice double")
        p = str(tmp_path / "orders.parquet")
        df.write.parquet(p)
        return str(tmp_path)

    def _run(self, spark, sf_dir):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = QUERIES["rsi_monthly_revenue"](spark, sf_dir).collect()
        return sorted(rows, key=lambda r: r["month"])

    def test_all_up_is_full_scale(self, spark, tmp_path):
        # strictly increasing revenue: every delta is a gain -> RSI 1e6
        out = self._run(
            spark, self._orders(spark, tmp_path, [100 + 10 * i for i in range(20)])
        )
        # months 15..20 have 14 full deltas
        assert len(out) == 6
        assert all(r["rsi_ppm"] == 1_000_000 for r in out)
        assert all(r["loss14"] == 0 for r in out)

    def test_mixed_matches_hand_computation(self, spark, tmp_path):
        cents = [1000, 1100, 1050, 1200, 900, 950, 1000, 980, 1020,
                 1100, 1080, 1150, 1130, 1200, 1190, 1250]
        out = self._run(spark, self._orders(spark, tmp_path, cents))
        deltas = [b - a for a, b in zip(cents, cents[1:])]
        assert len(out) == 2  # months 15 and 16
        for idx, r in enumerate(out):
            win = deltas[idx : idx + 14]
            g = sum(d for d in win if d > 0)
            lo = sum(-d for d in win if d < 0)
            assert r["gain14"] == g
            assert r["loss14"] == lo
            assert r["rsi_ppm"] == (g * 1_000_000) // (g + lo)

    def test_flat_series_null_rsi(self, spark, tmp_path):
        out = self._run(spark, self._orders(spark, tmp_path, [500] * 16))
        assert len(out) == 2
        assert all(r["rsi_ppm"] is None for r in out)
        assert all(r["gain14"] == 0 and r["loss14"] == 0 for r in out)
