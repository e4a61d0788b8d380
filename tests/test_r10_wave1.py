"""Round-10 wave-1 tests: Durbin-Watson, Youden-J threshold,
Fleiss' kappa."""

from __future__ import annotations

import datetime as dt
from fractions import Fraction


def _orders_parquet(spark, tmp_path, monthly_dollars):
    rows = []
    for k, dollars in enumerate(monthly_dollars):
        y, m = divmod(k, 12)
        rows.append((dt.date(1995 + y, m + 1, 10), float(dollars)))
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _dw_ref(ys):
    """Reference for dw_ppm: exact integer sums, IEEE double floor
    (the query's exact semantics)."""
    import math

    n = len(ys)
    ts = list(range(1, n + 1))
    st, st2, sy = sum(ts), sum(t * t for t in ts), sum(ys)
    sty = sum(t * y for t, y in zip(ts, ys))
    nb = n * sty - st * sy
    d = n * st2 - st * st
    anum = sy * st2 - st * sty
    e = [d * y - anum - nb * t for t, y in zip(ts, ys)]
    den = sum(v * v for v in e)
    num = sum((a - b) ** 2 for a, b in zip(e[1:], e[:-1]))
    return (
        math.floor(float(num) * 1e6 / float(den)) if den > 0 else None
    )


class TestDurbinWatson:
    def _run(self, spark, tmp_path, monthly_dollars):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        return QUERIES["durbin_watson_revenue"](
            spark, _orders_parquet(spark, tmp_path, monthly_dollars)
        ).collect()[0]

    def test_alternating_residuals_dw_near_4(self, spark, tmp_path):
        # perfect negative lag-1 autocorrelation around a flat trend
        ys = [100 + (10 if k % 2 == 0 else -10) for k in range(12)]
        r = self._run(spark, tmp_path, ys)
        assert r["n_months"] == 12
        assert r["dw_ppm"] == _dw_ref(ys)
        assert r["dw_ppm"] > 3_000_000  # DW -> 4 for alternating signs

    def test_smooth_walk_dw_low(self, spark, tmp_path):
        # slow curvature around the linear trend: positive
        # autocorrelation, DW well below 2
        ys = [100 + (k - 6) ** 2 for k in range(13)]
        r = self._run(spark, tmp_path, ys)
        assert r["dw_ppm"] == _dw_ref(ys)
        assert r["dw_ppm"] < 1_000_000

    def test_perfect_line_null(self, spark, tmp_path):
        ys = [100 + 7 * k for k in range(10)]  # residuals identically 0
        r = self._run(spark, tmp_path, ys)
        assert r["has_variance"] is False
        assert r["dw_ppm"] is None


class TestYoudenJ:
    def _run(self, spark, tmp_path, rows):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            rows, "l_quantity double, l_returnflag string"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        out = QUERIES["youden_j_threshold"](spark, str(tmp_path)).collect()
        return {r["threshold"]: r for r in out}

    def test_separable_threshold_wins(self, spark, tmp_path):
        # all positives at qty >= 30, negatives below: theta = 30 is
        # the perfect cutoff (J = 1)
        rows = [(float(q), "N") for q in (10, 15, 20, 25) for _ in range(3)]
        rows += [(float(q), "R") for q in (30, 40, 50) for _ in range(2)]
        got = self._run(spark, tmp_path, rows)
        best = got[30]
        assert best["tp"] == 6 and best["fp"] == 0
        assert best["j_ppm"] == 1_000_000
        assert best["j_rank"] == 1

    def test_j_values_match_reference(self, spark, tmp_path):
        rows = [
            (10.0, "R"), (10.0, "N"), (20.0, "R"), (20.0, "N"), (20.0, "N"),
            (30.0, "R"), (30.0, "R"), (40.0, "N"),
        ]
        got = self._run(spark, tmp_path, rows)
        p = 4
        n = 4
        # threshold 30: tp = 2 (qty>=30 R) + ... qty 40 is N, 30 has 2 R
        r30 = got[30]
        assert (r30["tp"], r30["fp"]) == (2, 1)
        exp = Fraction(2, p) - Fraction(1, n)
        assert r30["j_ppm"] == int(exp * 1_000_000)
        # rank 1 belongs to the max j_scaled
        ranks = sorted(got.values(), key=lambda r: r["j_rank"])
        js = [r["tp"] * n - r["fp"] * p for r in ranks]
        assert js == sorted(js, reverse=True)


class TestFleissKappa:
    def _run(self, spark, tmp_path, orders):
        """orders: list of 3-char strings over {R,A,N} — one order of
        exactly three lineitems each."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for i, cats in enumerate(orders):
            for j, c in enumerate(cats):
                rows.append((i + 1, j + 1, c))
        spark.createDataFrame(
            rows, "l_orderkey bigint, l_linenumber int, l_returnflag string"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        return QUERIES["fleiss_kappa_orders"](spark, str(tmp_path)).collect()[0]

    @staticmethod
    def _ref(orders):
        n, m = len(orders), 3
        a = sum(
            sum(cats.count(c) ** 2 for c in "RAN") for cats in orders
        )
        cj = {c: sum(cats.count(c) for cats in orders) for c in "RAN"}
        t = n * m
        s = sum(v * v for v in cj.values())
        num = t * (a - t) - (m - 1) * s
        den = (m - 1) * (t * t - s)
        sign = 1 if num >= 0 else -1
        return sign * ((abs(num) * 1_000_000) // den) if den > 0 else None

    def test_perfect_agreement(self, spark, tmp_path):
        orders = ["RRR", "NNN", "AAA", "RRR", "NNN"]
        r = self._run(spark, tmp_path, orders)
        assert r["n_items"] == 5
        assert r["kappa_ppm"] == 1_000_000

    def test_mixed_agreement_matches_reference(self, spark, tmp_path):
        orders = ["RRN", "NNN", "RAN", "AAR", "NNR", "RRR", "ANA"]
        r = self._run(spark, tmp_path, orders)
        assert r["kappa_ppm"] == self._ref(orders)
        assert r["pbar_ppm"] is not None and r["pe_ppm"] is not None

    def test_short_orders_excluded(self, spark, tmp_path):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = [(1, 1, "R"), (1, 2, "R"), (1, 3, "R"), (2, 1, "N")]
        spark.createDataFrame(
            rows, "l_orderkey bigint, l_linenumber int, l_returnflag string"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        r = QUERIES["fleiss_kappa_orders"](spark, str(tmp_path)).collect()[0]
        assert r["n_items"] == 1  # the 1-lineitem order dropped
