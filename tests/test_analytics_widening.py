"""Item-item cosine, equi-depth bins, contingency chi2, event paths,
winsorize (this round's analytics widening) on hand-checkable data."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from dpe_energy_performance_analysis_etl_spark.operators.aggregate import winsorize
from dpe_energy_performance_analysis_etl_spark.operators.basket import item_item_cosine
from dpe_energy_performance_analysis_etl_spark.operators.quantiles import equi_depth_bins
from dpe_energy_performance_analysis_etl_spark.operators.stats import contingency_cells
from dpe_energy_performance_analysis_etl_spark.operators.temporal import common_event_paths
from dpe_energy_performance_analysis_etl_spark.text.retrieval import inverted_postings


def test_item_item_cosine(spark):
    baskets = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"), (4, "a")]
    df = spark.createDataFrame(baskets, "basket long, item string")
    got = {(r.item_a, r.item_b): r for r in
           item_item_cosine(df, "basket", "item", min_support=1).collect()}
    ab = got[("a", "b")]
    assert ab.support == 2 and ab.supp_a == 4 and ab.supp_b == 2
    assert ab.cosine == pytest.approx(2 / math.sqrt(8))
    ac = got[("a", "c")]
    assert ac.cosine == pytest.approx(1 / math.sqrt(4))


def test_equi_depth_bins_balanced_on_skew(spark):
    # 90 identical values + 10 spread: equal-WIDTH binning would dump
    # 90% in one bucket; equi-depth keeps 20 rows in each of 5 bins.
    vals = [(i, 1.0 if i < 90 else float(i)) for i in range(100)]
    df = spark.createDataFrame(vals, "id long, v double")
    got = {r.bin: r for r in equi_depth_bins(df, "v", 5, "id").collect()}
    assert sorted(got) == [1, 2, 3, 4, 5]
    assert all(got[b].n_rows == 20 for b in got)
    assert got[5].hi == 99.0 and got[1].lo == 1.0


def test_contingency_cells_exact(spark):
    rows = [("x", "p")] * 30 + [("x", "q")] * 10 + [("y", "p")] * 20 + [("y", "q")] * 40
    df = spark.createDataFrame(rows, "r string, c string")
    got = {(r.row_val, r.col_val): r for r in contingency_cells(df, "r", "c").collect()}
    cell = got[("x", "p")]
    assert cell.obs == 30 and cell.row_total == 40 and cell.col_total == 50 and cell.n == 100
    assert cell.expected == pytest.approx(20.0)
    assert cell.chi2_contrib == pytest.approx((30 - 20.0) ** 2 / 20.0)
    chi2 = sum(r.chi2_contrib for r in got.values())
    # Hand-computed chi2 for this 2x2 table: 100*(30*40-10*20)^2/(40*60*50*50).
    assert chi2 == pytest.approx(100 * (30 * 40 - 10 * 20) ** 2 / (40 * 60 * 50 * 50))


def test_common_event_paths(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "view"), (2, 1, t0 + dt.timedelta(minutes=1), "click"),
        (3, 1, t0 + dt.timedelta(minutes=2), "purchase"),
        (4, 2, t0, "view"), (5, 2, t0 + dt.timedelta(minutes=1), "click"),
        (6, 2, t0 + dt.timedelta(minutes=2), "purchase"),
        (7, 2, t0 + dt.timedelta(minutes=3), "view"),  # beyond k=3, ignored
        (8, 3, t0, "error"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {r.path: r.n_users for r in common_event_paths(df, k=3).collect()}
    assert got == {"view>click>purchase": 2, "error": 1}


def test_winsorize_grouped(spark):
    rows = [("g", float(v), i) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    df = spark.createDataFrame(rows, "grp string, v double, id long")
    out = winsorize(df, "v", ["grp"], lo=0.1, hi=0.9).collect()
    clipped = {r.id: r.v_winsorized for r in out}
    # Exact 10%/90% quantiles of 10 points: 1.9 and 9*0.9+... the
    # linear-interpolation values; extremes must be clipped to them.
    assert max(clipped.values()) < 1000
    assert min(clipped.values()) > 1
    # Interior values untouched.
    assert clipped[4] == 5.0


def test_inverted_postings(spark):
    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "b b")], "doc_id long, text string"
    )
    got = {(r.term, r.doc_id): r for r in inverted_postings(df).collect()}
    assert got[("a", 1)].tf == 2 and got[("a", 1)].positions == [0, 2]
    assert got[("b", 1)].positions == [1]
    assert got[("c", 1)].positions == [3]
    assert got[("b", 2)].tf == 2 and got[("b", 2)].positions == [0, 1]


class TestJenksBreaks:
    def _run(self, spark, ys, k):
        from collections import Counter

        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            jenks_breaks_binned,
        )

        cnt = Counter(ys)
        rows = [(y, y * n, y * y * n, n) for y, n in sorted(cnt.items())]
        df = spark.createDataFrame(rows, "bin bigint, s bigint, ss bigint, c bigint")
        return sorted(
            (r["class"], r["lo_bin"], r["hi_bin"], r["n"], r["s"])
            for r in jenks_breaks_binned(df, k=k).collect()
        )

    def _jenks_ref(self, ys, k):
        # exact DP reference with the same truncated-div cost
        from collections import Counter

        cnt = sorted(Counter(ys).items())
        B = len(cnt)
        vals = [v for v, _ in cnt]

        def cost(i, j):  # 0-based inclusive over cnt
            seg = cnt[i : j + 1]
            s = sum(v * n for v, n in seg)
            ss = sum(v * v * n for v, n in seg)
            c = sum(n for _, n in seg)
            return ss - (s * s) // max(c, 1)

        import functools

        @functools.lru_cache(None)
        def d(m, j):  # best (total, first_i) for m classes over bins 0..j
            if m == 1:
                return (cost(0, j), 0)
            best = None
            for i in range(m - 1, j + 1):
                t = d(m - 1, i - 1)[0] + cost(i, j)
                if best is None or (t, i) < best:
                    best = (t, i)
            return best

        cuts = [B - 1]
        for m in range(k, 1, -1):
            cuts.append(d(m, cuts[-1])[1] - 1)
        cuts = cuts[::-1]
        out = []
        start = 0
        for cls, end in enumerate(cuts, 1):
            if end >= start:
                seg = cnt[start : end + 1]
                out.append(
                    (
                        cls,
                        vals[start],
                        vals[end],
                        sum(n for _, n in seg),
                        sum(v * n for v, n in seg),
                    )
                )
            start = end + 1
        return sorted(out)

    def test_obvious_gaps_recovered(self, spark):
        # three tight groups with huge gaps: breaks must land on them
        ys = [1, 1, 2, 2, 50, 51, 52, 100, 101, 101]
        got = self._run(spark, ys, 3)
        assert [(c, lo, hi) for c, lo, hi, _, _ in got] == [
            (1, 1, 2),
            (2, 50, 52),
            (3, 100, 101),
        ]

    def test_matches_dp_reference(self, spark):
        import random

        rng = random.Random(17)
        ys = [rng.randint(0, 23) for _ in range(400)]
        for k in (2, 4):
            assert self._run(spark, ys, k) == self._jenks_ref(ys, k)

    def test_small_input_each_bin_own_class(self, spark):
        got = self._run(spark, [3, 7, 9], 4)
        assert [(c, lo, hi, n) for c, lo, hi, n, _ in got] == [
            (1, 3, 3, 1),
            (2, 7, 7, 1),
            (3, 9, 9, 1),
        ]


class TestRboWeights:
    def test_weights_are_exact_and_sum_to_truncated_series(self):
        """w_d = D/(d*2^d) exactly, and identical lists score
        D*(1 - 2^-20) (the truncated geometric series)."""
        from math import gcd
        from functools import reduce

        from dpe_energy_performance_analysis_etl_spark.plans.queries import _RBO_D, _RBO_W

        L = reduce(lambda a, b: a * b // gcd(a, b), range(1, 21))
        assert _RBO_D == (1 << 20) * L
        for d, w in enumerate(_RBO_W, 1):
            assert _RBO_D % (d * (1 << d)) == 0
            assert w == _RBO_D // (d * (1 << d))
        # identical lists: overlap_d = d at every depth
        assert sum(d * w for d, w in enumerate(_RBO_W, 1)) == _RBO_D - (
            _RBO_D >> 20
        )

    def test_rbo_hand_cases(self, spark):
        """Identical / disjoint / head-swapped rankings behave as the
        metric demands: identical = max, disjoint = 0, and agreement
        at the head outweighs the same agreement at the tail."""
        from pyspark.sql import functions as F

        from dpe_energy_performance_analysis_etl_spark.plans.queries import _RBO_D, _RBO_W

        w_arr = F.array(*[F.lit(w).cast("bigint") for w in _RBO_W])

        def rbo(la, lb):
            return F.aggregate(
                F.sequence(F.lit(1), F.lit(20)),
                F.lit(0).cast("bigint"),
                lambda acc, d: acc
                + F.size(
                    F.array_intersect(F.slice(la, 1, d), F.slice(lb, 1, d))
                ).cast("bigint")
                * F.element_at(w_arr, d.cast("int")),
            )

        a = list(range(1, 21))
        cases = [
            (a, a),                        # identical
            (a, list(range(100, 120))),    # disjoint
            (a, [2, 1] + a[2:]),           # head swap (depth-1 miss only)
            (a, a[:18] + [19, 100]),       # tail miss
        ]
        df = spark.createDataFrame(cases, "la array<bigint>, lb array<bigint>")
        got = [r["s"] for r in df.select(rbo(F.col("la"), F.col("lb")).alias("s")).collect()]
        assert got[0] == _RBO_D - (_RBO_D >> 20)
        assert got[1] == 0
        # head swap loses exactly w_1 (depth-1 overlap 0 vs 1)
        assert got[0] - got[2] == _RBO_W[0]
        # a tail miss costs less than a head miss
        assert got[0] > got[3] > got[2]
