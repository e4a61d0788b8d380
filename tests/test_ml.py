"""operators/ml.py: portable k-means Lloyd and histogram decision
stump — hand-computed ground truths."""

from __future__ import annotations

from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.operators.ml import (
    decision_stump_binned,
    kmeans_lloyd_portable,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestKmeansLloydPortable:
    def test_two_cluster_hand_computed(self, spark):
        # scaled coords: 0→1024, 0.1→1126, 0.9→1945, 1.0→2048
        df = _vecs(
            spark,
            [
                (0, [0.0, 0.0]),
                (1, [1.0, 1.0]),
                (2, [0.1, 0.1]),
                (3, [0.9, 0.9]),
            ],
        )
        got = {
            r["cluster"]: r
            for r in kmeans_lloyd_portable(df, k=2, iterations=2).collect()
        }
        assert set(got) == {0, 1}
        assert got[0]["n_members"] == 2 and got[1]["n_members"] == 2
        # c1_0 = (1024+1126)//2 = 1075 per dim -> dists 2*51^2 each
        assert got[0]["inertia"] == 2 * (2 * 51 * 51)
        # c1_1 = (2048+1945)//2 = 1996 -> dists 2*52^2 and 2*51^2
        assert got[1]["inertia"] == 2 * 52 * 52 + 2 * 51 * 51
        assert got[0]["centroid_sum"] == 2 * 1075
        assert got[1]["centroid_sum"] == 2 * 1996

    def test_partitioning_invariance(self, spark):
        rows = [
            (i, [float((i * 13) % 7) / 7.0, float((i * 29) % 11) / 11.0])
            for i in range(60)
        ]
        a = sorted(
            map(tuple, kmeans_lloyd_portable(_vecs(spark, rows).repartition(3), 4, 2).collect())
        )
        b = sorted(
            map(tuple, kmeans_lloyd_portable(_vecs(spark, rows).repartition(13), 4, 2).collect())
        )
        assert a == b

    def test_separated_clusters_stay_separated(self, spark):
        rows = [(i, [0.01 * i, 0.0]) for i in range(5)] + [
            (10 + i, [0.9 + 0.01 * i, 0.9]) for i in range(5)
        ]
        # seeds 0 and 1 both sit in the left cluster; after the first
        # update one centroid absorbs the right group
        got = kmeans_lloyd_portable(_vecs(spark, rows), k=2, iterations=2).collect()
        counts = sorted(r["n_members"] for r in got)
        assert sum(counts) == 10
        assert len(got) == 2


class TestDecisionStump:
    def test_perfectly_separable(self, spark):
        rows = [(float(v), 1 if v >= 5 else 0) for v in range(10)]
        df = spark.createDataFrame(rows, "val double, y int")
        r = decision_stump_binned(df, "val", F.col("y") == 1, n_bins=16).collect()[0]
        assert r["gini_score"] == 0.0
        assert r["pos_left"] == 0 and r["neg_left"] == 5
        assert r["pos_right"] == 5 and r["neg_right"] == 0
        # split value lies in (4, 5]
        assert 4.0 < r["split_value"] <= 5.0

    def test_unsplittable_uniform_label(self, spark):
        rows = [(float(v), 1) for v in range(10)]
        df = spark.createDataFrame(rows, "val double, y int")
        r = decision_stump_binned(df, "val", F.col("y") == 1, n_bins=8).collect()[0]
        # all-positive: every split scores 0; argmin tie-break picks
        # the lowest bucket
        assert r["gini_score"] == 0.0
        assert r["split_bucket"] == 0

    def test_constant_feature_returns_empty_not_nan(self, spark):
        # hi == lo makes bin width 0; the guard pins bucket 0 so the
        # plan never evaluates floor(NaN) — the correct "no split
        # exists" answer for a constant feature is an empty result.
        rows = [(5.0, 1), (5.0, 0), (5.0, 1)]
        df = spark.createDataFrame(rows, "val double, y int")
        got = decision_stump_binned(df, "val", F.col("y") == 1, n_bins=8).collect()
        assert got == []

    def test_hand_computed_mixed(self, spark):
        # left bin: 1 pos 3 neg, right bin: 3 pos 1 neg
        rows = [(0.0, 1)] + [(0.0, 0)] * 3 + [(10.0, 1)] * 3 + [(10.0, 0)]
        df = spark.createDataFrame(rows, "val double, y int")
        r = decision_stump_binned(df, "val", F.col("y") == 1, n_bins=2).collect()[0]
        assert (r["pos_left"], r["neg_left"]) == (1, 3)
        assert (r["pos_right"], r["neg_right"]) == (3, 1)
        assert r["gini_score"] == (1 * 3) / 4.0 + (3 * 1) / 4.0


class TestAlsRank1:
    def _als_ref(self, triples, rounds=2):
        # eager integer twin of the operator's dyadic alternation
        from collections import defaultdict

        r = defaultdict(int)
        for u, i, v in triples:
            r[(u, i)] += v
        users = sorted({u for u, _ in r})
        items = sorted({i for _, i in r})
        y = {i: 1 << 20 for i in items}
        x = {}
        for _ in range(rounds):
            x = {}
            for u in users:
                num = sum(r[(u, i)] * y[i] for i in items if (u, i) in r) << 20
                den = max(sum(y[i] * y[i] for i in items if (u, i) in r) >> 20, 1)
                x[u] = num // den
            y = {}
            for i in items:
                num = sum(r[(u, i)] * x[u] for u in users if (u, i) in r) << 20
                den = max(sum(x[u] * x[u] for u in users if (u, i) in r) >> 20, 1)
                y[i] = num // den
        return x, y

    def test_matches_eager_reference(self, spark):
        import random

        from dpe_energy_performance_analysis_etl_spark.operators.ml import als_rank1_rounds

        rng = random.Random(11)
        triples = [
            (rng.randint(1, 20), rng.randint(1, 15), rng.randint(1, 50))
            for _ in range(300)
        ]
        df = spark.createDataFrame(triples, "u bigint, i bigint, r bigint")
        out = {(r["kind"], r["id"]): r["factor_scaled"] for r in als_rank1_rounds(df).collect()}
        x, y = self._als_ref(triples)
        for u, v in x.items():
            assert out[("user", u)] == v
        for i, v in y.items():
            assert out[("item", i)] == v

    def test_rank1_structure_recovered(self, spark):
        # ratings EXACTLY rank-1 (r = a_u * b_i): after one
        # alternation the factor ratios must match the planted ones.
        from dpe_energy_performance_analysis_etl_spark.operators.ml import als_rank1_rounds

        a = {1: 2, 2: 4, 3: 8}
        b = {10: 3, 11: 6, 12: 9}
        triples = [(u, i, a[u] * b[i]) for u in a for i in b]
        df = spark.createDataFrame(triples, "u bigint, i bigint, r bigint")
        out = {(r["kind"], r["id"]): r["factor_scaled"] for r in als_rank1_rounds(df).collect()}
        xs = [out[("user", u)] for u in (1, 2, 3)]
        # planted user ratios 1:2:4 (tolerate the dyadic truncation)
        assert abs(xs[1] - 2 * xs[0]) <= 2 and abs(xs[2] - 4 * xs[0]) <= 4
        ys = [out[("item", i)] for i in (10, 11, 12)]
        assert abs(ys[1] - 2 * ys[0]) <= 2 and abs(ys[2] - 3 * ys[0]) <= 3


class TestIsotonicMinimax:
    def _pava_ref(self, s, c, scale=10**12):
        # classic pool-adjacent-violators on scaled integer means
        n = len(s)
        means = []
        for k in range(n):
            best = None
            for i in range(k + 1):
                worst = None
                for j in range(k, n):
                    m = scale * sum(s[i : j + 1]) // max(sum(c[i : j + 1]), 1)
                    worst = m if worst is None else min(worst, m)
                best = worst if best is None else max(best, worst)
            means.append(best)
        return means

    def test_matches_minimax_reference_and_monotone(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.ml import (
            isotonic_fit_minimax,
        )

        s = [5, 3, 9, 2, 2, 8, 7, 20]
        c = [10, 10, 12, 4, 9, 11, 8, 21]
        df = spark.createDataFrame(
            [(k, s[k], c[k]) for k in range(len(s))], "bin bigint, s bigint, c bigint"
        )
        rows = sorted(isotonic_fit_minimax(df).collect(), key=lambda r: r["bin"])
        exp = self._pava_ref(s, c)
        got = [r["fitted_scaled"] for r in rows]
        assert got == exp
        assert all(got[k] <= got[k + 1] for k in range(len(got) - 1))
        # pooling: already-monotone input is returned as plain means
        s2, c2 = [1, 5, 9], [10, 10, 10]
        df2 = spark.createDataFrame(
            [(k, s2[k], c2[k]) for k in range(3)], "bin bigint, s bigint, c bigint"
        )
        rows2 = sorted(isotonic_fit_minimax(df2).collect(), key=lambda r: r["bin"])
        assert [r["fitted_scaled"] for r in rows2] == [
            10**12 * s2[k] // c2[k] for k in range(3)
        ]

    def test_constant_violator_pools_to_weighted_mean(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.ml import (
            isotonic_fit_minimax,
        )

        # strictly decreasing input -> one global pool
        s, c = [9, 6, 3], [10, 10, 10]
        df = spark.createDataFrame(
            [(k, s[k], c[k]) for k in range(3)], "bin bigint, s bigint, c bigint"
        )
        rows = isotonic_fit_minimax(df).collect()
        pooled = 10**12 * sum(s) // sum(c)
        assert {r["fitted_scaled"] for r in rows} == {pooled}


class TestNaiveBayesOddsGate:
    def _ref(self, train, score, nf, lik_scale=1000):
        n = len(train)
        n1 = sum(r[-1] for r in train)
        n0 = n - n1
        prior = {0: lik_scale * n0 // n, 1: lik_scale * n1 // n}
        lik = {}
        for j in range(nf):
            for c in (0, 1):
                for v in (0, 1):
                    cnt = sum(1 for r in train if r[-1] == c and r[j] == v)
                    lik[(j, c, v)] = lik_scale * (cnt + 1) // ((n1 if c else n0) + 2)
        from collections import Counter

        cm = Counter()
        for r in score:
            o1 = prior[1]
            o0 = prior[0]
            for j in range(nf):
                o1 *= lik[(j, 1, r[j])]
                o0 *= lik[(j, 0, r[j])]
            cm[(1 if o1 >= o0 else 0, r[-1])] += 1
        return dict(cm)

    def test_separable_and_reference_equality(self, spark):
        import random

        from dpe_energy_performance_analysis_etl_spark.operators.ml import (
            naive_bayes_odds_gate,
        )

        rng = random.Random(3)
        # y = f0 with 10% flip noise; f1 is a decoy coin
        rows = []
        for _ in range(400):
            f0 = rng.randint(0, 1)
            f1 = rng.randint(0, 1)
            y = f0 if rng.random() > 0.1 else 1 - f0
            rows.append((f0, f1, y))
        train, score = rows[:300], rows[300:]
        tdf = spark.createDataFrame(train, "f0 int, f1 int, y int")
        sdf = spark.createDataFrame(score, "f0 int, f1 int, y int")
        got = {
            (r["pred"], r["actual"]): r["n"]
            for r in naive_bayes_odds_gate(tdf, sdf, ["f0", "f1"]).collect()
        }
        assert got == self._ref(train, score, 2)
        # the learned gate must track f0 (>85% accuracy on this noise)
        acc = sum(v for (p, a), v in got.items() if p == a) / len(score)
        assert acc > 0.8

    def test_feature_count_guard(self, spark):
        import pytest

        from dpe_energy_performance_analysis_etl_spark.operators.ml import (
            naive_bayes_odds_gate,
        )

        df = spark.createDataFrame([(1, 1)], "f0 int, y int")
        with pytest.raises(ValueError):
            naive_bayes_odds_gate(df, df, [f"f{i}" for i in range(6)])


class TestBradleyTerry:
    def test_two_player_analytic_fixed_point(self, spark):
        """A beats B 3:1 -> BT MLE is p_A/(p_A+p_B) = 3/4; the MM
        update reaches it exactly in one round and stays (1.5e6 /
        0.5e6 in ppm after renormalization to 2 players * 1e6)."""
        from dpe_energy_performance_analysis_etl_spark.operators.ml import (
            bradley_terry_mm,
        )

        rows = [("A", "B")] * 3 + [("B", "A")]
        df = spark.createDataFrame(rows, "winner string, loser string")
        got = {r["player"]: r for r in bradley_terry_mm(df, rounds=3).collect()}
        assert got["A"]["strength_ppm"] == 1_500_000
        assert got["B"]["strength_ppm"] == 500_000
        assert got["A"]["games"] == 4 and got["A"]["wins"] == 3
        assert got["B"]["games"] == 4 and got["B"]["wins"] == 1

    def test_transitive_triple_orders_strengths(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.ml import (
            bradley_terry_mm,
        )

        rows = [("A", "B")] * 7 + [("B", "A")] * 3 + [("B", "C")] * 7 + [
            ("C", "B")
        ] * 3 + [("A", "C")] * 8 + [("C", "A")] * 2
        df = spark.createDataFrame(rows, "winner string, loser string")
        got = {r["player"]: r["strength_ppm"] for r in bradley_terry_mm(df).collect()}
        assert got["A"] > got["B"] > got["C"]

    def test_winless_player_no_zero_division(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.ml import (
            bradley_terry_mm,
        )

        df = spark.createDataFrame([("A", "B"), ("A", "B")], "winner string, loser string")
        got = {r["player"]: r["strength_ppm"] for r in bradley_terry_mm(df).collect()}
        assert got["B"] == 0 and got["A"] == 2_000_000
