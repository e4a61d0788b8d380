"""Round-9 wave-14 tests: KMV pairwise set-operation estimates."""

from __future__ import annotations


def _h(term: str, pad: int = 16, base: int = 131, mod: int = 10**15) -> int:
    s = term + "#" * max(0, pad - len(term))
    acc = 0
    for ch in s:
        acc = (acc * base + ord(ch)) % mod
    return acc


class TestKmvPairwiseSetops:
    def _run(self, spark, groups, k):
        from dpe_energy_performance_analysis_etl_spark.operators.sketch import (
            kmv_pairwise_setops,
        )

        rows = [(g, t) for g, terms in groups.items() for t in terms]
        df = spark.createDataFrame(rows, "g string, term string")
        out = kmv_pairwise_setops(df, "g", "term", k=k).collect()
        return {(r["src_a"], r["src_b"]): r for r in out}

    def test_exact_path_below_k(self, spark):
        # vocabularies smaller than k: everything exact
        a = {f"alpha{i}" for i in range(10)}
        b = {f"alpha{i}" for i in range(5)} | {f"beta{i}" for i in range(5)}
        got = self._run(spark, {"A": a, "B": b}, k=64)
        r = got[("A", "B")]
        assert r["est_a"] == 10.0 and r["est_b"] == 10.0
        assert r["est_union"] == 15.0
        assert r["jaccard_ppm"] == (5 * 10**6) // 15
        assert abs(r["est_intersection"] - 5.0) < 1e-9

    def test_estimator_path_matches_python_mirror(self, spark):
        k = 8
        a = {f"w{i}" for i in range(60)}
        b = {f"w{i}" for i in range(30, 90)}
        got = self._run(spark, {"A": a, "B": b}, k=k)
        r = got[("A", "B")]

        def kmin(vocab):
            return sorted({_h(t) for t in vocab})[:k]

        def est(hs, n_items):
            held = len(hs)
            if held < k:
                return float(held)
            return (k - 1) * 1.0e15 / float(hs[-1])

        ka, kb = kmin(a), kmin(b)
        union_all = sorted(set(ka) | set(kb))[:k]
        n_both = sum(1 for h in union_all if h in set(ka) and h in set(kb))
        assert r["est_a"] == est(ka, len(a))
        assert r["est_b"] == est(kb, len(b))
        assert r["est_union"] == est(union_all, None)
        assert r["jaccard_ppm"] == (n_both * 10**6) // len(union_all)
        assert r["est_intersection"] == n_both / len(union_all) * est(union_all, None)

    def test_disjoint_groups_zero_jaccard(self, spark):
        a = {f"xx{i}" for i in range(20)}
        b = {f"yy{i}" for i in range(20)}
        got = self._run(spark, {"A": a, "B": b}, k=64)
        r = got[("A", "B")]
        assert r["jaccard_ppm"] == 0
        assert r["est_intersection"] == 0.0
        assert r["est_union"] == 40.0

    def test_three_groups_all_pairs(self, spark):
        groups = {
            "A": {f"t{i}" for i in range(8)},
            "B": {f"t{i}" for i in range(4, 12)},
            "C": {f"u{i}" for i in range(8)},
        }
        got = self._run(spark, groups, k=64)
        assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
        assert got[("A", "B")]["jaccard_ppm"] == (4 * 10**6) // 12
        assert got[("A", "C")]["jaccard_ppm"] == 0

    def test_estimates_reasonable_at_scale(self, spark):
        # 2000-term vocabularies, 50% overlap, k=64: the estimator
        # should land within ~35% of truth (k=64 relative error
        # ~1/sqrt(64) = 12.5%, allow 3 sigma)
        a = {f"word{i}" for i in range(2000)}
        b = {f"word{i}" for i in range(1000, 3000)}
        got = self._run(spark, {"A": a, "B": b}, k=64)
        r = got[("A", "B")]
        assert 1300 < r["est_a"] < 2700
        assert 1950 < r["est_union"] < 4050
        assert 0.13 < r["jaccard_ppm"] / 1e6 < 0.55  # truth 1/3
