"""Round-9 wave-23 tests: DP mechanisms (geometric noise, RR)."""

from __future__ import annotations


def _mix32(x: int, salt: int) -> int:
    s = (x % 2**32 * 73244475 + salt * 2246822519) % 2**32
    s = ((s ^ (s >> 16)) * 73244475) % 2**32
    s = ((s ^ (s >> 16)) * 73244475) % 2**32
    return s


def _ctz32(h: int) -> int:
    if h == 0:
        return 32
    c = 0
    while h % 2 == 0:
        h //= 2
        c += 1
    return c


class TestDpGeometricCounts:
    def _run(self, spark, tmp_path, nation_counts):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        nations = sorted(nation_counts)
        spark.createDataFrame(
            [(i, nm) for i, nm in enumerate(nations)],
            "n_nationkey bigint, n_name string",
        ).write.parquet(str(tmp_path / "nation.parquet"))
        custs, ck = [], 0
        for nm, cnt in nation_counts.items():
            nk = nations.index(nm)
            for _ in range(cnt):
                ck += 1
                custs.append((ck, nk))
        spark.createDataFrame(
            custs, "c_custkey bigint, c_nationkey bigint"
        ).write.parquet(str(tmp_path / "customer.parquet"))
        out = QUERIES["dp_geometric_counts_nations"](spark, str(tmp_path)).collect()
        return {r["n_name"]: r for r in out}, nations

    def test_noise_matches_seeded_reference(self, spark, tmp_path):
        counts = {"AAA": 40, "BBB": 7, "CCC": 123}
        got, nations = self._run(spark, tmp_path, counts)
        for nm, cnt in counts.items():
            nk = nations.index(nm)
            z = _ctz32(_mix32(nk * 2 + 1, 1091)) - _ctz32(_mix32(nk * 2 + 2, 4639))
            r = got[nm]
            assert r["true_count"] == cnt
            assert r["noise"] == z
            assert r["noisy_count"] == cnt + z

    def test_noise_distribution_is_two_sided_geometric(self, spark):
        # pure-python check of the mechanism's distribution over many
        # seeds: P(|Z| = 0) should be ~1/3 for Laplace(p=1/2)
        zs = [
            _ctz32(_mix32(k * 2 + 1, 1091)) - _ctz32(_mix32(k * 2 + 2, 4639))
            for k in range(20000)
        ]
        frac0 = sum(1 for z in zs if z == 0) / len(zs)
        assert abs(frac0 - 1 / 3) < 0.02
        assert abs(sum(zs) / len(zs)) < 0.05  # centered


class TestRandomizedResponse:
    def _run(self, spark, tmp_path, rows):
        """rows: list of returnflag strings; one lineitem per row,
        one brand."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            [(i // 4, i % 4, 1, fl) for i, fl in enumerate(rows)],
            "l_orderkey bigint, l_linenumber int, l_partkey bigint,"
            " l_returnflag string",
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        spark.createDataFrame(
            [(1, "Brand#1")], "p_partkey bigint, p_brand string"
        ).write.parquet(str(tmp_path / "part.parquet"))
        return QUERIES["randomized_response_returns"](spark, str(tmp_path)).collect()[0]

    def test_reported_counts_match_seeded_flips(self, spark, tmp_path):
        rows = (["R"] * 30 + ["N"] * 70) * 4
        r = self._run(spark, tmp_path, rows)
        flips = [
            1 if _mix32((i // 4) * 8 + (i % 4), 7211) % 4 == 0 else 0
            for i in range(len(rows))
        ]
        expect_reported = sum(
            ((1 if fl == "R" else 0) + f) % 2 for fl, f in zip(rows, flips)
        )
        assert r["n"] == len(rows)
        assert r["true_returns"] == 120
        assert r["reported_returns"] == expect_reported
        n, obs = len(rows), expect_reported
        sign = 1 if 4 * obs >= n else -1
        assert r["estimated_ppm"] == sign * ((abs(4 * obs - n) * 10**6) // (2 * n))

    def test_debiased_estimate_tracks_truth(self, spark, tmp_path):
        rows = (["R"] * 25 + ["N"] * 75) * 40  # 4000 rows, p = 0.25
        r = self._run(spark, tmp_path, rows)
        # flip noise on 4000 rows: estimate within ~4 points of truth
        assert abs(r["estimated_ppm"] - 250_000) < 40_000
        assert r["true_ppm"] == 250_000
