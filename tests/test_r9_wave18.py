"""Round-9 wave-18 tests: Neyman allocation, required sample size."""

from __future__ import annotations

import math


class TestNeymanAllocation:
    def _run(self, spark, tmp_path, strata):
        """strata: dict nation -> list of totalprice cents."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        nations = sorted(strata)
        spark.createDataFrame(
            [(i, nm) for i, nm in enumerate(nations)],
            "n_nationkey bigint, n_name string",
        ).write.parquet(str(tmp_path / "nation.parquet"))
        custs, orders = [], []
        ck = 0
        ok = 0
        for nm, vals in strata.items():
            nk = nations.index(nm)
            ck += 1
            custs.append((ck, nk))
            for v in vals:
                ok += 1
                orders.append((ok, ck, float(v) / 100.0))
        spark.createDataFrame(
            custs, "c_custkey bigint, c_nationkey bigint"
        ).write.parquet(str(tmp_path / "customer.parquet"))
        spark.createDataFrame(
            orders, "o_orderkey bigint, o_custkey bigint, o_totalprice double"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        out = QUERIES["neyman_allocation_nations"](spark, str(tmp_path)).collect()
        return {r["n_name"]: r for r in out}

    @staticmethod
    def _ref(strata, budget=10_000):
        ws = {}
        for nm, vals in strata.items():
            n = len(vals)
            if n > 1:
                s = sum(vals)
                ssq = sum(v * v for v in vals)
                ws[nm] = math.sqrt(n * (n * ssq - s * s) / (n - 1)) / n
            else:
                ws[nm] = 0.0
        wsum = 0.0
        for nm in sorted(ws):
            wsum += ws[nm]
        alloc = {nm: budget * w / wsum for nm, w in ws.items()}
        flo = {nm: math.floor(a) for nm, a in alloc.items()}
        extra = budget - sum(flo.values())
        order = sorted(ws, key=lambda nm: (-(alloc[nm] - flo[nm]), nm))
        out = dict(flo)
        for nm in order[:extra]:
            out[nm] += 1
        return out

    def test_matches_reference_and_sums_to_budget(self, spark, tmp_path):
        import random

        rng = random.Random(3)
        strata = {
            "AAA": [rng.randint(100, 1000) for _ in range(50)],     # volatile
            "BBB": [500 + rng.randint(-5, 5) for _ in range(200)],  # tight
            "CCC": [rng.randint(100, 5000) for _ in range(30)],     # wild
        }
        got = self._run(spark, tmp_path, strata)
        ref = self._ref(strata)
        for nm in strata:
            assert got[nm]["n_allocated"] == ref[nm], nm
        assert sum(r["n_allocated"] for r in got.values()) == 10_000
        # wild stratum out-allocates the tight big one per unit size
        assert (
            got["CCC"]["n_allocated"] / 30
            > got["BBB"]["n_allocated"] / 200
        )

    def test_zero_variance_stratum_gets_nothing(self, spark, tmp_path):
        strata = {
            "FLAT": [700] * 100,
            "VAR": [100, 900, 100, 900, 500, 300],
        }
        got = self._run(spark, tmp_path, strata)
        assert got["FLAT"]["n_allocated"] == 0
        assert got["VAR"]["n_allocated"] == 10_000


class TestRequiredSampleSize:
    def _run(self, spark, tmp_path, rows):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            [(i, i % 7, fl) for i, fl in enumerate(rows)],
            "l_orderkey bigint, l_partkey bigint, l_returnflag string",
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        spark.createDataFrame(
            [(k, "Brand#1") for k in range(7)],
            "p_partkey bigint, p_brand string",
        ).write.parquet(str(tmp_path / "part.parquet"))
        return QUERIES["required_sample_size_brands"](spark, str(tmp_path)).collect()[0]

    def test_formula_exact_ceiling(self, spark, tmp_path):
        rows = ["R"] * 25 + ["N"] * 75  # p = 0.25
        r = self._run(spark, tmp_path, rows)
        assert r["n"] == 100 and r["x"] == 25
        # n_req = ceil(800 * 75 / 25) = 2400
        assert r["n_required_per_arm"] == 2400
        # exact ceiling on a non-divisible case
        rows2 = ["R"] * 7 + ["N"] * 13
        import tempfile, pathlib

        d2 = pathlib.Path(tempfile.mkdtemp())
        r2 = self._run(spark, d2, rows2)
        assert r2["n_required_per_arm"] == math.ceil(800 * 13 / 7)

    def test_zero_conversions_null(self, spark, tmp_path):
        r = self._run(spark, tmp_path, ["N"] * 40)
        assert r["n_required_per_arm"] is None
