"""Round-10 wave-6 tests: Cochran-Armitage trend, Getis-Ord Gi*,
Jarque-Bera."""

from __future__ import annotations

import datetime as dt
import math


class TestCochranArmitage:
    def _run(self, spark, tmp_path, cells):
        """cells: dict priority_digit -> (n_lineitems, n_returned)."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        orows, lrows = [], []
        ok = 0
        for w, (nj, rj) in sorted(cells.items()):
            for i in range(nj):
                ok += 1
                orows.append((ok, f"{w}-X", dt.date(1995, 1, 5)))
                lrows.append((ok, "R" if i < rj else "N"))
        spark.createDataFrame(
            orows, "o_orderkey bigint, o_orderpriority string, o_orderdate date"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        spark.createDataFrame(
            lrows, "l_orderkey bigint, l_returnflag string"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        return QUERIES["cochran_armitage_priority_returns"](
            spark, str(tmp_path)
        ).collect()[0]

    @staticmethod
    def _ref(cells):
        n = sum(nj for nj, _ in cells.values())
        r = sum(rj for _, rj in cells.values())
        swn = sum(w * nj for w, (nj, _) in cells.items())
        sw2n = sum(w * w * nj for w, (nj, _) in cells.items())
        swr = sum(w * rj for w, (_, rj) in cells.items())
        b = n * sw2n - swn * swn
        if r == 0 or r == n or b <= 0:
            return None
        a = n * swr - swn * r
        return math.floor(
            float(a) / math.sqrt(float(r * (n - r)) * float(b) / float(n))
            * 1000
        )

    def test_increasing_rate_positive_z(self, spark, tmp_path):
        cells = {1: (20, 2), 2: (20, 5), 3: (20, 8), 4: (20, 12), 5: (20, 16)}
        r = self._run(spark, tmp_path, cells)
        assert r["n_total"] == 100 and r["n_returned"] == 43
        assert r["ca_z_milli"] == self._ref(cells)
        assert r["ca_z_milli"] > 3000

    def test_flat_rate_near_zero(self, spark, tmp_path):
        cells = {w: (20, 6) for w in range(1, 6)}
        r = self._run(spark, tmp_path, cells)
        assert r["ca_z_milli"] == self._ref(cells)
        assert abs(r["ca_z_milli"]) <= 1

    def test_all_returned_null(self, spark, tmp_path):
        cells = {1: (5, 5), 2: (5, 5)}
        r = self._run(spark, tmp_path, cells)
        assert r["ca_z_milli"] is None


class TestGetisOrd:
    def _run(self, spark, vals):
        """vals: dict (cx, cy) -> int value."""
        from dpe_energy_performance_analysis_etl_spark.operators.spatial import (
            getis_ord_gi_grid,
        )

        df = spark.createDataFrame(
            [(x, y, v) for (x, y), v in sorted(vals.items())],
            "cx bigint, cy bigint, val bigint",
        )
        return getis_ord_gi_grid(df, top_k=2).collect()

    def test_hotspot_detected(self, spark):
        vals = {(x, y): 10 for x in range(5) for y in range(5)}
        # a hot 2x2 block in one corner
        for c in [(0, 0), (0, 1), (1, 0), (1, 1)]:
            vals[c] = 1000
        out = self._run(spark, vals)
        hot = [r for r in out if r["bucket"] == "hot"]
        assert len(hot) == 2
        top = next(r for r in hot if r["rk"] == 1)
        # the hottest cell is inside the hot block
        assert (top["cx"], top["cy"]) in {(0, 0), (0, 1), (1, 0), (1, 1)}
        assert top["gi_z_milli"] > 2000
        cold = [r for r in out if r["bucket"] == "cold"]
        assert len(cold) == 2 and all(
            r["gi_z_milli"] < top["gi_z_milli"] for r in cold
        )

    def test_z_matches_reference(self, spark):
        vals = {(x, y): (x + 1) * (y + 2) for x in range(4) for y in range(4)}
        out = self._run(spark, vals)
        n = len(vals)
        s = sum(vals.values())
        s2 = sum(v * v for v in vals.values())
        d2 = n * s2 - s * s

        def ref(cx, cy):
            nb = [(cx, cy), (cx + 1, cy), (cx - 1, cy), (cx, cy + 1), (cx, cy - 1)]
            present = [p for p in nb if p in vals]
            w = len(present)
            lsum = sum(vals[p] for p in present)
            a = n * lsum - w * s
            return math.floor(
                float(a)
                / math.sqrt(float(d2) * float(n * w - w * w) / float(n - 1))
                * 1000
            )

        for r in out:
            assert r["gi_z_milli"] == ref(r["cx"], r["cy"])


class TestJarqueBera:
    def _run(self, spark, tmp_path, dollars):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            [(float(v), dt.date(1995, 1, 5)) for v in dollars],
            "o_totalprice double, o_orderdate date",
        ).write.parquet(str(tmp_path / "orders.parquet"))
        return QUERIES["jarque_bera_order_values"](
            spark, str(tmp_path)
        ).collect()[0]

    @staticmethod
    def _ref(xs):
        n = len(xs)
        s1, s2 = sum(xs), sum(x * x for x in xs)
        s3, s4 = sum(x**3 for x in xs), sum(x**4 for x in xs)
        fn = float(n)
        m2 = (fn * float(s2) - float(s1) * float(s1)) / (fn * fn)
        m3 = (
            fn * fn * float(s3)
            - 3.0 * fn * float(s2) * float(s1)
            + 2.0 * float(s1) ** 3
        ) / fn**3
        m4 = (
            fn**3 * float(s4)
            - 4.0 * fn * fn * float(s3) * float(s1)
            + 6.0 * fn * float(s2) * float(s1) * float(s1)
            - 3.0 * float(s1) ** 4
        ) / fn**4
        if m2 <= 0:
            return None, None, None
        skew = m3 / math.sqrt(m2**3)
        exk = m4 / (m2 * m2) - 3.0
        jb = fn / 6.0 * (skew * skew + exk * exk / 4.0)
        return (
            math.floor(skew * 1000),
            math.floor(exk * 1000),
            math.floor(jb * 1000),
        )

    def test_symmetric_values(self, spark, tmp_path):
        xs = [100, 200, 300, 400, 500, 300, 300, 200, 400]
        r = self._run(spark, tmp_path, xs)
        sk, ek, jb = self._ref(xs)
        assert (r["skew_milli"], r["exkurt_milli"], r["jb_milli"]) == (
            sk,
            ek,
            jb,
        )
        assert abs(r["skew_milli"]) < 200  # near-symmetric

    def test_right_skewed(self, spark, tmp_path):
        xs = [100] * 20 + [2000, 3000, 5000]
        r = self._run(spark, tmp_path, xs)
        sk, ek, jb = self._ref(xs)
        assert (r["skew_milli"], r["exkurt_milli"], r["jb_milli"]) == (
            sk,
            ek,
            jb,
        )
        assert r["skew_milli"] > 1000 and r["jb_milli"] > 5000

    def test_constant_null(self, spark, tmp_path):
        r = self._run(spark, tmp_path, [500] * 8)
        assert r["jb_milli"] is None
