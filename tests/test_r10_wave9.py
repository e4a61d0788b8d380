"""Round-10 wave-9 tests: multiset ops, landmark closeness, Brier
decomposition."""

from __future__ import annotations

import datetime as dt
import math


class TestMultisetOps:
    def _run(self, spark, tmp_path, half1, half2):
        """half1/half2: lists of quantity values."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = [(float(q), dt.date(1994, 2, 1)) for q in half1]
        rows += [(float(q), dt.date(1998, 11, 1)) for q in half2]
        spark.createDataFrame(
            rows, "l_quantity double, l_shipdate date"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        out = QUERIES["multiset_ops_quantity"](spark, str(tmp_path)).collect()
        return {r["quantity"]: r for r in out}

    def test_bag_semantics(self, spark, tmp_path):
        got = self._run(
            spark, tmp_path, [1, 1, 1, 2, 3], [1, 2, 2, 4]
        )
        assert (got[1]["c1"], got[1]["c2"]) == (3, 1)
        assert got[1]["except_all_count"] == 2  # 3 copies minus 1
        assert got[1]["intersect_all_count"] == 1
        assert got[2]["except_all_count"] == 0
        assert got[2]["rexcept_all_count"] == 1
        assert got[2]["intersect_all_count"] == 1
        assert got[3]["intersect_all_count"] == 0
        assert got[4]["rexcept_all_count"] == 1


class TestClosenessCentrality:
    def _run(self, spark, tmp_path, orders):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for ok, parts in enumerate(orders, start=1):
            for p in parts:
                rows.append((ok, p))
        spark.createDataFrame(
            rows, "l_orderkey bigint, l_partkey bigint"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        out = QUERIES["closeness_centrality_landmarks"](
            spark, str(tmp_path)
        ).collect()
        return {r["node"]: r for r in out}

    def test_star_center_most_central(self, spark, tmp_path):
        # star centered at node 1 with leaves 2..6 (each edge twice to
        # clear the support floor); landmarks = 4 smallest ids 1,2,3,4
        orders = []
        for leaf in range(2, 7):
            orders += [[1, leaf], [1, leaf]]
        got = self._run(spark, tmp_path, orders)
        # center: dist 1 to every other node -> from landmarks 2,3,4
        # distance 1 each (self landmark 1 contributes 0)
        assert got[1]["closeness_x12"] == 3 * 12
        assert got[1]["rk"] == 1
        # leaf 5: dist 1 to landmark 1, dist 2 to landmarks 2,3,4
        assert got[5]["closeness_x12"] == 12 + 3 * 6
        # ranks are deterministic: node 1 first, leaves tie-broken by id
        leaf_rows = sorted(
            (r["rk"], n) for n, r in got.items() if n in (5, 6)
        )
        assert leaf_rows[0][1] == 5


class TestBrierDecomposition:
    def _run(self, spark, tmp_path, bins):
        """bins: priority digit -> ((n1, r1), (n2, r2)) for the two
        halves (r = count with status 'F')."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for w, ((n1, r1), (n2, r2)) in sorted(bins.items()):
            for half, (n, r) in enumerate(((n1, r1), (n2, r2))):
                day = dt.date(1993, 3, 1) if half == 0 else dt.date(1998, 5, 1)
                for i in range(n):
                    rows.append(
                        (f"{w}-X", "F" if i < r else "O", day)
                    )
        spark.createDataFrame(
            rows,
            "o_orderpriority string, o_orderstatus string, o_orderdate date",
        ).write.parquet(str(tmp_path / "orders.parquet"))
        return QUERIES["brier_decomposition_orders"](
            spark, str(tmp_path)
        ).collect()[0]

    @staticmethod
    def _ref(bins):
        n = sum(v[1][0] for v in bins.values())
        r = sum(v[1][1] for v in bins.values())
        rel = res = 0.0
        for w in range(1, 6):
            if w not in bins:
                continue
            (n1, r1), (n2, r2) = bins[w]
            # mirror the engine's left-associated (n2 * d) * d shape
            # — n2 * (d ** 2) differs by 1 ulp at floor boundaries
            if n1 > 0 and n2 > 0:
                d = r1 / n1 - r2 / n2
                rel += (n2 * d) * d
            if n2 > 0:
                d = r2 / n2 - r / n
                res += (n2 * d) * d
        return (
            math.floor(rel / n * 1e6),
            math.floor(res / n * 1e6),
            math.floor(r / n * (1 - r / n) * 1e6),
        )

    def test_well_calibrated_low_reliability(self, spark, tmp_path):
        bins = {
            1: ((50, 10), (50, 10)),
            3: ((50, 25), (50, 25)),
            5: ((50, 40), (50, 40)),
        }
        r = self._run(spark, tmp_path, bins)
        rel, res, unc = self._ref(bins)
        assert (
            r["reliability_ppm"],
            r["resolution_ppm"],
            r["uncertainty_ppm"],
        ) == (rel, res, unc)
        assert r["reliability_ppm"] == 0  # perfectly calibrated
        assert r["resolution_ppm"] > 10_000  # bins genuinely differ

    def test_drifted_rates_reliability_positive(self, spark, tmp_path):
        bins = {
            1: ((50, 10), (50, 30)),
            4: ((50, 40), (50, 15)),
        }
        r = self._run(spark, tmp_path, bins)
        rel, res, unc = self._ref(bins)
        assert (
            r["reliability_ppm"],
            r["resolution_ppm"],
            r["uncertainty_ppm"],
        ) == (rel, res, unc)
        assert r["reliability_ppm"] > 50_000  # forecasts badly off
