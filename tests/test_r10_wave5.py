"""Round-10 wave-5 tests: Cucconi, Krippendorff's alpha, edge
embeddedness."""

from __future__ import annotations

import datetime as dt
import math


class TestCucconi:
    def _run(self, spark, tmp_path, rows):
        """rows: (status, priority_first_char, dollars)."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            [
                (s, f"{c}-X", float(v), dt.date(1995, 1, 5))
                for s, c, v in rows
            ],
            "o_orderstatus string, o_orderpriority string,"
            " o_totalprice double, o_orderdate date",
        ).write.parquet(str(tmp_path / "orders.parquet"))
        out = QUERIES["cucconi_status"](spark, str(tmp_path)).collect()
        return {r["o_orderstatus"]: r for r in out}

    @staticmethod
    def _ref(values, sides):
        """Mid-rank U/V reference (floats)."""
        n = len(values)
        n2 = sum(sides)
        order = sorted(range(n), key=lambda i: values[i])
        ranks = [0.0] * n
        i = 0
        pos = 0
        while i < len(order):
            j = i
            while j < len(order) and values[order[j]] == values[order[i]]:
                j += 1
            mid = (pos + 1 + pos + (j - i)) / 2
            for t in range(i, j):
                ranks[order[t]] = mid
            pos += j - i
            i = j
        sr2 = sum(r * r for r, s in zip(ranks, sides) if s)
        ss2 = sum((n + 1 - r) ** 2 for r, s in zip(ranks, sides) if s)
        den = math.sqrt(
            n2 * (n - n2) * (n + 1) * (2 * n + 1) * (8 * n + 11) / 180.0
        )
        eu = n2 * (n + 1) * (2 * n + 1) / 6.0
        return (
            math.floor((sr2 - eu) / den * 1000),
            math.floor((ss2 - eu) / den * 1000),
        )

    def test_shift_moves_u_up(self, spark, tmp_path):
        # sample 2 (urgent) strictly to the right of sample 1
        rows = [("F", 3, 100 + i) for i in range(8)]
        rows += [("F", 1, 200 + i) for i in range(8)]
        got = self._run(spark, tmp_path, rows)["F"]
        values = [100 + i for i in range(8)] + [200 + i for i in range(8)]
        sides = [0] * 8 + [1] * 8
        u, v = self._ref([v * 100 for v in values], sides)
        assert got["u_milli"] == u and got["v_milli"] == v
        assert got["u_milli"] > 2000  # right shift
        assert got["v_milli"] < -2000

    def test_ties_midrank(self, spark, tmp_path):
        rows = [("O", 3, 100), ("O", 3, 100), ("O", 1, 100), ("O", 1, 200)]
        got = self._run(spark, tmp_path, rows)["O"]
        u, v = self._ref(
            [10000, 10000, 10000, 20000], [0, 0, 1, 1]
        )
        assert got["u_milli"] == u and got["v_milli"] == v

    def test_single_side_null(self, spark, tmp_path):
        rows = [("P", 1, 100 + i) for i in range(5)]
        got = self._run(spark, tmp_path, rows)["P"]
        assert got["u_milli"] is None and got["v_milli"] is None


class TestKrippendorff:
    def _run(self, spark, tmp_path, units):
        """units: list of category strings over {R,A,N}, len = raters."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for i, cats in enumerate(units):
            for j, cat in enumerate(cats):
                rows.append((i + 1, j + 1, cat))
        spark.createDataFrame(
            rows, "l_orderkey bigint, l_linenumber int, l_returnflag string"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        return QUERIES["krippendorff_alpha_orders"](
            spark, str(tmp_path)
        ).collect()[0]

    @staticmethod
    def _ref(units):
        units = [u for u in units if len(u) >= 2]
        n = sum(len(u) for u in units)
        do60 = 0
        for u in units:
            m = len(u)
            a = sum(u.count(c) * (m - u.count(c)) for c in "RAN")
            do60 += (60 // (m - 1)) * a
        cs = {c: sum(u.count(c) for u in units) for c in "RAN"}
        de = sum(v * (n - v) for v in cs.values())
        if de <= 0:
            return None
        num = 60 * de - (n - 1) * do60
        sign = 1 if num >= 0 else -1
        return sign * ((abs(num) * 1_000_000) // (60 * de))

    def test_perfect_agreement(self, spark, tmp_path):
        units = ["RR", "NNN", "AAAA", "RRRRR"]
        r = self._run(spark, tmp_path, units)
        assert r["alpha_ppm"] == 1_000_000

    def test_variable_raters_match_reference(self, spark, tmp_path):
        units = ["RRN", "NN", "RANR", "AARNA", "NR", "RRRRRNA"]
        r = self._run(spark, tmp_path, units)
        assert r["n_units"] == 6
        assert r["n_ratings"] == sum(len(u) for u in units)
        assert r["alpha_ppm"] == self._ref(units)

    def test_singleton_units_dropped(self, spark, tmp_path):
        units = ["R", "NN", "RR"]
        r = self._run(spark, tmp_path, units)
        assert r["n_units"] == 2
        assert r["alpha_ppm"] == self._ref(units)


class TestEdgeEmbeddedness:
    def _run(self, spark, tmp_path, orders):
        """orders: list of part lists; each co-purchase pair repeated
        twice across synthetic orders to clear the support floor."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        ok = 0
        for parts in orders:
            ok += 1
            for p in parts:
                rows.append((ok, p))
        spark.createDataFrame(
            rows, "l_orderkey bigint, l_partkey bigint"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        out = QUERIES["edge_embeddedness_parts"](spark, str(tmp_path)).collect()
        return {r["embeddedness"]: r["n_edges"] for r in out}

    def test_triangle_plus_bridge(self, spark, tmp_path):
        # triangle 1-2-3 (each pair twice) + pendant edge 3-4 (twice):
        # triangle edges have embeddedness 1, bridge edge 0
        orders = [[1, 2, 3], [1, 2, 3], [3, 4], [3, 4]]
        got = self._run(spark, tmp_path, orders)
        assert got == {1: 3, 0: 1}

    def test_support_floor_filters_weak_edges(self, spark, tmp_path):
        # pair (5, 6) appears once only -> no edge at all
        orders = [[1, 2], [1, 2], [5, 6]]
        got = self._run(spark, tmp_path, orders)
        assert got == {0: 1}

    def test_k4_embeddedness_two(self, spark, tmp_path):
        # complete graph on 4 nodes: every edge sits in 2 triangles
        k4 = [1, 2, 3, 4]
        orders = [k4, k4]
        got = self._run(spark, tmp_path, orders)
        assert got == {2: 6}
