"""Round-12 wave-1 tests: price indices, bullwhip ratio, Hoover
index, ABC-XYZ matrix, share-of-parent, aging buckets, demand
classes, single-sourcing."""

from __future__ import annotations

import datetime as dt
import math


def _q(name):
    from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

    return QUERIES[name]


class TestPriceIndices:
    def test_matches_integer_floored_reference(self, spark, tmp_path):
        # years 1998 (base), 1999 (obs); 2000 is the partial max year
        orders, lines = [], []
        # (orderkey, year) -> lines: (partkey, qty, price_dollars)
        data = {
            (1, 1998): [(10, 4, 100.00), (20, 2, 50.00)],
            (2, 1999): [(10, 5, 120.00), (20, 1, 30.00)],
            (3, 2000): [(10, 1, 999.00)],  # anchor year, excluded
        }
        for (ok, yr), ls in data.items():
            orders.append((ok, dt.datetime(yr, 6, 1)))
            for pk, q, d in ls:
                lines.append((ok, pk, q, float(d)))
        spark.createDataFrame(
            orders, "o_orderkey long, o_orderdate timestamp"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        spark.createDataFrame(
            lines,
            "l_orderkey long, l_partkey long, l_quantity long,"
            " l_extendedprice double",
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        r = _q("price_indices_yearly")(spark, str(tmp_path)).collect()[0]
        # python reference with the same integer-floored per-part terms
        c0 = {10: 10000, 20: 5000}
        q0 = {10: 4, 20: 2}
        c1 = {10: 12000, 20: 3000}
        q1 = {10: 5, 20: 1}
        l_num = sum(c1[p] * q0[p] // q1[p] for p in (10, 20))
        l_den = sum(c0.values())
        p_num = sum(c1.values())
        p_den = sum(c0[p] * q1[p] // q0[p] for p in (10, 20))
        assert (r["base_year"], r["obs_year"], r["n_parts"]) == (1998, 1999, 2)
        assert r["laspeyres_ppm"] == math.floor(1e6 * l_num / l_den)
        assert r["paasche_ppm"] == math.floor(1e6 * p_num / p_den)
        assert r["fisher_ppm"] == math.floor(
            1e6 * math.sqrt((l_num / l_den) * (p_num / p_den))
        )


class TestBullwhip:
    def test_order_vs_ship_variance_ratio(self, spark, tmp_path):
        # 3 months; ordered qty (by order month) vs shipped (by ship
        # month): ship shifts one line across a month boundary
        orders = [(k, dt.datetime(1999, m, 5)) for k, m in ((1, 1), (2, 2), (3, 3))]
        lines = [
            (1, 10, dt.datetime(1999, 1, 20)),
            (1, 2, dt.datetime(1999, 2, 2)),  # ordered Jan, shipped Feb
            (2, 6, dt.datetime(1999, 2, 15)),
            (3, 6, dt.datetime(1999, 3, 10)),
        ]
        spark.createDataFrame(
            orders, "o_orderkey long, o_orderdate timestamp"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        spark.createDataFrame(
            [(ok, q, ts) for ok, q, ts in lines],
            "l_orderkey long, l_quantity long, l_shipdate timestamp",
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        r = _q("bullwhip_ratio_monthly")(spark, str(tmp_path)).collect()[0]
        xs = [12, 6, 6]  # ordered qty per month
        ys = [10, 8, 6]  # shipped qty per month
        n = 3
        vx = n * sum(x * x for x in xs) - sum(xs) ** 2
        vy = n * sum(y * y for y in ys) - sum(ys) ** 2
        assert r["n_months"] == 3
        assert r["bullwhip_ppm"] == math.floor(1e6 * vx / vy)


class TestHoover:
    def test_two_nation_reference(self, spark, tmp_path):
        cust = [(1, 0), (2, 0), (3, 1), (4, 1)]
        spark.createDataFrame(
            cust, "c_custkey long, c_nationkey long"
        ).write.parquet(str(tmp_path / "customer.parquet"))
        orders = [(1, 1, 300.00), (2, 3, 100.00)]
        spark.createDataFrame(
            orders, "o_orderkey long, o_custkey long, o_totalprice double"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        r = _q("hoover_index_nations")(spark, str(tmp_path)).collect()[0]
        # nation 0: r=30000 cents m=2; nation 1: r=10000 m=2; R=40000 M=4
        sdev = abs(30000 * 4 - 2 * 40000) + abs(10000 * 4 - 2 * 40000)
        assert r["n_nations"] == 2
        assert r["hoover_ppm"] == math.floor(1e6 * sdev / (2 * 40000 * 4))

    def test_nation_without_orders_counts(self, spark, tmp_path):
        spark.createDataFrame(
            [(1, 0), (2, 1)], "c_custkey long, c_nationkey long"
        ).write.parquet(str(tmp_path / "customer.parquet"))
        spark.createDataFrame(
            [(1, 1, 100.00)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        ).write.parquet(str(tmp_path / "orders.parquet"))
        r = _q("hoover_index_nations")(spark, str(tmp_path)).collect()[0]
        # all revenue in nation 0, customers split evenly -> H = 1/2
        assert r["hoover_ppm"] == 500000


class TestAbcXyz:
    def test_classes_land_in_expected_cells(self, spark, tmp_path):
        # brand A: 80% of revenue, steady monthly qty -> ('A', 'X');
        # brand B: 20%, wildly varying qty -> ('C', ...) since
        # cum(A)=80% (<=80% -> A) then cum(B)=100% (> 95% -> C)
        lines, parts = [], [(1, "BRAND#A"), (2, "BRAND#B")]
        for m in range(1, 7):
            lines.append((m, 1, 10, 800.00, dt.datetime(1999, m, 10)))
        # five quiet months + one 100x spike: CV^2 = V/S^2 ~ 4.4 >= 1
        # (a 50/50 two-point alternation tops out below CV^2 = 1)
        for m, q in ((1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (6, 100)):
            lines.append((10 + m, 2, q, 200.00, dt.datetime(1999, m, 12)))
        spark.createDataFrame(
            parts, "p_partkey long, p_brand string"
        ).write.parquet(str(tmp_path / "part.parquet"))
        spark.createDataFrame(
            lines,
            "l_orderkey long, l_partkey long, l_quantity long,"
            " l_extendedprice double, l_shipdate timestamp",
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        rows = {
            (r["abc_class"], r["xyz_class"]): (r["n_brands"], r["revenue_cents"])
            for r in _q("abc_xyz_matrix")(spark, str(tmp_path)).collect()
        }
        assert rows[("A", "X")] == (1, 480000)  # steady brand A
        # brand B: mean 15.5, huge swings -> CV^2 >= 1 -> Z
        assert rows[("C", "Z")] == (1, 120000)


class TestShareOfParent:
    def test_ppm_shares(self, spark, tmp_path):
        spark.createDataFrame(
            [(0, "EUROPE"), (1, "ASIA")], "r_regionkey long, r_name string"
        ).write.parquet(str(tmp_path / "region.parquet"))
        spark.createDataFrame(
            [(0, 0, "FRANCE"), (1, 0, "GERMANY"), (2, 1, "JAPAN")],
            "n_nationkey long, n_regionkey long, n_name string",
        ).write.parquet(str(tmp_path / "nation.parquet"))
        spark.createDataFrame(
            [(1, 0), (2, 1), (3, 2)], "c_custkey long, c_nationkey long"
        ).write.parquet(str(tmp_path / "customer.parquet"))
        spark.createDataFrame(
            [(1, 1, 30.00), (2, 2, 10.00), (3, 3, 60.00)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        ).write.parquet(str(tmp_path / "orders.parquet"))
        rows = {
            r["nation"]: r
            for r in _q("share_of_parent_regions")(spark, str(tmp_path)).collect()
        }
        assert rows["FRANCE"]["share_of_region_ppm"] == 750000
        assert rows["GERMANY"]["share_of_region_ppm"] == 250000
        assert rows["JAPAN"]["share_of_region_ppm"] == 1000000
        assert rows["FRANCE"]["region_share_ppm"] == 400000
        assert rows["JAPAN"]["region_share_ppm"] == 600000


class TestAgingBuckets:
    def test_buckets_and_open_filter(self, spark, tmp_path):
        snap = dt.datetime(2000, 1, 1)
        rows = [
            (1, "O", snap, 10.00),                       # 0d
            (2, "O", snap - dt.timedelta(days=30), 10.00),   # edge 0-030
            (3, "P", snap - dt.timedelta(days=31), 10.00),   # 031-090
            (4, "P", snap - dt.timedelta(days=365), 10.00),  # 091-365
            (5, "O", snap - dt.timedelta(days=366), 10.00),  # 365d+
            (6, "F", snap - dt.timedelta(days=500), 99.00),  # closed
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_orderstatus string, o_orderdate timestamp,"
            " o_totalprice double",
        ).write.parquet(str(tmp_path / "orders.parquet"))
        got = {
            r["bucket"]: (r["n_orders"], r["open_value_cents"])
            for r in _q("aging_buckets_open_orders")(spark, str(tmp_path)).collect()
        }
        assert got == {
            "0-030d": (2, 2000),
            "031-090d": (1, 1000),
            "091-365d": (1, 1000),
            "365d+": (1, 1000),
        }


class TestDemandClasses:
    def test_four_classes(self, spark, tmp_path):
        # 12-month calendar span anchored by brand S's monthly rows
        lines, parts = [], []
        brands = {
            1: "BRAND#S",  # smooth: every month, constant qty
            2: "BRAND#E",  # erratic: every month, wild qty
            3: "BRAND#I",  # intermittent: few months, constant qty
            4: "BRAND#L",  # lumpy: few months, wild qty
        }
        for pk, b in brands.items():
            parts.append((pk, b))
        ok = 0
        for m in range(1, 13):
            ok += 1
            lines.append((ok, 1, 10, dt.datetime(1999, m, 5)))
            ok += 1
            lines.append((ok, 2, 1 if m % 2 else 40, dt.datetime(1999, m, 6)))
        for m in (1, 12):  # ADI = 12/2 = 6 >= 1.32
            ok += 1
            lines.append((ok, 3, 10, dt.datetime(1999, m, 7)))
            ok += 1
            lines.append((ok, 4, 1 if m == 1 else 50, dt.datetime(1999, m, 8)))
        spark.createDataFrame(
            parts, "p_partkey long, p_brand string"
        ).write.parquet(str(tmp_path / "part.parquet"))
        spark.createDataFrame(
            lines,
            "l_orderkey long, l_partkey long, l_quantity long,"
            " l_shipdate timestamp",
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        got = {
            r["brand"]: r["demand_class"]
            for r in _q("demand_classes_brands")(spark, str(tmp_path)).collect()
        }
        assert got == {
            "BRAND#S": "smooth",
            "BRAND#E": "erratic",
            "BRAND#I": "intermittent",
            "BRAND#L": "lumpy",
        }


class TestSingleSource:
    def test_histogram_and_share(self, spark, tmp_path):
        rows = [
            (1, 10, 100),
            (2, 10, 100),  # dup pair collapses
            (3, 20, 100),
            (4, 20, 200),
            (5, 30, 100),
            (6, 30, 200),
            (7, 30, 300),
        ]
        spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long, l_suppkey long"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        got = {
            r["n_suppliers"]: (r["n_parts"], r["share_ppm"])
            for r in _q("single_source_parts")(spark, str(tmp_path)).collect()
        }
        assert got == {1: (1, 333333), 2: (1, 333333), 3: (1, 333333)}
