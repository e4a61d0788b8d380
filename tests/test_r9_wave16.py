"""Round-9 wave-16 tests: rich club, runs test, turning points."""

from __future__ import annotations

import datetime as dt
import math


def _orders_parquet(spark, tmp_path, monthly_cents):
    rows = []
    for k, cents in enumerate(monthly_cents):
        y, m = divmod(k, 12)
        rows.append((dt.date(1995 + y, m + 1, 1), float(cents) / 100.0))
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


class TestRichClub:
    def _run(self, spark, tmp_path, orders_parts):
        """orders_parts: list of (orderkey, partkey); duplicated rows
        raise co-occurrence support."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            orders_parts, "l_orderkey bigint, l_partkey bigint"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        out = QUERIES["rich_club_parts"](spark, str(tmp_path)).collect()
        return {r["k_min_degree"]: r for r in out}

    def test_star_plus_clique(self, spark, tmp_path):
        # clique over parts 1-4 (each pair co-occurs in 2 orders) plus
        # low-degree satellites 10,11 attached to part 1
        op = []
        for rep in range(2):
            base = 100 * rep
            # clique orders: all 4 parts together
            for p in (1, 2, 3, 4):
                op.append((base + 1, p))
            # satellites
            op.append((base + 2, 1)); op.append((base + 2, 10))
            op.append((base + 3, 1)); op.append((base + 3, 11))
        got = self._run(spark, tmp_path, op)
        # degrees: part1 = 5 (2,3,4,10,11), parts 2-4 = 3, sats = 1
        r2 = got[2]
        assert r2["n_nodes"] == 4  # degree > 2: parts 1,2,3,4
        assert r2["n_edges"] == 6  # the full clique among them
        assert r2["phi_ppm"] == 1_000_000
        r4 = got[4]
        assert r4["n_nodes"] == 1 and r4["phi_ppm"] is None
        assert got[16]["n_nodes"] == 0

    def test_no_rich_nodes_all_null(self, spark, tmp_path):
        op = [(1, 1), (1, 2), (2, 1), (2, 2)]  # one edge, degree 1 each
        got = self._run(spark, tmp_path, op)
        assert all(got[k]["n_nodes"] == 0 for k in (2, 4, 8, 16))


class TestRunsTest:
    def _run(self, spark, tmp_path, cents):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        return QUERIES["runs_test_revenue_deltas"](
            spark, _orders_parquet(spark, tmp_path, cents)
        ).collect()[0]

    def test_alternating_max_runs(self, spark, tmp_path):
        cents = [100 + (10 if k % 2 else -10) for k in range(21)]
        r = self._run(spark, tmp_path, cents)
        n = 20
        assert r["n_deltas"] == n
        assert r["n_runs"] == n  # every delta flips sign
        assert r["e_runs_milli"] == 1000 + (2000 * 10 * 10) // 20
        # python mirror of the z expression
        e = 1.0 + 2.0 * 10 * 10 / 20
        v = 2.0 * 100 * (200 - 20) / (20.0 * 20 * 19)
        expect = math.floor(abs(n - e) * 1000 / math.sqrt(v))
        assert r["z_milli"] == expect
        assert r["z_milli"] > 3000  # way too many runs

    def test_trending_min_runs(self, spark, tmp_path):
        cents = [100 + 10 * k for k in range(11)] + [200 - 10 * k for k in range(1, 11)]
        r = self._run(spark, tmp_path, cents)
        assert r["n_runs"] == 2
        assert r["z_milli"] < -2000  # far too few runs

    def test_flat_months_dropped(self, spark, tmp_path):
        cents = [100, 100, 120, 120, 90]
        r = self._run(spark, tmp_path, cents)
        assert r["n_deltas"] == 2  # two flat deltas dropped
        assert r["n_up"] == 1 and r["n_down"] == 1
        assert r["z_milli"] is None  # 2*1*1 = 2 <= n -> variance guard


class TestTurningPoints:
    def _run(self, spark, tmp_path, cents):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        return QUERIES["turning_points_revenue"](
            spark, _orders_parquet(spark, tmp_path, cents)
        ).collect()[0]

    def test_sawtooth_turns_everywhere(self, spark, tmp_path):
        cents = [100 + (10 if k % 2 else -10) for k in range(20)]
        r = self._run(spark, tmp_path, cents)
        n, t = 20, 18
        assert r["n_months"] == n
        assert r["turning_points"] == t
        assert r["e_milli"] == (2000 * (n - 2)) // 3
        expect = math.floor(
            abs(t - 2.0 * (n - 2) / 3.0) * 1000 / math.sqrt((16.0 * n - 29) / 90.0)
        )
        assert r["z_milli"] == expect

    def test_monotone_no_turns(self, spark, tmp_path):
        cents = [100 + 5 * k for k in range(15)]
        r = self._run(spark, tmp_path, cents)
        assert r["turning_points"] == 0
        assert r["z_milli"] < -4000
