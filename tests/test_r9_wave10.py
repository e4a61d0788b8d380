"""Round-9 wave-10 tests: Copeland duels, Gini stump, McNemar."""

from __future__ import annotations

import datetime as dt


class TestCopelandBrandDuels:
    def _run(self, spark, tmp_path, lineitems, orders, parts):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            lineitems, "l_orderkey bigint, l_partkey bigint, l_extendedprice double"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        spark.createDataFrame(
            orders, "o_orderkey bigint, o_custkey bigint"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        spark.createDataFrame(
            parts, "p_partkey bigint, p_brand string"
        ).write.parquet(str(tmp_path / "part.parquet"))
        rows = QUERIES["copeland_brand_duels"](spark, str(tmp_path)).collect()
        return {r["p_brand"]: r for r in rows}

    def test_strict_dominance_gives_condorcet_winner(self, spark, tmp_path):
        # 3 customers, 3 brands; every customer spends most on A,
        # then B, then C -> A is the Condorcet winner, C the loser.
        parts = [(1, "A"), (2, "B"), (3, "C")]
        orders = [(10 * c + 1, c) for c in (1, 2, 3)]
        lineitems = []
        for c in (1, 2, 3):
            ok = 10 * c + 1
            lineitems += [(ok, 1, 30.0), (ok, 2, 20.0), (ok, 3, 10.0)]
        got = self._run(spark, tmp_path, lineitems, orders, parts)
        assert got["A"]["copeland2"] == 4 and got["A"]["is_condorcet"]
        assert got["B"]["copeland2"] == 2 and not got["B"]["is_condorcet"]
        assert got["C"]["copeland2"] == 0
        assert all(r["n_buyers"] == 3 for r in got.values())

    def test_unbought_brand_loses_by_default(self, spark, tmp_path):
        # customer 1 buys only A; customer 2 buys only A. B bought by
        # nobody in cb -> absent from output (no buyers), and A's
        # duels only span bought brands.
        parts = [(1, "A"), (2, "B")]
        orders = [(11, 1), (21, 2)]
        lineitems = [(11, 1, 5.0), (21, 1, 7.0)]
        got = self._run(spark, tmp_path, lineitems, orders, parts)
        assert set(got) == {"A"}
        # single bought brand: zero duels, trivially Condorcet
        assert got["A"]["copeland2"] == 0 and got["A"]["is_condorcet"]

    def test_one_sided_buyers_break_tie(self, spark, tmp_path):
        # equal spend among both-buyers, but A has an extra solo buyer
        # -> A wins the duel (never-bought counts as zero spend).
        parts = [(1, "A"), (2, "B")]
        orders = [(11, 1), (21, 2)]
        lineitems = [(11, 1, 5.0), (11, 2, 5.0), (21, 1, 9.0)]
        got = self._run(spark, tmp_path, lineitems, orders, parts)
        assert got["A"]["copeland2"] == 2 and got["A"]["is_condorcet"]
        assert got["B"]["copeland2"] == 0


class TestGiniStump:
    def _run(self, spark, tmp_path, rows):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            rows, "l_quantity bigint, l_returnflag string"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        out = QUERIES["gini_stump_qty_returns"](spark, str(tmp_path)).collect()
        return sorted(out, key=lambda r: r["qty_threshold"])

    def test_perfect_split_found(self, spark, tmp_path):
        # qty <= 2 all returned, qty >= 3 none: threshold 2 has
        # impurity 0 and is the unique best
        rows = [(1, "R"), (2, "R"), (2, "R"), (3, "N"), (4, "N"), (5, "N")]
        out = self._run(spark, tmp_path, rows)
        best = [r for r in out if r["is_best"]]
        assert len(best) == 1 and best[0]["qty_threshold"] == 2
        assert best[0]["impurity_ppb"] == 0
        assert best[0]["n_le"] == 3 and best[0]["pos_le"] == 3

    def test_impurity_matches_fraction_reference(self, spark, tmp_path):
        from fractions import Fraction

        rows = [(1, "R"), (1, "N"), (2, "R"), (3, "N"), (3, "N"), (4, "R")]
        out = self._run(spark, tmp_path, rows)
        data = sorted(rows)
        n_tot = len(data)
        for r in out:
            t = r["qty_threshold"]
            left = [x for x in data if x[0] <= t]
            right = [x for x in data if x[0] > t]
            pl = sum(1 for x in left if x[1] == "R")
            pr = sum(1 for x in right if x[1] == "R")
            nl, nr = len(left), len(right)
            f = 2 * (
                Fraction(pl * (nl - pl), nl) + Fraction(pr * (nr - pr), nr)
            ) / n_tot
            assert r["impurity_ppb"] == (f.numerator * 10**9) // f.denominator

    def test_max_qty_not_a_candidate(self, spark, tmp_path):
        rows = [(1, "R"), (2, "N"), (3, "R")]
        out = self._run(spark, tmp_path, rows)
        assert [r["qty_threshold"] for r in out] == [1, 2]


class TestMcnemar:
    def _run(self, spark, tmp_path, events):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            events,
            "user_id long, event_id long, ts timestamp, event_type string,"
            " value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))
        return QUERIES["mcnemar_repeat_purchase"](spark, str(tmp_path)).collect()[0]

    def test_counts_and_statistic(self, spark, tmp_path):
        base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        late = dt.datetime(2024, 1, 21, tzinfo=dt.timezone.utc)
        ev = []
        eid = 0

        def add(u, when, typ):
            nonlocal eid
            eid += 1
            ev.append((u, eid, when, typ, 0.0, "{}"))

        # day range 0..20 -> split day 10; H1 = days < 10
        # user 1: purchase both halves; user 2: H1 only (b);
        # users 3,4: H2 only (c=2); user 5: views only (neither)
        add(1, base, "purchase"); add(1, late, "purchase")
        add(2, base, "purchase"); add(2, late, "view")
        add(3, base, "view"); add(3, late, "purchase")
        add(4, base, "view"); add(4, late, "purchase")
        add(5, base, "view"); add(5, late, "view")
        r = self._run(spark, tmp_path, ev)
        assert r["n_users"] == 5
        assert r["n_both"] == 1
        assert r["n_neither"] == 1
        assert r["b_lapsed"] == 1
        assert r["c_adopted"] == 2
        # chi2 = (1-2)^2 / 3 -> ppm 333333
        assert r["mcnemar_ppm"] == 333333
        # continuity corrected: (|1-2|-1)^2 / 3 = 0
        assert r["mcnemar_cc_ppm"] == 0

    def test_no_discordant_users_null_statistic(self, spark, tmp_path):
        base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        late = dt.datetime(2024, 1, 21, tzinfo=dt.timezone.utc)
        ev = [
            (1, 1, base, "purchase", 0.0, "{}"),
            (1, 2, late, "purchase", 0.0, "{}"),
            (2, 3, base, "view", 0.0, "{}"),
            (2, 4, late, "view", 0.0, "{}"),
        ]
        r = self._run(spark, tmp_path, ev)
        assert r["b_lapsed"] == 0 and r["c_adopted"] == 0
        assert r["mcnemar_ppm"] is None and r["mcnemar_cc_ppm"] is None
