"""Round-9 wave-12 tests: Friedman test, matrix-profile discord,
Mantel-Haenszel."""

from __future__ import annotations

import datetime as dt


class TestFriedman:
    def _run(self, spark, tmp_path, cells):
        """cells: list of (nation, priority_digit, revenue_cents) —
        one synthetic order per cell so the per-cell sum equals it."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        nations = sorted({n for n, _, _ in cells})
        spark.createDataFrame(
            [(i, n) for i, n in enumerate(nations)],
            "n_nationkey bigint, n_name string",
        ).write.parquet(str(tmp_path / "nation.parquet"))
        spark.createDataFrame(
            [(i, nations.index(n)) for i, (n, _, _) in enumerate(cells)],
            "c_custkey bigint, c_nationkey bigint",
        ).write.parquet(str(tmp_path / "customer.parquet"))
        spark.createDataFrame(
            [
                (i, i, f"{p}-X", float(cents) / 100.0)
                for i, (_, p, cents) in enumerate(cells)
            ],
            "o_orderkey bigint, o_custkey bigint, o_orderpriority string,"
            " o_totalprice double",
        ).write.parquet(str(tmp_path / "orders.parquet"))
        return QUERIES["friedman_nation_priority"](spark, str(tmp_path)).collect()[0]

    def test_identical_rank_pattern_maximal_chi2(self, spark, tmp_path):
        # every block ranks priorities 1<2<3<4<5 -> R_j = b*j,
        # chi2 = 3*sum((2bj)^2)/(b*30) - 18b = b*4 (for k=5: 12b*... )
        cells = []
        for blk in ["A", "B", "C"]:
            for j, p in enumerate(["1", "2", "3", "4", "5"]):
                cells.append((blk, p, 100 * (j + 1)))
        r = self._run(spark, tmp_path, cells)
        b = 3
        r2 = [2 * b * (j + 1) for j in range(5)]  # doubled rank sums
        assert [r[f"r2_p{s}"] for s in "12345"] == r2
        expect = (3 * sum(x * x for x in r2) * 10**6) // (b * 30) - 3 * 10**6 * b * 6
        assert r["chi2_ppm"] == expect
        assert r["b_blocks"] == 3

    def test_incomplete_block_dropped(self, spark, tmp_path):
        cells = [("A", p, 100 * int(p)) for p in "12345"]
        cells += [("B", p, 50 * int(p)) for p in "1234"]  # only 4 cells
        r = self._run(spark, tmp_path, cells)
        assert r["b_blocks"] == 1

    def test_random_pattern_matches_reference(self, spark, tmp_path):
        vals = {
            ("A", "1"): 500, ("A", "2"): 100, ("A", "3"): 300,
            ("A", "4"): 200, ("A", "5"): 400,
            ("B", "1"): 900, ("B", "2"): 800, ("B", "3"): 100,
            ("B", "4"): 700, ("B", "5"): 600,
        }
        cells = [(b, p, v) for (b, p), v in vals.items()]
        r = self._run(spark, tmp_path, cells)
        # python reference with doubled mid-ranks (no ties here)
        r2 = {s: 0 for s in "12345"}
        for blk in ["A", "B"]:
            vs = sorted(vals[(blk, p)] for p in "12345")
            for p in "12345":
                rank = vs.index(vals[(blk, p)]) + 1
                r2[p] += 2 * rank
        for s in "12345":
            assert r[f"r2_p{s}"] == r2[s]
        b = 2
        expect = (
            3 * sum(x * x for x in r2.values()) * 10**6
        ) // (b * 30) - 3 * 10**6 * b * 6
        assert r["chi2_ppm"] == expect


class TestMatrixProfileDiscord:
    def _run(self, spark, tmp_path, monthly_cents):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = []
        for k, cents in enumerate(monthly_cents):
            y, m = divmod(k, 12)
            rows.append((dt.date(1995 + y, m + 1, 1), float(cents) / 100.0))
        spark.createDataFrame(
            rows, "o_orderdate date, o_totalprice double"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        out = QUERIES["matrix_profile_discord_revenue"](spark, str(tmp_path)).collect()
        return sorted(out, key=lambda r: r["win_start"])

    def test_planted_anomaly_is_discord(self, spark, tmp_path):
        # repeating sawtooth with one wild spike: the windows covering
        # the spike are far from every non-overlapping neighbor
        series = [100, 200, 300, 100, 200, 300] * 4
        series[13] = 90_000  # spike inside windows 8..13 (1-based)
        out = self._run(spark, tmp_path, series)
        assert len(out) == len(series) - 5
        discords = [r["win_start"] for r in out if r["is_discord"]]
        assert discords, "a discord must exist"
        assert all(8 <= i <= 14 for i in discords), discords

    def test_profile_matches_brute_force(self, spark, tmp_path):
        series = [110, 320, 50, 470, 90, 210, 380, 40, 150, 260,
                  330, 70, 420, 180, 240, 310]
        out = self._run(spark, tmp_path, series)
        n_win = len(series) - 5
        wins = [series[i : i + 6] for i in range(n_win)]

        def d2(a, b):
            return sum((x - y) ** 2 for x, y in zip(a, b))

        for r in out:
            i = r["win_start"] - 1
            expect = min(
                d2(wins[i], wins[j])
                for j in range(n_win)
                if abs(i - j) >= 6
            )
            assert r["profile_dist2"] == float(expect), (i,)


class TestMantelHaenszel:
    def _run(self, spark, tmp_path, rows):
        """rows: (priority_digit, qty, returnflag) one lineitem each."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            [(i, i) for i in range(len(rows))],
            "x bigint, y bigint",
        )  # no-op guard for empty input
        spark.createDataFrame(
            [(i, float(q), fl) for i, (_, q, fl) in enumerate(rows)],
            "l_orderkey bigint, l_quantity double, l_returnflag string",
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        spark.createDataFrame(
            [(i, f"{p}-X") for i, (p, _, _) in enumerate(rows)],
            "o_orderkey bigint, o_orderpriority string",
        ).write.parquet(str(tmp_path / "orders.parquet"))
        return QUERIES["mantel_haenszel_qty_returns"](spark, str(tmp_path)).collect()[0]

    def test_matches_python_reference(self, spark, tmp_path):
        import random

        rng = random.Random(7)
        rows = []
        for _ in range(400):
            p = rng.choice("12345")
            q = rng.randint(1, 50)
            # exposure raises return odds
            fl = "R" if rng.random() < (0.5 if q > 25 else 0.2) else "N"
            rows.append((p, q, fl))
        r = self._run(spark, tmp_path, rows)
        from collections import defaultdict

        cells = defaultdict(lambda: [0, 0, 0, 0])
        for p, q, fl in rows:
            e, o = q > 25, fl == "R"
            idx = 0 if (e and o) else 1 if (e and not o) else 2 if o else 3
            cells[p][idx] += 1
        sum_ad = sum(
            (a * d * 10**6) // (a + b + c + d) for a, b, c, d in cells.values()
        )
        sum_bc = sum(
            (b * c * 10**6) // (a + b + c + d) for a, b, c, d in cells.values()
        )
        assert r["n_strata"] == len(cells)
        assert r["sum_ad_scaled"] == sum_ad
        assert r["sum_bc_scaled"] == sum_bc
        assert r["mh_or_ppm"] == (sum_ad * 10**6) // sum_bc
        assert r["mh_or_ppm"] > 1_000_000  # positive association planted

    def test_zero_denominator_null(self, spark, tmp_path):
        # no high-qty non-returns and no low-qty returns -> b=c=0
        rows = [("1", 30, "R"), ("1", 10, "N"), ("2", 40, "R"), ("2", 5, "N")]
        r = self._run(spark, tmp_path, rows)
        assert r["mh_or_ppm"] is None and r["pooled_or_ppm"] is None
