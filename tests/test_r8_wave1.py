"""Round-8 wave-1 operators: PMI collocations, FD discovery,
log-rank test, diff-in-differences, seasonal decomposition,
next-event backtest."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestPmiCollocations:
    def test_phrase_beats_chance_pair(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.retrieval import pmi_collocations

        # "new york" always together; "the of" co-occur but both are
        # everywhere, so their discounted PMI is far lower
        docs = spark.createDataFrame(
            [(i, "the new york office of the new york branch") for i in range(10)]
            + [(100 + i, "the office of the branch the of") for i in range(10)],
            "doc_id long, text string",
        )
        got = pmi_collocations(docs, min_count=5, discount=5, top_k=5).collect()
        assert got, "no collocations found"
        assert (got[0]["w1"], got[0]["w2"]) == ("new", "york")
        # exact score replay: c12=20, c1=c2=20, N = total tokens
        n = sum(
            len(r.text.split())
            for r in docs.select("text").collect()
        )
        assert got[0]["score_ppm"] == (20 - 5) * n * 1_000_000 // (20 * 20)

    def test_min_count_floor(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.retrieval import pmi_collocations

        docs = spark.createDataFrame(
            [(1, "rare pair rare pair rare pair")], "doc_id long, text string"
        )
        got = pmi_collocations(docs, min_count=50, discount=0, top_k=5).collect()
        assert got == []


class TestFdDiscovery:
    def test_holds_violations_and_null_semantics(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quality import fd_discovery

        df = spark.createDataFrame(
            [
                ("a", "x", 1),
                ("a", "x", 1),
                ("b", "y", 1),
                ("b", "z", 1),  # b -> {y, z}: violates b_col -> c_col? no: lhs 'b' of col A maps to y and z in col B
                (None, "y", 2),
                (None, "w", 2),  # NULL lhs with two rhs: violates
            ],
            "a string, b string, c int",
        )
        rows = {
            (r.lhs, r.rhs): r
            for r in fd_discovery(df, ["a", "b", "c"]).collect()
        }
        assert len(rows) == 6
        # a -> c: a=x maps to 1, b maps to 1, NULL maps to 2 -> holds
        assert rows[("a", "c")].holds == 1
        # a -> b: 'b' maps to y and z; NULL maps to y and w -> 2 violations
        ab = rows[("a", "b")]
        assert (ab.holds, ab.n_violating_lhs) == (0, 2)
        # c -> a: 1 maps to {a, b}; 2 maps to {NULL} -> violates once
        ca = rows[("c", "a")]
        assert (ca.holds, ca.n_violating_lhs) == (0, 1)
        # b -> a: x->a, y->{a, NULL}, z->b, w->NULL -> y violates
        assert rows[("b", "a")].n_violating_lhs == 1

    def test_sentinel_value_not_conflated_with_null(self, spark):
        """ADVICE r8: a genuine column value equal to the old string
        sentinel ' NULL ' must stay distinct from a real NULL — the
        injective prefix encoding guarantees it."""
        from dpe_energy_performance_analysis_etl_spark.operators.quality import (
            fd_discovery,
        )

        df = spark.createDataFrame(
            [
                # lhs ' NULL ' (a real string) maps to 'p'; lhs NULL
                # maps to 'q' — under the old sentinel both collapsed
                # to one lhs value with two rhs values = a FALSE
                # violation; under the injective encoding a -> b holds
                (" NULL ", "p"),
                (None, "q"),
            ],
            "a string, b string",
        )
        rows = {
            (r.lhs, r.rhs): r for r in fd_discovery(df, ["a", "b"]).collect()
        }
        ab = rows[("a", "b")]
        assert (ab.holds, ab.n_lhs_values, ab.n_violating_lhs) == (1, 2, 0)
        # and the reverse: rhs side distinguishes them too — b -> a
        # maps p -> ' NULL ' and q -> NULL, two DISTINCT rhs values
        ba = rows[("b", "a")]
        assert (ba.holds, ba.n_lhs_rhs_pairs) == (1, 2)


class TestLogrank:
    def test_identical_groups_zero_statistic(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import logrank_test

        rows = [(t, 1, g) for t in (1, 2, 3, 4) for g in (0, 1)]
        df = spark.createDataFrame(rows, "t long, ev int, g int")
        got = logrank_test(df, "t", "ev", "g").collect()[0]
        # perfectly balanced: O1 equals E1 at every tier
        assert got["o1_events"] * 1_000_000 == got["e1_ppm"]
        assert got["chi2_milli"] == 0

    def test_hand_case_matches_manual_hypergeometric(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import logrank_test

        # group 1 dies at t=1,2; group 0 dies at t=3,4
        rows = [(1, 1, 1), (2, 1, 1), (3, 1, 0), (4, 1, 0)]
        df = spark.createDataFrame(rows, "t long, ev int, g int")
        got = logrank_test(df, "t", "ev", "g").collect()[0]
        assert (got["n_subjects"], got["n_group1"], got["o1_events"]) == (4, 2, 2)
        # tiers: (n,n1,d): (4,2,1), (3,1,1), (2,0,1), (1,0,1)
        e1 = (
            (1 * 2 * 10**6) // 4
            + (1 * 1 * 10**6) // 3
            + 0
            + 0
        )
        v = (
            (1 * 2 * 2 * 3 * 10**6) // (4 * 4 * 3)
            + (1 * 1 * 2 * 2 * 10**6) // (3 * 3 * 2)
            + 0
            + 0
        )
        assert got["e1_ppm"] == e1
        assert got["v_ppm"] == v
        num = (2 * 10**6 - e1) ** 2 * 1000
        assert got["chi2_milli"] == num // (v * 10**6)


class TestDiffInDifferences:
    def test_hand_two_by_two(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            diff_in_differences,
        )

        # treated: 100 -> 200 (+100); control: 50 -> 70 (+20); DiD = +80
        rows = (
            [(1, 0, 100)] * 3
            + [(1, 1, 200)] * 3
            + [(0, 0, 50)] * 4
            + [(0, 1, 70)] * 4
        )
        df = spark.createDataFrame(rows, "g int, post int, y long")
        got = diff_in_differences(df, "g", "post", "y", scale=1000).collect()[0]
        assert got["mean_tt_scaled"] == 200_000
        assert got["mean_cp_scaled"] == 50_000
        assert got["did_scaled"] == 80_000

    def test_empty_cell_floors_to_zero_mean(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            diff_in_differences,
        )

        df = spark.createDataFrame([(1, 1, 10)], "g int, post int, y long")
        got = diff_in_differences(df, "g", "post", "y").collect()[0]
        assert got["n_cp"] == 0 and got["mean_cp_scaled"] == 0


class TestSeasonalDecompose:
    def test_pure_trend_plus_seasonal_recovers_components(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            seasonal_decompose,
        )

        period = 4
        seas = [40, -20, -40, 20]  # sums to zero over one period
        rows = [(t, 1000 + 10 * t + seas[t % 4]) for t in range(16)]
        df = spark.createDataFrame(rows, "t long, y long")
        got = {
            r["t"]: r
            for r in seasonal_decompose(df, "t", "y", period=4, scale=1000).collect()
        }
        # interior tiers only: window -2..+1 full for t in [2, 14]
        assert sorted(got) == list(range(2, 15))
        for t, r in got.items():
            # linear trend: centered 4-MA of 1000+10t (+ zero-sum
            # seasonal) = 1000 + 10t - 5 exactly
            assert r["trend_scaled"] == (1000 + 10 * t - 5) * 1000
            assert r["seasonal_scaled"] == (seas[t % 4] + 5) * 1000
            assert r["remainder_scaled"] == 0

    def test_even_count_phase_median_exists(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            seasonal_decompose,
        )

        # 10 tiers, period 2 -> interior tiers 1..9; phase 1 has four
        # tiers (even count): the low-median rank must still match a
        # row (the `/` vs `div` regression this test pins)
        rows = [(t, 100 + t) for t in range(10)]
        df = spark.createDataFrame(rows, "t long, y long")
        got = seasonal_decompose(df, "t", "y", period=2, scale=1000).collect()
        assert len(got) == 9


class TestNextEventHitrate:
    def test_deterministic_sequence_perfect_hits(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            next_event_hitrate,
        )

        # one user, strict a->b->a->b... : model learns both
        # transitions from the first 80%, predicts the rest perfectly
        rows = [
            (1, i, "a" if i % 2 == 0 else "b", i) for i in range(20)
        ]
        df = spark.createDataFrame(rows, "user_id long, ts long, event_type string, event_id long")
        got = {r["prev_type"]: r for r in next_event_hitrate(df).collect()}
        assert all(r["hits"] == r["n_test"] for r in got.values())
        assert all(r["hit_ppm"] == 1_000_000 for r in got.values())

    def test_unseen_context_counts_as_miss(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            next_event_hitrate,
        )

        # 'z' appears only in the test tail -> no prediction -> miss
        types = ["a"] * 8 + ["z", "a"]
        rows = [(1, i, types[i], i) for i in range(10)]
        df = spark.createDataFrame(rows, "user_id long, ts long, event_type string, event_id long")
        got = {r["prev_type"]: r for r in next_event_hitrate(df).collect()}
        assert got["z"]["hits"] == 0 and got["z"]["n_test"] == 1
