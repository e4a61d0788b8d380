"""Deletion-neighborhood fuzzy join (operators/entity.py) and
degree-oriented triangle counting (operators/graph.py) on
hand-checkable inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.operators.entity import (
    deletion_variants,
    fuzzy_join_ed1,
)
from dpe_energy_performance_analysis_etl_spark.operators.graph import triangle_counts


def test_deletion_variants(spark):
    row = (
        spark.createDataFrame([("abc",)], "s string")
        .select(deletion_variants("s").alias("v"))
        .collect()[0]
    )
    assert row.v == ["abc", "bc", "ac", "ab"]


def test_fuzzy_join_ed1_all_edit_kinds(spark):
    left = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "lid long, name string"
    )
    right = spark.createDataFrame(
        [
            (10, "alpha"),   # exact (dist 0)
            (11, "alpa"),    # deletion (dist 1)
            (12, "betas"),   # insertion (dist 1)
            (13, "gamba"),   # substitution (dist 1)
            (14, "delta"),   # no match
            (15, "alphxx"),  # dist 2 -> must NOT match
        ],
        "rid long, rname string",
    )
    got = {
        (r.lid, r.rid): r.edit_dist
        for r in fuzzy_join_ed1(left, right, "name", "rname").collect()
    }
    assert got == {(1, 10): 0, (1, 11): 1, (2, 12): 1, (3, 13): 1}


def test_fuzzy_join_blocking_prevents_cross_block(spark):
    left = spark.createDataFrame([(1, "k", "aaa")], "lid long, blk string, name string")
    right = spark.createDataFrame(
        [(2, "k", "aab"), (3, "other", "aab")], "rid long, blk string, rname string"
    )
    got = [
        (r.lid, r.rid)
        for r in fuzzy_join_ed1(left, right, "name", "rname", block=["blk"]).collect()
    ]
    assert got == [(1, 2)]


def test_triangle_counts_known_graph(spark):
    # 4-clique on 1..4 (4 triangles, 3 per node) plus a pendant 5-6
    # edge and an isolated wedge 7-8-9 (no triangle).
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (5, 6),
        (7, 8), (8, 9),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.v: (r.deg, r.n_triangles) for r in triangle_counts(df).collect()}
    assert got[1] == (3, 3) and got[2] == (3, 3) and got[3] == (3, 3) and got[4] == (3, 3)
    assert got[5] == (1, 0) and got[6] == (1, 0)
    assert got[7] == (1, 0) and got[8] == (2, 0) and got[9] == (1, 0)


def test_triangle_counts_canonicalizes_input(spark):
    # Duplicate edges, reversed directions, and self-loops must not
    # change the answer.
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.v: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


class TestJaroWinklerMicro:
    def _jw_ref(self, s1: str, s2: str) -> int:
        # textbook Jaro-Winkler (greedy window matching), exact
        # integer micro-units — the operator's published contract
        L1, L2 = len(s1), len(s2)
        if L1 == 0 or L2 == 0:
            return 0
        w = max(max(L1, L2) // 2 - 1, 0)
        used = [False] * L2
        mi, mj = [], []
        for i in range(L1):
            for j in range(max(0, i - w), min(L2 - 1, i + w) + 1):
                if not used[j] and s2[j] == s1[i]:
                    used[j] = True
                    mi.append(i)
                    mj.append(j)
                    break
        m = len(mi)
        if m == 0:
            return 0
        mjs = sorted(mj)
        t = sum(1 for k in range(m) if s1[mi[k]] != s2[mjs[k]])
        A = 2 * m * m * L2 + 2 * m * m * L1 + (2 * m - t) * L1 * L2
        B = 6 * m * L1 * L2
        l = 0
        for k in range(min(4, L1, L2)):
            if s1[k] != s2[k]:
                break
            l += 1
        return (10 * A + l * (B - A)) * 1000000 // (10 * B)

    def test_textbook_and_edge_cases(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.entity import (
            jaro_winkler_micro,
        )

        cases = [
            ("MARTHA", "MARHTA"),      # canonical 0.961111
            ("DIXON", "DICKSONX"),     # canonical 0.813333
            ("JELLYFISH", "SMELLYFISH"),
            ("abc", "abc"),
            ("abc", "xyz"),
            ("a", "a"),
            ("a", "b"),
            ("CRATE", "TRACE"),        # transposition-heavy
            ("kitten", "sitting"),
            ("", "abc"),
            ("ab", ""),
            ("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaab"),
        ]
        df = spark.createDataFrame(cases, "a string, b string")
        got = {(r["a"], r["b"]): r["jw_micro"] for r in jaro_winkler_micro(df).collect()}
        assert got[("MARTHA", "MARHTA")] == 961111
        assert got[("DIXON", "DICKSONX")] == 813333
        for s1, s2 in cases:
            assert got[(s1, s2)] == self._jw_ref(s1, s2), (s1, s2)

    def test_random_strings_vs_reference(self, spark):
        import random

        from dpe_energy_performance_analysis_etl_spark.operators.entity import (
            jaro_winkler_micro,
        )

        rng = random.Random(7)
        alpha = "abcde"
        cases = [
            (
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 30))),
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 30))),
            )
            for _ in range(300)
        ]
        df = spark.createDataFrame(cases, "a string, b string")
        rows = jaro_winkler_micro(df).collect()
        for r in rows:
            assert r["jw_micro"] == self._jw_ref(r["a"], r["b"]), (r["a"], r["b"])

    def test_row_local_no_shuffle(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.entity import (
            jaro_winkler_micro,
        )

        df = spark.createDataFrame([("abc", "abd")], "a string, b string")
        plan = jaro_winkler_micro(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestSmithWaterman:
    @staticmethod
    def _ref(a, b, match=2, mismatch=1, gap=1):
        best = 0
        prev = [0] * (len(a) + 1)
        for bj in b:
            cur = [0]
            for i in range(1, len(a) + 1):
                s = match if a[i - 1] == bj else -mismatch
                h = max(0, prev[i - 1] + s, prev[i] - gap, cur[-1] - gap)
                cur.append(h)
                best = max(best, h)
            prev = cur
        return best

    def test_hand_cases_and_random_against_reference(self, spark):
        import random

        from pyspark.sql import functions as F

        from dpe_energy_performance_analysis_etl_spark.operators.entity import (
            smith_waterman_score,
        )

        rng = random.Random(23)
        cases = [
            ([1, 2, 3], [1, 2, 3]),          # full match -> 6
            ([1, 2, 3], [4, 5, 6]),          # disjoint -> 0
            ([9, 9, 1, 2, 3, 8], [7, 1, 2, 3]),  # local motif -> 6
            ([1, 2, 3], [1, 3]),             # one gap -> 3
            ([], [1, 2]),
            ([1], []),
            ([], []),
        ] + [
            (
                [rng.randint(0, 4) for _ in range(rng.randint(1, 12))],
                [rng.randint(0, 4) for _ in range(rng.randint(1, 12))],
            )
            for _ in range(60)
        ]
        df = spark.createDataFrame(cases, "a array<bigint>, b array<bigint>")
        rows = df.select(
            "a", "b", smith_waterman_score(F.col("a"), F.col("b")).alias("s")
        ).collect()
        assert rows[0]["s"] == 6 and rows[1]["s"] == 0
        assert rows[2]["s"] == 6 and rows[3]["s"] == 3
        for r in rows:
            assert r["s"] == self._ref(r["a"], r["b"]), (r["a"], r["b"])

    def test_no_udf_in_plan(self, spark):
        from pyspark.sql import functions as F

        from dpe_energy_performance_analysis_etl_spark.operators.entity import (
            smith_waterman_score,
        )

        df = spark.createDataFrame([([1, 2], [2, 3])], "a array<bigint>, b array<bigint>")
        plan = (
            df.select(smith_waterman_score(F.col("a"), F.col("b")).alias("s"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestFellegiSunterEM:
    def test_recovers_planted_m_u(self, spark):
        """Synthetic pairs with known generative parameters: 10% true
        matches; fields agree on (90%, 80%, 70%) of matches and
        (5%, 20%, 10%) of non-matches. THREE conditionally
        independent fields is the classic EM identifiability minimum
        (2 fields give 4 patterns against 5 free parameters — an
        earlier 2-field version of this test converged to a valid
        but different optimum). Exact replication across engines is
        the oracle's job; here we check the STATISTICS."""
        from dpe_energy_performance_analysis_etl_spark.operators.entity import (
            fellegi_sunter_em,
        )

        def mix(i, salt):
            s = (i * 40503 + salt * 73244475) % 2**32
            s = ((s ^ (s >> 16)) * 73244475) % 2**32
            return (s ^ (s >> 16)) % 1000

        rows = []
        for i in range(20000):
            is_match = mix(i, 1) < 100
            a = mix(i, 2) < (900 if is_match else 50)
            b = mix(i, 3) < (800 if is_match else 200)
            c = mix(i, 4) < (700 if is_match else 100)
            rows.append((a, b, c))
        df = spark.createDataFrame(rows, "g1 boolean, g2 boolean, g3 boolean")
        got = {
            r["field"]: r
            for r in fellegi_sunter_em(df, ["g1", "g2", "g3"], rounds=8).collect()
        }
        assert abs(got["g1"]["p_ppm"] - 100_000) < 40_000
        assert abs(got["g1"]["m_ppm"] - 900_000) < 80_000
        assert abs(got["g1"]["u_ppm"] - 50_000) < 40_000
        assert abs(got["g2"]["m_ppm"] - 800_000) < 80_000
        assert abs(got["g2"]["u_ppm"] - 200_000) < 60_000
        assert abs(got["g3"]["m_ppm"] - 700_000) < 80_000
        assert abs(got["g3"]["u_ppm"] - 100_000) < 50_000

    def test_deterministic_across_partitionings(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.entity import (
            fellegi_sunter_em,
        )

        rows = [(i % 3 == 0, i % 7 == 0) for i in range(500)]
        df = spark.createDataFrame(rows, "g1 boolean, g2 boolean")
        a = sorted(map(tuple, fellegi_sunter_em(df, ["g1", "g2"]).collect()))
        b = sorted(
            map(tuple, fellegi_sunter_em(df.repartition(13), ["g1", "g2"]).collect())
        )
        assert a == b
