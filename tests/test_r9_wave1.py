"""Round-9 wave-1 operator tests: KS two-sample, key discovery,
deterministic mode, drawdown, conversion window, soundex blocking."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


class TestKsTwoSample:
    def test_matches_python_reference(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import ks_two_sample

        rng = random.Random(3)
        rows = []
        for g, shift in (("a", 0), ("b", 30)):
            for i in range(300):
                side = i % 2
                v = rng.randint(0, 100) + (shift if side else 0)
                rows.append((g, side, v))
        df = spark.createDataFrame(rows, "g string, s int, v bigint")
        got = {
            r["g"]: (r["n1"], r["n2"], r["d_scaled"])
            for r in ks_two_sample(df, "g", "s", "v").collect()
        }
        for g in ("a", "b"):
            s0 = [v for gg, s, v in rows if gg == g and s == 0]
            s1 = [v for gg, s, v in rows if gg == g and s == 1]
            n1, n2 = len(s1), len(s0)
            best = max(
                abs(
                    sum(1 for v in s1 if v <= x) * n2
                    - sum(1 for v in s0 if v <= x) * n1
                )
                for x in set(s0 + s1)
            )
            assert got[g] == (n1, n2, best * 1_000_000 // (n1 * n2))
        # the shifted group must show larger D
        assert got["b"][2] > got["a"][2]

    def test_empty_side_returns_null(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import ks_two_sample

        df = spark.createDataFrame(
            [("g", 1, 5), ("g", 1, 7)], "g string, s int, v bigint"
        )
        row = ks_two_sample(df, "g", "s", "v").collect()[0]
        assert (row["n1"], row["n2"], row["d_scaled"]) == (2, 0, None)

    def test_identical_sides_d_zero(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import ks_two_sample

        rows = [("g", s, v) for v in range(50) for s in (0, 1)]
        df = spark.createDataFrame(rows, "g string, s int, v bigint")
        assert ks_two_sample(df, "g", "s", "v").collect()[0]["d_scaled"] == 0


class TestKeyDiscovery:
    def test_singles_pairs_and_null_handling(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quality import key_discovery

        df = spark.createDataFrame(
            [
                (1, "x", None),
                (2, "x", "p"),
                (3, "y", "p"),
            ],
            "a int, b string, c string",
        )
        rows = {
            r["candidate"]: (r["n_rows"], r["n_distinct"], r["is_key"])
            for r in key_discovery(df, ["a", "b", "c"]).collect()
        }
        assert len(rows) == 6  # 3 singles + 3 pairs
        assert rows["a"] == (3, 3, 1)
        assert rows["b"] == (3, 2, 0)
        assert rows["c"] == (3, 2, 0)  # NULL counts as a value
        assert rows["a+b"][2] == 1
        assert rows["b+c"] == (3, 3, 1)  # (x,NULL),(x,p),(y,p) distinct

    def test_concatenation_cannot_fake_uniqueness(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quality import key_discovery

        # ('ab','c') vs ('a','bc'): naive concat collides, the
        # length-prefixed encoding must keep them distinct AND must
        # not invent distinctness for true duplicates
        df = spark.createDataFrame(
            [("ab", "c"), ("a", "bc"), ("a", "bc")], "x string, y string"
        )
        rows = {
            r["candidate"]: (r["n_distinct"], r["is_key"])
            for r in key_discovery(df, ["x", "y"]).collect()
        }
        assert rows["x+y"] == (2, 0)


class TestModeStructTrick:
    def test_mode_and_antimode_with_tiebreak(self, spark):
        # mirrors the mode_priority_by_status recipe on a controlled df
        df = spark.createDataFrame(
            [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c")],
            "g string, v string",
        )
        cnts = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cnt"))
        out = (
            cnts.groupBy("g")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("v").alias("m"))
                ).alias("hi"),
                F.min(
                    F.struct(F.col("cnt").alias("c"), F.col("v").alias("m"))
                ).alias("lo"),
            )
            .select("g", "hi.m", (-F.col("hi.nc")).alias("n"), "lo.m", "lo.c")
            .collect()[0]
        )
        # counts: a=2, b=2, c=1 -> mode 'a' (tie-break smallest), anti 'c'
        assert (out[1], out[2], out[3], out[4]) == ("a", 2, "c", 1)


class TestDrawdownAndConversion:
    def test_drawdown_python_parity(self, spark):
        rng = random.Random(5)
        rows = [
            (u, i, rng.randint(1, 1000))
            for u in range(20)
            for i in range(rng.randint(1, 30))
        ]
        df = spark.createDataFrame(rows, "u int, i int, cents bigint")
        from pyspark.sql import Window

        w = (
            Window.partitionBy("u")
            .orderBy("i")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        got = {
            r["u"]: r["dd"]
            for r in df.withColumn("peak", F.max("cents").over(w))
            .groupBy("u")
            .agg(F.max(F.col("peak") - F.col("cents")).alias("dd"))
            .collect()
        }
        by_u: dict[int, list[tuple[int, int]]] = {}
        for u, i, c in rows:
            by_u.setdefault(u, []).append((i, c))
        for u, seq in by_u.items():
            seq.sort()
            peak, dd = 0, 0
            for _, c in seq:
                peak = max(peak, c)
                dd = max(dd, peak - c)
            assert got[u] == dd

    def test_conversion_window_boundaries(self, spark, tmp_path):
        # view at t, purchases at t (excluded), t+3600s (included),
        # t+3601s (excluded) -> exactly the half-open (t, t+1h]
        import datetime as dt

        base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        rows = [
            (1, 10, base, "view", 0.0, "{}"),
            (1, 11, base, "purchase", 0.0, "{}"),  # same instant: no
            (2, 20, base, "view", 0.0, "{}"),
            (2, 21, base + dt.timedelta(seconds=3600), "purchase", 0.0, "{}"),
            (3, 30, base, "view", 0.0, "{}"),
            (3, 31, base + dt.timedelta(seconds=3601), "purchase", 0.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "user_id long, event_id long, ts timestamp, event_type string,"
            " value double, props string",
        )
        p = str(tmp_path / "events.parquet")
        df.write.parquet(p)
        import os

        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        out = QUERIES["view_purchase_within_hour"](
            spark, os.path.dirname(p)
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["n_views"], r["n_converted"], r["conversion_ppm"]) == (
            3,
            1,
            333333,
        )


class TestSoundexBlocking:
    def test_known_codes(self, spark):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import (
            _soundex_code_sql,
        )

        words = {
            # classic soundex values that the simplified variant agrees
            # on (no internal h/w, no first-letter-digit merge cases)
            "robert": "R163",
            "rupert": "R163",
            "tymczak": "T522",
            "honeyman": "H555",
            "green": "G650",   # run-collapse branch (nn -> n wait: 'reen' -> r6,e0,e0,n5 -> '6005' collapse none, drop 0 -> '65' -> G650)
            "goldenrod": "G435",
            "a": "A000",       # single letter: empty rest pads to 000
        }
        df = spark.createDataFrame(
            [(w,) for w in words], "w string"
        ).select("w", F.expr(_soundex_code_sql("w")).alias("code"))
        got = {r["w"]: r["code"] for r in df.collect()}
        assert got == words

    def test_duckdb_agrees_on_random_words(self, spark):
        import duckdb

        from dpe_energy_performance_analysis_etl_spark.plans.queries import (
            _soundex_code_sql,
        )

        rng = random.Random(9)
        words = [
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randint(1, 14)))
            for _ in range(200)
        ]
        sdf = spark.createDataFrame([(w,) for w in words], "w string").select(
            "w", F.expr(_soundex_code_sql("w")).alias("code")
        )
        got_spark = {r["w"]: r["code"] for r in sdf.collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?) AS w", [words])
        got_duck = dict(
            con.execute(
                f"SELECT w, {_soundex_code_sql('w')} FROM t"
            ).fetchall()
        )
        assert got_spark == got_duck
