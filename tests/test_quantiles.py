"""Histogram quantiles (operators/quantiles.py): accuracy vs numpy,
error bound, merge == whole, pinned-bounds mode, determinism."""

from __future__ import annotations

import numpy as np

from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
    histogram_buckets,
    histogram_quantiles,
    merge_histograms,
)

PROBS = [0.1, 0.5, 0.9]


def _df(spark, vals, parts=8):
    return spark.createDataFrame([(float(v),) for v in vals], "v double").repartition(parts)


def test_within_bucket_width_of_true_quantile(spark):
    rng = np.random.default_rng(3)
    vals = rng.lognormal(mean=10, sigma=1, size=20_000)  # heavy-tailed
    got = {
        r["prob"]: r["q_est"]
        for r in histogram_quantiles(_df(spark, vals), "v", PROBS, 2048).collect()
    }
    width = (vals.max() - vals.min()) / 2048
    for p in PROBS:
        true = np.quantile(vals, p)
        assert abs(got[p] - true) <= width + 1e-9, (p, got[p], true, width)


def test_uniform_data_near_exact(spark):
    vals = np.arange(10_000) / 10.0
    got = {
        r["prob"]: r["q_est"]
        for r in histogram_quantiles(_df(spark, vals), "v", PROBS, 1000).collect()
    }
    for p in PROBS:
        assert abs(got[p] - np.quantile(vals, p)) < (vals.max() - vals.min()) / 1000


def test_merge_equals_whole_with_pinned_bounds(spark):
    rng = np.random.default_rng(5)
    vals = rng.uniform(0, 100, 5000)
    bounds = (0.0, 100.0)
    h1 = histogram_buckets(_df(spark, vals[:2500]), "v", 256, bounds)
    h2 = histogram_buckets(_df(spark, vals[2500:]), "v", 256, bounds)
    whole = histogram_buckets(_df(spark, vals), "v", 256, bounds)
    merged = {
        r["bucket"]: r["cnt"] for r in merge_histograms(h1, h2).collect()
    }
    assert merged == {r["bucket"]: r["cnt"] for r in whole.collect()}


def test_partitioning_invariance(spark):
    vals = np.arange(3000) * 7 % 1000
    a = sorted(histogram_quantiles(_df(spark, vals, 2), "v", PROBS, 128).collect())
    b = sorted(histogram_quantiles(_df(spark, vals, 31), "v", PROBS, 128).collect())
    assert a == b  # bit-exact, not approximately


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,)], "v double"
    )
    got = histogram_quantiles(df, "v", [0.5], 4).collect()
    # median of 1,2,3 (null ignored) within one bucket width (0.5)
    assert abs(got[0]["q_est"] - 2.0) <= 0.5


class TestGroupedKthSmallest:
    def test_matches_python_order_statistic(self, spark):
        import random

        from pyspark.sql import functions as F

        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_kth_smallest,
        )

        rng = random.Random(7)
        rows = [(g, rng.randint(0, 50)) for g in ("a", "b", "c") for _ in range(200)]
        rows += [("d", 9)]  # singleton group
        df = spark.createDataFrame(rows, "g string, v long")
        ks = [("a", 1), ("b", 100), ("c", 200), ("d", 1)]
        k_df = spark.createDataFrame(ks, "g string, k long")
        got = {r["g"]: r["kth_value"] for r in grouped_kth_smallest(df, "g", "v", k_df).collect()}
        by_g = {}
        for g, v in rows:
            by_g.setdefault(g, []).append(v)
        expect = {g: sorted(by_g[g])[k - 1] for g, k in ks}
        assert got == expect

    def test_k_beyond_group_size_returns_no_row(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_kth_smallest,
        )

        df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, v long")
        k_df = spark.createDataFrame([("a", 3)], "g string, k long")
        assert grouped_kth_smallest(df, "g", "v", k_df).count() == 0

    def test_k_of_n_shares_one_pass_and_matches_k_df(self, spark):
        """r9 (VERDICT r8 ask #1): k_of_n derives group counts from the
        recipe's own bounded sizes table — same answers as an explicit
        k_df built from the same rule, plus (n, k) columns and NULL
        kth_value for k > n groups."""
        import random

        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_kth_smallest,
        )

        rng = random.Random(11)
        rows = [(g, rng.randint(0, 99)) for g in ("a", "b") for _ in range(150)]
        rows += [("tiny", 5)]  # n=1: k_of_n 'n + 1' overshoots -> NULL
        df = spark.createDataFrame(rows, "g string, v long")
        got = {
            r["g"]: (r["n"], r["k"], r["kth_value"])
            for r in grouped_kth_smallest(
                df, "g", "v", k_of_n="least(n, CAST(n * 3 div 4 + 1 AS BIGINT))"
            ).collect()
        }
        by_g = {}
        for g, v in rows:
            by_g.setdefault(g, []).append(v)
        for g, vs in by_g.items():
            n = len(vs)
            k = min(n, n * 3 // 4 + 1)
            assert got[g] == (n, k, sorted(vs)[k - 1])
        # overshoot branch: k > n gives a row with NULL kth_value
        got2 = {
            r["g"]: (r["n"], r["k"], r["kth_value"])
            for r in grouped_kth_smallest(
                df, "g", "v", k_of_n="n + 1"
            ).collect()
        }
        assert got2["tiny"] == (1, 2, None)
        assert len(got2) == 3

    def test_exactly_one_k_source_required(self, spark):
        import pytest as _pytest

        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_kth_smallest,
        )

        df = spark.createDataFrame([("a", 1)], "g string, v long")
        with _pytest.raises(ValueError, match="exactly one"):
            grouped_kth_smallest(df, "g", "v")
        with _pytest.raises(ValueError, match="exactly one"):
            grouped_kth_smallest(df, "g", "v", k_df=df, k_of_n="n")


class TestGroupedTrimmedMeanMethods:
    """r9 (VERDICT r8 ask #4): the exact-vs-histprune crossover — both
    strategies are EXACT and must agree bit-for-bit; 'auto' routes by
    total rows using histprune's own stats pass."""

    def _data(self, spark):
        import random

        rng = random.Random(23)
        rows = [(f"g{i % 5}", rng.randint(-1000, 100_000)) for i in range(8000)]
        rows += [("const", 7)] * 40  # degenerate hi == lo bucket range
        rows += [("pair", 1), ("pair", 3)]
        return rows, spark.createDataFrame(rows, "g string, v bigint")

    def test_methods_agree_and_match_python(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_trimmed_mean,
        )

        rows, df = self._data(spark)
        for ppm in (0, 100_000, 250_000, 490_000):
            res = {}
            for method in ("exact", "histprune"):
                res[method] = {
                    r["g"]: (
                        r["n"],
                        r["n_trimmed_each_side"],
                        r["trimmed_mean_scaled"],
                    )
                    for r in grouped_trimmed_mean(
                        df, "g", "v", trim_ppm=ppm, method=method
                    ).collect()
                }
            assert res["exact"] == res["histprune"], ppm
            by_g = {}
            for g, v in rows:
                by_g.setdefault(g, []).append(v)
            expect = {}
            for g, vs in by_g.items():
                vs = sorted(vs)
                n = len(vs)
                k = n * ppm // 1_000_000
                kept = vs[k : n - k]
                if kept:
                    expect[g] = (n, k, (sum(kept) * 1000) // len(kept))
            assert res["exact"] == expect, ppm

    def test_over_trim_emits_no_row(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_trimmed_mean,
        )

        # n=2, trim 50% -> k=1 each side -> nothing kept
        df = spark.createDataFrame([("a", 1), ("a", 9)], "g string, v bigint")
        for method in ("exact", "histprune"):
            assert (
                grouped_trimmed_mean(
                    df, "g", "v", trim_ppm=500_000, method=method
                ).count()
                == 0
            )

    def test_auto_routes_small_to_exact_and_unknown_method_raises(self, spark):
        import pytest as _pytest

        from dpe_energy_performance_analysis_etl_spark.operators import quantiles

        _, df = self._data(spark)
        small = quantiles.grouped_trimmed_mean(df, "g", "v")  # auto
        explicit = quantiles.grouped_trimmed_mean(df, "g", "v", method="exact")
        assert sorted(map(tuple, small.collect())) == sorted(
            map(tuple, explicit.collect())
        )
        with _pytest.raises(ValueError, match="unknown method"):
            quantiles.grouped_trimmed_mean(df, "g", "v", method="nope")


class TestR11ScaleSafePrimitives:
    """Round-11 window-class sweep primitives: take_ordered_ranked
    (TakeOrderedAndProject top-k + rank over the k-row head) and
    global_rank_and_prefix (exact global rank + inclusive running
    total via range partition + bounded offsets)."""

    def test_take_ordered_ranked_matches_sorted_head(self, spark):
        from pyspark.sql import functions as F

        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            take_ordered_ranked,
        )

        df = spark.range(1000).select(
            F.col("id"), (F.col("id") * 37 % 101).alias("v")
        ).repartition(7)
        got = (
            take_ordered_ranked(df, [F.col("v").desc(), F.col("id").asc()], 15)
            .orderBy("rank")
            .collect()
        )
        want = sorted(
            [(r["id"], r["v"]) for r in df.collect()],
            key=lambda t: (-t[1], t[0]),
        )[:15]
        assert [(r["id"], r["v"]) for r in got] == want
        assert [r["rank"] for r in got] == list(range(1, 16))
        # the physical plan is a TakeOrderedAndProject, not a
        # data-sized global sort + window
        plan = (
            take_ordered_ranked(df, [F.col("v").desc(), F.col("id").asc()], 15)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan

    def test_global_rank_and_prefix_exact(self, spark):
        from pyspark.sql import functions as F

        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            global_rank_and_prefix,
        )

        df = spark.range(500).select(
            F.col("id"), ((F.col("id") * 13) % 97).cast("bigint").alias("x")
        ).repartition(9)
        out = global_rank_and_prefix(
            df, [F.col("x").asc(), F.col("id").asc()], "x",
            rank_col="r", cum_col="cum",
        ).collect()
        rows = sorted(((r["x"], r["id"], r["r"], r["cum"]) for r in out))
        want = sorted(((r["x"], r["id"]) for r in out))
        cum = 0
        for i, ((x, did, r, c), (wx, wid)) in enumerate(zip(rows, want), 1):
            cum += x
            assert (x, did) == (wx, wid)
            assert r == i, f"rank mismatch at {i}: {r}"
            assert c == cum, f"cum mismatch at {i}: {c} != {cum}"


class TestGroupedKthsSmallest:
    def test_multi_k_matches_single_k_recipe(self, spark):
        """r12 (VERDICT r11 plan-audit follow-up): several order
        statistics from ONE pinned ranged subtree must agree with the
        single-k recipe run once per k."""
        import random

        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_kth_smallest,
            grouped_kths_smallest,
        )

        rng = random.Random(12)
        rows = [(g, rng.randint(0, 99)) for g in ("a", "b", "c") for _ in range(150)]
        rows += [("d", 5)]  # singleton: median defined, p90 k=1 too
        df = spark.createDataFrame(rows, "g string, v long")
        ks = {
            "p50": "(n + 1) div 2",
            "p90": "(n * 9 + 9) div 10",
            "minv": "1",
        }
        got = {
            r["g"]: (r["n"], r["p50"], r["p90"], r["minv"])
            for r in grouped_kths_smallest(df, "g", "v", ks).collect()
        }
        for name, expr in ks.items():
            single = {
                r["g"]: (r["n"], r["kth_value"])
                for r in grouped_kth_smallest(df, "g", "v", k_of_n=expr).collect()
            }
            idx = list(ks).index(name) + 1
            for g, (n, kv) in single.items():
                assert got[g][0] == n
                assert got[g][idx] == kv, (name, g)

    def test_out_of_range_k_is_null_row_kept(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_kths_smallest,
        )

        df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, v long")
        rows = grouped_kths_smallest(
            df, "g", "v", {"ok": "n", "too_big": "n + 5", "zero": "0"}
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["n"], r["ok"], r["too_big"], r["zero"]) == (2, 2, None, None)

    def test_randomized_edge_shapes_match_python(self, spark):
        """Multi-seed adversarial shapes for the UNIFIED rank recipe
        (post r12 delegation it is the single implementation every
        order-statistic family runs on): ties-heavy domains, one
        giant group beside singletons, negative values, and a
        two-row frame — each checked against Python sorted() picks
        for min / p25 / median / p90 / max ranks."""
        import random

        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_kths_smallest,
        )

        ks = {
            "kmin": "1",
            "kq1": "(n + 3) div 4",
            "kmed": "(n + 1) div 2",
            "kp90": "(n * 9 + 9) div 10",
            "kmax": "n",
        }
        shapes = []
        rng = random.Random(1207)
        # ties-heavy: 3 groups over a 5-value domain
        shapes.append(
            [(f"g{i % 3}", rng.randint(0, 4)) for i in range(300)]
        )
        # skew: one giant group + two singletons, negatives allowed
        shapes.append(
            [("big", rng.randint(-1000, 1000)) for _ in range(500)]
            + [("s1", -7), ("s2", 0)]
        )
        # tiny frame
        shapes.append([("a", 2), ("a", 1)])
        for rows in shapes:
            df = spark.createDataFrame(rows, "g string, v long")
            got = {
                r["g"]: r for r in grouped_kths_smallest(df, "g", "v", ks).collect()
            }
            by_g = {}
            for g, v in rows:
                by_g.setdefault(g, []).append(v)
            for g, vs in by_g.items():
                xs = sorted(vs)
                n = len(xs)
                expect = {
                    "kmin": xs[0],
                    "kq1": xs[(n + 3) // 4 - 1],
                    "kmed": xs[(n + 1) // 2 - 1],
                    "kp90": xs[(n * 9 + 9) // 10 - 1],
                    "kmax": xs[-1],
                }
                r = got[g]
                assert r["n"] == n
                for name, want in expect.items():
                    assert r[name] == want, (g, name)


def test_with_ranged_returns_pinned_copy_of_input(spark):
    # r12: with_ranged hands back the recipe's own pinned ranged
    # table so threshold cuts join onto it instead of recomputing
    # the input's upstream in a second action (kmv_pairwise_setops).
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_kth_smallest,
    )

    rows = [("a", v) for v in range(100)] + [("b", v * 3) for v in range(40)]
    df = spark.createDataFrame(rows, "g string, h long")
    th, ranged = grouped_kth_smallest(
        df, "g", "h", k_of_n="least(n, 16)", with_ranged=True
    )
    # the ranged copy holds exactly the input rows (plus _pid)
    assert sorted(
        (r["g"], r["h"]) for r in ranged.select("g", "h").collect()
    ) == sorted(rows)
    # a threshold cut over the ranged copy == the cut over the input
    from pyspark.sql import functions as F

    cut = (
        ranged.join(
            F.broadcast(th.select("g", F.col("kth_value").alias("t"))), "g"
        )
        .where(F.col("h") <= F.col("t"))
        .select("g", "h")
    )
    want = {("a", v) for v in range(16)} | {("b", v * 3) for v in range(16)}
    assert {(r["g"], r["h"]) for r in cut.collect()} == want
    # single-k result shape unchanged
    got = {r["g"]: (r["n"], r["k"], r["kth_value"]) for r in th.collect()}
    assert got == {"a": (100, 16, 15), "b": (40, 16, 45)}


def test_global_prefix_max_multi_partition(spark):
    # r12: peak-of-running-sum folds LOCAL+CROSS without per-row
    # prefixes. Force several range partitions so the cross-offset
    # term is exercised (AQE would coalesce the tiny exchange).
    import random

    from pyspark.sql import functions as F

    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        global_prefix_max,
    )

    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        rng = random.Random(7)
        rows = [(t, rng.randint(-5, 5)) for t in range(2000)]
        df = spark.createDataFrame(rows, "t long, d long")
        got = global_prefix_max(df, [F.col("t").asc()], "d").collect()[0][0]
        run = best = None
        for _, d in sorted(rows):
            run = d if run is None else run + d
            best = run if best is None else max(best, run)
        assert got == best
        # empty input -> NULL
        empty = spark.createDataFrame([], "t long, d long")
        assert (
            global_prefix_max(empty, [F.col("t").asc()], "d").collect()[0][0]
            is None
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)
