"""Wave-4 operators: grouped OLS, MAD outliers, hopping windows,
hard-negative mining — hand-computed expectations on tiny inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.operators.stats import (
    group_linregress,
    mad_outlier_report,
)
from dpe_energy_performance_analysis_etl_spark.similarity.ann import hard_negative_topk


class TestGroupLinregress:
    def test_perfect_line(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0)], "k string, x double, y double"
        )
        row = group_linregress(df, "k", "x", "y", 2, 2).collect()[0]
        assert row["n_obs"] == 3
        assert row["slope"] == pytest.approx(2.0, abs=1e-12)
        assert row["intercept"] == pytest.approx(0.0, abs=1e-12)
        assert row["r2"] == pytest.approx(1.0, abs=1e-12)

    def test_flat_y_and_degenerate_group(self, spark):
        df = spark.createDataFrame(
            [("b", 1.0, 1.0), ("b", 2.0, 1.0), ("b", 3.0, 1.0), ("c", 5.0, 9.0)],
            "k string, x double, y double",
        )
        out = {r["k"]: r for r in group_linregress(df, "k", "x", "y", 2, 2).collect()}
        # zero y-variance: slope exactly 0, r2 undefined (0/0) -> NULL
        assert out["b"]["slope"] == 0.0
        assert out["b"]["intercept"] == pytest.approx(1.0, abs=1e-12)
        assert out["b"]["r2"] is None
        # single point: zero x-variance -> all NULL
        assert out["c"]["slope"] is None and out["c"]["r2"] is None

    def test_known_slope(self, spark):
        # y = 3x + 1 with one perturbed point: x=[0,1,2,3], y=[1,4,8,10]
        # Sx=6 Sy=23 Sxy=[0+4+16+30]=50 Sxx=14; slope=(4*50-6*23)/(4*14-36)=62/20=3.1
        df = spark.createDataFrame(
            [("g", 0.0, 1.0), ("g", 1.0, 4.0), ("g", 2.0, 8.0), ("g", 3.0, 10.0)],
            "k string, x double, y double",
        )
        row = group_linregress(df, "k", "x", "y", 2, 2).collect()[0]
        assert row["slope"] == pytest.approx(3.1, abs=1e-12)
        assert row["intercept"] == pytest.approx(23 / 4 - 3.1 * 1.5, abs=1e-12)

    def test_scale_conversion(self, spark):
        # x_scale != y_scale must still report original-unit slope
        df = spark.createDataFrame(
            [("s", 1.0, 10.0), ("s", 2.0, 20.0), ("s", 3.0, 30.0)],
            "k string, x double, y double",
        )
        row = group_linregress(df, "k", "x", "y", 1, 3).collect()[0]
        assert row["slope"] == pytest.approx(10.0, abs=1e-9)


class TestMadOutliers:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(
            [("a", v) for v in [1.0, 2.0, 3.0, 4.0, 100.0]], "k string, v double"
        )
        row = mad_outlier_report(df, "k", "v", 2).collect()[0]
        # cents: [100,200,300,400,10000]; median 300
        assert row["median_cents"] == 300.0
        # devs: [200,100,0,100,9700] -> sorted [0,100,100,200,9700], MAD=100
        assert row["mad_cents"] == 100.0
        # threshold 1.5*100=150: devs 200 and 9700 exceed -> 2 outliers
        assert row["n_outliers"] == 2
        assert row["n_obs"] == 5

    def test_even_count_interpolation_exact(self, spark):
        df = spark.createDataFrame(
            [("e", v) for v in [1.0, 2.0, 3.0, 10.0]], "k string, v double"
        )
        row = mad_outlier_report(df, "k", "v", 2).collect()[0]
        # cents [100,200,300,1000]: median = (200+300)/2 = 250 exactly
        assert row["median_cents"] == 250.0
        # devs [150,50,50,750] sorted [50,50,150,750] -> MAD = (50+150)/2 = 100 exactly
        assert row["mad_cents"] == 100.0
        # threshold 1.5*100 = 150, strict >: dev 150 is NOT flagged, 750 is
        assert row["n_outliers"] == 1

    def test_no_outliers_uniform(self, spark):
        df = spark.createDataFrame([("u", 5.0)] * 4, "k string, v double")
        row = mad_outlier_report(df, "u".replace("u", "k"), "v", 2).collect()[0]
        assert row["mad_cents"] == 0.0 and row["n_outliers"] == 0


class TestHardNegatives:
    def test_excludes_same_label_and_ranks(self, spark):
        rows = [
            (0, 0, [1.0, 0.0]),
            (1, 0, [1.0, 0.01]),   # same label: never a negative for 0
            (2, 1, [1.0, 0.1]),    # different label, very close: top negative
            (3, 1, [0.0, 1.0]),    # different label, orthogonal
            (4, 2, [0.9, 0.2]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
        out = hard_negative_topk(df, df.filter(F.col("vec_id") == 0), k=3)
        got = [(r["neighbor_id"], r["rank"]) for r in out.orderBy("rank").collect()]
        ids = [g[0] for g in got]
        assert 1 not in ids  # same-label excluded
        assert ids[0] == 2  # closest different-label vector ranks first
        assert set(ids) == {2, 3, 4}

    def test_k_truncation(self, spark):
        rows = [(i, i % 2, [float(i + 1), 1.0]) for i in range(6)]
        df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
        out = hard_negative_topk(df, df.filter(F.col("vec_id") == 0), k=2).collect()
        assert len(out) == 2
        assert all(r["neg_label"] != r["query_label"] for r in out)


class TestHoppingWindow:
    def test_each_event_in_two_windows(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 10:30:00", "click", 2.0)],
            "event_id long, ts string, event_type string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = (
            df.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").cast("string").alias("ws"), "n")
            .orderBy("ws")
            .collect()
        )
        assert [r["ws"] for r in out] == ["2024-01-01 09:00:00", "2024-01-01 10:00:00"]
        assert all(r["n"] == 1 for r in out)


class TestPrefixFilterSetSim:
    def test_agrees_with_full_posting_join(self, spark):
        """Prefix filtering is EXACT: same pairs as the full
        posting-list join at the same threshold on real testdata."""
        from dpe_energy_performance_analysis_etl_spark.dedup.setsim import prefix_filter_jaccard_join
        from dpe_energy_performance_analysis_etl_spark.dedup.shingles import shingle_pairs_jaccard

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        got = {
            (r["doc_a"], r["doc_b"], r["n_common"])
            for r in prefix_filter_jaccard_join(docs, threshold=0.5).collect()
        }
        ref = {
            (r["doc_a"], r["doc_b"], r["n_common"])
            for r in shingle_pairs_jaccard(docs, threshold=0.5, hash_shingle_key=False).collect()
        }
        assert got == ref and len(got) > 0

    def test_completeness_adversarial(self, spark):
        """Hand-built corpus where every pair's Jaccard is known:
        no qualifying pair may be lost to the prefix filter."""
        import itertools

        from dpe_energy_performance_analysis_etl_spark.dedup.setsim import prefix_filter_jaccard_join

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        texts = [
            base,
            base + " extra",                      # very high overlap
            "alpha beta gamma delta epsilon zeta omega psi chi phi",  # ~half
            "one two three four five six seven eight nine ten",       # disjoint
            base,                                  # exact duplicate
        ]
        df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

        def shingles(t):
            ws = t.split()
            return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

        expected = set()
        ss = [shingles(t) for t in texts]
        for a, b in itertools.combinations(range(len(texts)), 2):
            inter = len(ss[a] & ss[b])
            union = len(ss[a] | ss[b])
            if union and inter / union >= 0.5:
                expected.add((a, b))
        got = {
            (r["doc_a"], r["doc_b"])
            for r in prefix_filter_jaccard_join(df, threshold=0.5).collect()
        }
        assert got == expected and (0, 4) in got

    def test_prefix_posts_fewer_tokens(self, spark):
        """The scale claim: prefixes post ~(1-t) of each set."""
        from pyspark.sql import functions as F
        from dpe_energy_performance_analysis_etl_spark.dedup.shingles import word_shingles

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        sh = docs.select(word_shingles("text", 3).alias("s")).where(F.size("s") > 0)
        sizes = sh.select(
            F.size("s").alias("n"),
            (F.size("s") - F.ceil(F.lit(0.5) * F.size("s")) + 1).alias("p"),
        ).agg(F.sum("n").alias("total"), F.sum("p").alias("prefix")).collect()[0]
        assert sizes["prefix"] < 0.6 * sizes["total"]


class TestRandomizedAgainstNumpy:
    def test_linregress_matches_numpy_over_random_groups(self, spark):
        """30 random groups in ONE Spark call vs numpy's closed form
        (tolerance: the operator is exact-integer; numpy is float)."""
        import numpy as np

        rng = np.random.default_rng(42)
        rows = []
        expect = {}
        for g in range(30):
            n = int(rng.integers(2, 40))
            x = np.round(rng.uniform(-50, 50, n), 2)
            y = np.round(rng.uniform(-50, 50, n), 2)
            rows += [(f"g{g:02d}", float(a), float(b)) for a, b in zip(x, y)]
            den = n * (x * x).sum() - x.sum() ** 2
            if den > 1e-9:
                slope = (n * (x * y).sum() - x.sum() * y.sum()) / den
                expect[f"g{g:02d}"] = (slope, y.mean() - slope * x.mean())
        df = spark.createDataFrame(rows, "k string, x double, y double")
        got = {r["k"]: r for r in group_linregress(df, "k", "x", "y", 2, 2).collect()}
        assert len(got) == 30
        for k, (slope, intercept) in expect.items():
            assert got[k]["slope"] == pytest.approx(slope, rel=1e-9, abs=1e-9)
            assert got[k]["intercept"] == pytest.approx(intercept, rel=1e-9, abs=1e-9)
            if got[k]["r2"] is not None:
                assert -1e-12 <= got[k]["r2"] <= 1 + 1e-12

    def test_mad_matches_numpy_over_random_groups(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        rows = []
        expect = {}
        for g in range(20):
            n = int(rng.integers(1, 60))
            v = np.round(rng.uniform(0, 1000, n), 2)
            rows += [(f"g{g:02d}", float(x)) for x in v]
            cents = np.round(v * 100)
            med = np.median(cents)
            dev = np.abs(cents - med)
            mad = np.median(dev)
            expect[f"g{g:02d}"] = (med, mad, int((dev > 1.5 * mad).sum()))
        df = spark.createDataFrame(rows, "k string, v double")
        got = {r["k"]: r for r in mad_outlier_report(df, "k", "v", 2).collect()}
        for k, (med, mad, n_out) in expect.items():
            assert got[k]["median_cents"] == med
            assert got[k]["mad_cents"] == mad
            assert got[k]["n_outliers"] == n_out

    def test_kcore_matches_python_peeling_on_random_graph(self, spark):
        import numpy as np
        from dpe_energy_performance_analysis_etl_spark.operators.graph import kcore_peel

        rng = np.random.default_rng(11)
        edges = {tuple(sorted(p)) for p in rng.integers(0, 40, (220, 2)) if p[0] != p[1]}

        def ref_kcore(es, k):
            es = set(es)
            while True:
                deg = {}
                for a, b in es:
                    deg[a] = deg.get(a, 0) + 1
                    deg[b] = deg.get(b, 0) + 1
                keep = {v for v, d in deg.items() if d >= k}
                nxt = {(a, b) for a, b in es if a in keep and b in keep}
                if nxt == es:
                    break
                es = nxt
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            return {v: d for v, d in deg.items() if d >= k}

        df = spark.createDataFrame([(int(a), int(b)) for a, b in edges], "src long, dst long")
        for k in (2, 3, 4):
            got = {r["v"]: r["core_degree"] for r in kcore_peel(df, k=k).collect()}
            assert got == ref_kcore(edges, k), f"k={k}"


class TestBootstrapMeanCI:
    def test_interval_brackets_mean_and_is_deterministic(self, spark):
        import numpy as np
        from dpe_energy_performance_analysis_etl_spark.operators.stats import bootstrap_mean_ci

        rng = np.random.default_rng(3)
        vals = np.round(rng.normal(500, 50, 400), 2)
        df = spark.createDataFrame(
            [("g", i, float(v)) for i, v in enumerate(vals)], "k string, rid long, v double"
        )
        row = bootstrap_mean_ci(df, "k", "v", "rid", 2).collect()[0]
        assert row["n_replicas"] == 32
        assert row["ci_lo"] < row["mean_cents"] < row["ci_hi"]
        # interval width should be within a few standard errors
        se = 50 * 100 / np.sqrt(400)
        assert row["ci_hi"] - row["ci_lo"] < 8 * se
        again = bootstrap_mean_ci(df.repartition(11), "k", "v", "rid", 2).collect()[0]
        assert (row["ci_lo"], row["ci_hi"], row["mean_cents"]) == (
            again["ci_lo"], again["ci_hi"], again["mean_cents"]
        )

    def test_pseudo_poisson_weights_mean_one(self, spark):
        """The hash-derived multiplicities must average ~1 so replica
        sample sizes match the original (the Poisson bootstrap
        contract)."""
        import numpy as np
        from dpe_energy_performance_analysis_etl_spark.operators.stats import bootstrap_mean_ci

        df = spark.createDataFrame(
            [("g", i, 100.0) for i in range(2000)], "k string, rid long, v double"
        )
        row = bootstrap_mean_ci(df, "k", "v", "rid", 2).collect()[0]
        # constant values: every replica mean is exactly 10000 cents
        assert row["ci_lo"] == row["ci_hi"] == row["mean_cents"] == 10000.0


class TestDistinctiveTerms:
    def test_exclusive_term_tops_its_group(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.analysis import (
            distinctive_terms_by_source,
        )

        rows = [
            (0, "common words here plus zebra zebra zebra", "sA"),
            (1, "common words here plus yonder yonder", "sB"),
            (2, "common words here again", "sB"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {}
        for r in distinctive_terms_by_source(df, k=2).collect():
            got.setdefault(r["source"], []).append((r["rank"], r["term"]))
        assert sorted(got["sA"])[0][1] == "zebra"
        assert sorted(got["sB"])[0][1] == "yonder"

    def test_score_is_exact_rational(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.analysis import (
            distinctive_terms_by_source,
        )

        rows = [(0, "aa aa bb", "x"), (1, "bb cc", "y")]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {(r["source"], r["term"]): r["score"] for r in distinctive_terms_by_source(df, k=3).collect()}
        # vocab=3, grand=5; x: total 3, rest 2. score(aa|x): tf=2,
        # rest=0 -> ((2+1)/(3+3)) / ((0+1)/(2+3)) = .5/.2 = 2.5
        assert got[("x", "aa")] == (3 / 6) / (1 / 5)


class TestBenfordAudit:
    def test_synthetic_benford_sample_fits(self, spark):
        import numpy as np
        from dpe_energy_performance_analysis_etl_spark.operators.quality import (
            BENFORD_P,
            benford_digit_report,
        )

        # log-uniform values follow Benford closely
        rng = np.random.default_rng(5)
        vals = np.round(10 ** rng.uniform(0, 4, 5000), 2)
        df = spark.createDataFrame([("g", float(v)) for v in vals], "k string, v double")
        rows = benford_digit_report(df, "k", "v", 2).collect()
        assert {r["digit"] for r in rows} == set(range(1, 10))
        chi2 = sum(r["chi2_contrib"] for r in rows)
        assert chi2 < 30  # 8 dof; a uniform-digit sample would be >> 1000
        for r in rows:
            assert r["expected"] == r["n"] * BENFORD_P[r["digit"] - 1]

    def test_uniform_sample_rejected(self, spark):
        import numpy as np
        from dpe_energy_performance_analysis_etl_spark.operators.quality import benford_digit_report

        rng = np.random.default_rng(6)
        vals = np.round(rng.uniform(100, 999, 5000), 0)  # flat first digits
        df = spark.createDataFrame([("g", float(v)) for v in vals], "k string, v double")
        chi2 = sum(r["chi2_contrib"] for r in benford_digit_report(df, "k", "v", 0).collect())
        assert chi2 > 500

    def test_zero_and_negative_excluded(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quality import benford_digit_report

        df = spark.createDataFrame(
            [("g", 0.0), ("g", 12.0), ("g", 91.0)], "k string, v double"
        )
        rows = benford_digit_report(df, "k", "v", 2).collect()
        assert sum(r["obs"] for r in rows) == 2


import pytest as _pytest


@_pytest.mark.parametrize("threshold", [0.3, 0.34, 0.5, 0.57, 0.66, 0.71])
def test_prefix_filter_exact_for_arbitrary_thresholds(spark, threshold):
    """ADVICE r3 regression: the prefix bound is integer rational
    arithmetic now — float ceil(0.57 * 100) = 58 used to shorten the
    prefix and silently DROP qualifying pairs at non-dyadic
    thresholds. The prefix join must equal the full posting join at
    every threshold, including ones whose products double-round."""
    from dpe_energy_performance_analysis_etl_spark.dedup import shingle_pairs_jaccard
    from dpe_energy_performance_analysis_etl_spark.dedup.setsim import (
        prefix_filter_jaccard_join,
    )

    rows = []
    base = [f"tok{i}" for i in range(30)]
    for d in range(24):
        # graded mutations create pairs across the whole jaccard range
        words = list(base)
        for m in range(d % 7):
            words[(5 * m + d) % len(words)] = f"mut{d}x{m}"
        rows.append((d, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    full = {
        (r.doc_a, r.doc_b, r.n_common)
        for r in shingle_pairs_jaccard(df, threshold=threshold).collect()
    }
    pref = {
        (r.doc_a, r.doc_b, r.n_common)
        for r in prefix_filter_jaccard_join(df, threshold=threshold).collect()
    }
    # the posting join uses a float >= compare, the prefix join an
    # exact rational one; on this corpus no pair sits close enough to
    # the boundary for that to differ — the sets must be identical
    assert pref == full
    assert full, f"degenerate fixture at t={threshold}"


class TestAdaptiveJaccardJoin:
    def test_both_branches_identical_pairs(self, spark):
        """budget=∞ → plain join; budget=0 → prefix filter; same rows."""
        from dpe_energy_performance_analysis_etl_spark.dedup.setsim import (
            adaptive_jaccard_join,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plain = {
            (r["doc_a"], r["doc_b"], r["n_common"])
            for r in adaptive_jaccard_join(
                docs, threshold=0.5, candidate_budget=10**15
            ).collect()
        }
        pref = {
            (r["doc_a"], r["doc_b"], r["n_common"])
            for r in adaptive_jaccard_join(
                docs, threshold=0.5, candidate_budget=0
            ).collect()
        }
        assert plain == pref and len(plain) > 0

    def test_probe_picks_expected_branch(self, spark, monkeypatch):
        """The probe must route below-budget corpora to the plain
        posting join (never the prefix pipeline) and vice versa."""
        import dpe_energy_performance_analysis_etl_spark.dedup.setsim as setsim_mod
        from dpe_energy_performance_analysis_etl_spark.dedup.setsim import (
            adaptive_jaccard_join,
        )

        called = []
        real = setsim_mod.prefix_filter_jaccard_join
        monkeypatch.setattr(
            setsim_mod,
            "prefix_filter_jaccard_join",
            lambda *a, **k: called.append("prefix") or real(*a, **k),
        )
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        adaptive_jaccard_join(docs, threshold=0.5, candidate_budget=10**15).count()
        assert called == []  # plain branch
        adaptive_jaccard_join(docs, threshold=0.5, candidate_budget=0).count()
        assert called == ["prefix"]
