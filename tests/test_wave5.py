"""Round-5 wave operators: exact ROC-AUC, seasonal-naive MASE,
skip-gram pairs, t-closeness, link prediction — hand-computed cases
(the oracle gate checks them at corpus scale; these pin the semantics
on inputs small enough to verify by hand)."""

import pytest
from pyspark.sql import functions as F


def test_roc_auc_exact_separable_tied_and_degenerate(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.stats import roc_auc_exact

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 0, 2.0), ("a", 1, 3.0), ("a", 1, 4.0),
         ("b", 0, 5.0), ("b", 1, 5.0), ("b", 0, 5.0), ("b", 1, 5.0),
         ("c", 1, 1.0), ("c", 1, 2.0)],
        "grp string, y int, s double",
    )
    rows = {r.grp: r for r in roc_auc_exact(df, "y", "s", by="grp").collect()}
    assert rows["a"].auc == 1.0          # perfectly separated
    assert rows["b"].auc == 0.5          # all tied -> chance
    assert rows["c"].auc is None         # one class -> guarded NULL
    assert (rows["a"].n_pos, rows["a"].n_neg) == (2, 2)
    # a swapped ordering gives the complement
    swapped = roc_auc_exact(
        df.filter("grp = 'a'").withColumn("s", -F.col("s")), "y", "s"
    ).collect()[0]
    assert swapped.auc == 0.0


def test_seasonal_naive_mase_hand_case(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        seasonal_naive_eval,
    )

    # series 10, 20, 12, 24, 14, 28 with season 2:
    # seasonal errors |12-10|,|24-20|,|14-12|,|28-24| = 2,4,2,4 (sum 12, n 4)
    # naive errors |20-10|,|12-20|,|24-12|,|14-24|,|28-14| = 10,8,12,10,14 (sum 54, n 5)
    # mase = (12/4) / (54/5) = 3 / 10.8 = 15/54
    df = spark.createDataFrame(
        [(t, v) for t, v in enumerate([10, 20, 12, 24, 14, 28])], "t int, v long"
    )
    r = seasonal_naive_eval(df, "t", "v", season=2).collect()[0]
    assert (r.n_eval, r.sae_seasonal, r.sae_naive) == (4, 12, 54)
    assert r.mase == (12 * 5) / (54 * 4)
    # constant series: naive error sum 0 -> guarded NULL
    const = spark.createDataFrame([(t, 7) for t in range(6)], "t int, v long")
    assert seasonal_naive_eval(const, "t", "v", season=2).collect()[0].mase is None


def test_walk_skipgram_pairs_window(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        walk_skipgram_pairs,
    )

    # one walk 0: A B C D -> window 2 ordered pairs:
    # dist1: (A,B),(B,C),(C,D) + reverses; dist2: (A,C),(B,D) + reverses
    walks = spark.createDataFrame(
        [("A", 0, 0, "A"), ("A", 0, 1, "B"), ("A", 0, 2, "C"), ("A", 0, 3, "D")],
        "start string, walk int, step int, node string",
    )
    got = {(r.center, r.context): r.n_pairs for r in walk_skipgram_pairs(walks).collect()}
    expect_pairs = {("A", "B"), ("B", "C"), ("C", "D"), ("A", "C"), ("B", "D")}
    expect = {p: 1 for p in expect_pairs} | {(b, a): 1 for a, b in expect_pairs}
    assert got == expect


def test_t_closeness_audit_hand_case(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        t_closeness_audit,
    )

    # population: 4 of X, 4 of Y (p = 1/2 each); group g1 = 3X + 1Y
    # EMD = 1/2 (|3/4 - 1/2| + |1/4 - 1/2|) = 1/4; g2 = 1X + 3Y same.
    rows = [("g1", "X")] * 3 + [("g1", "Y")] + [("g2", "X")] + [("g2", "Y")] * 3
    df = spark.createDataFrame(rows, "g string, s string")
    out = {r.g: r for r in t_closeness_audit(df, ["g"], "s", t_num=1, t_den=5).collect()}
    assert out["g1"].t_closeness == 0.25
    assert out["g1"].violates and out["g2"].violates  # 1/4 > 1/5
    strict = {r.g: r.violates for r in t_closeness_audit(df, ["g"], "s", t_num=1, t_den=4).collect()}
    assert strict == {"g1": False, "g2": False}  # 1/4 > 1/4 is false
    # absent value in a group still contributes: group of only X
    df2 = spark.createDataFrame(
        [("h1", "X"), ("h1", "X"), ("h2", "Y"), ("h2", "Y")], "g string, s string"
    )
    r = {r.g: r for r in t_closeness_audit(df2, ["g"], "s").collect()}
    assert r["h1"].t_closeness == 0.5  # (|1-1/2| + |0-1/2|)/2


def test_link_prediction_scores_square(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        LP_RA_SCALE,
        link_prediction_scores,
    )

    # square 1-2-3-4-1: diagonals (1,3) and (2,4) each share 2 common
    # neighbors of degree 2; every deg = 2 -> PA = 4, RA = 2 * S//2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src int, dst int"
    )
    got = {
        (r.u, r.v): r
        for r in link_prediction_scores(edges, min_common=1).collect()
    }
    assert set(got) == {(1, 3), (2, 4)}
    for r in got.values():
        assert r.common_neighbors == 2
        assert r.preferential_attachment == 4
        assert r.ra_scaled == 2 * (LP_RA_SCALE // 2)
    # existing edges are anti-joined away even when they close wedges
    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src int, dst int")
    assert link_prediction_scores(tri, min_common=1).count() == 0


def test_cdc_chunks_survive_prefix_insertion(spark):
    """The content-defined property itself: prepending tokens to a
    document re-keys only the chunks up to the first unchanged
    boundary — every later chunk keeps its md5 identity (fixed-size
    blocks would re-key everything after the edit)."""
    from dpe_energy_performance_analysis_etl_spark.text.chunking import cdc_chunks

    # 200 varied tokens -> ~200 distinct 4-grams, so ~1/16 of them cut
    words = " ".join(f"tok{i * i % 1009}" for i in range(200))
    base = spark.createDataFrame([(1, words.strip())], "doc_id int, text string")
    edited = spark.createDataFrame(
        [(1, ("inserted preamble tokens " + words).strip())],
        "doc_id int, text string",
    )
    h0 = [r.chunk_md5 for r in cdc_chunks(base).orderBy("chunk_idx").collect()]
    h1 = [r.chunk_md5 for r in cdc_chunks(edited).orderBy("chunk_idx").collect()]
    assert len(h0) >= 3, "fixture should produce several chunks"
    shared = set(h0) & set(h1)
    # all chunks after the first boundary resynchronize
    assert set(h0[1:]) <= shared
    # and the suffix ORDER is preserved
    assert h1[-(len(h0) - 1):] == h0[1:]


def test_cdc_chunks_partition_exactly(spark):
    """Chunks tile each document: contiguous, gap-free, full cover."""
    from dpe_energy_performance_analysis_etl_spark.text.chunking import cdc_chunks
    from dpe_energy_performance_analysis_etl_spark.plans.queries import read_documents

    docs = read_documents(spark, "/root/testdata/sf0.001")
    spans = cdc_chunks(docs).orderBy("doc_id", "chunk_idx").collect()
    from collections import defaultdict

    per_doc = defaultdict(list)
    for r in spans:
        per_doc[r.doc_id].append((r.start_tok, r.n_tokens))
    import re as _re

    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, ch in per_doc.items():
        n = len(_re.findall(r"[a-z0-9]+", texts[doc_id].lower()))
        pos = 0
        for start, ln in ch:
            assert start == pos and ln >= 1
            pos += ln
        assert pos == n


def test_fellegi_sunter_classes_hand_case(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.entity import (
        fellegi_sunter_link,
    )

    left = spark.createDataFrame(
        [(1, "b1", "ann", "x"), (2, "b1", "bob", "y"), (3, "b2", "cat", "z")],
        "id int, blk string, name string, city string",
    )
    right = spark.createDataFrame(
        [(10, "b1", "ann", "x"),   # full agree with 1 -> 30 match
         (20, "b1", "ann", "q"),   # name only: 20 - 5 = 15 possible
         (30, "b2", "dog", "q")],  # nothing: -15 non_match
        "id int, blk string, name string, city string",
    )
    out = fellegi_sunter_link(
        left, right,
        block_cols=[(F.col("blk"), F.col("blk"))],
        comparisons=[
            ("name", F.col("name"), F.col("name"), 20, -10),
            ("city", F.col("city"), F.col("city"), 10, -5),
        ],
        left_id="id", right_id="id", upper=30, lower=0,
    )
    got = {(r.left_id, r.right_id): (r.score, r.n_agree, r.link_class)
           for r in out.collect()}
    assert got[(1, 10)] == (30, 2, "match")
    assert got[(1, 20)] == (15, 1, "possible")
    assert got[(3, 30)] == (-15, 0, "non_match")
    # blocking: (3, 10) never becomes a candidate (different blocks)
    assert (3, 10) not in got


def test_rake_keywords_hand_case(spark):
    from dpe_energy_performance_analysis_etl_spark.text.analysis import (
        RAKE_SCALE,
        rake_keywords,
    )

    # doc: "deep learning of deep nets" -> phrases "deep learning",
    # "deep nets"; freq(deep)=2, deg(deep)=4; freq(learning)=1,
    # deg(learning)=2; freq(nets)=1, deg(nets)=2
    df = spark.createDataFrame(
        [(1, "deep learning of deep nets")], "doc_id int, text string"
    )
    got = {r.phrase: r for r in rake_keywords(df).collect()}
    assert set(got) == {"deep learning", "deep nets"}
    expected = (4 * RAKE_SCALE) // 2 + (2 * RAKE_SCALE) // 1
    assert got["deep learning"].score_scaled == expected
    assert got["deep learning"].n_occurrences == 1
    assert got["deep nets"].score_scaled == expected


def test_pass_at_k_hand_cases(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.stats import pass_at_k

    rows = (
        [("p1", True)] + [("p1", False)] * 3          # n=4, c=1 -> 1 - C(3,3)/C(4,3) = 3/4
        + [("p2", False)] * 3                           # n=3, c=0 -> 0
        + [("p3", True), ("p3", True), ("p3", False)]  # n-c < k -> 1
        + [("p4", True), ("p4", False)]                 # n < k -> NULL
    )
    df = spark.createDataFrame(rows, "prob string, ok boolean")
    got = {r.prob: r for r in pass_at_k(df, "prob", "ok", k=3).collect()}
    assert got["p1"].pass_at_k == 0.75
    assert got["p2"].pass_at_k == 0.0
    assert got["p3"].pass_at_k == 1.0
    assert got["p4"].pass_at_k is None
    assert (got["p1"].n_samples, got["p1"].n_success) == (4, 1)


def test_landmark_bfs_path_graph(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        landmark_bfs_distances,
    )

    # path 1-2-3-4-5-6, single landmark (smallest id = 1), depth 3
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "src int, dst int"
    )
    got = {
        (r.landmark, r.node): r.dist
        for r in landmark_bfs_distances(edges, n_landmarks=1, max_depth=3).collect()
    }
    assert got == {(1, 1): 0, (1, 2): 1, (1, 3): 2, (1, 4): 3}
    # two landmarks advance together; first-discovery keeps min dist
    got2 = {
        (r.landmark, r.node): r.dist
        for r in landmark_bfs_distances(edges, n_landmarks=2, max_depth=2).collect()
    }
    assert got2[(2, 4)] == 2 and got2[(1, 3)] == 2 and (1, 4) not in got2


def test_hll_portable_accuracy_and_registers(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.sketch import hll_portable

    # 5000 distinct values (well above the 2.5*m small-range regime)
    df = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    r = hll_portable(df, "v").collect()[0]
    assert r.n_buckets_hit == 64
    assert abs(r.hll_estimate - 5000) / 5000 < 0.30  # ~13% RSE at m=64
    # duplicates never move a register: estimate is a set function
    dup = df.unionAll(df).unionAll(df)
    r2 = hll_portable(dup, "v").collect()[0]
    assert r2.hll_estimate == r.hll_estimate
    assert r2.register_sum_x2p == r.register_sum_x2p


def test_bounded_bellman_ford_weighted_shortcut(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        bounded_bellman_ford,
    )

    # 1->2->3 costs 1+1=2; direct 1->3 costs 5: min wins; and the
    # round bound is respected (path 1..5 needs 4 hops)
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (1, 3, 5), (3, 4, 1), (4, 5, 1)],
        "src int, dst int, w int",
    )
    d = {
        (r.source, r.node): r.dist
        for r in bounded_bellman_ford(edges, n_sources=1, rounds=2).collect()
    }
    assert d[(1, 3)] == 2 and d[(1, 2)] == 1 and (1, 5) not in d
    d4 = {
        (r.source, r.node): r.dist
        for r in bounded_bellman_ford(edges, n_sources=1, rounds=4).collect()
    }
    assert d4[(1, 5)] == 4


def test_greedy_max_coverage_hand_case(spark):
    from dpe_energy_performance_analysis_etl_spark.text.curation import (
        greedy_max_coverage,
    )

    # doc 1 covers {a,b,c}, doc 2 {c,d}, doc 3 {a,b} (subset of 1),
    # doc 4 {e}: greedy picks 1 (3), then 2 (+1 d), then 4 (+1 e);
    # doc 3 adds nothing and is never picked
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "c"), (2, "d"),
            (3, "a"), (3, "b"), (4, "e")]
    pairs = spark.createDataFrame(rows, "doc_id long, item string")
    got = [(r.round, r.doc_id, r.gain)
           for r in greedy_max_coverage(pairs, k=5, id_col="doc_id").collect()]
    assert sorted(got) == [(1, 1, 3), (2, 2, 1), (3, 4, 1)]


def test_greedy_max_coverage_deep_k50(spark):
    # selection depth must not be bounded by a driver-side literal
    # list: 60 docs each uniquely covering one item → greedy picks 50
    # of them (smallest-id tie-break), one per round.
    from dpe_energy_performance_analysis_etl_spark.text.curation import (
        greedy_max_coverage,
    )

    rows = [(d, f"item_{d}") for d in range(60)]
    pairs = spark.createDataFrame(rows, "doc_id long, item string")
    got = greedy_max_coverage(pairs, k=50, id_col="doc_id").collect()
    assert len(got) == 50
    assert [r.doc_id for r in sorted(got, key=lambda r: r.round)] == list(range(50))
    assert all(r.gain == 1 for r in got)


def test_wave5_randomized_brute_force_cross_checks(spark):
    """One seeded random dataset per operator, checked against a
    brute-force pure-Python reference — the semantics gate the
    hand cases can't cover combinatorially."""
    import itertools
    import random

    rng = random.Random(20260814)

    # --- exact AUC vs the O(n^2) pairwise definition ----------------
    from dpe_energy_performance_analysis_etl_spark.operators.stats import roc_auc_exact

    data = [(rng.randint(0, 1), float(rng.randint(0, 19)) / 4) for _ in range(200)]
    df = spark.createDataFrame(data, "y int, s double")
    got = roc_auc_exact(df, "y", "s").collect()[0].auc
    pos = [s for y, s in data if y == 1]
    neg = [s for y, s in data if y == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0
               for p in pos for n in neg)
    assert got == wins / (len(pos) * len(neg))

    # --- Bellman-Ford vs dict relaxation ----------------------------
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        bounded_bellman_ford,
    )

    edges = [(rng.randint(1, 14), rng.randint(1, 14), rng.randint(1, 9))
             for _ in range(40)]
    edges = [(u, v, w) for u, v, w in edges if u != v]
    e_df = spark.createDataFrame(edges, "src int, dst int, w int")
    got_d = {
        (r.source, r.node): r.dist
        for r in bounded_bellman_ford(e_df, n_sources=2, rounds=3).collect()
    }
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    ref = {}
    for s in nodes[:2]:
        dist = {s: 0}
        for _ in range(3):
            nd = dict(dist)
            for u, v, w in edges:
                if u in dist and dist[u] + w < nd.get(v, 1 << 60):
                    nd[v] = dist[u] + w
            dist = nd
        for n, d in dist.items():
            ref[(s, n)] = d
    assert got_d == ref

    # --- link prediction vs brute common-neighbor enumeration -------
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        LP_RA_SCALE,
        link_prediction_scores,
    )

    und = {tuple(sorted((u, v))) for u, v, _ in edges}
    e2 = spark.createDataFrame(sorted(und), "src int, dst int")
    got_lp = {
        (r.u, r.v): (r.common_neighbors, r.preferential_attachment, r.ra_scaled)
        for r in link_prediction_scores(e2, min_common=1).collect()
    }
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ref_lp = {}
    for u, v in itertools.combinations(sorted(adj), 2):
        if (u, v) in und:
            continue
        common = adj[u] & adj[v]
        if common:
            ref_lp[(u, v)] = (
                len(common),
                len(adj[u]) * len(adj[v]),
                sum(LP_RA_SCALE // len(adj[z]) for z in common),
            )
    assert got_lp == ref_lp


def test_ngram_precision_hand_case(spark):
    from dpe_energy_performance_analysis_etl_spark.text.evaluation import ngram_precision

    cand = spark.createDataFrame([(1, "a b a b c")], "doc_id long, text string")
    ref = spark.createDataFrame([(1, "a b x a b")], "doc_id long, text string")
    # cand bigrams: ab, ba, ab, bc -> counts {ab:2, ba:1, bc:1}, den 4
    # ref bigrams: ab, bx, xa, ab -> {ab:2}; clipped num = min(2,2) = 2
    r = ngram_precision(cand, ref, n=2).collect()[0]
    assert (r.pn_num, r.pn_den, r.precision) == (2, 4, 0.5)
    # candidate with no ref row: precision 0 (all grams unclipped)
    cand2 = spark.createDataFrame([(9, "q r s")], "doc_id long, text string")
    r2 = ngram_precision(cand2, ref, n=2).collect()[0]
    assert (r2.pn_num, r2.pn_den) == (0, 2)


def test_distinct_n_and_simpson_hand_cases(spark):
    from dpe_energy_performance_analysis_etl_spark.text.evaluation import (
        distinct_n,
        simpson_concentration,
    )

    df = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "a b c d")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in distinct_n(df, n=2).collect()}
    assert (got[1].n_distinct, got[1].n_total) == (2, 5)  # xy, yx repeated
    assert got[2].distinct_ratio == 1.0                   # all bigrams unique
    ev = spark.createDataFrame(
        [("u1", "click")] * 3 + [("u2", "click"), ("u2", "view")],
        "user string, ev string",
    )
    s = {r.user: r.simpson for r in simpson_concentration(ev, "user", "ev").collect()}
    assert s["u1"] == 1.0          # all same value
    assert s["u2"] == 0.0          # two singletons, never match


def test_portable_mix32_extreme_inputs_no_overflow(spark):
    """ADVICE r4 regression: with the old 2.6e9-scale multipliers a
    mod-2^32-reduced term could overflow int64 under ANSI. Push
    extreme int64 values through every term position and assert the
    mix evaluates (no ANSI overflow) and stays in [0, 2^32)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import _portable_mix32

    big = (1 << 62) + 12345
    df = spark.createDataFrame(
        [(big, big, big), (-big, -big, -big), (0, 0, 0),
         (2**31 - 1, 2**32 - 1, 2**31)],
        "a long, b long, c long",
    )
    rows = df.select(
        _portable_mix32(F.col("a"), F.col("b"), F.col("c")).alias("m")
    ).collect()
    for r in rows:
        assert 0 <= r.m < 1 << 32


def test_hits_fixed_star_hand_case(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        HITS_SCALE as S,
        hits_fixed,
    )

    # 1->10, 2->10, 3->10, 3->11: node 10 is the authority (3 in),
    # node 3 the hub (2 out). After 1 round: a(10)=S, a(11)=S//3;
    # h(3)=S, h(1)=h(2)=S*S div (S + S//3) = 750000.
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (3, 11)], "src int, dst int"
    )
    got = {r.node: (r.hub_scaled, r.auth_scaled)
           for r in hits_fixed(edges, iterations=1).collect()}
    assert got[10] == (0, S)
    assert got[11] == (0, S // 3)
    assert got[3] == (S, 0)
    assert got[1] == (750000, 0) and got[2] == (750000, 0)


def test_vocab_growth_hand_case(spark):
    from dpe_energy_performance_analysis_etl_spark.text.analysis import vocab_growth

    # doc 0: a b; doc 5: a c; doc 9: d — width = 9//3+1 = 4 ->
    # buckets 0 (docs 0-3), 1 (4-7), 2 (8-11)
    df = spark.createDataFrame(
        [(0, "a b"), (5, "a c"), (9, "d")], "doc_id long, text string"
    )
    rows = {r.bucket: r for r in vocab_growth(df, n_buckets=3).collect()}
    assert rows[0].n_new_terms == 2 and rows[0].vocab_cum == 2      # a, b
    assert rows[1].n_new_terms == 1 and rows[1].vocab_cum == 3      # c
    assert rows[2].n_new_terms == 1 and rows[2].vocab_cum == 4      # d
    assert rows[2].bucket_start_doc == 8
