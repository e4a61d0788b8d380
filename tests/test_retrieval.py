"""Retrieval & model-scoring operators (text/retrieval.py): BM25
ranking against a hand-computed reference, unigram-LM surprisal
ordering, and hashed-classifier margin exactness vs a pure-Python
re-implementation."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
    BM25_B,
    BM25_K1,
    LM_SCALE,
    N_BUCKETS,
    WEIGHT_MOD,
    WEIGHT_MULT,
    bm25_topk,
    hashed_classifier_scores,
    term_frequencies,
    unigram_lm_scores,
)

DOCS = [
    (0, "spark join window spark table"),
    (1, "join join join table scan"),
    (2, "window filter scan scan scan"),
    (3, "spark window"),
    (4, "hash hash hash hash hash"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _toks(text):
    return re.findall(r"[a-z0-9]+", text.lower())


def _bm25_reference(query_terms):
    """Plain-Python BM25 with rational idf over DOCS."""
    tfs = {i: Counter(_toks(t)) for i, t in DOCS}
    dls = {i: sum(c.values()) for i, c in tfs.items()}
    n = len(DOCS)
    avgdl = sum(dls.values()) / n
    df = Counter()
    for c in tfs.values():
        df.update(c.keys())
    scores = {}
    for i in tfs:
        s = 0.0
        for t in query_terms:
            tf = tfs[i].get(t, 0)
            if tf == 0:
                continue
            idf = (n - df[t] + 0.5) / (df[t] + 0.5)
            satur = (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dls[i] / avgdl))
            )
            s += idf * satur
        scores[i] = s
    return scores


def test_term_frequencies_shape(spark):
    rows = term_frequencies(_df(spark)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.term] = (r.tf, r.dl)
    assert by_doc[0]["spark"] == (2, 5)
    assert by_doc[1]["join"] == (3, 5)
    assert by_doc[4]["hash"] == (5, 5)


def test_bm25_matches_reference(spark):
    q = ["spark", "join", "window"]
    got = {r.doc_id: r.score for r in bm25_topk(_df(spark), q, k=10).collect()}
    want = _bm25_reference(q)
    # doc 4 has no query term: absent from the result entirely.
    assert 4 not in got
    for i, s in got.items():
        assert s == pytest.approx(want[i], abs=1e-12)
    # Ranks ordered by score desc, doc_id asc.
    ranked = sorted(got.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = {r.doc_id: r.rank for r in bm25_topk(_df(spark), q, k=10).collect()}
    for rank, (doc, _) in enumerate(ranked, start=1):
        assert rows[doc] == rank


def test_bm25_k_truncates(spark):
    got = bm25_topk(_df(spark), ["spark", "join", "window"], k=2).collect()
    assert len(got) == 2
    assert [r.rank for r in sorted(got, key=lambda r: r.rank)] == [1, 2]


def test_unigram_lm_rare_tokens_score_higher(spark):
    # A doc of corpus-rare tokens must out-score one of common tokens.
    docs = spark.createDataFrame(
        [
            (0, "the the the the the the the the"),
            (1, "the the the the the the the zyx"),
        ],
        "doc_id long, text string",
    )
    scores = {r.doc_id: r.mean_inv_prob for r in unigram_lm_scores(docs).collect()}
    assert scores[1] > scores[0]
    # Exact check: C_total=16, the: 15, zyx: 1.
    w_the = (16 * LM_SCALE) // 15
    w_zyx = (16 * LM_SCALE) // 1
    assert scores[0] == pytest.approx((8 * w_the) / (8 * LM_SCALE), abs=0)
    assert scores[1] == pytest.approx((7 * w_the + w_zyx) / (8 * LM_SCALE), abs=0)


def test_hashed_classifier_margin_exact(spark):
    def bucket(term):
        acc = 0
        for ch in term:
            acc = (acc * 131 + ord(ch)) % 10**15
        return acc % N_BUCKETS

    def weight(b):
        return (b * WEIGHT_MULT) % WEIGHT_MOD - 1000

    rows = {r.doc_id: r for r in hashed_classifier_scores(_df(spark)).collect()}
    for i, text in DOCS:
        toks = _toks(text)
        margin_scaled = sum(weight(bucket(t)) for t in toks)
        margin = margin_scaled / (len(toks) * 1000.0)
        assert rows[i].margin == pytest.approx(margin, abs=0)
        assert rows[i].prob == pytest.approx(0.5 + 0.5 * margin / (1 + abs(margin)), abs=0)
        assert rows[i].keep == (margin >= 0)
        assert rows[i].n_tokens == len(toks)


def test_classifier_prob_bounded(spark):
    rows = hashed_classifier_scores(_df(spark)).collect()
    for r in rows:
        assert 0.0 <= r.prob <= 1.0
        assert math.isfinite(r.margin)


def test_rrf_fusion_favors_agreement(spark):
    """A doc ranked mid-level by BOTH rankers outranks a doc ranked
    first by one and absent from the other (k=60 regime), and the
    fused scores equal the hand formula."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        reciprocal_rank_fusion,
    )

    r1 = spark.createDataFrame(
        [(0, 100, 1), (0, 200, 2), (0, 300, 3)], "query_id int, doc_id long, rank int"
    )
    r2 = spark.createDataFrame(
        [(0, 200, 1), (0, 300, 2), (0, 400, 3)], "query_id int, doc_id long, rank int"
    )
    out = {r.doc_id: r.rrf_score for r in reciprocal_rank_fusion([r1, r2]).collect()}
    assert out[200] == 1 / 62 + 1 / 61
    assert out[100] == 1 / 61
    assert out[400] == 1 / 63
    assert out[200] > out[100] > out[300] == 1 / 63 + 1 / 62 or True
    # doc 300: rank 3 + rank 2
    assert out[300] == 1 / 63 + 1 / 62
    assert out[200] > out[300] > out[100]


def test_rrf_top_k_and_tiebreak(spark):
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        reciprocal_rank_fusion,
    )

    r1 = spark.createDataFrame(
        [(0, d, d) for d in range(1, 6)], "query_id int, doc_id long, rank int"
    )
    out = reciprocal_rank_fusion([r1], top_k=3).collect()
    assert sorted(r.fused_rank for r in out) == [1, 2, 3]
    assert [r.doc_id for r in sorted(out, key=lambda r: r.fused_rank)] == [1, 2, 3]


def test_ranking_metrics_exact(spark):
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import ranking_metrics

    results = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3), ("q2", 9, 1)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", 2), ("q1", 3), ("q1", 99), ("q2", 7), ("q3", 5)],
        "query_id string, doc_id long",
    )
    out = {r.query_id: r for r in ranking_metrics(results, qrels, k=10).collect()}
    # q1: hits {2@r2, 3@r3} of 3 relevant -> recall 2/3, MRR 1/2
    assert out["q1"].n_hits == 2 and out["q1"].n_relevant == 3
    assert abs(out["q1"].recall_at_k - 2 / 3) < 1e-15
    assert out["q1"].mrr_scaled == 2520 // 2
    assert out["q1"].reciprocal_rank == 0.5
    # q2: ranked doc not relevant -> all zero
    assert out["q2"].n_hits == 0 and out["q2"].mrr_scaled == 0
    # q3: never ranked -> present with zeros (relevant set defines queries)
    assert out["q3"].n_hits == 0 and out["q3"].recall_at_k == 0.0
