"""DSIR importance scoring (text/importance.py): exact-count affinity
semantics and the log-likelihood-ratio scorer vs a numpy reference."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.text.importance import (
    dsir_log_ratio,
    importance_score,
    unigram_counts,
)

DOCS = [
    (0, "the spark engine shuffles data across the cluster", "en"),
    (1, "spark broadcast joins avoid the shuffle entirely", "en"),
    (2, "le moteur distribue les donnees sur le cluster", "fr"),
    (3, "les jointures diffusees evitent le shuffle", "fr"),
    (4, "spark spark spark cluster cluster the", "en"),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )


def _target(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, lang in DOCS if lang == "en"], "doc_id long, text string"
    )


def _toks(text):
    return re.findall(r"[a-z0-9]+", text.lower())


def test_unigram_counts_exact(spark):
    got = {r["tok"]: r["cnt"] for r in unigram_counts(_df(spark)).collect()}
    want = Counter(t for _, text, _ in DOCS for t in _toks(text))
    assert got == dict(want)


def test_affinity_matches_hand_computation(spark):
    out = {
        r["doc_id"]: r for r in importance_score(_df(spark), _target(spark)).collect()
    }
    tvoc = Counter(t for _, text, lang in DOCS if lang == "en" for t in _toks(text))
    rvoc = Counter(t for _, text, _ in DOCS for t in _toks(text))
    t_total, r_total = sum(tvoc.values()), sum(rvoc.values())
    for doc_id, text, _ in DOCS:
        toks = _toks(text)
        tm = sum(tvoc.get(t, 0) for t in toks)
        rm = sum(rvoc.get(t, 0) for t in toks)
        row = out[doc_id]
        assert (row["n_tokens"], row["target_mass"], row["ref_mass"]) == (
            len(toks), tm, rm,
        )
        assert row["affinity"] == (tm * float(r_total)) / (rm * float(t_total))


def test_target_language_scores_higher(spark):
    out = {r["doc_id"]: r["affinity"] for r in importance_score(_df(spark), _target(spark)).collect()}
    en = [out[i] for i, _, lang in DOCS if lang == "en"]
    fr = [out[i] for i, _, lang in DOCS if lang == "fr"]
    assert min(en) > max(fr)


def test_log_ratio_matches_numpy_reference(spark):
    got = {r["doc_id"]: r for r in dsir_log_ratio(_df(spark), _target(spark)).collect()}
    tvoc = Counter(t for _, text, lang in DOCS if lang == "en" for t in _toks(text))
    rvoc = Counter(t for _, text, _ in DOCS for t in _toks(text))
    vocab = set(tvoc) | set(rvoc)
    t_total, r_total, v = sum(tvoc.values()), sum(rvoc.values()), len(vocab)
    for doc_id, text, _ in DOCS:
        want = sum(
            math.log((tvoc.get(t, 0) + 1) / (t_total + v))
            - math.log((rvoc.get(t, 0) + 1) / (r_total + v))
            for t in _toks(text)
        )
        assert abs(got[doc_id]["log_ratio"] - want) < 1e-9
        assert got[doc_id]["n_tokens"] == len(_toks(text))


def test_log_ratio_favors_target_language(spark):
    got = {r["doc_id"]: r["log_ratio"] for r in dsir_log_ratio(_df(spark), _target(spark)).collect()}
    en = [got[i] for i, _, lang in DOCS if lang == "en"]
    fr = [got[i] for i, _, lang in DOCS if lang == "fr"]
    assert min(en) > max(fr)
