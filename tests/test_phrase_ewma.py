"""Phrase search over the positional index (text/retrieval.py) and
dyadic EWMA smoothing (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from dpe_energy_performance_analysis_etl_spark.operators.temporal import ewma_dyadic
from dpe_energy_performance_analysis_etl_spark.text.retrieval import phrase_search


def test_phrase_search_adjacency(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark join window"),        # one match
            (2, "join spark"),               # wrong order: no match
            (3, "spark x join"),             # gap: no match
            (4, "spark join spark join"),    # two matches
            (5, "nothing here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_matches for r in phrase_search(docs, ["spark", "join"]).collect()}
    assert got == {1: 1, 4: 2}


def test_phrase_search_three_terms(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b x c"), (3, "c a b c a b c")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_matches for r in phrase_search(docs, ["a", "b", "c"]).collect()}
    assert got == {1: 1, 3: 2}


def test_phrase_search_rejects_single_term(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        phrase_search(docs, ["a"])


def test_ewma_dyadic_exact(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, i, t0 + dt.timedelta(minutes=i), float(v))
            for i, v in enumerate([4.0, 8.0, 2.0])]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    got = {r.event_id: r.ewma for r in
           ewma_dyadic(df, "user_id", ["ts", "event_id"], "value", window=8).collect()}
    # Row 0: single sample -> the value itself after renormalization.
    assert got[0] == pytest.approx(4.0, abs=0)
    # Row 1: (8/2 + 4/4) / (1 - 1/4) = 5 / 0.75
    assert got[1] == pytest.approx((8 / 2 + 4 / 4) / 0.75, abs=0)
    # Row 2: (2/2 + 8/4 + 4/8) / (1 - 1/8)
    assert got[2] == pytest.approx((2 / 2 + 8 / 4 + 4 / 8) / 0.875, abs=0)


def test_ewma_window_bound(spark):
    # With window=2 only the trailing two samples contribute.
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, i, t0 + dt.timedelta(minutes=i), float(v))
            for i, v in enumerate([100.0, 1.0, 3.0])]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    got = {r.event_id: r.ewma for r in
           ewma_dyadic(df, "user_id", ["ts", "event_id"], "value", window=2).collect()}
    assert got[2] == pytest.approx((3 / 2 + 1 / 4) / 0.75, abs=0)  # 100 already evicted


def test_ewma_skips_nulls(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, 0, t0, 4.0), (1, 1, t0 + dt.timedelta(minutes=1), None),
            (1, 2, t0 + dt.timedelta(minutes=2), 8.0)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    out = ewma_dyadic(df, "user_id", ["ts", "event_id"], "value").collect()
    assert len(out) == 2  # null row excluded from both output and state
    got = {r.event_id: r.ewma for r in out}
    assert got[2] == pytest.approx((8 / 2 + 4 / 4) / 0.75, abs=0)
