"""Markov transitions and conversion attribution
(operators/temporal.py) on a hand-built event log."""

from __future__ import annotations

import datetime as dt

import pytest

from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
    conversion_attribution,
    event_transitions,
)


def _events(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view -> click -> purchase -> view
        (1, 1, t0 + dt.timedelta(minutes=0), "view"),
        (2, 1, t0 + dt.timedelta(minutes=1), "click"),
        (3, 1, t0 + dt.timedelta(minutes=2), "purchase"),
        (4, 1, t0 + dt.timedelta(minutes=3), "view"),
        # user 2: click -> click (no purchase)
        (5, 2, t0 + dt.timedelta(minutes=0), "click"),
        (6, 2, t0 + dt.timedelta(minutes=5), "click"),
        # user 3: purchase immediately (no prior events)
        (7, 3, t0 + dt.timedelta(minutes=0), "purchase"),
        # user 4: equal timestamps — event_id breaks the tie
        (8, 4, t0, "view"),
        (9, 4, t0, "purchase"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_transitions_counts_and_probs(spark):
    got = {
        (r.prev_type, r.next_type): (r.n, r.prob)
        for r in event_transitions(_events(spark)).collect()
    }
    # user1: view->click, click->purchase, purchase->view
    # user2: click->click ; user4: view->purchase (tie broken by id)
    assert got[("view", "click")] == (1, 0.5)
    assert got[("view", "purchase")] == (1, 0.5)
    assert got[("click", "purchase")] == (1, 0.5)
    assert got[("click", "click")] == (1, 0.5)
    assert got[("purchase", "view")] == (1, 1.0)
    assert sum(n for n, _ in got.values()) == 5
    for (prev, _), (_, p) in got.items():
        total = sum(p2 for (pv, _), (_, p2) in got.items() if pv == prev)
        assert total == pytest.approx(1.0)


def test_attribution_first_last(spark):
    got = {r.user_id: r for r in conversion_attribution(_events(spark)).collect()}
    assert set(got) == {1, 3, 4}  # user 2 never converts
    assert got[1].first_touch == "view"
    assert got[1].last_touch == "click"
    assert got[1].n_prior_events == 2
    # user 3 converts with no history: NULL touches, zero prior.
    assert got[3].first_touch is None and got[3].last_touch is None
    assert got[3].n_prior_events == 0
    # user 4: tie timestamp, event 8 (view) sorts before purchase 9.
    assert got[4].first_touch == "view" and got[4].last_touch == "view"
    assert got[4].n_prior_events == 1
