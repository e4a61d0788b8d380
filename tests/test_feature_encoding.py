"""Leave-one-out target encoding (operators/aggregate.py) and the
feature-hashing trick (operators/relational.py)."""

from __future__ import annotations

import pytest

from dpe_energy_performance_analysis_etl_spark.operators.aggregate import target_encode_loo
from dpe_energy_performance_analysis_etl_spark.operators.relational import (
    feature_hash_indices,
)


def test_target_encode_loo_exact(spark):
    rows = [(1, "a", 10.00), (2, "a", 20.00), (3, "a", 30.00), (4, "b", 5.50), (5, "b", 6.50), (6, "c", 99.99)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    got = {r.id: r.cat_target_enc for r in target_encode_loo(df, "cat", "y").collect()}
    assert got[1] == pytest.approx((20 + 30) / 2, abs=0)
    assert got[2] == pytest.approx((10 + 30) / 2, abs=0)
    assert got[4] == pytest.approx(6.50, abs=0)
    assert got[5] == pytest.approx(5.50, abs=0)
    assert got[6] is None  # singleton group: no peers, no leak


def test_target_encode_no_self_leakage(spark):
    # The encoding for a row must not move when ONLY that row's own
    # target changes (holding peers fixed).
    base = [(1, "a", 10.0), (2, "a", 20.0)]
    changed = [(1, "a", 999.0), (2, "a", 20.0)]
    enc = lambda rows: {
        r.id: r.cat_target_enc
        for r in target_encode_loo(
            spark.createDataFrame(rows, "id long, cat string, y double"), "cat", "y"
        ).collect()
    }
    assert enc(base)[1] == enc(changed)[1] == 20.0


def test_feature_hash_shape(spark):
    df = spark.createDataFrame(
        [(1, "HOUSEHOLD", 3), (2, "MACHINERY", 3)], "id long, seg string, nk int"
    )
    got = {r.id: r.feature_idx for r in feature_hash_indices(df, ["seg", "nk"], 64).collect()}
    for idxs in got.values():
        assert 1 <= len(idxs) <= 2
        assert all(0 <= i < 64 for i in idxs)
        assert idxs == sorted(idxs)
    # Same nk value -> the nk-derived index is shared across rows.
    shared = set(got[1]) & set(got[2])
    assert len(shared) >= 1


def test_feature_hash_deterministic(spark):
    df = spark.createDataFrame([(i, f"v{i % 7}", i % 3) for i in range(50)],
                               "id long, seg string, nk int")
    a = {r.id: r.feature_idx for r in feature_hash_indices(df, ["seg", "nk"]).collect()}
    b = {r.id: r.feature_idx
         for r in feature_hash_indices(df.repartition(5), ["seg", "nk"]).collect()}
    assert a == b
