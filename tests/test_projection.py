"""Rademacher JL projection (similarity/projection.py) vs a numpy
reference, plus the JL norm-concentration property."""

from __future__ import annotations

import numpy as np
import pytest

from dpe_energy_performance_analysis_etl_spark.similarity.projection import (
    J_STRIDE,
    KNUTH,
    project_embeddings,
)

D_IN, D_OUT = 16, 4


def _sign(i: int, j: int) -> float:
    return 1.0 if (i * KNUTH + j * J_STRIDE) % 2 == 0 else -1.0


def _reference(vec):
    out = []
    for j in range(D_OUT):
        acc = 0.0
        for i, v in enumerate(vec):
            acc += float(np.float32(v)) * _sign(i, j)
        out.append(acc / np.sqrt(float(D_OUT)))
    return out


def test_projection_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    vecs = [(k, [float(x) for x in rng.normal(size=D_IN).astype(np.float32)]) for k in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = {r.vec_id: r for r in
            project_embeddings(df, "embedding", D_IN, D_OUT).collect()}
    for k, vec in vecs:
        want = _reference(vec)
        got = [rows[k][f"p_{j}"] for j in range(D_OUT)]
        assert got == pytest.approx(want, rel=1e-12)
        orig_sq = sum(float(np.float32(v)) ** 2 for v in vec)
        proj_sq = sum(g * g for g in got)
        assert rows[k].norm_ratio == pytest.approx(proj_sq / orig_sq, rel=1e-12)


def test_projection_norm_concentration(spark):
    # With d_out = 32 of d_in = 64, the JL ratio concentrates near 1:
    # mean over 200 random vectors within 15%.
    rng = np.random.default_rng(11)
    vecs = [(k, [float(x) for x in rng.normal(size=64).astype(np.float32)]) for k in range(200)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    ratios = [r.norm_ratio for r in project_embeddings(df, "embedding", 64, 32).collect()]
    assert 0.85 < float(np.mean(ratios)) < 1.15


def test_projection_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * D_IN)], "vec_id long, embedding array<float>"
    )
    r = project_embeddings(df, "embedding", D_IN, D_OUT).collect()[0]
    assert r.norm_ratio == 0.0
    assert all(r[f"p_{j}"] == 0.0 for j in range(D_OUT))
