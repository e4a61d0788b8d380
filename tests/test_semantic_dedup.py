"""SemDeDup semantic dedup (dedup/semantic.py): removal semantics,
the no-surviving-near-pair invariant, and the trained-centroid path."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.dedup.semantic import (
    assign_clusters,
    seeded_centroids,
    semantic_dedup,
)


def _vecs(spark):
    """Two tight bundles around orthogonal axes + one outlier.
    ids 0/1 double as the seeded centroids (n_clusters=2)."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 0
        (3, [0.0, 0.998, 0.02]),   # near-dup of 1
        (4, [0.98, 0.0, 0.199]),   # near 0 but below a 0.999 threshold
        (5, [0.0, 0.0, 1.0]),      # outlier: joins some cluster, far from all
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_removes_near_dups_keeps_lowest_id(spark):
    out = semantic_dedup(_vecs(spark), n_clusters=2, threshold=0.99)
    state = {r["id"]: r["kept"] for r in out.collect()}
    assert state[0] and state[1] and state[5]
    assert not state[2] and not state[3]  # dominated by 0 / 1
    assert state[4]  # cos(4, 0) ≈ 0.98 < 0.99 → survives


def test_dup_cosine_reports_strongest_match(spark):
    out = semantic_dedup(_vecs(spark), n_clusters=2, threshold=0.99)
    row = {r["id"]: r for r in out.collect()}
    got = row[2]["dup_cosine"]
    want = 0.999 / math.sqrt(0.999**2 + 0.01**2)
    assert abs(got - want) < 1e-6  # inputs are float32; math is double
    assert row[0]["dup_cosine"] is None


def test_no_surviving_near_pair_within_cluster(spark):
    """The invariant the operator exists for: after dedup, no two
    SURVIVORS in the same cluster sit within the threshold (any such
    pair would have dominated its higher-id member)."""
    vecs = _vecs(spark)
    thr = 0.99
    out = semantic_dedup(vecs, n_clusters=2, threshold=thr)
    kept = out.filter("kept").select("id")
    assigned = assign_clusters(vecs, seeded_centroids(vecs, 2))
    kv = kept.join(assigned, on="id").select("id", "cluster", "v", "nrm")
    a, b = kv.alias("a"), kv.alias("b")
    from dpe_energy_performance_analysis_etl_spark.dedup.embedding import dot_double

    close = (
        a.join(b, F.col("a.cluster") == F.col("b.cluster"))
        .where(F.col("a.id") < F.col("b.id"))
        .where(
            dot_double(F.col("a.v"), F.col("b.v"))
            / (F.col("a.nrm") * F.col("b.nrm"))
            >= thr
        )
        .count()
    )
    assert close == 0


def test_trained_centroids_path(spark):
    """k-means centroids from similarity.ivf slot straight in (same
    schema contract) — the production quantizer."""
    from dpe_energy_performance_analysis_etl_spark.similarity.ivf import (
        train_ivf_centroids,
    )

    vecs = _vecs(spark)
    cents = train_ivf_centroids(vecs, k=2, iterations=2).withColumn(
        "centnorm",
        F.sqrt(
            F.aggregate(
                "centroid", F.lit(0.0), lambda acc, x: acc + x * x
            )
        ),
    )
    out = semantic_dedup(vecs, threshold=0.99, centroids=cents)
    assert out.count() == 6
    assert out.filter("kept").count() < 6  # the exact dup still dies


def test_auto_ivf_path_above_threshold(spark, monkeypatch):
    """Past auto_train_threshold the quantizer must be TRAINED on a
    bounded deterministic sample (not seeded with k ∝ n) — and the
    result is still one row per input with near-dups removed."""
    import dpe_energy_performance_analysis_etl_spark.similarity.ivf as ivf_mod

    calls = {}
    real_train = ivf_mod.train_ivf_centroids

    def spy(df, k=16, iterations=3, vec_col="embedding", id_col="vec_id"):
        calls["k"] = k
        calls["n_train"] = df.count()
        return real_train(df, k=k, iterations=iterations, vec_col=vec_col, id_col=id_col)

    monkeypatch.setattr(ivf_mod, "train_ivf_centroids", spy)
    vecs = _vecs(spark)
    out = semantic_dedup(
        vecs,
        n_clusters=2,
        threshold=0.99,
        auto_train_threshold=0,   # force the large-n path on 6 rows
        train_sample_size=4,      # ~4-row deterministic hash sample
    )
    rows = out.collect()
    assert len(rows) == 6
    assert calls["k"] == 2
    # the trainer saw the hash-sample, not the full corpus
    assert 0 < calls["n_train"] <= 6
    kept = {r.id for r in rows if r.kept}
    assert len(kept) < 6  # near-dups still die under trained centroids


def test_auto_threshold_default_stays_seeded(spark, monkeypatch):
    """Below the threshold nothing trains — the seeded oracle twin is
    untouched by the auto-IVF wiring."""
    import dpe_energy_performance_analysis_etl_spark.similarity.ivf as ivf_mod

    def boom(*a, **k):
        raise AssertionError("train_ivf_centroids must not run below threshold")

    monkeypatch.setattr(ivf_mod, "train_ivf_centroids", boom)
    out = semantic_dedup(_vecs(spark), n_clusters=2, threshold=0.99)
    assert out.count() == 6
