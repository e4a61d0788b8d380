"""Deterministic splits, per-group reservoir sampling
(text/mixing.py) and n-gram extraction (text/analysis.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.text.analysis import ngrams_expr
from dpe_energy_performance_analysis_etl_spark.text.curation import sampling_hash
from dpe_energy_performance_analysis_etl_spark.text.mixing import (
    group_sample_topk,
    split_assign,
)

KNUTH, MOD, DENOM = 2654435761, 2**32, 10000


def _bucket(key: int) -> int:
    return ((key * KNUTH) % MOD) % DENOM


def test_split_assign_matches_hash_and_fractions(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    rows = split_assign(df, "doc_id").collect()
    for r in rows:
        b = _bucket(r.doc_id)
        want = "train" if b < 8000 else ("val" if b < 9000 else "test")
        assert r.split == want
    counts = {s: sum(1 for r in rows if r.split == s) for s in ("train", "val", "test")}
    # Hash buckets approximate the fractions; 2000 keys keeps it loose.
    assert 0.7 < counts["train"] / 2000 < 0.9
    assert counts["train"] + counts["val"] + counts["test"] == 2000


def test_split_assign_stable_under_growth(spark):
    small = {r.doc_id: r.split for r in split_assign(
        spark.range(0, 100).withColumnRenamed("id", "doc_id"), "doc_id").collect()}
    big = {r.doc_id: r.split for r in split_assign(
        spark.range(0, 1000).withColumnRenamed("id", "doc_id"), "doc_id").collect()}
    for k, v in small.items():
        assert big[k] == v  # no migration when the corpus grows


def test_group_sample_topk_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(300)], "doc_id long, grp string"
    )
    a = {(r.grp, r.doc_id): r.sample_rank for r in group_sample_topk(df, ["grp"], "doc_id", k=4).collect()}
    b = {(r.grp, r.doc_id): r.sample_rank
         for r in group_sample_topk(df.repartition(13), ["grp"], "doc_id", k=4).collect()}
    assert a == b  # partitioning-independent
    per_group = {}
    for (g, _), rank in a.items():
        per_group.setdefault(g, []).append(rank)
    for g, ranks in per_group.items():
        assert sorted(ranks) == [1, 2, 3, 4]
    # Rank 1 really is the hash-minimal key of the group.
    for g in per_group:
        members = [i for i in range(300) if "g%d" % (i % 3) == g]
        want_first = min(members, key=lambda i: (_bucket(i), i))
        got_first = [doc for (grp, doc), rank in a.items() if grp == g and rank == 1]
        assert got_first == [want_first]


def test_ngrams_expr_basic_and_short(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "only"), (3, ""), (4, "x y")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.g for r in df.select("doc_id", ngrams_expr("text", 2).alias("g")).collect()}
    assert got[1] == ["a b", "b c", "c d"]
    assert got[2] == []
    assert got[3] == []
    assert got[4] == ["x y"]
    tri = {r.doc_id: r.g for r in df.select("doc_id", ngrams_expr("text", 3).alias("g")).collect()}
    assert tri[1] == ["a b c", "b c d"]
    assert tri[4] == []
