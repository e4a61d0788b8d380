"""Exact-integer PageRank (operators/graph.py): hand-computed ranks,
partitioning invariance, dangling-node behavior, hub dominance."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.operators.graph import (
    SCALE,
    pagerank_fixed,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _ranks(df):
    return {r["node"]: r["rank_scaled"] for r in df.collect()}


def test_two_node_cycle_hand_computed(spark):
    """a<->b: every iteration each node receives the other's full
    rank. r1 = 0.15S + 0.85S = S exactly, forever."""
    got = _ranks(pagerank_fixed(_edges(spark, [("a", "b"), ("b", "a")]), 3))
    assert got == {"a": SCALE, "b": SCALE}


def test_star_hub_dominates(spark):
    """Leaves point at the hub; hub points back. After iteration 1:
    hub = 0.15S + 0.85·3S; leaves = 0.15S + 0.85·(hub_r0/3)."""
    edges = [("l1", "h"), ("l2", "h"), ("l3", "h"), ("h", "l1"), ("h", "l2"), ("h", "l3")]
    got = _ranks(pagerank_fixed(_edges(spark, edges), 1))
    assert got["h"] == 150_000_000_000 + (85 * 3 * SCALE) // 100
    leaf = 150_000_000_000 + (85 * (SCALE // 3)) // 100
    assert got["l1"] == got["l2"] == got["l3"] == leaf


def test_dangling_node_keeps_base_rank(spark):
    """b has no out-edges: it receives but never contributes; a
    receives nothing → damped base only."""
    got = _ranks(pagerank_fixed(_edges(spark, [("a", "b")]), 2))
    assert got["a"] == 150_000_000_000
    assert got["b"] > got["a"]


def test_partitioning_invariance_bit_exact(spark):
    edges = [(f"n{i}", f"n{(i * 3 + 1) % 50}") for i in range(200)]
    a = _ranks(pagerank_fixed(_edges(spark, edges).repartition(2), 4))
    b = _ranks(pagerank_fixed(_edges(spark, edges).repartition(23), 4))
    assert a == b


def test_duplicate_edges_collapse(spark):
    once = _ranks(pagerank_fixed(_edges(spark, [("a", "b"), ("b", "a")]), 2))
    dup = _ranks(
        pagerank_fixed(_edges(spark, [("a", "b"), ("a", "b"), ("b", "a")]), 2)
    )
    assert once == dup
