"""Near-duplicate cluster formation: connected components over a
pair graph, plus canonical-document selection.

Pair-producing operators (``shingles.py``, ``minhash.py``,
``simhash.py``, ``embedding.py``) emit EDGES (doc_a, doc_b). A
training-data dedup pipeline needs the transitive closure of those
edges — if A~B and B~C, all three are one duplicate group even when
A~C is below threshold — and then one canonical survivor per group.
(The reference's dedup surface stops at ``drop_duplicates``,
``load.py:188-210``; this is the scale generalization.)

Algorithm: iterative min-label propagation. Every node starts
labeled with its own id; each round, every node takes the min of its
own label and its neighbors' labels; at fixpoint the label is the
component's minimum node id (a deterministic cluster id). Rounds
needed = graph diameter, which for near-dup graphs is small (dup
clusters are dense cliques-ish, diameters of 1-3).

Scale notes (100 TB / 10^9+ nodes):
  - each round is one shuffle (join on node) + one partial-agg
    min — both key-partitioned on node id, so AQE coalesces and
    the partitioning is reused between rounds;
  - ``localCheckpoint`` after each round cuts the lineage so the
    plan doesn't grow by two joins per iteration (at cluster scale
    with dynamic executors, prefer ``checkpoint`` to survive
    executor loss);
  - for adversarial diameters (long chains), switch to the
    alternating small-star/large-star algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") which converges
    in O(log^2 n) rounds; min-label is the right default for dedup
    graphs and is exactly reproducible in SQL (recursive CTE oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    nodes: DataFrame | None = None,
    node_col: str = "doc_id",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components of the undirected graph given by
    ``edges``. Returns (node, component) with component = min node id
    reachable from node. ``nodes`` optionally supplies the full node
    universe so isolated nodes appear as singleton components.
    """
    und = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).unionAll(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    if nodes is not None:
        universe = nodes.select(F.col(node_col).alias("node")).distinct()
    else:
        universe = und.select(F.col("s").alias("node")).distinct()
    und = und.localCheckpoint()
    labels = universe.select("node", F.col("node").alias("comp")).localCheckpoint()
    # Convergence probe: labels only ever DECREASE, so the total
    # sum(comp) is strictly monotone until fixpoint — an O(1)-row
    # aggregate replaces a per-round join-and-compare job.
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]

    for _ in range(max_rounds):
        # Neighbor messages: my comp, proposed to each neighbor.
        msgs = labels.join(und, labels["node"] == und["s"]).select(
            F.col("d").alias("node"), "comp"
        )
        new_labels = (
            labels.unionAll(msgs).groupBy("node").agg(F.min("comp").alias("comp"))
        ).localCheckpoint()
        labels = new_labels
        new_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def dedup_clusters(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Cluster assignment for every document: (doc_id, component,
    cluster_size, is_canonical). Canonical = the component's min id —
    the deterministic survivor a dedup pipeline keeps."""
    labels = connected_components(edges, src=src, dst=dst, nodes=docs, node_col=id_col)
    w = Window.partitionBy("comp")
    return labels.select(
        F.col("node").alias(id_col),
        F.col("comp").alias("component"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    )
