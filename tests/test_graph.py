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


class TestKCorePeel:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src long, dst long")

    def test_clique_survives_pendants_peel(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import kcore_peel

        # K4 on {1,2,3,4} (each degree 3) + chain 4-5-6 (degrees < 3)
        k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        edges = self._edges(spark, k4 + [(4, 5), (5, 6)])
        got = {r["v"]: r["core_degree"] for r in kcore_peel(edges, k=3).collect()}
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_cascading_peel_needs_multiple_rounds(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import kcore_peel

        # path 1-2-3-4-5: 2-core is empty, but only after cascading
        # rounds (endpoints peel first, exposing new endpoints).
        edges = self._edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        assert kcore_peel(edges, k=2).count() == 0
        # a cycle is its own 2-core: nothing peels
        cyc = self._edges(spark, [(1, 2), (2, 3), (3, 1)])
        got = {r["v"]: r["core_degree"] for r in kcore_peel(cyc, k=2).collect()}
        assert got == {1: 2, 2: 2, 3: 2}

    def test_fixed_prefix_matches_fixpoint_when_converged(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import kcore_peel

        k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        edges = self._edges(spark, k4 + [(4, 5), (5, 6), (6, 7)])
        fixed = {(r["v"], r["core_degree"]) for r in kcore_peel(edges, k=3, iterations=4).collect()}
        conv = {(r["v"], r["core_degree"]) for r in kcore_peel(edges, k=3).collect()}
        assert fixed == conv

    def test_direction_and_duplicate_insensitive(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import kcore_peel

        tri = [(1, 2), (2, 3), (3, 1)]
        rev = [(b, a) for a, b in tri]
        got1 = {(r["v"], r["core_degree"]) for r in kcore_peel(self._edges(spark, tri + rev), k=2).collect()}
        got2 = {(r["v"], r["core_degree"]) for r in kcore_peel(self._edges(spark, tri), k=2).collect()}
        assert got1 == got2


def test_lpa_two_cliques_converge_to_min_label(spark):
    """Two disjoint triangles: every node must adopt its clique's
    minimum label within 3 synchronous rounds."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "src long, dst long",
    )
    got = {r.node: r.label for r in label_propagation(edges, iterations=3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_lpa_partitioning_invariance(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.graph import label_propagation

    import random

    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, label_propagation(df, iterations=3).collect()))
    b = sorted(map(tuple, label_propagation(df.repartition(11), iterations=3).collect()))
    assert a == b


def test_lpa_star_adopts_hub_then_leaves(spark):
    """Star graph 0-(1..5): after round 1 the hub takes the min leaf
    label (1) and leaves take the hub's (0); synchronous semantics —
    NOT the sequential variant where the first update leaks."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    got = {r.node: r.label for r in label_propagation(edges, iterations=1).collect()}
    assert got[0] == 1
    assert all(got[i] == 0 for i in range(1, 6))


def test_walks_follow_edges_and_stop_at_sinks(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        deterministic_random_walks,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"  # 4 is a sink
    )
    rows = deterministic_random_walks(edges, walk_len=5, walks_per_node=2).collect()
    eset = {(1, 2), (1, 3), (2, 3), (3, 4)}
    byw = {}
    for r in rows:
        byw.setdefault((r.start, r.walk), {})[r.step] = r.node
    for (start, _w), seq in byw.items():
        assert seq[0] == start
        steps = sorted(seq)
        # consecutive steps traverse real edges; walks end at the sink
        for a, b in zip(steps, steps[1:]):
            assert b == a + 1
            assert (seq[a], seq[b]) in eset
        if max(steps) < 4:
            assert seq[max(steps)] == 4  # only the sink truncates


def test_walks_deterministic_across_partitioning(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        deterministic_random_walks,
    )

    import random

    rng = random.Random(3)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, deterministic_random_walks(df, 4, 2).collect()))
    b = sorted(map(tuple, deterministic_random_walks(df.repartition(9), 4, 2).collect()))
    assert a == b and len(a) > 0


def test_walks_visit_multiple_neighbors(spark):
    """The hash choice must actually spread over neighbors: from a
    hub with 8 out-edges, 16 walks should visit several distinct
    first-step neighbors (a constant pick would visit one)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        deterministic_random_walks,
    )

    edges = [(0, i) for i in range(1, 9)] + [(i, 0) for i in range(1, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = deterministic_random_walks(df, walk_len=2, walks_per_node=16).collect()
    first = {r.node for r in rows if r.start == 0 and r.step == 1}
    assert len(first) >= 4


class TestClusteringCoefficients:
    """cc = 2T/(deg·(deg−1)) — hand-checked triangle+pendant graph."""

    def test_triangle_with_pendant(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import (
            clustering_coefficients,
        )

        edges = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
        got = {
            r["v"]: (r["deg"], r["n_triangles"], r["clustering_coeff"])
            for r in clustering_coefficients(edges).collect()
        }
        assert got["a"] == (2, 1, 1.0)
        assert got["b"] == (2, 1, 1.0)
        assert got["c"] == (3, 1, 2 / 6)
        assert got["d"] == (1, 0, 0.0)

    def test_clique_is_all_ones(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import (
            clustering_coefficients,
        )

        nodes = ["a", "b", "c", "d"]
        edges = _edges(
            spark,
            [(x, y) for x in nodes for y in nodes if x < y],
        )
        got = clustering_coefficients(edges).collect()
        assert all(r["clustering_coeff"] == 1.0 for r in got)
        assert all(r["n_triangles"] == 3 for r in got)


class TestDegreeAssortativity:
    def test_star_is_perfectly_disassortative(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import (
            degree_assortativity,
        )

        edges = _edges(spark, [("h", "l1"), ("h", "l2"), ("h", "l3")])
        row = degree_assortativity(edges).collect()[0]
        assert row["m_directed"] == 6
        assert row["sum_x"] == 12
        assert row["sum_xy"] == 18
        assert row["sum_x2"] == 30
        assert row["assortativity"] == -1.0

    def test_regular_graph_degenerate_variance_is_zero(self, spark):
        """Cycle: every degree equal → zero variance → guarded 0.0."""
        from dpe_energy_performance_analysis_etl_spark.operators.graph import (
            degree_assortativity,
        )

        edges = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        row = degree_assortativity(edges).collect()[0]
        assert row["assortativity"] == 0.0

    def test_direction_and_duplicates_ignored(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import (
            degree_assortativity,
        )

        a = degree_assortativity(
            _edges(spark, [("h", "l1"), ("l1", "h"), ("h", "l2"), ("h", "l3")])
        ).collect()[0]
        assert a["assortativity"] == -1.0


class TestCommunityModularity:
    def test_two_triangles_bridge(self, spark):
        """Two triangles joined by one bridge edge, communities = the
        triangles: the textbook Q = 2·(4·7·3 − 7²)/(4·7²) = 5/14."""
        from dpe_energy_performance_analysis_etl_spark.operators.graph import (
            community_modularity,
        )

        edges = _edges(
            spark,
            [
                ("a", "b"), ("b", "c"), ("c", "a"),
                ("x", "y"), ("y", "z"), ("z", "x"),
                ("c", "x"),
            ],
        )
        comms = spark.createDataFrame(
            [("a", 1), ("b", 1), ("c", 1), ("x", 2), ("y", 2), ("z", 2)],
            "node string, community int",
        )
        rows = {r["community"]: r for r in community_modularity(edges, comms).collect()}
        for c in (1, 2):
            assert rows[c]["n_nodes"] == 3
            assert rows[c]["intra_edges"] == 3
            assert rows[c]["degree_sum"] == 7
            assert rows[c]["q_contrib_num"] == 4 * 7 * 3 - 49
            assert rows[c]["modularity_den"] == 4 * 49
        q = sum(r["q_contrib"] for r in rows.values())
        assert abs(q - 5 / 14) < 1e-15

    def test_whole_graph_one_community_q_is_zero_minus_degree_term(self, spark):
        """Single community: m_c = m, d_c = 2m → contribution
        (4m² − 4m²)/4m² = 0 exactly."""
        from dpe_energy_performance_analysis_etl_spark.operators.graph import (
            community_modularity,
        )

        edges = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        comms = spark.createDataFrame(
            [("a", 1), ("b", 1), ("c", 1)], "node string, community int"
        )
        row = community_modularity(edges, comms).collect()[0]
        assert row["q_contrib_num"] == 0
        assert row["q_contrib"] == 0.0


class TestKtruss:
    def test_k4_survives_pendant_dies(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import ktruss_edges

        # K4 (every edge in 2 triangles) + a pendant edge (4,5)
        k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        edges = spark.createDataFrame(k4 + [(4, 5)], "src long, dst long")
        got = {(r["a"], r["b"]): r["support"] for r in ktruss_edges(edges, k=4).collect()}
        assert set(got) == set(k4)
        assert all(s == 2 for s in got.values())

    def test_shared_edge_two_triangles(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import ktruss_edges

        tri2 = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
        edges = spark.createDataFrame(tri2 + [(4, 5)], "src long, dst long")
        # 3-truss: every triangle edge survives, pendant dies
        got3 = {(r["a"], r["b"]) for r in ktruss_edges(edges, k=3).collect()}
        assert got3 == set(tri2)
        # 4-truss: only (2,3) has support 2, but alone it closes no
        # triangle -> fixpoint is empty
        assert ktruss_edges(edges, k=4).count() == 0


class TestGspSequences:
    def test_hand_case_with_gaps(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            gsp_frequent_sequences,
        )

        rows = []
        for uid, seq in [(1, "abc"), (2, "acb"), (3, "axb")]:
            for i, it in enumerate(seq):
                rows.append((uid, i, i, it))
        ev = spark.createDataFrame(rows, "user_id long, ts long, event_id long, event_type string")
        got = {
            (r["pattern"], r["length"]): r["support"]
            for r in gsp_frequent_sequences(ev, min_support=2, max_len=3).collect()
        }
        assert got[("a", 1)] == 3 and got[("b", 1)] == 3
        # a→b holds for u1 (adjacent), u2 (a..b), u3 (gap over x)
        assert got[("a→b", 2)] == 3
        assert got[("a→c", 2)] == 2
        assert ("b→c", 2) not in got and ("c→b", 2) not in got
        assert not any(ln == 3 for (_, ln) in got)

    def test_triple_found(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
            gsp_frequent_sequences,
        )

        rows = []
        for uid, seq in [(1, "aXbYc"), (2, "abc")]:
            for i, it in enumerate(seq):
                rows.append((uid, i, i, it))
        ev = spark.createDataFrame(rows, "user_id long, ts long, event_id long, event_type string")
        got = {
            (r["pattern"], r["length"]): r["support"]
            for r in gsp_frequent_sequences(ev, min_support=2, max_len=3).collect()
        }
        assert got[("a→b→c", 3)] == 2


class TestBoruvkaMst:
    def test_square_with_diagonal(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import boruvka_mst

        rows = [(1, 2, 1), (2, 3, 2), (3, 4, 4), (4, 1, 3), (1, 3, 10)]
        e = spark.createDataFrame(rows, "src long, dst long, weight long")
        got = {(r["a"], r["b"]): r["weight"] for r in boruvka_mst(e).collect()}
        assert got == {(1, 2): 1, (2, 3): 2, (1, 4): 3}

    def test_long_chain_merges_fully(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import boruvka_mst

        # path 0-1-2-...-30 with increasing weights + heavy chords:
        # MST must be exactly the path (chain-merge stress for the
        # hash-min convergence)
        n = 31
        path = [(i, i + 1, 100 + i) for i in range(n - 1)]
        chords = [(i, i + 2, 10_000 + i) for i in range(n - 2)]
        e = spark.createDataFrame(path + chords, "src long, dst long, weight long")
        got = boruvka_mst(e).collect()
        assert len(got) == n - 1
        assert {(r["a"], r["b"]) for r in got} == {(i, i + 1) for i in range(n - 1)}

    def test_forest_two_components(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import boruvka_mst

        rows = [(1, 2, 5), (2, 3, 6), (10, 11, 1), (11, 12, 2), (10, 12, 9)]
        e = spark.createDataFrame(rows, "src long, dst long, weight long")
        got = boruvka_mst(e).collect()
        assert len(got) == 4  # 2 + 2 edges, no cross edges
        assert sum(r["weight"] for r in got) == 5 + 6 + 1 + 2

    def test_kruskal_cross_check_random(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import boruvka_mst
        import random

        rng = random.Random(17)
        n = 60
        edges = set()
        rows = []
        wseen = set()
        for _ in range(220):
            a, b = rng.randrange(n), rng.randrange(n)
            if a == b:
                continue
            a, b = min(a, b), max(a, b)
            if (a, b) in edges:
                continue
            edges.add((a, b))
            while True:  # distinct weights -> unique MST
                w = rng.randrange(1, 10_000)
                if w not in wseen:
                    wseen.add(w)
                    break
            rows.append((a, b, w))
        # reference Kruskal
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ref_total, ref_edges = 0, 0
        for a, b, w in sorted(rows, key=lambda r: r[2]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
                ref_total += w
                ref_edges += 1
        e = spark.createDataFrame(rows, "src long, dst long, weight long")
        got = boruvka_mst(e).collect()
        assert len(got) == ref_edges
        assert sum(r["weight"] for r in got) == ref_total


class TestDensestSubgraph:
    def test_clique_core_beats_path_fringe(self, spark):
        """K6 (density 15/6 = 2.5) with a 20-node path hanging off it:
        the whole graph's density is lower, so peeling must recover
        exactly the clique."""
        from dpe_energy_performance_analysis_etl_spark.operators.graph import (
            densest_subgraph,
        )

        clique = [(a, b) for a in range(6) for b in range(a + 1, 6)]
        path = [(5 + i, 6 + i) for i in range(1, 20)]  # 6-7, 7-8, ...
        edges = clique + [(5, 6)] + path
        df = spark.createDataFrame(edges, "src long, dst long")
        got = densest_subgraph(df, eps_num=0, eps_den=1, iterations=12).collect()
        assert sorted(r["v"] for r in got) == list(range(6))
        assert got[0]["n_nodes"] == 6 and got[0]["n_edges"] == 15
        assert got[0]["density_scaled"] == (15 << 20) // 6
        assert all(r["deg"] == 5 for r in got)

    def test_fixpoint_mode_matches_fixed_prefix(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.graph import (
            densest_subgraph,
        )

        edges = [(a, b) for a in range(5) for b in range(a + 1, 5)] + [
            (4, 10), (10, 11), (11, 12), (12, 13),
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        fixed = sorted(map(tuple, densest_subgraph(df, 0, 1, iterations=10).collect()))
        free = sorted(map(tuple, densest_subgraph(df, 0, 1, iterations=None).collect()))
        assert fixed == free

    def test_uniform_graph_returns_whole(self, spark):
        """A pure cycle is its own densest subgraph (density 1
        everywhere); best round must be 0 and include every node."""
        from dpe_energy_performance_analysis_etl_spark.operators.graph import (
            densest_subgraph,
        )

        cycle = [(i, (i + 1) % 8) for i in range(8)]
        df = spark.createDataFrame(cycle, "src long, dst long")
        got = densest_subgraph(df, 0, 1, iterations=5).collect()
        assert len(got) == 8
        assert got[0]["best_round"] == 0
        assert got[0]["density_scaled"] == (8 << 20) // 8
