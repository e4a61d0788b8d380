"""Fixed-iteration PageRank in exact integer arithmetic — the
iterative-algorithm pattern (join → aggregate → recompute) as plain
DataFrame ops, like the connected-components operator
(``dedup/cluster.py``) but with numeric state.

Why integers: float PageRank sums contributions in partition order —
every run (and every engine) gets a different last ulp, which is
poison for reproducible pipelines and for this repo's value-hash
gate. Scaled-integer ranks (1.0 ≡ 10^12) with FLOOR division make
every iteration a pure function of the input: bit-identical across
partitionings, engines, and reruns. The truncation error is ≤ 1
scaled unit (10^-12) per hop — noise relative to PageRank's own
damping-limited precision.

Update rule per node v (damping d = num/den):

    r'(v) = (1-d)·S + d · Σ_{u→v} (r(u) // outdeg(u))

with S = 10^12, all ops in int64 (ranks stay ≤ S·N/den-ish; ANSI
aborts loudly on any overflow rather than wrapping).

Scale shape: one src-keyed equi-join (ranks ⋈ edges) plus one
dst-keyed aggregation per iteration — both partial-agg/shuffle
bounded by |E|; the rank table is |V|. ``localCheckpoint`` every few
rounds cuts the lineage exactly as the CC operator does (checkpoint
on a real cluster). Dangling nodes (no out-edges) keep their damped
base rank and leak the rest — the classic simplification; pass
symmetric edges if you need conservation.

Public references: Page et al. 1999; the join-agg formulation is the
standard Pregel-free relational PageRank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SCALE = 10**12
HITS_SCALE = 10**6


def pagerank_fixed(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """(node, rank_scaled) after ``iterations`` exact-integer rounds
    over the DISTINCT edge set. Nodes = everything appearing as src
    or dst; initial rank = 10^12 each."""
    # The edge/degree/node tables are STATIC across iterations but sit
    # upstream of every round's join — uncached, each of the
    # 2·iterations actions re-derives them from source (measured 3.7x
    # on the supplier graph at sf1: 19.1 s -> 5.2 s with caching).
    # Out-degree rides a per-src window on the edge table itself (one
    # hash(src) exchange) instead of a separate deg table: each round
    # then runs ONE |E|-keyed join instead of ranks⋈deg followed by
    # ⋈e, and the cached table is hash-partitioned AND sorted on src,
    # so the per-round sort-merge join reads the cached layout with no
    # re-exchange of the static |E| side (guide §2.4: share one
    # exchange across operations keyed the same way).
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    ew = e.withColumn(
        "deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
    ).cache()
    nodes = (
        ew.select(F.explode(F.array("src", "dst")).alias("node"))
        .distinct()
        .cache()
    )
    # Materialize BOTH static caches in one job BEFORE the rounds are
    # planned: an InMemoryRelation over an unfinished AdaptiveSparkPlan
    # reports unknown partitioning, so a single-action plan re-exchanges
    # + re-sorts the cached side every round; once materialized, the
    # planner sees the final hash(src)/hash(node) layouts and every
    # round's sort-merge join reads them exchange-free (r12; probe:
    # cached-window join plans Exchange+Sort un-materialized, bare
    # InMemoryTableScan after a count).
    nodes.count()
    ranks = nodes.withColumn("rank_scaled", F.lit(SCALE).cast("long"))

    base = (damping_den - damping_num) * SCALE // damping_den
    for i in range(iterations):
        contrib = (
            ranks.join(ew, ranks["node"] == ew["src"], "inner")
            .select(
                F.col("dst").alias("node"),
                # SQL `div` = true int64 division: `floor(a / b)` would
                # route through a double and lose exactness past 2^53
                F.expr("rank_scaled div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = nodes.join(contrib, on="node", how="left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.expr(
                    f"({damping_num} * coalesce(inc, 0L)) div {damping_den}"
                )
            ).alias("rank_scaled"),
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """(src, dst, n): ordered within-basket co-occurrence pairs with
    multiplicity — src < dst, n = Σ over baskets of (#src copies ×
    #dst copies), support-floored. The basket-array replan (r12) of
    the self-equi-join `x ⋈ y ON basket AND x.item < y.item`:
    ONE shuffle of (basket, item) + a row-local sorted-array pair
    explode (bounded by basket size²) replaces the sort-merge
    self-join — measured 2.94 -> 1.81 s min-of-3 same-session on the
    sf0.1 lineitem part graph, byte-identical output (exceptAll both
    ways = 0). Duplicate items inside a basket keep the join's
    multiplicity: the array is sorted, so every (i < j) position pair
    with values a < b appears exactly n_a·n_b times."""
    b = df.groupBy(F.col(basket_col).alias("__bk")).agg(
        F.sort_array(F.collect_list(F.col(item_col))).alias("__ps")
    )
    pairs = b.select(
        F.explode(
            F.expr(
                """
                flatten(transform(__ps, (x, i) ->
                  transform(
                    filter(slice(__ps, i + 2, greatest(size(__ps) - i - 1, 0)),
                           y -> y > x),
                    y -> struct(x AS src, y AS dst))))
                """
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    out = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    if min_support > 1:
        out = out.where(F.col("n") >= min_support)
    return out


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected simple graph.

    Degree-oriented enumeration (the standard MPC/MapReduce algorithm
    — Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    Last Reducer", WWW'11): orient every edge from the lower-ranked
    endpoint to the higher, rank = (degree, id). Each triangle
    {a,b,c} is then enumerated EXACTLY once from its lowest-ranked
    vertex, and the join fan-out per vertex is its out-degree under
    the orientation, which is O(sqrt(|E|)) for any graph (arboricity
    bound) — this is what kills the "curse of the last reducer" that
    a naive adjacency self-join has on hub nodes.

    Plan shape: degree agg (one shuffle) → broadcast-or-shuffle rank
    join → oriented wedge self-join on the middle vertex → edge
    existence semi-join → per-corner count aggregation. Everything is
    equi-keyed; nothing is quadratic in a hub's degree.

    Input may contain both directions or duplicates; it is
    canonicalized to distinct undirected pairs first. Self-loops are
    dropped.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # The canonical edge table feeds FOUR subtrees (degrees, rank
        # join, wedge closing, per-corner counts) — uncached, Catalyst
        # re-derives it from the raw input each time (measured 17.3 s
        # -> the edge build dominated; same lesson as the PageRank
        # edge cache). MEMORY_AND_DISK, |E| rows.
        .cache()
    )
    both = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = both.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).withColumnRenamed("a", "v")

    # Orient u -> w iff (deg(u), u) < (deg(w), w).
    dl = deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "deg_a")
    dr = deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "deg_b")
    ranked = e.join(dl, "a").join(dr, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"),
    )

    # Wedges centered at the lowest-ranked vertex u: (u -> w1, u -> w2).
    o1 = oriented.select(F.col("u"), F.col("w").alias("w1"))
    o2 = oriented.select(F.col("u"), F.col("w").alias("w2"))
    wedges = o1.join(o2, "u").filter(F.col("w1") < F.col("w2"))

    # A wedge closes iff the undirected edge {w1, w2} exists.
    closing = e.select(F.col("a").alias("w1"), F.col("b").alias("w2"))
    triangles = wedges.join(closing, ["w1", "w2"])

    # One explode, not a 3-way unionAll of the same subtree — the
    # union form re-evaluates the wedge join three times (measured 3x
    # the whole operator's cost; Catalyst does not share non-cached
    # subtrees across union branches).
    per_corner = (
        triangles.select(F.explode(F.array("u", "w1", "w2")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(per_corner, "v", "left").select(
        "v",
        "deg",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
    )


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    iterations: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core peeling (Seidman 1983; the Batagelj-Zaversnik bulk
    variant): repeatedly delete vertices of degree < k together with
    their edges. Returns (v, core_degree) for vertices still holding
    degree >= k after the final round.

    ``iterations=None`` peels to the FIXPOINT — one edge-count action
    per round as the convergence probe (counts can only shrink, and an
    unchanged edge count implies an unchanged vertex set, so the count
    doubles as a checksum — the single-action lesson from the star-CC
    operator). A fixed ``iterations`` runs exactly that many rounds —
    the deterministic prefix an external replayer (the SQL oracle's
    chained CTEs) can reproduce, since peeling is confluent: bulk
    rounds are a pure function of the input graph.

    Scale shape per round: one degree aggregation (explode both
    endpoints — NOT a unionAll of two selects, which would evaluate
    the edge subtree twice) and two vertex-keyed semi-joins, all
    equi-keyed on vertex ids; |E| can only shrink. The edge table is
    re-cached per round and the parent uncached (lineage one round
    deep; localCheckpoint/checkpoint on a real cluster for very deep
    peels).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )

    def degrees(ed: DataFrame) -> DataFrame:
        return (
            ed.select(F.explode(F.array("a", "b")).alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    prev_count = e.count() if iterations is None else None
    rounds = 0
    while iterations is None or rounds < iterations:
        # keep feeds both semi-joins: its degree-agg re-runs per
        # consumer, but over the CACHED edge table — two cheap scans
        # of memory, not two rebuilds of the peel lineage.
        keep = degrees(e).where(F.col("deg") >= k).select("v")
        nxt = (
            e.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b")
            # eager localCheckpoint, NOT cache+unpersist-parent: the
            # parent unpersist cascades into the child's cache entry
            # (plan-subtree match) and every round then re-peels from
            # scratch — the BFS/LPA fix applied here (measured 5.6 s →
            # see NOTES round-5; checkpoint() on a real cluster)
            .localCheckpoint()
        )
        e.unpersist()
        e = nxt
        rounds += 1
        if iterations is None:
            # the count is ONLY the fixpoint probe — a fixed-round
            # prefix skips it (the eager checkpoint already
            # materialized the round; one job per round, not two)
            n = nxt.count()
            if n == prev_count:
                break
            prev_count = n
    out = degrees(e).where(F.col("deg") >= k).select(
        F.col("v"), F.col("deg").alias("core_degree")
    )
    return out


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, the LPA
    community detector — GraphX/GraphFrames ship the same variant):
    every node starts with its own id as label; each round it adopts
    the most frequent label among its neighbors, ties broken by the
    SMALLEST label. Returns (node, label) after ``iterations`` rounds.

    Determinism: the textbook algorithm breaks ties randomly and
    updates asynchronously — both engine-hostile. Synchronous rounds +
    min-label tie-break make every round a pure function of the
    previous labeling, so a fixed unrolling replays bit-identically in
    SQL (the pagerank/k-core oracle pattern).

    Scale shape per round: one edge⋈labels equi-join (|E| rows), one
    (node, label) count aggregation — map-side combinable, hot
    communities collapse early — and one min_by argmax per node. The
    static symmetrized edge table is cached once; each round's label
    table is an EAGER localCheckpoint — cache+unpersist-parent is a
    trap here, because the child's plan contains the parent as a
    subtree and the unpersist CASCADES into the child's cache, so
    every round recomputed the whole chain (measured 19.9 s → 8.2 s
    cold-cache at sf0.1 switching to checkpoints; checkpoint() on a
    real cluster)."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.explode(F.array(F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
                                  F.struct(F.col("v").alias("s"), F.col("u").alias("d")))).alias("x"))
        .select(F.col("x.s").alias("s"), F.col("x.d").alias("d"))
        .distinct()
        # cache hash-partitioned + sorted on the per-round join key:
        # the distinct's (s, d) layout forced every round's sort-merge
        # join to re-exchange AND re-sort the static |E| side (r12;
        # guide §2.4 — one layout, reused by all rounds)
        .repartition("s")
        .sortWithinPartitions("s")
        .cache()
    )
    nodes = e.select(F.col("s").alias("node")).distinct().cache()
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint()
    for _ in range(iterations):
        counts = (
            e.join(labels, e["s"] == labels["node"])
            .select(F.col("d").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            counts.groupBy("node")
            .agg(
                F.min_by(
                    "label", F.struct((-F.col("c")).alias("nc"), F.col("label").alias("l"))
                ).alias("label")
            )
            # eager: materializes AND truncates lineage, immune to the
            # cascade invalidation cache+unpersist-parent suffers
            .localCheckpoint()
        )
    return labels


def _portable_mix32(*terms):
    """Nonlinear 32-bit mix of integer column terms (the bootstrap
    xor-shift-multiply finalizer) — SQL-replayable, ANSI-safe: every
    per-term multiplier is ≤ 0x45d9f3b, so a mod-2^32-reduced term
    times its multiplier stays < 2^32 * 0x45d9f3b ≈ 3.1e17 and the
    ≤4-term sum < 1.3e18, both well inside int64 (the earlier
    2246822519/2654435761 multipliers could push a reduced term to
    ~1.1e19 — an ANSI overflow; latent then, impossible now)."""
    M = F.lit(73244475)  # 0x45d9f3b
    s = F.lit(0).cast("bigint")
    muls = [F.lit(1), F.lit(40503), F.lit(73244475), F.lit(5381)]
    for i, t in enumerate(terms):
        # pmod, not %: Spark's % keeps the dividend's sign, so a
        # negative term would leak a negative value through the xor/
        # shift chain. pmod == % on the non-negative inputs the SQL
        # twin sees, so the oracle form is unchanged.
        s = s + F.pmod(t.cast("bigint"), F.lit(4294967296)) * muls[min(i, len(muls) - 1)]
    s = s % F.lit(4294967296)
    s = (s.bitwiseXOR(F.shiftright(s, 16)) * M) % F.lit(4294967296)
    return s.bitwiseXOR(F.shiftright(s, 16))


def deterministic_random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """DeepWalk-style walk corpus (Perozzi et al. KDD'14) with HASHED
    instead of random neighbor choices: walk w from node v picks, at
    step k, neighbor index mix(cur, w, k) mod degree — every engine,
    every rerun, every partitioning generates the IDENTICAL corpus
    (the published recipe uses RNG; hashing the walk state is the
    reproducible equivalent, the fim_transform pattern). Output rows
    (start, walk, step, node), step 0 = the start node; feed to the
    skip-gram/SGNS operators (negative_sampling_table) for embedding
    training data.

    Scale shape per step: the walker table joins (1) the degree table
    on cur — computes the pick index — then (2) the indexed neighbor
    table on the COMPOSITE key (cur, idx): both fully equi-keyed,
    O(#walkers) probe rows per step, never O(|E|) fan-out (matching
    all neighbors then filtering would touch deg rows per walker).
    Walks stop early at sinks (no out-neighbors). The indexed
    neighbor and degree tables are cached once and reused by every
    step."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    w_idx = Window.partitionBy("u").orderBy("v")
    nbrs = e.select(
        "u", "v", (F.row_number().over(w_idx) - 1).alias("idx")
    ).cache()
    degs = nbrs.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).cache()
    starts = degs.select(F.col("u").alias("start")).withColumn(
        "walk", F.explode(F.array(*[F.lit(i) for i in range(walks_per_node)]))
    )
    cur = starts.select(
        "start", "walk", F.lit(0).alias("step"), F.col("start").alias("node")
    )
    out = cur
    for k in range(1, walk_len):
        pick = _portable_mix32(F.col("node"), F.col("walk"), F.lit(k)) % F.col("deg")
        walkers = (
            cur.join(degs, cur["node"] == degs["u"])
            .withColumn("pick", pick)
            .select("start", "walk", F.col("node").alias("cur"), "pick")
        )
        stepped = walkers.join(
            nbrs,
            (walkers["cur"] == nbrs["u"]) & (walkers["pick"] == nbrs["idx"]),
        ).select("start", "walk", F.lit(k).alias("step"), F.col("v").alias("node"))
        out = out.unionByName(stepped)
        cur = stepped
    return out


def walk_skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """Skip-gram (center, context) training pairs from a walk corpus
    (the DeepWalk/node2vec step between ``deterministic_random_walks``
    and SGNS embedding training — Perozzi KDD'14 §4.2): within each
    walk, every ordered pair of nodes at step distance 1..window
    becomes a pair; multiplicity is kept as a count (the SGNS loss
    weights pairs by frequency).

    Scale shape: one self-equi-join on the (start, walk) walk id —
    fan-out bounded at walk_len² per walk, never corpus-wide — then a
    (center, context) count aggregation. The walk table feeds both
    join sides, so it is cached (bounded: walks_per_node * walk_len
    rows per node; the subtree-re-evaluation rule).

    Returns (center, context, n_pairs).
    """
    w = walks.select("start", "walk", "step", "node").cache()
    a, b = w.alias("a"), w.alias("b")
    dist = F.col("b.step") - F.col("a.step")
    pairs = a.join(
        b,
        (F.col("a.start") == F.col("b.start"))
        & (F.col("a.walk") == F.col("b.walk"))
        & (dist != 0)
        & (F.abs(dist) <= window),
    ).select(
        F.col("a.node").alias("center"), F.col("b.node").alias("context")
    )
    return pairs.groupBy("center", "context").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


LP_RA_SCALE = 10**9


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 2,
    max_middle_degree: int | None = None,
) -> DataFrame:
    """Neighborhood-based link prediction (Liben-Nowell & Kleinberg,
    CIKM'03) over an undirected simple graph: for every non-adjacent
    pair at distance 2, the three classic scores —

      * common_neighbors: |Γ(u) ∩ Γ(v)| (integer);
      * preferential_attachment: deg(u)·deg(v) (integer);
      * resource_allocation (Zhou et al. 2009): Σ_z 1/deg(z) over
        common neighbors z, computed as the INTEGER-scaled
        Σ (10^9 div deg(z)) — exact BIGINT, order-free addition, no
        float accumulation anywhere (cross-engine hash-stable; the
        floor error is < |common| units of 10^-9, far below any
        ranking decision).

    Candidate generation is the wedge join on the shared middle z —
    equi-keyed, never all-pairs; a hub middle contributes deg(z)²
    wedges, so ``max_middle_degree`` optionally drops super-hub
    middles (the standard curse-of-the-last-reducer guard; RA itself
    down-weights them to ~0, so the ranking is barely touched —
    callers choose the cap knowingly). Existing edges are removed by
    a left-anti join; ``min_common`` bounds the output.

    Returns (u, v, common_neighbors, preferential_attachment,
    ra_scaled) with u < v.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .cache()  # feeds adjacency, degrees, and the anti-join
    )
    adj = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).select(
        F.col("a").alias("z"), F.col("b").alias("nbr")
    )
    # deg feeds three consumers (wedge left side, du, dv) — uncached,
    # the |V|-sized final aggregation re-runs per consumer (r12; the
    # map side dedupes via ReusedExchange, the post-shuffle agg does
    # not). |V| rows, cheap to hold.
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).cast("bigint").alias("deg")).cache()
    mids = adj.join(deg, "z")
    if max_middle_degree is not None:
        mids = mids.filter(F.col("deg") <= max_middle_degree)
    left = mids.select("z", F.col("nbr").alias("u"), F.col("deg"))
    # the right wedge side never reads deg: plain adjacency, so the
    # data-sized adj⋈deg join executes ONCE (it was consumed by both
    # wedge sides and re-ran per branch — joins above deduplicated
    # exchanges still re-execute per consumer, r12)
    right = adj.select("z", F.col("nbr").alias("v"))
    if max_middle_degree is not None:
        right = (
            adj.join(deg, "z")
            .filter(F.col("deg") <= max_middle_degree)
            .select("z", F.col("nbr").alias("v"))
        )
    wedges = left.join(right, "z").filter(F.col("u") < F.col("v"))
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
        # SQL `div` = exact int64 floor division (a double `/` would
        # round past 2^53 — same rule as the PageRank contributions)
        F.sum(F.expr(f"{LP_RA_SCALE} div deg")).cast("bigint").alias("ra_scaled"),
    )
    non_edges = scored.join(
        e,
        (scored["u"] == e["a"]) & (scored["v"] == e["b"]),
        "left_anti",
    ).filter(F.col("common_neighbors") >= min_common)
    du = deg.select(F.col("z").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("z").alias("v"), F.col("deg").alias("deg_v"))
    return non_edges.join(du, "u").join(dv, "v").select(
        "u",
        "v",
        "common_neighbors",
        (F.col("deg_u") * F.col("deg_v")).cast("bigint").alias(
            "preferential_attachment"
        ),
        "ra_scaled",
    )


def landmark_bfs_distances(
    edges: DataFrame,
    n_landmarks: int = 4,
    max_depth: int = 4,
    src: str = "src",
    dst: str = "dst",
    sources: DataFrame | None = None,
) -> DataFrame:
    """Multi-source BFS from deterministic landmarks — the distance
    primitive behind landmark/sketch-based shortest-path estimation
    (Potamias et al., CIKM'09): exact hop distances from the
    ``n_landmarks`` SMALLEST node ids (deterministic, portable — no
    RNG) out to ``max_depth`` hops over the undirected graph.

    Per round: the depth-(r-1) frontier equi-joins the adjacency list
    and an anti-join against the visited set keeps first discoveries
    only — O(Σ frontier degrees) per round, the textbook relational
    BFS. Each round's visited set is an EAGER ``localCheckpoint`` —
    not cache+unpersist-parent, because the new round's plan contains
    the old visited as a subtree and unpersisting the parent CASCADES
    the invalidation into the child's cache, recomputing the whole
    chain every round (measured here: rounds 2.0 → 5.8 → 9.5 → 19.0 s
    at sf0.01 before the fix, flat ~1 s after; checkpoint() on a real
    cluster). The same trap NOTES records for repeat-timing caches.

    All landmarks advance in ONE joined pass per round (the frontier
    carries its landmark id), so the cost is rounds × |E|-bounded, not
    landmarks × rounds. Returns (landmark, node, dist), dist ≤
    max_depth, including the landmark itself at dist 0.

    ``sources`` (round 9): an explicit 1-column ``landmark`` frame of
    start nodes overrides the smallest-ids default — the hook the
    two-sweep diameter estimator uses to BFS from a data-derived
    start (max-degree node, then the farthest discovered node).
    """
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"),
    ).filter(F.col("a") != F.col("b")).distinct()
    # ONE explode, not unionAll-of-selects: e is uncached and its
    # build (often a data-sized graph construction) would re-run once
    # per union branch during the adj cache materialization (r12)
    adj = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("z"), F.col("b").alias("nbr")),
                    F.struct(F.col("b").alias("z"), F.col("a").alias("nbr")),
                )
            ).alias("x")
        )
        .select("x.z", "x.nbr")
        # laid out on the per-round frontier-join key (r12; §2.4)
        .repartition("z")
        .sortWithinPartitions("z")
        .cache()
    )
    if sources is not None:
        landmarks = sources.select("landmark")
    else:
        nodes = adj.select(F.col("z").alias("node")).distinct()
        landmarks = nodes.orderBy("node").limit(n_landmarks).select(
            F.col("node").alias("landmark")
        )
    visited = landmarks.select(
        "landmark", F.col("landmark").alias("node"), F.lit(0).alias("dist")
    ).localCheckpoint()
    frontier = visited
    for r in range(1, max_depth + 1):
        discovered = (
            frontier.join(adj, frontier["node"] == adj["z"])
            .select("landmark", F.col("nbr").alias("node"))
            .distinct()
            .join(visited, ["landmark", "node"], "left_anti")
            .withColumn("dist", F.lit(r))
        )
        # eager localCheckpoint: materializes AND truncates lineage, so
        # no unpersist of a parent can cascade-invalidate this round
        visited = visited.unionByName(discovered).localCheckpoint()
        frontier = visited.where(F.col("dist") == r)
    return visited.select(
        "landmark", "node", F.col("dist").cast("bigint").alias("dist")
    )


def bounded_bellman_ford(
    edges: DataFrame,
    n_sources: int = 4,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Bounded multi-source Bellman-Ford: cheapest WEIGHTED path
    within ``rounds`` hops from the ``n_sources`` smallest node ids —
    the weighted sibling of ``landmark_bfs_distances`` (relaxation is
    the textbook relational formulation; bounding the rounds makes it
    a pure function of the input that an unrolled SQL replay
    reproduces exactly).

    Per round: dist ⋈ edges on the source endpoint (the ONLY shuffle,
    |frontier|-keyed), then a (source, node) MIN aggregation over old
    ∪ relaxed. Integer weights keep every distance BIGINT — exact.
    Each round ends in an eager localCheckpoint (the cascade-
    invalidation rule). Directed: pass both directions for an
    undirected graph. Returns (source, node, dist), node reachable
    within ``rounds`` hops, dist exact cheapest ≤-rounds-hop cost.
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"),
        F.col(weight).cast("bigint").alias("w"),
    )
    nodes = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    ).distinct()
    sources = nodes.orderBy("node").limit(n_sources).select(
        F.col("node").alias("source")
    )
    dist = sources.select(
        "source", F.col("source").alias("node"), F.lit(0).cast("bigint").alias("dist")
    ).localCheckpoint()
    # static relaxation table laid out on the per-round join key (r12)
    e = e.repartition("u").sortWithinPartitions("u").cache()
    for _ in range(rounds):
        relaxed = (
            dist.join(e, dist["node"] == e["u"])
            .select("source", F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("source", "node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist


def personalized_pagerank(
    edges: DataFrame,
    n_seeds: int = 4,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Personalized PageRank (Jeh & Widom, WWW'03) in the same
    exact-integer form as ``pagerank_fixed``: the teleport mass lands
    ONLY on the seed set (here the ``n_seeds`` smallest node ids —
    deterministic, the landmark convention), so ranks measure
    proximity TO the seeds — the recommendation/expansion centrality,
    not global importance.

    Update: r'(v) = [v∈seeds]·((1−d)·S div |seeds|) + d·Σ_{u→v}
    (r(u) div outdeg(u)), all int64 with true ``div`` — bit-identical
    across engines/partitionings like the global variant. Init:
    r₀ = S div |seeds| on seeds, 0 elsewhere. Same per-round shape:
    one src-keyed join + one dst-keyed agg, |E|-bounded; static
    edge/degree/node/seed tables cached once.
    """
    # Same static-table layout as pagerank_fixed (r12): out-degree via
    # a per-src window, cached hash(src)-partitioned, so each round is
    # ONE |E|-keyed join with no re-exchange of the static side.
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    ew = e.withColumn(
        "deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
    ).cache()
    nodes = (
        ew.select(F.explode(F.array("src", "dst")).alias("node"))
        .distinct()
        .cache()
    )
    seeds = nodes.orderBy("node").limit(n_seeds).select(
        "node", F.lit(True).alias("__seed")
    ).cache()
    # materialize the static caches before round planning (see
    # pagerank_fixed — unmaterialized cached layouts are re-exchanged)
    nodes.count()

    base_seed = (damping_den - damping_num) * SCALE // (damping_den * n_seeds)
    init_seed = SCALE // n_seeds
    tagged = nodes.join(seeds, "node", "left")
    ranks = tagged.select(
        "node",
        F.when(F.col("__seed"), F.lit(init_seed))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank_scaled"),
    )
    for _ in range(iterations):
        contrib = (
            ranks.join(ew, ranks["node"] == ew["src"], "inner")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_scaled div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            tagged.join(contrib, on="node", how="left")
            .select(
                "node",
                (
                    F.when(F.col("__seed"), F.lit(base_seed))
                    .otherwise(F.lit(0))
                    .cast("long")
                    + F.expr(
                        f"({damping_num} * coalesce(inc, 0L)) div {damping_den}"
                    )
                ).alias("rank_scaled"),
            )
        )
    return ranks


def hits_fixed(
    edges: DataFrame,
    iterations: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM'99) in bit-portable
    scaled-integer arithmetic: per round, authority(v) = Σ hub(u) over
    u→v, then hub(u) = Σ authority(v) over u→v, each re-normalized so
    the MAX score is exactly SCALE (integer floor division by the max
    — the L∞ norm; the textbook L2 norm needs a sqrt of a sum whose
    order would matter, L∞ is the exact-arithmetic choice and the
    ranking is identical).

    The per-round max is a single-row aggregate attached via a
    broadcast crossJoin (the bloom-bitset pattern — scalar state, not
    data, crosses the driver). Fixed iterations + integer arithmetic
    = the same unrolled-SQL replay property as PageRank/PPR. Per
    round: two |E|-keyed join+aggs + two scalar attaches. Returns
    (node, hub_scaled, auth_scaled).

    Scale: 10^6, NOT PageRank's 10^12 — the renorm multiplies a raw
    sum (≤ max_degree·S) by S again, so S² · max_degree must stay
    under int64: 10^6 gives headroom to ~9·10^6-degree hubs, and
    10^-6 relative precision is far beyond ranking needs (10^12
    overflowed on the sf0.01 graph — measured, ANSI aborted loudly
    as designed).
    """
    # TWO cached copies of the static edge table, each hash-
    # partitioned AND sorted on its round's join key (r12): the hub
    # half-round joins on src, the authority half-round on dst — with
    # one (src,dst)-hashed cache both sort-merge joins re-exchanged
    # AND re-sorted |E| every half-round (4 static-side exchanges at
    # 2 iterations); pre-laying-out each copy pays that once at build
    # (guide §2.4). Memory: 2·|E| — the standard in/out adjacency
    # layout.
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    e_src = e.repartition("src").sortWithinPartitions("src").cache()
    e_dst = (
        e_src.repartition("dst").sortWithinPartitions("dst").cache()
    )
    nodes = (
        e_src.select(F.explode(F.array("src", "dst")).alias("node"))
        .distinct()
        .cache()
    )
    hubs = nodes.select("node", F.lit(HITS_SCALE).cast("long").alias("h"))

    def _renorm(df: DataFrame, col: str, eager: bool) -> DataFrame:
        # checkpoint FIRST: the raw table feeds both the max
        # aggregate and the renormalized projection — uncached, the
        # double consumption compounds through the h->a->h chain into
        # 2^rounds re-evaluations (measured 28 s -> 7 s at sf0.01).
        # Only the FIRST checkpoint is eager (r12): its job also
        # materializes the static edge caches, so every later
        # half-round is PLANNED against the measured, laid-out
        # InMemoryRelations (unmaterialized cached layouts report
        # unknown partitioning and would be re-exchanged); the rest
        # are lazy — the broadcast build of __mx materializes them
        # inside the final action without extra scheduled jobs.
        df = df.localCheckpoint(eager=eager)
        mx = df.agg(F.max(col).alias("__mx"))
        return df.crossJoin(F.broadcast(mx)).select(
            "node",
            F.expr(f"({col} * {HITS_SCALE}) div greatest(__mx, 1L)").alias(col),
        )

    auths = None
    for it in range(iterations):
        auths = _renorm(
            e_src.join(hubs, e_src["src"] == hubs["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a")),
            "a",
            eager=(it == 0),
        )
        hubs = _renorm(
            e_dst.join(auths, e_dst["dst"] == auths["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h")),
            "h",
            # round 1's hub checkpoint also materializes e_dst so the
            # later hub half-rounds plan against its layout
            eager=(it == 0),
        )
    return (
        nodes.join(hubs, "node", "left")
        .join(auths, "node", "left")
        .select(
            "node",
            F.coalesce("h", F.lit(0)).cast("bigint").alias("hub_scaled"),
            F.coalesce("a", F.lit(0)).cast("bigint").alias("auth_scaled"),
        )
    )


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node LOCAL clustering coefficient (Watts & Strogatz,
    Nature'98): cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)), the fraction of
    a node's neighbor pairs that are themselves connected — the
    standard "how clique-like is this node's neighborhood" measure a
    co-occurrence graph audit reads next to raw triangle counts.

    Built ON TOP of ``triangle_counts`` (degree-oriented wedge
    enumeration — same arboricity-bounded scale shape; no new
    shuffle beyond its plan). Exactness: 2·T and deg·(deg−1) are both
    int64 (ANSI aborts loudly on overflow); ONE double division of
    two exact integers is correctly rounded identically in any IEEE
    engine, so the value sits behind the hash gate — no float sums
    anywhere. deg < 2 ⇒ coefficient 0 by convention (guards the ANSI
    division).

    Returns (v, deg, n_triangles, clustering_coeff).
    """
    t = triangle_counts(edges, src, dst)
    denom = F.col("deg") * (F.col("deg") - F.lit(1))
    return t.select(
        "v",
        "deg",
        "n_triangles",
        F.when(F.col("deg") < 2, F.lit(0.0))
        .otherwise(
            (F.lit(2) * F.col("n_triangles")).cast("double") / denom.cast("double")
        )
        .alias("clustering_coeff"),
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient (Newman, PRL'02): the Pearson
    correlation of endpoint degrees over the SYMMETRIZED edge list —
    positive when hubs attach to hubs (social nets), negative when
    hubs attach to leaves (supply/dependency nets). One number a
    graph-health dashboard wants next to the degree histogram.

    Exact-arithmetic form: over the 2|E| directed copies, with x the
    source endpoint's degree and y the destination's, x and y are
    identically distributed (every edge contributes both ways), so
    Pearson's denominator √(M·Σx²−(Σx)²)·√(M·Σy²−(Σy)²) collapses to
    M·Σx²−(Σx)² and

        r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²)

    — every term an int64 SUM of integer products, ONE final double
    division. No float accumulation, no sqrt: bit-portable across
    engines. Overflow bound (ANSI aborts loudly past it):
    M·Σxy ≤ (2|E|)²·maxdeg² must stay under 2^63 — holds to ~10^9
    edges at maxdeg 10^4·√scale margins; swap the sums to
    decimal(38,0) if a graph ever trips it.

    Scale shape: one degree aggregation, two degree joins keyed on
    the endpoints (broadcast when the degree table is small), one
    global single-row aggregate. Returns a single row
    (m_directed, sum_x, sum_xy, sum_x2, assortativity).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )
    both = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("dx"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("dy"))
    joined = both.join(da, "a").join(db, "b")
    sums = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("m_directed"),
        F.sum(F.col("dx").cast("bigint")).alias("sum_x"),
        F.sum((F.col("dx") * F.col("dy")).cast("bigint")).alias("sum_xy"),
        F.sum((F.col("dx") * F.col("dx")).cast("bigint")).alias("sum_x2"),
    )
    num = F.col("m_directed") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_x")
    den = F.col("m_directed") * F.col("sum_x2") - F.col("sum_x") * F.col("sum_x")
    return sums.select(
        "m_directed",
        "sum_x",
        "sum_xy",
        "sum_x2",
        F.when(den == 0, F.lit(0.0))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("assortativity"),
    )


def community_modularity(
    edges: DataFrame,
    communities: DataFrame,
    node_col: str = "node",
    community_col: str = "community",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-community modularity decomposition (Newman & Girvan,
    PRE'04): for a partition of an undirected graph,

        Q = Σ_c [ m_c/m − (d_c/2m)² ]

    with m total edges, m_c intra-community edges, d_c the community's
    degree sum — THE standard score for "did the community detector
    (or a given attribute partition) beat random wiring".

    Exact-arithmetic form: each community's contribution is
    (4·m·m_c − d_c²) / 4m² — numerator and denominator int64, ONE
    double division per community row. The global Q is the caller's
    fixed-order sum over the tiny per-community table (the chi2-cells
    contract: a parallel double SUM is last-ulp nondeterministic;
    q_contrib_num/modularity_den are emitted exactly for callers that
    want the integer route).

    Scale shape: two community-label joins keyed on the endpoints
    (broadcast when the labeling is a dimension), one groupBy
    community — all equi-keyed, |E|-bounded. Nodes missing from
    ``communities`` are dropped from the edge accounting (document
    the labeling as total, or left-join beforehand).

    Returns (community, n_nodes, degree_sum, intra_edges,
    q_contrib_num, modularity_den, q_contrib).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )
    lab = communities.select(
        F.col(node_col).alias("__n"), F.col(community_col).alias("__c")
    )
    la = lab.select(F.col("__n").alias("a"), F.col("__c").alias("ca"))
    lb = lab.select(F.col("__n").alias("b"), F.col("__c").alias("cb"))
    labeled = e.join(la, "a").join(lb, "b").cache()
    m_row = labeled.agg(F.count(F.lit(1)).cast("bigint").alias("__m"))

    # per-community degree sums: each labeled edge endpoint contributes
    # 1 to its community — one explode, one groupBy
    deg_c = (
        labeled.select(F.explode(F.array("ca", "cb")).alias("community"))
        .groupBy("community")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree_sum"))
    )
    intra = (
        labeled.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("intra_edges"))
    )
    n_nodes = (
        labeled.select(F.explode(F.array("a", "b")).alias("__n"))
        .distinct()
        .join(lab, "__n")
        .groupBy(F.col("__c").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    out = (
        deg_c.join(intra, "community", "left")
        .join(n_nodes, "community", "left")
        .crossJoin(F.broadcast(m_row))
    )
    mc = F.coalesce(F.col("intra_edges"), F.lit(0))
    num = F.lit(4) * F.col("__m") * mc - F.col("degree_sum") * F.col("degree_sum")
    den = F.lit(4) * F.col("__m") * F.col("__m")
    return out.select(
        "community",
        F.coalesce("n_nodes", F.lit(0)).alias("n_nodes"),
        "degree_sum",
        mc.alias("intra_edges"),
        num.cast("bigint").alias("q_contrib_num"),
        den.cast("bigint").alias("modularity_den"),
        F.when(den == 0, F.lit(0.0))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("q_contrib"),
    )


def ktruss_edges(
    edges: DataFrame,
    k: int = 4,
    iterations: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-truss decomposition (Cohen 2008 "Trusses: cohesive subgraphs
    for social network analysis"): keep exactly the edges embedded in
    ≥ k−2 triangles OF THE SURVIVING SUBGRAPH — the edge-level
    sibling of k-core (a k-truss is always inside a (k−1)-core but
    much denser; the standard community-core extractor).

    Per round: enumerate each triangle ONCE via the ordered wedge
    join (neighbors u<x<y: wedge at u closed by (x,y)), explode it to
    its 3 member edges (explode-of-array, not unionAll — the
    repeated-subtree rule), aggregate per-edge support, semi-join
    edges with support ≥ k−2, eager localCheckpoint (the cascade
    rule), one edge-count action as convergence probe — identical
    discipline to ``kcore_peel``, with the wedge join's Σdeg² cost
    bounded by the id-ordered adjacency (each triangle generated
    exactly once, hub middles never fan out twice).

    ``iterations=None`` runs to the fixpoint; a fixed count gives the
    deterministic prefix an unrolled SQL oracle replays (peeling is
    confluent). Returns surviving (a, b, support).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    prev = e.count()
    rounds = 0
    support = None
    while iterations is None or rounds < iterations:
        tri = (
            e.alias("e1")
            .join(e.alias("e2"), F.col("e1.a") == F.col("e2.a"))
            .where(F.col("e1.b") < F.col("e2.b"))
            .select(
                F.col("e1.a").alias("u"),
                F.col("e1.b").alias("x"),
                F.col("e2.b").alias("y"),
            )
            .join(
                e.selectExpr("a AS x", "b AS y"),
                ["x", "y"],
                "left_semi",
            )
        )
        sup = (
            tri.select(
                F.explode(
                    F.array(
                        F.struct(F.col("u").alias("a"), F.col("x").alias("b")),
                        F.struct(F.col("u").alias("a"), F.col("y").alias("b")),
                        F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                    )
                ).alias("ed")
            )
            .select("ed.a", "ed.b")
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        )
        nxt = (
            e.join(sup, ["a", "b"], "left")
            .where(F.coalesce(F.col("support"), F.lit(0)) >= k - 2)
            .select("a", "b", F.coalesce(F.col("support"), F.lit(0)).alias("support"))
            .localCheckpoint()
        )
        support = nxt
        # lazy projection over the checkpointed leaf — a second eager
        # localCheckpoint here re-materialized a full copy of the same
        # rows minus one column, one extra pass per round (r12)
        e = nxt.select("a", "b")
        rounds += 1
        if iterations is None:
            # count = fixpoint probe only; a fixed-round prefix skips
            # it (the eager checkpoint already ran the round's job)
            n = nxt.count()
            if n == prev:
                break
            prev = n
    if support is None:
        return e.withColumn("support", F.lit(0).cast("bigint"))
    return support


def boruvka_mst(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    max_rounds: int = 20,
) -> DataFrame:
    """Minimum spanning forest by Borůvka rounds (1926; THE
    distributed MST algorithm — each round every component picks its
    minimum outgoing edge and components merge, so the component
    count at least halves: ≤ log₂|V| rounds) — the backbone of
    single-linkage clustering at scale (cut the MST at a distance
    threshold = the dendrogram cut; compose with the CC operator).

    Determinism: edges order by (weight, a, b) struct-min — ties
    break on endpoint ids, so the forest is a pure function of the
    input on every engine (with distinct weights it is THE unique
    MST).

    Component merge per round runs hash-min + pointer-doubling over
    the picked-link graph (neighbor-min alone is O(diameter);
    doubling alone stalls on chains whose min is not a neighbor —
    10—7—9—2 leaves 7 self-labeled; combined they resolve depth 2^h
    in h hops) — and it must reach a FIXPOINT before the next round:
    a half-merged tree would pass the ca≠cb filter and re-pick an
    intra-tree edge, i.e. a cycle in the output.

    Two measured perf lessons at sf0.01 (3.6k edges):
      * ``localCheckpoint`` CARRIES the origin plan's ESTIMATED
        statistics into the new leaf, and a size estimate of an
        inner-join tree is the PRODUCT of its leaf estimates — so an
        iterative step that references the previous round's leaf k≥2
        times multiplies the carried ``sizeInBytes`` exponent by k
        EVERY iteration (here the hop references cmap 3×: neighbor
        join, stepped base, doubling lookup → 3^hops growth). The
        estimate is a Scala ``BigInt``; by round 3 at sf0.01 the
        optimizer (``SizeInBytesOnlyStatsPlanVisitor``) was grinding
        through ~10⁸-bit ``BigInteger`` multiplies (hop 0 spent 97 s
        in stats) and OOMed the driver. Per-round semi-joins (kcore)
        and single-reference joins (pagerank) only grow the exponent
        LINEARLY, which is why no other iterative operator hit this.
        The fix is a STATS RE-BASE: ``cache()`` each checkpointed
        leaf — the very next action (the checksum collect) populates
        the cache, and every later plan sees the InMemoryRelation's
        MEASURED byte size instead of the compounded estimate, so
        per-hop estimates stay a bounded constant. Unpersisting the
        2-generations-old leaf is cascade-safe (the r5 cache rule)
        because every cached entry is a fresh ``LogicalRDD`` leaf —
        no entry's plan contains another's subtree.
      * Action economy: one eager checkpoint + one O(1)-row
        sum-checksum per hop (labels only decrease, so an unchanged
        ``sum(m)`` proves pointwise fixpoint — same probe as
        ``dedup/cluster.py``); the forest accumulates as a Python
        list of checkpointed picks, unioned once at the end; the
        empty-picks guard doubles as the termination test, so no
        per-round distinct-component count exists at all.

    Returns the forest edges (a, b, weight).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
            F.col(weight).cast("bigint").alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint()
    )
    labels = (
        e.select(F.explode(F.array("a", "b")).alias("v"))
        .distinct()
        .select("v", F.col("v").alias("comp"))
        .localCheckpoint()
    )
    spark = edges.sparkSession
    labels.cache()
    picked: list[DataFrame] = []
    prev_labels: DataFrame | None = None
    for _ in range(max_rounds):
        le = (
            e.join(
                labels.withColumnRenamed("v", "a").withColumnRenamed("comp", "ca"),
                "a",
            )
            .join(
                labels.withColumnRenamed("v", "b").withColumnRenamed("comp", "cb"),
                "b",
            )
            .where(F.col("ca") != F.col("cb"))
        )
        cand = le.select(
            F.explode(F.array("ca", "cb")).alias("comp"),
            F.struct("w", "a", "b", "ca", "cb").alias("edge"),
        )
        picks = (
            cand.groupBy("comp")
            .agg(F.min("edge").alias("e"))
            .select("e.a", "e.b", "e.w", "e.ca", "e.cb")
            .distinct()
            .localCheckpoint()
        )
        # This count also materializes the new labels cache (the
        # picks plan scans labels), completing the stats re-base;
        # the previous round's labels leaf is then safe to drop.
        if picks.count() == 0:
            break
        if prev_labels is not None:
            prev_labels.unpersist()
            prev_labels = None
        picked.append(picks.select("a", "b", "w"))
        # Undirected comp-level link graph of this round's picks —
        # lazy: a cheap explode over the checkpointed picks, read
        # once per hop.
        links = picks.select(
            F.explode(
                F.array(
                    F.struct(F.col("ca").alias("x"), F.col("cb").alias("y")),
                    F.struct(F.col("cb").alias("x"), F.col("ca").alias("y")),
                )
            ).alias("l")
        ).select("l.x", "l.y")

        cmap = (
            links.groupBy("x")
            .agg(F.least(F.min("y"), F.min("x")).alias("m"))
            .localCheckpoint()
        )
        cmap.cache()
        prev_sum = cmap.agg(F.sum("m")).collect()[0][0]
        prev_cmap: DataFrame | None = None
        for _hop in range(32):
            nbr = (
                links.join(cmap.withColumnRenamed("x", "y"), "y")
                .groupBy("x")
                .agg(F.min("m").alias("nm"))
            )
            stepped = cmap.join(nbr, "x", "left").select(
                "x",
                F.least(F.col("m"), F.coalesce(F.col("nm"), F.col("m"))).alias("m"),
            )
            # Doubling through the MATERIALIZED cmap leaf (see
            # docstring: self-joining the lazy `stepped` squares
            # carried stats per hop → optimizer BigInteger OOM).
            # cmap is unique per x, so no post-join groupBy needed.
            nxt = (
                stepped.join(
                    cmap.selectExpr("x AS m", "m AS m2"), "m", "left"
                )
                .select(
                    "x",
                    F.least(F.col("m"), F.coalesce(F.col("m2"), F.col("m"))).alias(
                        "m"
                    ),
                )
                .localCheckpoint()
            )
            nxt.cache()
            new_sum = nxt.agg(F.sum("m")).collect()[0][0]
            if prev_cmap is not None:
                prev_cmap.unpersist()
            prev_cmap, cmap = cmap, nxt
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        if prev_cmap is not None:
            prev_cmap.unpersist()
        prev_labels = labels
        labels = (
            labels.join(cmap.withColumnRenamed("x", "comp"), "comp", "left")
            .select("v", F.coalesce(F.col("m"), F.col("comp")).alias("comp"))
            .localCheckpoint()
        )
        labels.cache()
        # The eager labels checkpoint has consumed cmap; drop it.
        cmap.unpersist()
    for leftover in (labels, prev_labels):
        if leftover is not None:
            leftover.unpersist()
    if not picked:
        return spark.createDataFrame([], "a bigint, b bigint, weight bigint")
    forest = picked[0]
    for p in picked[1:]:
        forest = forest.unionByName(p)
    return forest.groupBy("a", "b").agg(F.min("w").alias("weight"))


def densest_subgraph(
    edges: DataFrame,
    eps_num: int = 1,
    eps_den: int = 2,
    iterations: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Densest-subgraph 2(1+ε)-approximation by parallel peeling
    (Bahmani, Kumar & Vassilvitskii, VLDB'12 — the MapReduce-round
    variant of Charikar's greedy): each round removes EVERY vertex
    whose degree is ≤ 2(1+ε)·ρ where ρ = |E|/|V| is the current
    density; the answer is the round prefix with the maximum density
    seen. Finds the community-core / spam-cluster / hot-topic
    subgraph that avg-degree or k-core misses (a k-core fixes the
    threshold globally; this one ratchets it with the shrinking
    graph).

    Exactness and portability: the peel predicate is evaluated
    CROSS-MULTIPLIED — deg·|V|·ε_den ≤ 2(ε_den+ε_num)·|E| — pure
    int64, no ratio; the best round is the argmax of the
    integer-scaled density key |E|·2²⁰ div |V| (ties → earliest
    round), the same key an unrolled SQL replay computes, so a fixed
    ``iterations`` prefix is bit-reproducible cross-engine (peeling
    is confluent, like kcore_peel's).

    Scale shape per round (the kcore_peel discipline): one degree
    aggregation over the CACHED edge table (explode both endpoints,
    never unionAll-of-selects), one anti-threshold filter, two
    vertex-keyed semi-joins, an eager localCheckpoint (cascade rule)
    — |E| and |V| only shrink, and each round removes at least an
    ε/(1+ε) fraction of vertices at or below threshold, so rounds
    are O(log |V|). Driver pulls exactly two scalars per round
    (|V|, |E| — the convergence probe and the density bookkeeping).

    Returns (v, deg, best_round, n_nodes, n_edges, density_scaled)
    for every vertex of the best-round subgraph; density_scaled =
    |E|·2²⁰ div |V| of that subgraph.
    """
    spark = edges.sparkSession
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    e.cache()

    def degrees(ed: DataFrame) -> DataFrame:
        return (
            ed.select(F.explode(F.array("a", "b")).alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    def stats(ed: DataFrame) -> tuple[int, int]:
        # ONE bounded scalar pull per round (the convergence probe
        # doubles as the density bookkeeping) over the cached table:
        # |V| = distinct exploded endpoints, 2|E| = exploded rows —
        # fused into a single aggregation job (was two actions/round)
        row = (
            ed.select(F.explode(F.array("a", "b")).alias("v"))
            .agg(
                F.count_distinct("v").cast("bigint").alias("nv"),
                (F.count(F.lit(1)) / 2).cast("bigint").alias("ne"),
            )
            .collect()[0]
        )
        return int(row["nv"]), int(row["ne"])

    best_key = -1
    best_round = -1
    best_e_df = None
    best_stats = (0, 0)
    rounds = 0
    nv, ne = stats(e)
    while True:
        if nv > 0:
            key = (ne << 20) // nv
            if key > best_key:
                prev_best = best_e_df
                best_key, best_round, best_stats = key, rounds, (nv, ne)
                best_e_df = e
                if prev_best is not None and prev_best is not e:
                    prev_best.unpersist()
        if (iterations is not None and rounds >= iterations) or ne == 0:
            break
        keep = degrees(e).where(
            F.col("deg") * F.lit(nv) * F.lit(eps_den)
            > F.lit(2 * (eps_den + eps_num) * ne)
        ).select("v")
        nxt = (
            e.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b")
            # LAZY checkpoint: the stats() collect below is the one
            # action per round and materializes checkpoint + cache in
            # a single job (the IBLT loop-state rule, r12) — eager
            # here doubled the per-round job count
            .localCheckpoint(eager=False)
        )
        nxt.cache()
        prev_e = e
        e = nxt
        rounds += 1
        prev = (nv, ne)
        nv, ne = stats(e)
        if prev_e is not best_e_df:
            # safe only after stats() materialized nxt: unpersist
            # drops the cache entry, and the checkpoint blocks of the
            # prior round remain for any still-lazy consumers
            prev_e.unpersist()
        if iterations is None and (nv, ne) == prev:
            break
    if best_e_df is None:
        return spark.createDataFrame(
            [],
            "v bigint, deg bigint, best_round bigint, n_nodes bigint,"
            " n_edges bigint, density_scaled bigint",
        )
    nv, ne = best_stats
    out = degrees(best_e_df).select(
        F.col("v"),
        F.col("deg").cast("bigint").alias("deg"),
        F.lit(best_round).cast("bigint").alias("best_round"),
        F.lit(nv).cast("bigint").alias("n_nodes"),
        F.lit(ne).cast("bigint").alias("n_edges"),
        F.lit((ne << 20) // nv).cast("bigint").alias("density_scaled"),
    )
    return out


def diameter_two_sweep(
    edges: DataFrame,
    max_depth: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Two-sweep diameter lower bound (Magnien, Latapy & Habib, ACM
    JEA 2009 — the standard cheap diameter estimator): BFS from a
    high-degree start node, take the farthest discovered node u, BFS
    again from u — u's eccentricity is a tight diameter lower bound
    in practice (exact on trees). Both sweeps are hop-capped at
    ``max_depth`` (an unreached periphery shows up as the bound
    equalling the cap — the honest "at least this" answer).

    Deterministic throughout: start = max-degree node (tie: smallest
    id), u = max-distance node of sweep 1 (tie: smallest id), both
    picked with min-of-struct aggregates — no RNG, no collect. Each
    sweep is the landmark BFS machinery (frontier ⋈ adjacency +
    visited anti-join per round, eager localCheckpoint rounds).

    Returns ONE row: (start_node, ecc_start, far_node, diameter_lb,
    n_reached_start, n_reached_far).
    """
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"),
    ).filter(F.col("a") != F.col("b")).distinct()
    # explode-symmetrize (see landmark BFS note — e is uncached)
    adj = e.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("z"), F.col("b").alias("nbr")),
                F.struct(F.col("b").alias("z"), F.col("a").alias("nbr")),
            )
        ).alias("x")
    ).select("x.z", "x.nbr")
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("d"))
    start = deg.agg(
        F.min(F.struct((-F.col("d")).alias("nd"), F.col("z").alias("z"))).alias(
            "s"
        )
    ).select(F.col("s.z").alias("landmark"))
    d1 = landmark_bfs_distances(
        edges, max_depth=max_depth, src=src, dst=dst, sources=start
    )
    # farthest node of sweep 1 (tie: smallest id) + sweep-1 stats —
    # ONE aggregation row consumed twice (bounded) via broadcast
    s1 = d1.agg(
        F.min(
            F.struct((-F.col("dist")).alias("nd"), F.col("node").alias("u"))
        ).alias("far"),
        F.count(F.lit(1)).cast("bigint").alias("n_reached_start"),
        F.max("dist").cast("bigint").alias("ecc_start"),
        F.min("landmark").cast("bigint").alias("start_node"),
    )
    far = s1.select(F.col("far.u").alias("landmark"))
    d2 = landmark_bfs_distances(
        edges, max_depth=max_depth, src=src, dst=dst, sources=far
    )
    s2 = d2.agg(
        F.max("dist").cast("bigint").alias("diameter_lb"),
        F.count(F.lit(1)).cast("bigint").alias("n_reached_far"),
    )
    return (
        s1.crossJoin(F.broadcast(s2))
        .select(
            "start_node",
            "ecc_start",
            F.col("far.u").cast("bigint").alias("far_node"),
            "diameter_lb",
            "n_reached_start",
            "n_reached_far",
        )
    )
