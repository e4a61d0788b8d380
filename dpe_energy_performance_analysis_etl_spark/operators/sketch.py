"""Count-min sketch: a mergeable frequency sketch over unbounded
item domains, fully deterministic and SQL-portable.

Exact per-item counts over a 100 TB corpus need a shuffle keyed by
EVERY distinct item (vocabulary-sized state). A count-min sketch
bounds the state to ``depth × width`` counters regardless of
vocabulary: each item increments one cell per row (independent
hashes); a lookup reads its ``depth`` cells and takes the min.
Estimates never undercount and overcount by at most ``2N/width``
with probability ``1 - 2^-depth`` (Cormode & Muthukrishnan 2005).

Everything here is engine-portable integer arithmetic — the item
hash is the same polynomial rolling hash as ``doc_fingerprint``
(base 131 mod 1e15, oracle-checked) and the per-row cell hashes are
``((a·(h mod P) + b) mod P) mod width`` with int64-safe constants —
so the DuckDB oracle reproduces the sketch BIT-EXACTLY, unlike
engine-specific sketch builtins (HLL etc., which are rows-only in
the gate).

The sketch is a (row, cell, cnt) DataFrame — a monoid under
cell-wise addition (``cms_merge``), so partial sketches from any
partitioning/batching combine associatively, same contract as
``agg_state``/``maintained_agg_stream``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dpe_energy_performance_analysis_etl_spark.text import rolling_hash_fingerprint

# (a, b) per sketch row. Small multipliers keep a·(h mod P) + b well
# inside int64: 41 × 999999937 ≈ 4.1e10.
CMS_PARAMS: list[tuple[int, int]] = [(31, 7), (37, 11), (41, 13)]
CMS_PRIME = 999999937


def cms_cell(item: Column, a: int, b: int, width: int) -> Column:
    """Row-hash cell index for an item column (string)."""
    h = rolling_hash_fingerprint(item) % CMS_PRIME
    return ((F.lit(a) * h + F.lit(b)) % CMS_PRIME) % width


def _with_cells(
    df: DataFrame, item_col: str, width: int, params: list[tuple[int, int]]
) -> DataFrame:
    """(row, cell) per item occurrence, one posexplode pass."""
    cells = F.array(*[cms_cell(F.col(item_col), a, b, width) for a, b in params])
    return df.select(
        F.col(item_col), F.posexplode(cells).alias("row", "cell")
    )


def cms_build(
    df: DataFrame,
    item_col: str,
    width: int = 512,
    params: list[tuple[int, int]] = CMS_PARAMS,
) -> DataFrame:
    """Build the sketch over all rows of ``df[item_col]`` →
    (row, cell, cnt), at most ``depth × width`` rows. One shuffle,
    keyed by (row, cell) — bounded regardless of item cardinality."""
    return (
        _with_cells(df, item_col, width, params)
        .groupBy("row", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(s1: DataFrame, s2: DataFrame) -> DataFrame:
    """Cell-wise addition — the sketch monoid. Sketches built over
    disjoint batches merge to the sketch of the union (exactly)."""
    merged = s1.alias("a").join(s2.alias("b"), on=["row", "cell"], how="full_outer")
    return merged.select(
        "row",
        "cell",
        (
            F.coalesce(F.col("a.cnt"), F.lit(0)) + F.coalesce(F.col("b.cnt"), F.lit(0))
        ).alias("cnt"),
    )


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 512,
    params: list[tuple[int, int]] = CMS_PARAMS,
) -> DataFrame:
    """Frequency estimates for ``items[item_col]`` (distinct items):
    min over each item's ``depth`` cells. The sketch (≤ depth×width
    rows) broadcasts, so lookups never shuffle the item side."""
    cells = _with_cells(items.select(item_col).distinct(), item_col, width, params)
    joined = cells.join(F.broadcast(sketch), on=["row", "cell"], how="left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


# ---------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the portable counterpart of
# HLL approx_count_distinct. State = the k smallest item hashes; a
# monoid under (union, keep k smallest). With hashes uniform on
# [0, M), E[distinct] ≈ (k-1) · M / h_(k); all arithmetic here is
# deterministic integer/one-double-division, so the oracle reproduces
# the ESTIMATE bit-exactly (engine HLL sketches never can).
# ---------------------------------------------------------------------

KMV_MOD = 10**15  # range of the rolling hash
# Items are right-padded to this length before hashing: the
# polynomial accumulator must WRAP the modulus a couple of times to
# mix — unpadded short strings hash far below KMV_MOD and the
# uniformity assumption (hence the estimator) breaks. 16 chars ≈ two
# wraps of the 1e15 modulus at base 131.
KMV_PAD = 16


def _raw_rolling_hash(col: Column, base: int = 131, mod: int = KMV_MOD) -> Column:
    """Rolling hash over the RAW characters (no normalization —
    ``rolling_hash_fingerprint`` canonicalizes first, which would
    strip the uniformity padding)."""
    chars = F.regexp_extract_all(col, F.lit("."), 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def kmv_build(df: DataFrame, item_col: str, k: int = 64) -> DataFrame:
    """Sketch = k smallest distinct hashes of ``df[item_col]`` →
    (pos, h), pos 1..k ascending. One distinct-shuffle + a global
    top-k (takeOrdered — only k rows ever reach the driver side of
    the sort)."""
    hashes = df.select(
        _raw_rolling_hash(F.rpad(F.col(item_col), KMV_PAD, "#")).alias("h")
    ).distinct()
    # k smallest via TakeOrderedAndProject (per-partition k-row heaps)
    # — the distinct-hash table grows with the data, so never a global
    # row_number window over it (r11 window-class sweep).
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        take_ordered_ranked,
    )

    return take_ordered_ranked(hashes, [F.col("h").asc()], k, rank_col="pos").select(
        "pos", "h"
    )


def kmv_merge(s1: DataFrame, s2: DataFrame, k: int = 64) -> DataFrame:
    """Union the hash sets, keep the k smallest — associative and
    commutative, so per-batch/per-partition sketches combine."""
    u = s1.select("h").unionAll(s2.select("h")).distinct()
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        take_ordered_ranked,
    )

    return take_ordered_ranked(u, [F.col("h").asc()], k, rank_col="pos").select(
        "pos", "h"
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate: exact when the sketch holds fewer
    than k hashes (we saw everything), else (k-1)·M / h_(k)."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_held"), F.max("h").alias("h_k")
    )
    return agg.select(
        F.when(F.col("n_held") < k, F.col("n_held").cast("double"))
        .otherwise(
            (F.lit(float(k - 1)) * F.lit(float(KMV_MOD))) / F.col("h_k").cast("double")
        )
        .alias("est_distinct")
    )


HLL_P = 6                      # m = 2^p = 64 registers
HLL_M = 1 << HLL_P
HLL_ALPHA = 7.0937e-1          # ≈ 0.7213 / (1 + 1.079/64), pinned double


def hll_portable(df: DataFrame, item_col, by=None) -> DataFrame:
    """Portable HyperLogLog distinct-count estimate (Flajolet et al.
    2007) — the oracle-checkable twin of ``approx_count_distinct``
    (whose sketch bytes are engine-specific, keeping that query
    rows-only forever).

    Portability recipe: item → char-fold polynomial hash mod 2^31−1 →
    the xor-shift-multiply 32-bit finalizer (the _portable_mix32
    form); bucket = low p bits, rank ρ = leading-zeros+1 of the
    remaining 26-bit word via ``27 − length(bin(w))`` (string-exact,
    no libm log). Register max per bucket, then the raw estimate
    α·m²/Σ2^(−M_j) where 2^(−M_j) is computed as
    ``1.0 / shiftleft(1, M_j)`` — an EXACT dyadic double, so the
    64-term sum is exact in ANY order and the whole estimate is one
    multiply + one divide of deterministic doubles. No small-range
    linear-counting correction (it needs ln): the raw estimator is
    biased low below ~2.5·m distincts — callers wanting exactness
    there use KMV (``kmv_estimate`` is exact under k) or exact
    count_distinct; this twin exists for parity, with accuracy
    ~1.04/√64 ≈ 13% RSE above that regime.

    Scale shape: one (keys, bucket) max aggregation — mergeable,
    map-side combinable, fixed 64-register state per group; the
    estimate is a per-group expression over ≤ 64 rows.

    Returns (keys…, n_buckets_hit, register_sum_x2p, hll_estimate).
    ``register_sum_x2p`` = Σ 2^(27−M_j) over hit buckets — an integer
    fingerprint of the register state (hash-stable evidence the
    registers themselves match, independent of float formatting).
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    item = F.col(item_col) if isinstance(item_col, str) else item_col
    h0 = _raw_rolling_hash(
        F.rpad(item.cast("string"), KMV_PAD, "#"), mod=(1 << 31) - 1
    )
    s1 = (h0.bitwiseXOR(F.shiftright(h0, 16)) * F.lit(73244475)) % F.lit(1 << 32)
    h32 = s1.bitwiseXOR(F.shiftright(s1, 16))
    bucket = h32 % F.lit(HLL_M)
    # arithmetic shift = exact floor division by 2^p (h32 < 2^32)
    w = F.shiftright(h32.cast("bigint"), HLL_P)
    rho = F.when(w == 0, F.lit(27)).otherwise(27 - F.length(F.bin(w)))
    regs = (
        df.select(*keys, bucket.alias("__b"), rho.alias("__rho"))
        .groupBy(*keys, "__b")
        .agg(F.max("__rho").alias("__m"))
    )
    # F.shiftleft only takes a literal shift — SQL shiftleft(1L, col)
    # accepts an expression shift
    est_den = (
        F.sum(F.lit(1.0) / F.expr("shiftleft(1L, __m)").cast("double"))
        + (F.lit(HLL_M) - F.count(F.lit(1))).cast("double")
    )
    out = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets_hit"),
        F.sum(F.expr("shiftleft(1L, 27 - __m)"))
        .cast("bigint")
        .alias("register_sum_x2p"),
        # alpha * (m*m): ONE float multiply (int product exact first) —
        # the oracle's `7.0937e-1 * 4096` must round identically
        (F.lit(HLL_ALPHA * (HLL_M * HLL_M)) / est_den).alias("hll_estimate"),
    )
    return out


# ---------------------------------------------------------------------
# AMS / tug-of-war F2 sketch — the second frequency moment (self-join
# size) estimated in constant state. F2 = Σ_t c_t² is what a join
# planner wants ("how big is the self-join on this key?") but exact F2
# needs the full per-key histogram; AMS (Alon-Matias-Szegedy, STOC'96)
# keeps only k signed counters: sketch_j = Σ_t c_t·s_j(t) with random
# signs s_j ∈ {±1}, and E[sketch²] = F2. Median-of-means over groups
# bounds the error. Signs here come from the deterministic
# xor-shift-multiply finalizer (seeded per estimator) instead of
# 4-wise-independent polynomials — reproducible across engines and
# runs, adequate mixing in practice (documented deviation from the
# paper's independence guarantee).
# ---------------------------------------------------------------------

AMS_ESTIMATORS = 16
AMS_GROUPS = 4


def ams_f2(df: DataFrame, item_col: str) -> DataFrame:
    """Estimate F2 of ``df[item_col]`` with 16 sign-hash estimators in
    4 median-of-means groups, next to the EXACT F2 for calibration.

    All-integer pipeline: per-term counts (one hash aggregation — at
    real scale this is the one data-sized shuffle; the sketch itself
    is mergeable so partial sketches could skip it entirely), a 16-way
    posexplode over the VOCABULARY (not the corpus), per-estimator
    int64 dot products, squares, group sums, and the LOWER-median
    (2nd-smallest of 4 — a rank pick, not an interpolation) scaled ×4
    so the group mean never divides. One double division at the end
    for the ratio. Overflow: sketch_j ≤ Σc = |corpus| and its square
    must fit int64 — safe to ~3·10⁹ occurrences, ANSI aborts loudly
    beyond.

    Returns one row (n_terms, exact_f2, f2_est_x4, est_over_exact).
    """
    counts = df.groupBy(F.col(item_col).alias("term")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    h0 = _raw_rolling_hash(
        F.rpad(F.col("term").cast("string"), KMV_PAD, "#"), mod=(1 << 31) - 1
    )
    s1 = (h0.bitwiseXOR(F.shiftright(h0, 16)) * F.lit(73244475)) % F.lit(1 << 32)
    h32 = s1.bitwiseXOR(F.shiftright(s1, 16))
    signs = []
    for j in range(AMS_ESTIMATORS):
        t0 = (h32 + F.lit(j * 40503)) % F.lit(4294967296)
        t1 = (t0.bitwiseXOR(F.shiftright(t0, 16)) * F.lit(73244475)) % F.lit(
            4294967296
        )
        t2 = t1.bitwiseXOR(F.shiftright(t1, 16))
        signs.append(F.lit(1) - F.lit(2) * (t2 % F.lit(2)))
    exploded = counts.select(
        "c", F.posexplode(F.array(*signs)).alias("j", "sign")
    )
    sketches = exploded.groupBy("j").agg(
        F.sum(F.col("c") * F.col("sign")).cast("bigint").alias("s")
    )
    groups = sketches.groupBy(F.expr("j div 4").alias("g")).agg(
        F.sum(F.col("s") * F.col("s")).cast("bigint").alias("gs")
    )
    from pyspark.sql import Window

    w = Window.orderBy("gs", "g")
    med = (
        groups.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 2)
        .select(F.col("gs").alias("f2_est_x4"))
    )
    exact = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("exact_f2"),
    )
    return exact.crossJoin(F.broadcast(med)).select(
        "n_terms",
        "exact_f2",
        "f2_est_x4",
        (
            F.col("f2_est_x4").cast("double")
            / (F.lit(4).cast("double") * F.col("exact_f2").cast("double"))
        ).alias("est_over_exact"),
    )


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    item_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV set-operation estimates (Beyer et al., SIGMOD'07 "On
    synopses for distinct-value estimation under multiset
    operations"): union size, Jaccard, and intersection size of two
    sets from their k-min-value sketches ONLY — the mergeable
    bounded-state path for cross-corpus overlap questions (the exact
    `source_overlap_matrix` twin for when corpora are too large to
    join exactly).

    Estimators over the combined sketch su = k smallest of sa ∪ sb:
      - union_est: (k−1)·M / h_(k) (the kmv_estimate form);
      - jaccard: |{h ∈ su : h ∈ sa AND h ∈ sb}| / k — membership is
        tested against the two SKETCHES, never the raw sets;
      - inter_est = jaccard · union_est, evaluated as the single
        double division shared·(k−1)·M / (k·h_k) (products ≤ ~4e18,
        inside int64; one IEEE division is engine-exact).
    When the combined sketch holds fewer than k hashes the universe
    was fully seen: all three are exact (union = n_held, inter =
    shared), and both engines take the same branch.

    Scale shape: two distinct-shuffles + three k-row window picks;
    only sketch rows (≤ 3k) move afterwards. Returns one row:
    (n_held, shared, union_est, jaccard_ppm, inter_est).
    """
    sa = kmv_build(a, item_col, k=k)
    sb = kmv_build(b, item_col, k=k)
    su = kmv_merge(sa, sb, k=k)
    shared = (
        su.join(sa.select("h"), "h", "semi")
        .join(sb.select("h"), "h", "semi")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    agg = su.agg(F.count(F.lit(1)).alias("n_held"), F.max("h").alias("h_k"))
    j = agg.crossJoin(shared)
    full = F.col("n_held") < k
    return j.select(
        F.col("n_held").cast("bigint").alias("n_held"),
        F.col("shared").cast("bigint").alias("shared"),
        F.when(full, F.col("n_held").cast("double"))
        .otherwise(
            (F.lit(float(k - 1)) * F.lit(float(KMV_MOD))) / F.col("h_k").cast("double")
        )
        .alias("union_est"),
        F.when(
            full,
            F.expr(f"CAST(1000000 * shared AS BIGINT) div greatest(n_held, 1L)"),
        )
        .otherwise(F.expr(f"CAST(1000000 * shared AS BIGINT) div {k}"))
        .alias("jaccard_ppm"),
        F.when(full, F.col("shared").cast("double"))
        .otherwise(
            (F.col("shared") * F.lit(k - 1) * F.lit(KMV_MOD)).cast("double")
            / (F.lit(k) * F.col("h_k")).cast("double")
        )
        .alias("inter_est"),
    )


def cms_inner_product(s1: DataFrame, s2: DataFrame) -> DataFrame:
    """Join-size (inner-product) estimate from two CMS sketches
    (Cormode & Muthukrishnan's §4.2 estimator, J.Algorithms 2005):
    for each hash row r, Σ_cell a[r,c]·b[r,c] ≥ Σ_k f_A(k)·f_B(k),
    and the estimate is the MIN over rows — the planner's "how big
    is this join" question answered from two ≤ depth×width sketches
    without touching either table again. Always an OVERestimate
    (collisions only add mass); error ≤ e/width · F1(A)·F1(B) per
    the paper. Equi-join on (row, cell), then a depth-row min —
    nothing data-sized.

    Returns one row: (est,).

    Sparse-row dropout guard (ADVICE r7): the sketches are stored
    sparsely, so a hash row whose cells are fully disjoint between the
    two sketches has a TRUE dot of 0 — it must participate in the min
    as 0, not vanish from the inner join (which would weaken the
    min-over-rows estimator, and with fully disjoint inputs leave
    ``est`` NULL instead of 0). Left-join the per-row dots against the
    union of observed row ids and coalesce missing dots to 0.
    """
    j = s1.alias("a").join(s2.alias("b"), ["row", "cell"])
    dots = j.groupBy("row").agg(
        F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("bigint").alias("dot")
    )
    rows = s1.select("row").union(s2.select("row")).distinct()
    per_row = rows.join(dots, "row", "left").select(
        F.coalesce(F.col("dot"), F.lit(0)).cast("bigint").alias("dot")
    )
    return per_row.agg(
        F.coalesce(F.min("dot"), F.lit(0)).cast("bigint").alias("est")
    )


def kmv_pairwise_setops(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise KMV set-operation estimates between groups (Beyer et
    al., SIGMOD 2007): per group, the k smallest distinct item
    hashes; per group PAIR, the union estimate off the MERGED k-min
    sketch, the Jaccard estimate (fraction of the merged k-min
    present in BOTH sketches — valid because the union's k-th
    smallest is ≤ either side's, so membership is decidable from the
    sketches alone), and the intersection estimate jaccard × union.
    The N-group all-pairs generalization of :func:`kmv_set_ops` (two
    fixed corpora): sketches build once per GROUP via the grouped
    threshold recipe, then |groups|·(|groups|−1)/2 pair estimates
    come out of bounded-table algebra — "how much does each corpus
    overlap each other corpus" without touching any corpus twice.

    Scale shape: one distinct-shuffle to (group, hash); per-group
    k-th-smallest THRESHOLDS via grouped_kth_smallest's
    range-partition recipe (k_of_n = least(n, k) — no data-sized
    PARTITION BY window, no NULL branch); one broadcast threshold
    join cuts the sketches to ≤ k rows per group, pinned eagerly
    (they feed per-group estimates AND every pair). Pair algebra
    runs over ≤ |groups|²·2k bounded rows. Estimates follow
    kmv_estimate: exact below k, else (k−1)·M/h_k — one double
    division.

    Returns (src_a, src_b, est_a, est_b, est_union, jaccard_ppm,
    est_intersection), one row per unordered group pair.
    """
    from pyspark.sql import Window

    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_kth_smallest,
    )

    hashes = df.select(
        F.col(group_col).alias("g"),
        _raw_rolling_hash(F.rpad(F.col(item_col), KMV_PAD, "#")).alias("h"),
    ).distinct()
    # with_ranged: the threshold cut joins back onto the recipe's
    # OWN pinned ranged copy of `hashes` — without it the sk pin is
    # a second action and recomputes the whole tokenize+distinct
    # upstream (r12; guide §5 avoid needless recomputation)
    th, ranged = grouped_kth_smallest(
        hashes, "g", "h", k_of_n=f"least(n, {k})", with_ranged=True
    )
    sk = (
        ranged.join(
            F.broadcast(th.select("g", F.col("kth_value").alias("_thr"))), "g"
        )
        .where(F.col("h") <= F.col("_thr"))
        .select("g", "h")
        .localCheckpoint(eager=True)  # feeds per-group ests + all pairs
    )
    est = sk.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("held"),
        F.max("h").alias("hk"),
    )
    big_m = float(k - 1) * float(KMV_MOD)
    est = est.select(
        "g",
        F.when(F.col("held") < k, F.col("held").cast("double"))
        .otherwise(F.lit(big_m) / F.col("hk").cast("double"))
        .alias("est"),
    ).localCheckpoint(eager=True)  # |groups| rows; feeds pairs + 2 joins
    srcs = est.select("g")
    pairs = (
        srcs.alias("a")
        .join(F.broadcast(srcs.alias("b")), F.expr("a.g < b.g"))
        .selectExpr("a.g AS ga", "b.g AS gb")
    )
    sides = pairs.selectExpr(
        "explode(array(struct(ga AS ga, gb AS gb, ga AS g),"
        " struct(ga AS ga, gb AS gb, gb AS g))) AS e"
    ).select("e.ga", "e.gb", "e.g")
    ph = (
        sides.join(sk, "g")
        .groupBy("ga", "gb", "h")
        .agg(F.count(F.lit(1)).alias("n_sides"))
    )
    w_pair = Window.partitionBy("ga", "gb").orderBy("h")
    pr = ph.withColumn("pos", F.row_number().over(w_pair)).where(
        F.col("pos") <= k
    )
    um = pr.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).cast("bigint").alias("u_held"),
        F.max("h").alias("hu_k"),
        F.count_if(F.col("n_sides") == 2).cast("bigint").alias("n_both"),
    )
    return (
        um.join(F.broadcast(est.selectExpr("g AS ga", "est AS est_a")), "ga")
        .join(F.broadcast(est.selectExpr("g AS gb", "est AS est_b")), "gb")
        .selectExpr(
            "ga AS src_a",
            "gb AS src_b",
            "est_a",
            "est_b",
            f"CASE WHEN u_held < {k} THEN CAST(u_held AS DOUBLE)"
            f" ELSE CAST({big_m!r} AS DOUBLE) / CAST(hu_k AS DOUBLE)"
            " END AS est_union",
            "CAST((n_both * 1000000) div u_held AS BIGINT) AS jaccard_ppm",
            "CAST(n_both AS DOUBLE) / u_held *"
            f" (CASE WHEN u_held < {k} THEN CAST(u_held AS DOUBLE)"
            f"  ELSE CAST({big_m!r} AS DOUBLE) / CAST(hu_k AS DOUBLE) END)"
            " AS est_intersection",
        )
    )
