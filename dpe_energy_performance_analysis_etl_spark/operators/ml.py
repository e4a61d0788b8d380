"""Classic-ML training primitives in bit-portable exact arithmetic.

Two operators a training-data pipeline runs ON the corpus (not a
model-serving layer):

- ``kmeans_lloyd_portable``: Lloyd's k-means (the float version
  already powers IVF training — ``similarity/ivf.py
  train_ivf_centroids``) reformulated over integer-scaled vectors so
  a fixed number of rounds replays bit-identically in SQL — the
  PageRank/LPA portability recipe applied to clustering. This is the
  oracle-checkable twin; the float path remains the production
  trainer.
- ``decision_stump_binned``: exact best-split search for a one-level
  decision tree over a binned numeric feature — the core inner loop
  of gradient-boosting/quality-classifier training, and the
  histogram-split trick (LightGBM's binning) is exactly what makes it
  scale: cumulative class counts over a FIXED bin table, never a sort
  of the raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _int_vec(vec_col: Column, scale_pow2: int = 10, offset: int = 1024) -> Column:
    """float array → NON-NEGATIVE integer array: floor(x·2^s) + off.

    The 2^s scale is exact in binary floating point and the floor is
    then engine-exact; the offset keeps every coordinate ≥ 0 as a
    belt-and-braces guard for integer division semantics. (Measured
    on the in-env DuckDB 1.x: BIGINT `//` also truncates toward zero,
    -3 // 2 = -1, matching Spark `div` — so the engines agree on
    negatives too; the offset is retained because it is free,
    distance-invariant, and insulates against any engine/version
    whose integer division floors.)
    """
    return F.transform(
        vec_col,
        lambda x: (
            F.floor(x.cast("double") * F.lit(float(1 << scale_pow2)))
            + F.lit(offset)
        ).cast("bigint"),
    )


def _sq_dist_int(a: Column, b: Column) -> Column:
    """Σ_d (a_d − b_d)² as int64 — exact, order-free."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _lloyd_fit(
    vectors: DataFrame,
    k: int,
    iterations: int,
    vec_col: str,
    id_col: str,
):
    """The shared Lloyd loop behind :func:`kmeans_lloyd_portable` and
    :func:`kmeans_validity_indices`: deterministic lowest-id seeds,
    integer coordinates, min-struct argmin, integer-division centroid
    updates, per-round eager checkpoint of the bounded centroid
    table. Returns (cached base, last-round assignment, FINAL
    post-update centroids) — note the assignment's ``dist`` is
    against the centroids ENTERING the last round (the same
    convention the unrolled oracle replays)."""
    base = vectors.select(
        F.col(id_col).alias("vid"), _int_vec(F.col(vec_col)).alias("v")
    ).cache()
    cents = (
        base.orderBy("vid")
        .limit(k)
        .select(F.col("vid").cast("bigint").alias("cluster"), F.col("v").alias("c"))
    )

    assigned = None
    for _ in range(iterations):
        # argmin over the k broadcast centroids, ROW-LOCALLY: the
        # centroids fold to a ONE-row array and each vector picks its
        # min-(dist, id) struct with array_min(transform(...)) inside
        # the projection. The previous crossJoin-k-rows + groupBy(vid)
        # form shuffled k copies of every full vector per round (r12;
        # guide §2.3 — the argmin needs no exchange at all). The two
        # field reads of `best` are codegen-CSE'd (one array scan).
        cents_arr = cents.agg(
            F.collect_list(F.struct("cluster", "c")).alias("cs")
        )
        best = F.array_min(
            F.transform(
                F.col("cs"),
                lambda s: F.struct(
                    _sq_dist_int(F.col("v"), s["c"]).alias("dist"),
                    s["cluster"].alias("cluster"),
                ),
            )
        )
        assigned = base.crossJoin(F.broadcast(cents_arr)).select(
            "vid",
            "v",
            best["cluster"].alias("cluster"),
            best["dist"].alias("dist"),
        )
        dims = assigned.select(
            "cluster", F.posexplode("v").alias("d", "x")
        )
        cents = (
            dims.groupBy("cluster", "d")
            .agg(F.expr("sum(x) div count(1)").alias("cd"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "cd"))),
                    lambda s: s["cd"],
                ).alias("c")
            )
        )
        # small (k×dim) table consumed by next round's broadcast AND
        # the final centroid_sum — materialize eagerly, cut lineage
        cents = cents.localCheckpoint()

    return base, assigned, cents


def kmeans_lloyd_portable(
    vectors: DataFrame,
    k: int = 8,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd's k-means (fixed rounds, deterministic seeds = the k
    lowest-id vectors) in pure integer arithmetic:

      assign: cluster = argmin_c Σ_d (x_d − c_d)², ties → smallest
              cluster id (min-struct pick — engine-exact)
      update: c_d = (Σ members x_d) div |members|  (non-negative
              integer division — identical trunc/floor on both
              engines thanks to the +offset shift in ``_int_vec``)

    Every round is a pure function of the previous centroids, so an
    unrolled SQL replay is bit-identical — the iterative-oracle
    property PageRank/LPA/HITS use, now for clustering.

    Scale shape per round: one broadcast of the k×dim centroid table,
    one |V|-row argmin (array codegen, no explode of the corpus), one
    (cluster, dim) aggregation of the EXPLODED members — |V|·dim rows
    keyed on (cluster, dim), map-side combinable. Empty clusters drop
    out (both engines agree). Distance bound: dim·(2·offset)² ≈ 2.7e8
    per pair — int64 headroom to ~10^10-dim·count products.

    Returns per surviving cluster: (cluster, n_members, inertia,
    centroid_sum) — counts and integer sums only, scalar output for
    the hash gate.
    """
    base, assigned, cents = _lloyd_fit(vectors, k, iterations, vec_col, id_col)

    cent_sums = cents.select(
        "cluster",
        F.aggregate(
            F.col("c"), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("centroid_sum"),
    )
    stats = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("dist").cast("bigint").alias("inertia"),
    )
    return stats.join(cent_sums, "cluster").select(
        "cluster", "n_members", "inertia", "centroid_sum"
    )


def decision_stump_binned(
    df: DataFrame,
    feature_col: str,
    label_col: Column,
    n_bins: int = 256,
) -> DataFrame:
    """Exact best binary split of a binned numeric feature against a
    0/1 label — one boosting/tree inner step, scored by weighted Gini
    impurity. Histogram trick (the LightGBM/XGBoost-hist recipe):

      1. global (min, max) → ``n_bins`` equi-width bins — ONE
         aggregation over the data, bin assignment is a row-local
         expression (same floor form as histogram_quantiles, IEEE-
         deterministic);
      2. per-bin (pos, neg) counts — the only data-sized shuffle,
         keyed on ≤ n_bins values, map-side combinable;
      3. cumulative counts over the BIN table (window over ≤ n_bins
         rows), candidate split after every non-terminal bin;
      4. score = pos_l·neg_l/total_l + pos_r·neg_r/total_r — each
         term ONE double division of int64 products, a two-term sum
         (fixed order, deterministic); argmin via (score, bucket)
         rank pick.

    Returns one row: (split_bucket, split_value, pos_left, neg_left,
    pos_right, neg_right, gini_score).
    """
    v = F.col(feature_col)
    bounds = df.agg(
        F.min(v).cast("double").alias("lo"), F.max(v).cast("double").alias("hi")
    )
    labeled = df.select(
        v.alias("val"), label_col.cast("int").alias("y")
    ).crossJoin(F.broadcast(bounds))
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    # degenerate constant feature (hi == lo): width is 0.0 and the
    # floor sees 0.0/0.0 = NaN — Spark's (long)NaN is 0 but a SQL
    # twin raises on CAST(NaN AS BIGINT). Pin bucket 0 explicitly so
    # both engines agree (result is then empty: no right side exists,
    # which is the correct "no split" answer for a constant feature).
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.greatest(
                F.floor((F.col("val").cast("double") - F.col("lo")) / width).cast(
                    "bigint"
                ),
                F.lit(0),
            ),
            F.lit(n_bins - 1),
        )
    )
    bins = labeled.groupBy(bucket.alias("bucket")).agg(
        F.sum("y").cast("bigint").alias("pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("neg"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bucket",
        "lo",
        "hi",
        F.sum("pos").over(w).alias("pl"),
        F.sum("neg").over(w).alias("nl"),
    )
    tot = bins.agg(
        F.sum("pos").cast("bigint").alias("tp"), F.sum("neg").cast("bigint").alias("tn")
    )
    cand = cum.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "lo",
        "hi",
        "pl",
        "nl",
        (F.col("tp") - F.col("pl")).alias("pr"),
        (F.col("tn") - F.col("nl")).alias("nr"),
    )
    tl = F.col("pl") + F.col("nl")
    tr = F.col("pr") + F.col("nr")
    score = (F.col("pl") * F.col("nl")).cast("double") / tl.cast("double") + (
        F.col("pr") * F.col("nr")
    ).cast("double") / tr.cast("double")
    scored = cand.filter((tl > 0) & (tr > 0)).select(
        "bucket",
        "lo",
        "hi",
        "pl",
        "nl",
        "pr",
        "nr",
        score.alias("gini_score"),
    )
    w_pick = Window.orderBy("gini_score", "bucket")
    best = scored.withColumn("rn", F.row_number().over(w_pick)).filter(
        F.col("rn") == 1
    )
    return best.select(
        F.col("bucket").alias("split_bucket"),
        (
            F.col("lo")
            + (F.col("bucket") + 1).cast("double")
            * ((F.col("hi") - F.col("lo")) / F.lit(float(n_bins)))
        ).alias("split_value"),
        F.col("pl").alias("pos_left"),
        F.col("nl").alias("neg_left"),
        F.col("pr").alias("pos_right"),
        F.col("nr").alias("neg_right"),
        "gini_score",
    )


def principal_direction_power(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 3,
    scale_pow2: int = 10,
    v_pow2: int = 20,
) -> DataFrame:
    """Top principal direction of an embedding column by fixed-round
    power iteration over the EXACT integer Gram/covariance matrix —
    the PageRank/HITS bit-portability recipe applied to PCA (the
    classic von Mises iteration; at 100 TB this is how you get the
    dominant axis of an embedding corpus without ever materializing
    floats that two engines round differently).

    Exact pipeline:
      1. x = floor(v·2^s) int64 coords (``_int_vec`` scaling, no
         offset needed — covariance is shift-invariant by
         construction).
      2. Scatter covariance: G_ij = n·Σ x_i x_j − S_i·S_j, computed
         from a ROW-LOCAL d² pair explode (no join; explode →
         groupBy(i,j), map-side combinable, d²=4096 cells bounded) —
         all int64 exact.
      3. Deterministic dynamic rescale: q_g = max|G| div 2^36 + 1,
         G' = G div q_g (truncation toward zero — Spark `div` and
         DuckDB `//` agree) so each matvec term stays in int64:
         |G'·v·d| ≤ 2^36·2^20·2^6 = 2^62.
      4. ``iterations`` rounds of v ← G'·v with renorm
         v = w div (max|w| div 2^v_pow2 + 1) — the divide-FIRST
         renorm, because w·2^20 would overflow where HITS's
         (a·S) div max does not; costs ≤1 bit of precision per
         round, irrelevant for direction convergence.

    Every step is an integer expression over the d²-row matrix →
    the unrolled SQL replays bit-identically. Returns
    (dim, component_scaled) — d rows, |component| ≤ 2^v_pow2.
    """
    d2x = F.transform(vectors[vec_col], lambda x: F.floor(
        x.cast("double") * F.lit(float(1 << scale_pow2))
    ).cast("bigint"))
    rows = vectors.select(d2x.alias("x"))
    # row-local (i, j, xi*xj) triples: no join, one explode
    pairs = rows.select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(x, (xi, i) -> transform(x, (xj, j) ->"
                    " struct(i AS i, j AS j, xi * xj AS p)))"
                )
            )
        ).alias("t")
    ).select("t.i", "t.j", "t.p")
    sums = rows.select(F.posexplode("x").alias("i", "xi")).groupBy("i").agg(
        F.sum("xi").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    gram = (
        pairs.groupBy("i", "j")
        .agg(F.sum("p").cast("bigint").alias("sxx"))
        .join(F.broadcast(sums.select(F.col("i"), F.col("s").alias("si"), "n")), "i")
        .join(F.broadcast(sums.select(F.col("i").alias("j"), F.col("s").alias("sj"))), "j")
        .select(
            "i",
            "j",
            (F.col("n") * F.col("sxx") - F.col("si") * F.col("sj")).alias("g"),
        )
        .cache()
    )
    qg = gram.agg(
        F.expr(f"max(abs(g)) div {1 << 36} + 1").cast("bigint").alias("qg")
    )
    gq = gram.crossJoin(F.broadcast(qg)).selectExpr("i", "j", "g div qg AS g")
    gq = gq.cache()
    d_dims = sums.select(F.col("i").alias("dim"))
    v = d_dims.select("dim", F.lit(1 << v_pow2).cast("bigint").alias("v"))
    for _ in range(iterations):
        w = (
            gq.join(v.selectExpr("dim AS j", "v"), "j")
            .groupBy("i")
            .agg(F.sum(F.expr("g * v")).cast("bigint").alias("w"))
        )
        qw = w.agg(
            F.expr(f"max(abs(w)) div {1 << v_pow2} + 1").cast("bigint").alias("qw")
        )
        v = (
            w.crossJoin(F.broadcast(qw))
            .selectExpr("i AS dim", "w div qw AS v")
            .localCheckpoint()
        )
    return v.select("dim", F.col("v").alias("component_scaled"))


def als_rank1_rounds(
    ratings: DataFrame,
    user: str = "u",
    item: str = "i",
    rating: str = "r",
    rounds: int = 2,
) -> DataFrame:
    """Rank-1 ALS (Zhou et al., AAIM'08 shape, k=1) with INTEGER
    dyadic-scaled factors — the alternating-least-squares step a
    recommender pipeline runs at scale, reduced to its exactly
    reproducible core: for k=1 each alternation has the closed form
    x_u = Σ_i r·y_i / Σ_i y_i², y_i = Σ_u r·x_u / Σ_u x_u² — two
    aggregations per half-step, each one shuffle keyed on the
    updating side.

    Factors are stored ×2^20; each half-step computes
    ``new = (Σ r·f << 20) div greatest(Σ f² >> 20, 1)`` — both
    shifts and the truncating div are engine-exact on non-negative
    int64, so the whole trajectory is bit-reproducible (the same
    discipline as kmeans_lloyd_portable / HITS). With ratings ≤ ~2^14
    per pair, per-key degree ≤ ~2^6 and factors ≤ ~2^25, every
    intermediate stays ≤ ~2^59.

    Scale shape: the factor tables are key-partitioned aggregates of
    the ratings table (map-side combinable); no factor table is ever
    collected or broadcast (k=1 keeps them columnar); ``rounds``
    half-step PAIRS run, each re-reading the cached ratings.

    Returns (kind 'user'|'item', id, factor_scaled).
    """
    r = (
        ratings.select(
            F.col(user).cast("bigint").alias("u"),
            F.col(item).cast("bigint").alias("i"),
            F.col(rating).cast("bigint").alias("r"),
        )
        .groupBy("u", "i")
        .agg(F.sum("r").alias("r"))
        .cache()
    )
    y = r.select("i").distinct().select(
        "i", F.lit(1 << 20).cast("bigint").alias("f")
    )
    x = None
    for _ in range(rounds):
        x = (
            r.join(y, "i")
            .groupBy("u")
            .agg(
                F.expr(
                    "shiftleft(sum(r * f), 20) div "
                    "greatest(shiftright(sum(f * f), 20), 1L)"
                ).alias("f")
            )
        ).localCheckpoint()
        y = (
            r.join(x, "u")
            .groupBy("i")
            .agg(
                F.expr(
                    "shiftleft(sum(r * f), 20) div "
                    "greatest(shiftright(sum(f * f), 20), 1L)"
                ).alias("f")
            )
        ).localCheckpoint()
    out = (
        x.select(F.lit("user").alias("kind"), F.col("u").alias("id"), F.col("f").alias("factor_scaled"))
        .unionByName(
            y.select(F.lit("item").alias("kind"), F.col("i").alias("id"), F.col("f").alias("factor_scaled"))
        )
        .localCheckpoint()
    )
    r.unpersist()
    return out


def isotonic_fit_minimax(
    bins: DataFrame,
    bin_col: str = "bin",
    sum_col: str = "s",
    cnt_col: str = "c",
    scale: int = 10**12,
) -> DataFrame:
    """Isotonic regression (PAVA solution) of a BOUNDED pre-binned
    table via the minimax identity fitted(k) = max_{i<=k} min_{j>=k}
    mean(y[i..j]) (Robertson-Wright-Dykstra 1988, eq. 1.9 — the
    closed form equal to pool-adjacent-violators) — the calibration
    step behind monotone probability calibration (pairs with the
    `calibration_ece_orders` family).

    The identity enumerates O(B²) contiguous segments and a O(B³)
    (i,j,k) association — deliberate: the input is a BIN table (B ≤
    tens), never raw rows; the raw-data aggregation into (bin, Σy,
    n) is the caller's one data-sized pass. Segment means are
    integer-scaled truncating divisions (identical on both engines
    for the non-negative sums), so max-of-min over them is
    engine-exact; the result is the PAVA fit up to 1/scale.

    Returns (bin, n, s, fitted_scaled), fitted monotone nondecreasing.
    """
    from pyspark.sql import Window

    b = bins.select(
        F.col(bin_col).cast("bigint").alias("bin"),
        F.col(sum_col).cast("bigint").alias("s"),
        F.col(cnt_col).cast("bigint").alias("c"),
    )
    # global window over the BIN table — bounded by construction
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pref = b.select(
        "bin",
        "s",
        "c",
        F.sum("s").over(w).alias("cs"),
        F.sum("c").over(w).alias("cc"),
    ).cache()
    lo = pref.select(
        F.col("bin").alias("i"),
        (F.col("cs") - F.col("s")).alias("cs0"),
        (F.col("cc") - F.col("c")).alias("cc0"),
    )
    hi = pref.select(F.col("bin").alias("j"), "cs", "cc")
    segs = (
        lo.join(hi, F.col("i") <= F.col("j"))
        .select(
            "i",
            "j",
            F.expr(
                f"(CAST({scale} AS BIGINT) * (cs - cs0)) div greatest(cc - cc0, 1L)"
            ).alias("mean_scaled"),
        )
    )
    ks = b.select(F.col("bin").alias("k"))
    inner = (
        segs.join(ks, F.col("j") >= F.col("k"))
        .where(F.col("i") <= F.col("k"))
        .groupBy("i", "k")
        .agg(F.min("mean_scaled").alias("inner_min"))
    )
    fitted = inner.groupBy("k").agg(F.max("inner_min").alias("fitted_scaled"))
    out = (
        pref.select("bin", "c", "s")
        .join(fitted.withColumnRenamed("k", "bin"), "bin")
        .select("bin", F.col("c").alias("n"), "s", "fitted_scaled")
        .localCheckpoint()
    )
    pref.unpersist()
    return out


def naive_bayes_odds_gate(
    train: DataFrame,
    score: DataFrame,
    features: list[str],
    label: str = "y",
    lik_scale: int = 1000,
) -> DataFrame:
    """Bernoulli naive Bayes over BINARY features with the decision
    made by an exact INTEGER odds comparison — no logs, no floats,
    so train+score is bit-reproducible on any engine (the log-space
    formulation every float NB uses is libm-dependent and would
    break the oracle gate).

    Train: one aggregation pass builds Laplace-smoothed likelihoods
    l(j,c,v) = div(lik_scale·(n_{j,c,v}+1), n_c+2) — scaled to a
    FIXED precision so the model is independent of the training-set
    size (counts grow with data; the scaled fractions don't —
    the 100 TB-safe form). The model is O(features) numbers: it is
    pulled to the driver (a bounded scalar pull, same class as the
    imputation stats) and scoring compiles to literal CASE
    expressions — pure codegen, zero joins, zero shuffle per row.

    Decision: predict 1 iff
    prior1·Π_j l(j,1,v_j) >= prior0·Π_j l(j,0,v_j), with priors
    div(lik_scale·n_c, n). With lik_scale=1000 and ≤5 features every
    product stays <= 10^18 < 2^63.

    Returns the confusion matrix (pred, actual, n).
    """
    if not 1 <= len(features) <= 5:
        raise ValueError("naive_bayes_odds_gate supports 1..5 binary features")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in (0, 1):
        aggs.append(
            F.sum((F.col(label) == c).cast("bigint")).alias(f"n{c}")
        )
        for j, f in enumerate(features):
            for v in (0, 1):
                aggs.append(
                    F.sum(
                        ((F.col(label) == c) & (F.col(f) == v)).cast("bigint")
                    ).alias(f"n_{j}_{c}_{v}")
                )
    m = train.agg(*aggs).collect()[0]
    lik = {
        (j, c, v): lik_scale * (m[f"n_{j}_{c}_{v}"] + 1) // (m[f"n{c}"] + 2)
        for j in range(len(features))
        for c in (0, 1)
        for v in (0, 1)
    }
    prior = {c: lik_scale * m[f"n{c}"] // m["n"] for c in (0, 1)}
    odds = {}
    for c in (0, 1):
        e = F.lit(prior[c]).cast("bigint")
        for j, f in enumerate(features):
            e = e * F.when(
                F.col(f) == 1, F.lit(lik[(j, c, 1)]).cast("bigint")
            ).otherwise(F.lit(lik[(j, c, 0)]).cast("bigint"))
        odds[c] = e
    return (
        score.select(
            (odds[1] >= odds[0]).cast("int").alias("pred"),
            F.col(label).cast("int").alias("actual"),
        )
        .groupBy("pred", "actual")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bradley_terry_mm(
    matches: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    rounds: int = 3,
) -> DataFrame:
    """Bradley-Terry pairwise-preference strengths (Bradley & Terry
    1952) fitted with Hunter's MM algorithm (Annals of Statistics
    2004) — the model behind arena-style LLM-eval leaderboards:
    P(i beats j) = pᵢ/(pᵢ+pⱼ), updated as

        pᵢ' = Wᵢ / Σ_j n_ij/(pᵢ+pⱼ)     (then renormalized)

    Exactness discipline (the Markov-attribution pattern): the ONE
    data-sized pass aggregates matches to the pairwise game matrix
    n_ij and win totals Wᵢ — bounded by players², collected to the
    driver where the MM rounds run in EXACT Python integers
    (strengths in ppm; each term is (n_ij·10¹²) div (pᵢ+pⱼ); the
    round ends with a Σp renormalization to players·10⁶). Both
    engines replay the identical integer schedule, so an unrolled
    SQL twin is bit-equal. Ties and self-matches must be excluded
    upstream (a match needs a strict winner).

    Returns (player, strength_ppm, games, wins) after ``rounds`` MM
    rounds from the uniform start.
    """
    pair_counts = {
        (r["w"], r["l"]): r["n"]
        for r in matches.groupBy(
            F.col(winner_col).alias("w"), F.col(loser_col).alias("l")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }  # bounded: O(players^2) model state
    return _bt_fit(matches.sparkSession, pair_counts, rounds)


def bradley_terry_from_counts(
    counts: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    n_col: str = "n",
    rounds: int = 3,
) -> DataFrame:
    """``bradley_terry_mm`` from an ALREADY-aggregated pairwise win
    matrix (winner, loser, n) — the entry point for incrementally
    maintained leaderboards: pair counts are an additive monoid, so a
    streaming job merges per-batch deltas into state
    (streaming/incremental.py ``maintained_agg_stream`` with
    (winner, loser) keys) and this fit reads the state whenever a
    fresh leaderboard is wanted — the MM rounds replay the identical
    integer schedule as the batch twin, so stream == batch exactly."""
    pair_counts = {
        (r["w"], r["l"]): int(r["n"])
        for r in counts.select(
            F.col(winner_col).alias("w"),
            F.col(loser_col).alias("l"),
            F.col(n_col).alias("n"),
        ).collect()
    }
    return _bt_fit(counts.sparkSession, pair_counts, rounds)


def _bt_fit(spark, pair_counts: dict, rounds: int) -> DataFrame:
    players = sorted({w for w, _ in pair_counts} | {l for _, l in pair_counts})
    games: dict[tuple[str, str], int] = {}
    wins = {p: 0 for p in players}
    for (w, l), n in pair_counts.items():
        games[(w, l)] = games.get((w, l), 0) + n
        games[(l, w)] = games.get((l, w), 0) + n
        wins[w] += n
    UNIT = 10**6
    S = 10**12
    p = {pl: UNIT for pl in players}
    for _ in range(rounds):
        nxt = {}
        for i in players:
            d = 0
            for j in players:
                n_ij = games.get((i, j), 0)
                if n_ij:
                    # both-zero strengths (a winless pair playing only
                    # each other) must not divide by zero
                    d += (n_ij * S) // max(p[i] + p[j], 1)
            nxt[i] = (wins[i] * S) // max(d, 1)
        tot = max(sum(nxt.values()), 1)
        p = {i: (v * len(players) * UNIT) // tot for i, v in nxt.items()}
    rows = [
        (
            pl,
            p[pl],
            # each match involving pl lands in exactly one (pl, j) key
            sum(n for (a, _), n in games.items() if a == pl),
            wins[pl],
        )
        for pl in players
    ]
    return spark.createDataFrame(
        rows, "player string, strength_ppm bigint, games bigint, wins bigint"
    )


def ips_policy_value(
    logged: DataFrame,
    context_col: str,
    action_col: str,
    reward_col: str,
    split_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Inverse-propensity-scored off-policy evaluation (Horvitz &
    Thompson JASA'52; Li et al. WSDM'11's replay/IPS form for
    contextual bandits): estimate what a NEW deterministic policy
    would have earned from logs collected under a different policy,
    without deploying it. ``split_col`` (0 = train, 1 = eval) must be
    a TIME-based split (the walk-forward rule — a random split leaks
    the eval period into both the policy and the propensities).

    From the train split: empirical propensities p(a|x) =
    n(x,a)/n(x), and the target policy pi(x) = argmax_a of
    integer-scaled mean reward (sum_r * scale div n), ties to the
    lexicographically smallest action. On the eval split each row
    contributes reward * 1{a = pi(x)} / p(a|x) — realized exactly as
    floor(reward * n_ctx * scale / n_ctx_act) per row, then an exact
    integer sum (per-row flooring = deterministic, order-free,
    engine-identical).

    Scale shape: two bounded model tables (|contexts| x |actions|)
    from one train aggregation, broadcast onto the eval stream; one
    final single-row aggregate. Contexts unseen in training
    contribute nothing (no propensity — standard IPS support
    restriction, reported via n_unsupported).

    Returns one row: (n_eval, n_matched, n_unsupported,
    ips_value_scaled, matched_reward) — ips_value_scaled =
    floor-summed IPS total at ``scale``; divide by n_eval for the
    per-round value.
    """
    x = F.col(context_col).alias("x")
    a = F.col(action_col).alias("a")
    train = logged.where(F.col(split_col) == 0).select(
        x, a, F.col(reward_col).cast("bigint").alias("r")
    )
    ev = logged.where(F.col(split_col) == 1).select(
        x, a, F.col(reward_col).cast("bigint").alias("r")
    )
    ctx_act = train.groupBy("x", "a").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_xa"),
        F.sum("r").cast("bigint").alias("s_xa"),
    )
    ctx = ctx_act.groupBy("x").agg(F.sum("n_xa").cast("bigint").alias("n_x"))
    policy = (
        ctx_act.withColumn("mean_scaled", F.expr(f"(s_xa * {scale}) div n_xa"))
        .groupBy("x")
        .agg(
            F.min(
                F.struct(
                    (-F.col("mean_scaled")).alias("neg"), F.col("a").alias("a")
                )
            )
            .getField("a")
            .alias("pi_a")
        )
    )
    scored = (
        ev.join(F.broadcast(ctx), "x", "left")
        .join(F.broadcast(policy), "x", "left")
        .join(
            F.broadcast(ctx_act.select("x", "a", "n_xa")),
            ["x", "a"],
            "left",
        )
    )
    supported = F.col("n_xa").isNotNull()
    matched = supported & (F.col("a") == F.col("pi_a"))
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.count_if(matched).cast("bigint").alias("n_matched"),
        F.count_if(~supported).cast("bigint").alias("n_unsupported"),
        F.sum(
            F.when(
                matched, F.expr(f"(r * n_x * {scale}) div n_xa")
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("ips_value_scaled"),
        F.sum(F.when(matched, F.col("r")).otherwise(0))
        .cast("bigint")
        .alias("matched_reward"),
    )


def kmeans_validity_indices(
    vectors: DataFrame,
    k: int = 8,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Internal clustering-validity indices for the portable k-means
    fit — the "was k a good idea" readout, exact-integer throughout:

    * **Simplified silhouette** (Hruschka et al. 2004 — centroid
      distances instead of the O(n²) pairwise means), on SQUARED
      integer distances to the FINAL centroids: per point
      s' = (b² − a²)/max(a², b²) with a² = own centroid, b² = the
      nearest OTHER centroid; each point floors to ppm (the
      documented per-element floor variant), per-cluster mean is one
      integer division. ``n_negative`` counts points whose nearest
      final centroid is not their assigned one — the stability
      residue of stopping Lloyd after ``iterations`` rounds.
    * **Calinski-Harabasz** variance-ratio (1974):
      CH = (B/(k−1)) / (W/(n−k)) with W = Σ a² and B = T − W from
      the n-scaled total scatter (n² cancels in the ratio) —
      emitted ppm with one truncating division.

    Scale shape: one k-wide broadcast scoring pass over the
    assignment (conditional-aggregation argmin — no second shuffle),
    one bounded per-cluster fold, one scatter aggregation over the
    cached base. Returns per surviving cluster (cluster, n_members,
    mean_silhouette_ppm, n_negative, ch_ppm) — ch_ppm repeats per
    row (a global scalar on the cluster grain).
    """
    base, assigned, cents = _lloyd_fit(vectors, k, iterations, vec_col, id_col)

    # k-wide scoring pass, ROW-LOCAL like the Lloyd argmin (r12): the
    # final centroids fold to a one-row broadcast array; a² (own
    # centroid) and b² (nearest other) are array_min over filtered
    # transforms — the crossJoin-k-rows + groupBy(vid, own) form
    # shuffled |V|·k scored rows for a per-row reduction.
    # array_min([]) = NULL matches the old min(CASE...)-over-empty.
    cents_arr = cents.agg(F.collect_list(F.struct("cluster", "c")).alias("cs"))
    pts = (
        assigned.select("vid", F.col("cluster").alias("own"), "v")
        .crossJoin(F.broadcast(cents_arr))
        .select(
            "vid",
            "own",
            F.array_min(
                F.transform(
                    F.filter(F.col("cs"), lambda s: s["cluster"] == F.col("own")),
                    lambda s: _sq_dist_int(F.col("v"), s["c"]),
                )
            )
            .cast("bigint")
            .alias("a2"),
            F.array_min(
                F.transform(
                    F.filter(F.col("cs"), lambda s: s["cluster"] != F.col("own")),
                    lambda s: _sq_dist_int(F.col("v"), s["c"]),
                )
            )
            .cast("bigint")
            .alias("b2"),
        )
    )
    sil = pts.selectExpr(
        "own AS cluster",
        "a2",
        "b2",
        "CASE WHEN greatest(a2, b2) > 0 THEN"
        " (CASE WHEN b2 >= a2 THEN 1 ELSE -1 END)"
        " * ((abs(b2 - a2) * 1000000) div greatest(a2, b2))"
        " ELSE 0 END AS s_ppm",
    )
    per_cluster = sil.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        # the sum can be negative — sign factored out of the
        # truncating division (CLAUDE.md rule)
        F.expr(
            "CAST((CASE WHEN SUM(s_ppm) >= 0 THEN 1 ELSE -1 END)"
            " * (abs(SUM(s_ppm)) div COUNT(1)) AS BIGINT)"
        ).alias("mean_silhouette_ppm"),
        F.count_if(F.col("b2") < F.col("a2")).cast("bigint").alias("n_negative"),
        F.sum("a2").cast("bigint").alias("_w_part"),
    ).localCheckpoint(eager=True)  # bounded; feeds output + W/k totals
    totals = per_cluster.agg(
        F.sum("_w_part").cast("bigint").alias("w"),
        F.sum("n_members").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("kk"),
    )
    dims = base.select(F.posexplode("v").alias("d", "x"))
    scatter = dims.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
    )
    tn2 = scatter.agg(
        F.sum(
            F.expr("nd * sxx - CAST(sx AS DECIMAL(38,0)) * sx")
        ).alias("tn2")
    )
    return (
        per_cluster.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(tn2))
        .selectExpr(
            "cluster",
            "n_members",
            "mean_silhouette_ppm",
            "n_negative",
            # B = tn2 - w*n can go negative on pathological inputs
            # (integer-truncated centroids vs entering-round
            # assignment), so the truncating division is sign-
            # factored like mean_silhouette_ppm — never relying on
            # engine-specific negative-operand floor/trunc behavior
            # (ADVICE r9).
            "CASE WHEN kk > 1 AND w > 0 AND n > kk THEN CAST("
            " (CASE WHEN tn2 >= CAST(w AS DECIMAL(38,0)) * n"
            "       THEN 1 ELSE -1 END)"
            " * ((abs(tn2 - CAST(w AS DECIMAL(38,0)) * n)"
            "     * (n - kk) * 1000000)"
            "    div (CAST(w AS DECIMAL(38,0)) * n * (kk - 1)))"
            " AS BIGINT) END AS ch_ppm",
        )
    )
