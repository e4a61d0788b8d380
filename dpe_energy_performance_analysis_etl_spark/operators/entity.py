"""Entity resolution: edit-distance-1 fuzzy matching via the
deletion-neighborhood (FastSS / SymSpell) candidate scheme.

Naive fuzzy joins are quadratic (every pair levenshtein'd) and
prefix-blocking collapses on skewed key distributions (a shared
prefix like ``Customer#0000`` puts the whole table in one block —
measured as the difference between O(n·L) and O(n²) candidates on
the synthetic customer table). The deletion neighborhood fixes both
structurally: a string of length L expands to L+1 keys (itself plus
every single-character deletion), two strings within edit distance 1
ALWAYS share at least one key (s itself for equality, del(s) for
deletion/insertion, a common variant for substitution), and the
candidate join is a plain equi-join whose fan-out is linear in
corpus size — exactly the property that survives a 1000-executor
shuffle. Levenshtein verification then removes the rare hash-key
coincidences.

Public references: Bocek et al., "Fast Similarity Search in Large
Dictionaries" (FastSS, 2007); the SymSpell family. (The reference
repo has no fuzzy-matching surface; this extends its dedup domain
per the build mandate.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def deletion_variants(col: Column | str) -> Column:
    """Array of the string itself plus every single-deletion variant.

    ``transform`` over a 0..L index sequence stays fully inside
    whole-stage codegen — no UDF, no Python in the row path. Index 0
    maps to the unmodified string; index i (1-based) deletes
    character i.
    """
    s = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.sequence(F.lit(0), F.length(s)),
        lambda i: F.when(i == 0, s).otherwise(
            F.concat(F.substring(s, F.lit(1), i - 1), F.substr(s, i + 1))
        ),
    )


def fuzzy_join_ed1(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    block: list[str] | None = None,
) -> DataFrame:
    """All (left, right) row pairs whose strings are within edit
    distance 1, plus exact matches — deletion-neighborhood candidate
    generation, levenshtein verification.

    ``block`` columns (present on both sides, e.g. a region key) are
    added to the equi-join key: they shrink candidate volume AND give
    the shuffle a compound key, which spreads hot variant keys across
    partitions. Output keeps every column of both inputs (right-side
    name-collisions suffixed ``_r``) plus ``edit_dist``.

    Scale shape: explode(L+1) on each side → one equi-join on
    (block…, variant) → distinct on the pair key. Candidates are
    bounded by sum over variant keys of |L_k|·|R_k| — with near-unique
    variants this is O(matches), never O(n²).
    """
    block = block or []
    lcols = left.columns
    rename = {c: f"{c}_r" for c in right.columns if c in lcols and c not in block}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    rcol = rename.get(right_col, right_col)

    lv = left.withColumn("__variant", F.explode(deletion_variants(left_col)))
    rv = r.withColumn("__variant", F.explode(deletion_variants(rcol)))
    cand = lv.join(rv, on=block + ["__variant"]).drop("__variant").distinct()
    return cand.withColumn("edit_dist", F.levenshtein(F.col(left_col), F.col(rcol))).filter(
        F.col("edit_dist") <= 1
    )


def fellegi_sunter_link(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[tuple[Column, Column]],
    comparisons: list[tuple[str, Column, Column, int, int]],
    left_id: Column | str = "left_id",
    right_id: Column | str = "right_id",
    upper: int = 50,
    lower: int = 0,
) -> DataFrame:
    """Probabilistic record linkage scoring (Fellegi & Sunter, JASA
    1969): candidate pairs from BLOCKING (an equi-join on one or more
    block keys — never all-pairs), each scored by summing per-field
    agreement/disagreement weights, then classified by the two
    FS thresholds (``>= upper`` match, ``< lower`` non-match, else
    possible/clerical-review).

    Weights are INTEGERS (scaled log-odds log2(m/u) · 10, supplied by
    the caller from known or estimated m-/u-probabilities), so the
    score is an exact BIGINT sum and the same pair scores identically
    on every engine — the cross-engine float rule applied to linkage.
    Agreement is null-safe equality of the supplied field expressions
    (the caller encodes normalization — prefixes, buckets, phonetic
    keys — in the expressions themselves).

    Scale shape: one equi-join on the block keys; candidate volume is
    Σ_b |L_b|·|R_b| — the blocking design bounds it, exactly like
    every other candidate-generation operator in this repo (LSH
    bands, deletion variants, grid cells). Skewed blocks are the
    caller's blocking-key design concern, the classic FS trade-off.

    ``comparisons``: (name, left_expr, right_expr, w_agree,
    w_disagree). Returns (left_id, right_id, score, n_agree,
    link_class).
    """
    lid = F.col(left_id) if isinstance(left_id, str) else left_id
    rid = F.col(right_id) if isinstance(right_id, str) else right_id
    lsel = left.select(
        lid.alias("__lid"),
        *[b[0].alias(f"__bk{i}") for i, b in enumerate(block_cols)],
        *[c[1].alias(f"__l{i}") for i, c in enumerate(comparisons)],
    )
    rsel = right.select(
        rid.alias("__rid"),
        *[b[1].alias(f"__bk{i}") for i, b in enumerate(block_cols)],
        *[c[2].alias(f"__r{i}") for i, c in enumerate(comparisons)],
    )
    cand = lsel.join(rsel, [f"__bk{i}" for i in range(len(block_cols))])
    score = F.lit(0).cast("bigint")
    agree_cnt = F.lit(0)
    for i, (_, _, _, w_a, w_d) in enumerate(comparisons):
        agrees = F.col(f"__l{i}").eqNullSafe(F.col(f"__r{i}"))
        score = score + F.when(agrees, F.lit(w_a)).otherwise(F.lit(w_d))
        agree_cnt = agree_cnt + agrees.cast("int")
    cls = (
        F.when(F.col("score") >= upper, F.lit("match"))
        .when(F.col("score") < lower, F.lit("non_match"))
        .otherwise(F.lit("possible"))
    )
    return (
        cand.select(
            F.col("__lid").alias("left_id"),
            F.col("__rid").alias("right_id"),
            score.alias("score"),
            agree_cnt.cast("bigint").alias("n_agree"),
        )
        .withColumn("link_class", cls)
    )


def sorted_neighborhood_candidates(
    records: DataFrame,
    id_col: str,
    sort_cols: list[str],
    block_col: str,
    window: int = 3,
    verify_col: str | None = None,
    max_edit: int = 2,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95 —
    the classic merge/purge method): sort records by a discriminating
    key, slide a width-w window, and emit only pairs that co-occur in
    a window — O(n·w) candidates instead of O(n²).

    Scale shape: the sort key is PARTITIONED by ``block_col`` (the
    multi-pass SNM variant: each block sorts independently — a
    partition-less global rank would single-reduce the corpus), then
    candidates come from w EQUI-joins on (block, rank+k) built by one
    explode — never a range self-join, never all-pairs. When
    ``verify_col`` is set, pairs are verified with
    ``levenshtein(a, b) <= max_edit`` (JVM codegen on both engines).

    Returns (block, id_a, id_b, rank_gap[, edit_dist]) with
    id_a's record ranked before id_b's.
    """
    from pyspark.sql import Window

    w_rank = Window.partitionBy(block_col).orderBy(*sort_cols, id_col)
    keep = [id_col] + ([verify_col] if verify_col else [])
    ranked = records.select(
        F.col(block_col).alias("block"),
        *[F.col(c) for c in keep],
        F.row_number().over(w_rank).alias("rn"),
    ).cache()
    probes = ranked.select(
        "block",
        *[F.col(c).alias(f"{c}_a") for c in keep],
        F.explode(
            F.array(*[F.col("rn") + F.lit(k) for k in range(1, window + 1)])
        ).alias("rn"),
        F.col("rn").alias("rn_a"),
    )
    pairs = probes.join(ranked, ["block", "rn"]).select(
        "block",
        F.col(f"{id_col}_a").alias("id_a"),
        F.col(id_col).alias("id_b"),
        (F.col("rn") - F.col("rn_a")).cast("int").alias("rank_gap"),
        *(
            [
                F.levenshtein(F.col(f"{verify_col}_a"), F.col(verify_col)).alias(
                    "edit_dist"
                )
            ]
            if verify_col
            else []
        ),
    )
    if verify_col:
        pairs = pairs.filter(F.col("edit_dist") <= max_edit)
    return pairs


def jaro_winkler_micro(
    df: DataFrame,
    a: str = "a",
    b: str = "b",
    out: str = "jw_micro",
) -> DataFrame:
    """Jaro-Winkler similarity as an EXACT integer in micro-units
    (0..1_000_000), computed entirely in whole-stage-codegen SQL
    expressions — no UDF, no floats, hence bit-identical on every
    engine (the float jaro_winkler built-ins disagree across engines
    at the ulp level, which would break the oracle gate).

    Method (Jaro 1989; Winkler 1990):
      - greedy window matching is a SEQUENTIAL scan with mutable
        "already matched" state — here a single int64 ``aggregate``
        fold over the positions of ``a``: bit i (low 32) marks a[i]
        matched, bit 32+j marks b[j] consumed. Strings are capped at
        their first 30 characters (mask width; document or chunk
        longer inputs);
      - matched index sequences are recovered from the masks (both
        ascending, exactly the orders the transposition count
        needs); T = raw mismatch count between the two matched
        character sequences (t = T/2 in the classic formula);
      - similarity as one exact fraction: jaro = A/B with
        A = 2m²·lb + 2m²·la + (2m−T)·la·lb and B = 6m·la·lb, and
        jw = (10A + ℓ(B−A)) / 10B with ℓ = common-prefix length
        capped at 4 (Winkler p = 0.1 exactly). The micro-unit output
        is the integer division (10A + ℓ(B−A))·10⁶ div 10B — every
        intermediate < 2^53, and both engines truncate non-negative
        integer division identically.

    Scale shape: a pure row-local projection — zero shuffle, zero
    state; candidate pair generation stays the caller's job
    (``fuzzy_join_ed1`` / ``sorted_neighborhood_candidates`` /
    LSH), exactly like the other comparators in this module.
    """
    la, lb, w, mk = "__jw_la", "__jw_lb", "__jw_w", "__jw_mk"
    m, t, pl = "__jw_m", "__jw_t", "__jw_l"
    mi, mjs = "__jw_mi", "__jw_mjs"
    ac, bc = "__jw_a", "__jw_b"
    d = (
        df.withColumn(ac, F.substring(F.col(a), 1, 30))
        .withColumn(bc, F.substring(F.col(b), 1, 30))
        .withColumn(la, F.length(ac))
        .withColumn(lb, F.length(bc))
        .withColumn(
            w,
            F.greatest(
                F.shiftright(F.greatest(F.col(la), F.col(lb)), 1) - 1, F.lit(0)
            ),
        )
    )
    cands = (
        f"filter(sequence(greatest(0, i - {w}), least({lb} - 1, i + {w})), "
        f"j -> substr({bc}, j + 1, 1) = substr({ac}, i + 1, 1) "
        f"AND (shiftright(acc, 32 + j) & 1) = 0)"
    )
    step = (
        f"CASE WHEN least({lb} - 1, i + {w}) >= greatest(0, i - {w}) "
        f"AND try_element_at({cands}, 1) IS NOT NULL "
        f"THEN acc | shiftleft(1L, i) "
        f"| shiftleft(1L, 32 + try_element_at({cands}, 1)) "
        f"ELSE acc END"
    )
    d = d.withColumn(
        mk,
        F.expr(
            f"CASE WHEN {la} = 0 OR {lb} = 0 THEN 0L ELSE "
            f"aggregate(sequence(0, {la} - 1), 0L, (acc, i) -> {step}) END"
        ),
    )
    d = (
        d.withColumn(m, F.expr(f"bit_count({mk} & 4294967295)"))
        .withColumn(
            mi,
            F.expr(
                f"CASE WHEN {m} = 0 THEN array() ELSE "
                f"filter(sequence(0, {la} - 1), "
                f"i -> (shiftright({mk}, i) & 1) = 1) END"
            ),
        )
        .withColumn(
            mjs,
            F.expr(
                f"CASE WHEN {m} = 0 THEN array() ELSE "
                f"filter(sequence(0, {lb} - 1), "
                f"j -> (shiftright({mk}, 32 + j) & 1) = 1) END"
            ),
        )
    )
    d = d.withColumn(
        t,
        F.expr(
            f"CASE WHEN {m} = 0 THEN 0 ELSE size(filter(sequence(1, {m}), "
            f"k -> substr({ac}, element_at({mi}, k) + 1, 1) "
            f"<> substr({bc}, element_at({mjs}, k) + 1, 1))) END"
        ),
    )
    d = d.withColumn(
        pl,
        sum(
            (
                (F.col(la) >= k)
                & (F.col(lb) >= k)
                & (F.expr(f"substr({ac}, 1, {k}) = substr({bc}, 1, {k})"))
            ).cast("int")
            for k in range(1, 5)
        ),
    )
    big_a = (
        f"(2 * {m} * {m} * {lb} + 2 * {m} * {m} * {la} "
        f"+ (2 * {m} - {t}) * {la} * {lb})"
    )
    big_b = f"(6 * {m} * {la} * {lb})"
    d = d.withColumn(
        out,
        F.expr(
            f"CASE WHEN {m} = 0 THEN 0L ELSE "
            f"(CAST(10 * {big_a} + {pl} * ({big_b} - {big_a}) AS BIGINT) * 1000000) "
            f"div (10 * {big_b}) END"
        ),
    )
    return d.drop(ac, bc, la, lb, w, mk, m, t, pl, mi, mjs)


def smith_waterman_score(
    a: Column,
    b: Column,
    match: int = 2,
    mismatch: int = 1,
    gap: int = 1,
) -> Column:
    """Smith-Waterman LOCAL alignment score (Smith & Waterman, JMB
    1981) between two ARRAY columns — the best-scoring contiguous
    subsequence alignment under +match / −mismatch / −gap, clamped at
    0 (so unrelated flanks never drag a shared core below zero; this
    is what global alignment and DTW both miss). The comparator for
    near-duplicate fragments, plagiarized spans, and clickstream
    motif matching.

    Like ``dtw_distance``, the full O(n·m) DP runs ENTIRELY inside
    whole-stage codegen as nested `aggregate` folds — no UDF, exact
    integers. The local-alignment twist is that the answer is the max
    over ALL cells, not a corner: rather than threading a running
    best through the fold (which would force the inner fold to be
    evaluated twice per row — lambdas cannot bind locals), the outer
    accumulator CONCATENATES every DP row and the score is one
    `array_max` at the end. Memory is O(n·m) per pair — intended for
    BOUNDED series (per-key windows of tens of tokens), candidate
    pair generation stays the caller's job, as with every comparator
    in this repo. Elements may be any equality-comparable type.

    Empty inputs score 0 (the empty local alignment), guarded before
    the fold (`sequence(1, 0)` counts DOWN — the engine-wide rule).

    The same nested fold replays in DuckDB with the list_reduce
    prepend-the-initial-accumulator trick (see the
    ``smith_waterman_events`` oracle in plans/queries.py).
    """
    zero = F.lit(0).cast("bigint")
    n1 = F.size(a) + F.lit(1)  # row width: H(·, 0..n)
    init = F.concat(
        F.array(zero), F.transform(a, lambda _: zero)
    )  # row 0: all zeros

    def outer(acc, bj):
        prev_base = F.size(acc) - n1  # prev row = last n+1 of acc
        inner = F.aggregate(
            F.sequence(F.lit(1), F.size(a)),
            F.array(zero),  # H(j, 0) = 0
            lambda acc2, i: F.concat(
                acc2,
                F.array(
                    F.greatest(
                        zero,
                        F.element_at(acc, (prev_base + i).cast("int"))
                        + F.when(
                            F.element_at(a, i.cast("int")) == bj, F.lit(match)
                        ).otherwise(F.lit(-mismatch)),
                        F.element_at(acc, (prev_base + i + 1).cast("int"))
                        - F.lit(gap),
                        F.element_at(acc2, F.size(acc2)) - F.lit(gap),
                    )
                ),
            ),
        )
        return F.concat(acc, inner)

    final = F.aggregate(b, init, outer)
    return F.when((F.size(a) == 0) | (F.size(b) == 0), zero).otherwise(
        F.array_max(final).cast("bigint")
    )


def fellegi_sunter_em(
    pairs: DataFrame,
    agree_cols: list[str],
    rounds: int = 3,
    p0: int = 100_000,
    m0: int = 900_000,
    u0: int = 100_000,
) -> DataFrame:
    """EM estimation of the Fellegi-Sunter m/u probabilities (Winkler
    1988, the unsupervised fit behind Splink-style linkage) under
    conditional independence — closes the loop on
    ``fellegi_sunter_link``, whose integer log-odds weights the
    caller had to supply from KNOWN m/u values:

        E: w(γ) = p·Π_k mᵏ^γᵏ(1−mᵏ)^(1−γᵏ) / (that + (1−p)·Π u-terms)
        M: p ← Σ n·w / N;  mᵏ ← Σ_γᵏ=1 n·w / Σ n·w;  uᵏ symmetric

    Scale discipline (the Bradley-Terry/Markov precedent): the ONE
    data-sized pass aggregates candidate pairs to agreement-PATTERN
    counts — at most 2^K rows for K comparison fields — and the EM
    rounds run driver-side in exact Python integers (everything in
    ppm; pattern likelihood products are big ints, division only at
    defined points), so the unrolled HUGEINT SQL twin replays every
    round bit-for-bit. Candidate generation (blocking) stays the
    caller's job and bounds both the pass and what "non-match"
    means — u is estimated w.r.t. the BLOCKED pair population, as in
    every FS deployment.

    Returns one row per field: (field, m_ppm, u_ppm, p_ppm) after
    ``rounds`` EM rounds from (p0, m0, u0).
    """
    K = len(agree_cols)
    counts = (
        pairs.groupBy(*[F.col(c).cast("boolean").alias(c) for c in agree_cols])
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )  # bounded: <= 2^K pattern rows
    patterns = [
        (tuple(1 if r[c] else 0 for c in agree_cols), r["n"]) for r in counts
    ]
    U = 10**6
    p, m, u = p0, [m0] * K, [u0] * K
    n_total = sum(n for _, n in patterns)
    for _ in range(rounds):
        wsum = 0
        vsum = 0
        wg = [0] * K
        vg = [0] * K
        for g, n in patterns:
            num = p
            den = U - p
            for k in range(K):
                num *= m[k] if g[k] else U - m[k]
                den *= u[k] if g[k] else U - u[k]
            w = num * U // max(num + den, 1)  # ppm match weight
            wsum += n * w
            vsum += n * (U - w)
            for k in range(K):
                if g[k]:
                    wg[k] += n * w
                    vg[k] += n * (U - w)
        p = wsum // max(n_total, 1)
        m = [wg[k] * U // max(wsum, 1) for k in range(K)]
        u = [vg[k] * U // max(vsum, 1) for k in range(K)]
    spark = pairs.sparkSession
    rows = [(agree_cols[k], m[k], u[k], p) for k in range(K)]
    return spark.createDataFrame(
        rows, "field string, m_ppm bigint, u_ppm bigint, p_ppm bigint"
    )
