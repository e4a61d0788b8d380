"""Histogram-based distributed quantiles: a mergeable, deterministic
approximate-percentile path whose error is bounded by bucket width.

Exact percentiles (``percentile``, used by ``percentile_iqr``) sort —
fine per group, expensive for a global quantile over 100 TB. Spark's
built-in ``approx_percentile`` (Greenwald–Khanna) is sequential-merge
order-dependent, so its exact output is engine- and partitioning-
specific — it can never sit behind a value-hash gate. The equi-width
histogram sketch gives up adaptivity for determinism: bucket counts
are a pure function of (bounds, n_buckets, data), addition-mergeable
across batches/partitions (the same monoid contract as the CMS / KMV /
bloom / MG sketches), and the quantile estimate interpolates inside
the hit bucket with one fixed-order double expression — bit-identical
on any engine.

Cost: one pass for bounds (skippable when the domain is known — pass
``bounds``) + one pass of codegen arithmetic + a groupBy over ≤
n_buckets fixed-width keys. Error: ≤ (hi-lo)/n_buckets per quantile,
versus GK's rank-based ε — coarser on heavy-tailed data (docstring
over-promises nothing: pick n_buckets from the needed resolution, or
iterate: re-histogram inside the hit bucket for another /n_buckets
refinement per pass).

The cumulative scan runs over the ≤ n_buckets bucket table in a
single-partition window — the same "serial window over the TINY
table" shape as ``sequence_pack_bins``, benign by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def histogram_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int = 1024,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """(bucket, cnt) over the clamped equi-width grid, plus the grid
    itself as (lo, width) columns on every row (so downstream steps —
    and merges, which must agree on the grid — stay self-describing).
    One bounded-key shuffle; NULLs are excluded like every SQL
    percentile."""
    vals = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    if bounds is not None:
        lo, hi = float(bounds[0]), float(bounds[1])
        b = vals.select(F.lit(lo).alias("lo"), F.lit(hi).alias("hi"), "v")
    else:
        agg = vals.agg(
            F.min("v").cast("double").alias("lo"),
            F.max("v").cast("double").alias("hi"),
        )
        b = vals.crossJoin(F.broadcast(agg))
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_buckets))
    bucket = F.least(
        F.greatest(
            F.floor((F.col("v") - F.col("lo")) / width).cast("long"), F.lit(0)
        ),
        F.lit(n_buckets - 1),
    )
    return (
        b.select(bucket.alias("bucket"), "lo", width.alias("width"))
        .groupBy("bucket", "lo", "width")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histograms(h1: DataFrame, h2: DataFrame) -> DataFrame:
    """Add bucket counts — exact for histograms built on the SAME
    (bounds, n_buckets) grid; the caller pins explicit ``bounds`` for
    cross-batch merges (data-derived bounds differ per batch)."""
    return (
        h1.unionByName(h2)
        .groupBy("bucket", "lo", "width")
        .agg(F.sum("cnt").alias("cnt"))
    )


def histogram_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    n_buckets: int = 1024,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """(prob, q_est) per requested quantile: find the bucket where the
    running count crosses ceil(p·n), interpolate uniformly inside it.
    Deterministic: every arithmetic step is a fixed-order IEEE double
    op over exact integer counts."""
    # the ≤ n_buckets-row bucket table feeds the cumulative scan AND
    # the grand total — cache it or the full data scan runs twice
    hist = histogram_buckets(df, col, n_buckets, bounds).cache()
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bucket",
        "lo",
        "width",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
    ).crossJoin(F.broadcast(hist.agg(F.sum("cnt").alias("n"))))

    p = F.explode(
        F.array(*[F.lit(float(x)) for x in probs])
    ).alias("prob")
    targets = cum.select("*", p).withColumn(
        "target", F.greatest(F.ceil(F.col("prob") * F.col("n")), F.lit(1))
    )
    hit = (
        targets.where(F.col("cum") >= F.col("target"))
        .groupBy("prob")
        .agg(
            F.min_by(
                F.struct("bucket", "lo", "width", "cnt", "cum", "target"),
                F.col("bucket"),
            ).alias("h")
        )
    )
    frac = (
        F.col("h.target").cast("double")
        - (F.col("h.cum") - F.col("h.cnt")).cast("double")
    ) / F.col("h.cnt").cast("double")
    return hit.select(
        "prob",
        (
            F.col("h.lo")
            + F.col("h.width") * (F.col("h.bucket").cast("double") + frac)
        ).alias("q_est"),
    )


def equi_depth_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Equi-depth (equal-frequency) binning via ``ntile``: every bin
    gets n/n_bins ± 1 rows regardless of the value distribution — the
    histogram shape that survives heavy skew, where equal-WIDTH bins
    put 99% of rows in one bucket. Output: bin → row count, min/max
    value (the bin boundaries).

    ntile is rank-based, so ties are split deterministically by the
    (value, tiebreak) order — pass a unique tiebreak column for a
    reproducible assignment.

    Scale shape: a literal ``ntile().over(Window.orderBy(...))`` is an
    UNPARTITIONED window — Spark moves every row to one partition
    (the r6 window-boundedness audit fails it). Exact global ranks
    don't need that: ``repartitionByRange`` gives an order-preserving
    range partitioning (ascending ranges on ascending partition ids),
    per-partition ``row_number`` windows run in parallel, and the
    global rank is local rank + the cumulative size of earlier
    partitions (a broadcast table bounded by the partition count —
    the classic distributed-ranking recipe). The ntile bucket is then
    a closed-form expression of (rank, N): the first N mod b buckets
    take ⌈N/b⌉ rows, the rest ⌊N/b⌋ — bit-identical to SQL ntile.
    The approximate path at 100 TB remains ``histogram_quantiles``
    in this module (no sort at all)."""
    order_cols = [value_col] + ([order_tiebreak] if order_tiebreak else [])
    order = [F.col(c).asc() for c in order_cols]
    # pinned (eager localCheckpoint): consumed by the per-partition
    # size pass AND the ranked pass — the two-pass minimum for exact
    # global ranks; see the module note on why cache() is not enough
    # (two physical instantiations of repartitionByRange sample
    # DIFFERENT boundaries and the ranks go silently wrong)
    ranged = _pin(
        df.select(*order_cols)
        .repartitionByRange(*order)
        .withColumn("_pid", F.spark_partition_id())
    )
    sizes = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # one bounded table (≤ #partitions rows): cumulative offset + N
    offs = sizes.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("bigint").alias("_off"),
        F.sum("_cnt").over(w_all).cast("bigint").alias("_n"),
    )
    w_loc = Window.partitionBy("_pid").orderBy(*order)
    local = ranged.withColumn("_lrn", F.row_number().over(w_loc).cast("bigint"))

    def idiv(a: Column, b: Column) -> Column:
        # exact integer floor-div of non-negatives (double division of
        # an exact multiple — numerators bounded by row counts < 2^53)
        return ((a - F.pmod(a, b)) / b).cast("bigint")

    n = F.col("_n")
    b = F.lit(n_bins).cast("bigint")
    base = idiv(n, b)
    rem = F.pmod(n, b)
    threshold = rem * (base + F.lit(1))
    rn = F.col("_off") + F.col("_lrn")
    # when() evaluates both branches: greatest() keeps the divisor
    # nonzero in the dead branch (base = 0 implies threshold = N, so
    # no row reaches the otherwise side)
    bin_expr = F.when(
        rn <= threshold, idiv(rn - F.lit(1), base + F.lit(1)) + F.lit(1)
    ).otherwise(
        rem + idiv(rn - threshold - F.lit(1), F.greatest(base, F.lit(1))) + F.lit(1)
    )
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn("bin", bin_expr.cast("bigint"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
        )
    )


def jenks_breaks_binned(
    bins,
    k: int = 4,
    bin_col: str = "bin",
    sum_col: str = "s",
    sumsq_col: str = "ss",
    cnt_col: str = "c",
):
    """Fisher-Jenks natural breaks (Fisher JASA'58; Jenks 1967) — the
    OPTIMAL 1-D k-segmentation by within-class squared deviation,
    solved exactly by dynamic programming over a BOUNDED bin table
    (the histogram trick again: the data-sized pass is the caller's
    (bin, Σy, Σy², n) aggregation; the DP is O(k·B²) on B ≤ hundreds
    of bins). The exact complement to the iterative/heuristic
    ``kmeans_lloyd_portable`` for one dimension.

    Segment cost over contiguous bins i..j: SS − div(S², C)
    (integer-scaled within-segment squared deviation; the single
    truncating division per segment is engine-exact, so the DP's
    min-of-sums — evaluated by lexicographic (total, i) struct-min,
    ties to the smallest split — is bit-portable). Keep |y| values
    small enough that S² fits int64 (bound the caller's unit: S² ≤
    (n·max|y|)²).

    DP: D₁(j) = cost(1..j); Dₘ(j) = min_{i} D_{m−1}(i−1) + cost(i..j)
    — each level one bounded join; breaks recovered by walking the
    stored argmins. Returns one row per class: (class, lo_bin,
    hi_bin, n, s) with class 1 = lowest bins.
    """
    from pyspark.sql import Window, functions as F

    b = bins.select(
        F.col(bin_col).cast("bigint").alias("bin"),
        F.col(sum_col).cast("bigint").alias("s"),
        F.col(sumsq_col).cast("bigint").alias("ss"),
        F.col(cnt_col).cast("bigint").alias("c"),
    )
    wr = Window.orderBy("bin")
    wcum = wr.rowsBetween(Window.unboundedPreceding, 0)
    pref = b.select(
        "bin",
        F.row_number().over(wr).alias("r"),
        F.sum("s").over(wcum).alias("cs"),
        F.sum("ss").over(wcum).alias("css"),
        F.sum("c").over(wcum).alias("cc"),
        "s",
        "ss",
        "c",
    ).cache()
    lo = pref.select(
        F.col("r").alias("i"),
        F.col("bin").alias("lo_bin"),
        (F.col("cs") - F.col("s")).alias("cs0"),
        (F.col("css") - F.col("ss")).alias("css0"),
        (F.col("cc") - F.col("c")).alias("cc0"),
    )
    hi = pref.select(
        F.col("r").alias("j"), F.col("bin").alias("hi_bin"), "cs", "css", "cc"
    )
    costs = (
        lo.join(hi, F.col("i") <= F.col("j"))
        .select(
            "i",
            "j",
            "lo_bin",
            "hi_bin",
            (F.col("cs") - F.col("cs0")).alias("seg_s"),
            (F.col("cc") - F.col("cc0")).alias("seg_c"),
            F.expr(
                "(css - css0) - (CAST((cs - cs0) AS BIGINT) * (cs - cs0))"
                " div greatest(cc - cc0, 1L)"
            ).alias("cost"),
        )
        .cache()
    )
    # D_1
    d = costs.where(F.col("i") == 1).select(
        "j", F.col("cost").alias("total"), F.lit(1).cast("bigint").alias("arg")
    )
    levels = {1: d}
    for m in range(2, k + 1):
        prev = levels[m - 1].select(
            (F.col("j") + 1).alias("i"), F.col("total").alias("ptotal")
        )
        d = (
            costs.join(prev, "i")
            .groupBy("j")
            .agg(
                F.min(
                    F.struct(
                        (F.col("ptotal") + F.col("cost")).alias("total"),
                        F.col("i").alias("arg"),
                    )
                ).alias("best")
            )
            .select("j", F.col("best.total").alias("total"), F.col("best.arg").alias("arg"))
        )
        levels[m] = d.cache()
    n_bins = pref.count()
    if n_bins <= k:
        # each bin its own class — no DP needed
        out = costs.where(F.col("i") == F.col("j")).select(
            F.col("i").alias("class"),
            "lo_bin",
            "hi_bin",
            F.col("seg_c").alias("n"),
            F.col("seg_s").alias("s"),
        ).localCheckpoint()
        pref.unpersist()
        costs.unpersist()
        return out
    # backtrace driver-side: k-1 one-row lookups on bounded tables
    cuts = [n_bins]
    for m in range(k, 1, -1):
        arg = (
            levels[m].where(F.col("j") == cuts[-1]).collect()[0]["arg"]
        )
        cuts.append(int(arg) - 1)
    cuts = cuts[::-1]  # [e0=..., ..., e_{k-1}=n_bins], class m covers (cuts[m-1]+1-ish)
    spans = []
    start = 1
    for cls, end in enumerate(cuts, 1):
        if end >= start:
            spans.append((cls, start, end))
        start = end + 1
    spark = bins.sparkSession
    span_df = spark.createDataFrame(spans, "class bigint, lo_r bigint, hi_r bigint")
    out = (
        span_df.join(
            costs.select("i", "j", "lo_bin", "hi_bin", "seg_s", "seg_c"),
            (F.col("lo_r") == F.col("i")) & (F.col("hi_r") == F.col("j")),
        )
        .select(
            "class",
            "lo_bin",
            "hi_bin",
            F.col("seg_c").alias("n"),
            F.col("seg_s").alias("s"),
        )
        .localCheckpoint()
    )
    pref.unpersist()
    costs.unpersist()
    for lv in levels.values():
        try:
            lv.unpersist()
        except Exception:
            pass
    return out


# Materialization discipline for the rank primitives (r8, superseding
# the r7 cache-retirement registry): every primitive here range-
# partitions an intermediate (`ranged`/`ranked`) that the rest of the
# plan consumes TWO OR MORE times. repartitionByRange SAMPLES its
# boundaries per physical instantiation, so if the two consumptions
# ever materialize as separate exchanges the offsets and the local
# ranks come from DIFFERENT partitionings and the global ranks are
# silently WRONG. `.cache()` appeared to pin one instantiation, but
# correctness-by-cache is a trap: CacheManager matches entries by
# logical plan, so unpersisting a PREVIOUS invocation's plan-identical
# cache evicted the CURRENT invocation's entry (the r8 rfm row-gate
# catch: run 1 returned 116 segments, run 2 returned 8), and a plain
# spark.catalog.clearCache() between build and action does the same.
# EAGER `localCheckpoint()` fixes the class: the intermediate is
# materialized ONCE, deterministically, outside the CacheManager —
# immune to unpersist/clearCache — and its blocks are freed by the
# ContextCleaner when the plan is garbage-collected, which also
# closes ADVICE r7's unbounded-cache-accumulation finding without a
# manual registry. (Stats-carry checkpoint blowup does not apply:
# these are single-shot plans, not iterative self-referencing ones.)


def _pin(df: DataFrame) -> DataFrame:
    """Eagerly materialize a multi-consumer range-partitioned
    intermediate (see module note)."""
    return df.localCheckpoint(eager=True)


def take_ordered_ranked(
    df: DataFrame,
    order: list,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact global top-k under ``order`` plus a 1-based BIGINT rank —
    the scale-safe spelling of "top-k with rank" (VERDICT r10 ask #1).

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject:
    per-partition k-row heaps merged k-at-a-time on the driver — no
    partition ever holds more than k rows, no matter how large the
    input. The rank window then runs over the k-row RESULT only
    (bounded by construction), never over the data-sized input. The
    alternative — ``row_number`` over an unpartitioned window, then
    ``rank <= k`` — moves the ENTIRE input into one task first and is
    a scale-killer whenever the input grows with the corpus.

    ``order`` must be a total order (include a unique-id tiebreak) or
    the selected k-set is nondeterministic at the boundary.
    """
    topk = df.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn(rank_col, F.row_number().over(w).cast("bigint"))


def global_rank_and_prefix(
    df: DataFrame,
    order: list,
    sum_col: str,
    rank_col: str = "rank",
    cum_col: str = "cum",
) -> DataFrame:
    """df + an exact global 1-based rank AND the INCLUSIVE running
    total of ``sum_col``, both under ``order`` — the distributed
    Pareto/Lorenz primitive (ABC classification, cumulative share
    curves). Same two-pass shape as ``global_rank_column``: range
    partition on the order, per-partition row_number + running sum,
    and ONE bounded offset table (a row per partition) carrying both
    the row-count and sum prefixes from earlier partitions. No
    data-sized single-partition window anywhere. ``sum_col`` must be
    integral (the running total is kept exact in BIGINT)."""
    ranged = _pin(
        df.repartitionByRange(*order).withColumn("_pid", F.spark_partition_id())
    )
    sizes = ranged.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(sum_col).cast("bigint").alias("_sum"),
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("bigint").alias("_roff"),
        F.coalesce(F.sum("_sum").over(w_off), F.lit(0)).cast("bigint").alias("_soff"),
    )
    w_rank = Window.partitionBy("_pid").orderBy(*order)
    w_cum = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.withColumn("_lrn", F.row_number().over(w_rank).cast("bigint"))
        .withColumn("_lcs", F.sum(sum_col).over(w_cum).cast("bigint"))
        .join(F.broadcast(offs), "_pid")
        .withColumn(rank_col, (F.col("_roff") + F.col("_lrn")).cast("bigint"))
        .withColumn(cum_col, (F.col("_soff") + F.col("_lcs")).cast("bigint"))
        .drop("_pid", "_lrn", "_lcs", "_roff", "_soff")
    )


def global_prefix_max(
    df: DataFrame,
    order: list,
    sum_col: str,
    out_col: str = "prefix_max",
) -> DataFrame:
    """MAX over the exact inclusive global running total of
    ``sum_col`` under ``order`` — for sweep-line peaks (peak
    concurrency, max drawdown-style folds) that need ONLY the
    extremum, never the per-row prefix. r12 LOCAL+CROSS fold (guide
    §2.1): max of the global prefix = max over range partitions of
    (sum of all earlier partitions + the partition's local inclusive
    max), because the cross-partition offset is constant within a
    partition. One pass over the ranged table (single consumer — no
    pin needed, the r8 multi-instantiation hazard cannot arise), a
    bounded per-partition fold, no offsets join, no per-row rank.
    ``sum_col`` must be integral. Returns a 1-row DataFrame
    (``out_col`` BIGINT, NULL on empty input)."""
    ranged = df.repartitionByRange(*order).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    loc = ranged.withColumn("_lcs", F.sum(sum_col).over(w_loc).cast("bigint"))
    part = loc.groupBy("_pid").agg(
        F.sum(sum_col).cast("bigint").alias("_s"),
        F.max("_lcs").alias("_m"),
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    folded = part.withColumn(
        "_off", F.coalesce(F.sum("_s").over(w_off), F.lit(0)).cast("bigint")
    )
    return folded.agg(
        F.max(F.col("_off") + F.col("_m")).cast("bigint").alias(out_col)
    )


def global_rank_column(
    df: DataFrame,
    order: list,
    out_col: str,
) -> DataFrame:
    """df + an exact GLOBAL 1-based rank column under ``order`` —
    the reusable two-pass repartitionByRange recipe (range partition,
    per-partition row_number, bounded offset table) so callers never
    write the unpartitioned data-sized window the r6 audit bans. The
    range-partitioned intermediate is pinned with an eager
    localCheckpoint — correctness, not just perf (see module note)."""
    ranged = _pin(
        df.repartitionByRange(*order).withColumn("_pid", F.spark_partition_id())
    )
    sizes = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("bigint").alias("_off"),
    )
    w_loc = Window.partitionBy("_pid").orderBy(*order)
    return (
        ranged.withColumn("_lrn", F.row_number().over(w_loc).cast("bigint"))
        .join(F.broadcast(offs), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )


def grouped_kth_smallest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k_df: DataFrame | None = None,
    k_of_n: str | None = None,
    with_ranged: bool = False,
):
    """Exact k-th smallest ``value_col`` per group — the per-group
    generalization of ``equi_depth_bins``' distributed-ranking
    recipe, for when a window `PARTITION BY group` would be a skew
    trap (few huge groups → one executor sorts a data-sized
    partition). k comes from ONE of:

    * ``k_df`` — an explicit (group, k) table. Rows where k exceeds
      the group size return no row — guard k upstream. Returns
      (group, kth_value).
    * ``k_of_n`` — a SQL expression over the BIGINT group size ``n``
      (e.g. conformal's ``"((n + 1) * 9 + 9) div 10"``). The group
      counts come FREE from the bounded per-partition sizes table
      the recipe already aggregates — no second data-sized count
      pass over ``df`` (VERDICT r8 ask #1: the count and ranking
      consumers share ONE pinned ranged subtree). Returns
      (group, n, k, kth_value) with kth_value NULL when k > n or
      k < 1.

    Plan: ``repartitionByRange(group, value)`` (order-preserving
    range partitioning, parallel), per-(partition, group) local
    row_number windows, and a BOUNDED offset table (≤ partitions ×
    groups rows, broadcast) carrying each group's cumulative count
    from earlier partitions: global rank = offset + local rank. The
    k-th smallest VALUE is well-defined under ties (any row at rank
    k carries it).
    """
    if (k_df is None) == (k_of_n is None):
        raise ValueError("pass exactly one of k_df / k_of_n")
    if k_of_n is not None:
        # the single-k k_of_n path IS the 1-entry multi-k recipe —
        # ONE shared implementation of the pinned two-pass ranking so
        # the pinning discipline can never drift between copies (the
        # r8 RFM incident class); k is re-derived from the returned
        # group size for the documented (group, n, k, kth_value)
        # shape, with NULL kth_value when k is out of [1, n]
        res = grouped_kths_smallest(
            df, group_col, value_col, {"kth_value": k_of_n},
            with_ranged=with_ranged,
        )
        out, ranged = res if with_ranged else (res, None)
        out = out.withColumn("k", F.expr(k_of_n).cast("bigint")).select(
            group_col, "n", "k", "kth_value"
        )
        return (out, ranged) if with_ranged else out
    if with_ranged:
        raise ValueError("with_ranged requires the k_of_n path")
    order = [F.col(group_col).asc(), F.col(value_col).asc()]
    ranged = (
        df.select(group_col, value_col)
        .repartitionByRange(*order)
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged = _pin(ranged)
    sizes = ranged.groupBy("_pid", group_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "_pid",
        group_col,
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("bigint").alias("_off"),
    )
    w_loc = Window.partitionBy("_pid", group_col).orderBy(F.col(value_col).asc())
    local = ranged.withColumn("_lrn", F.row_number().over(w_loc).cast("bigint"))
    ranked = local.join(F.broadcast(offs), ["_pid", group_col]).withColumn(
        "_rk", F.col("_off") + F.col("_lrn")
    )
    return (
        ranked.join(F.broadcast(k_df), group_col)
        .where(F.col("_rk") == F.col("k"))
        .select(group_col, F.col(value_col).alias("kth_value"))
    )


def grouped_kths_smallest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ks: dict[str, str],
    with_ranged: bool = False,
):
    """SEVERAL exact order statistics per group from ONE pinned
    ranged subtree — the multi-k sibling of ``grouped_kth_smallest``
    for queries that want e.g. P50 AND P90 (ship-delay SLA, repeat-
    purchase cadence) or a median plus its CI rank bounds. Calling
    the single-k recipe once per percentile rebuilds (and re-pins)
    the data-sized ``repartitionByRange`` per call; here the ranged
    table, the sizes/offsets pass, and the rank join all run once,
    and only the bounded k-table grows (|groups| x |ks| rows).

    ``ks`` maps output column name -> SQL expression over the BIGINT
    group size ``n`` (the ``k_of_n`` contract). Returns one row per
    group: (group, n, <name> ...), each <name> NULL when its k is
    out of [1, n].

    ``with_ranged=True`` returns ``(result, ranged)`` where
    ``ranged`` is the recipe's own PINNED range-partitioned copy of
    ``df`` (columns: group, value, ``_pid``) — for callers that
    must join the picked statistics back onto the very rows the
    recipe ranked (e.g. a threshold cut). Reusing the pinned leaf
    avoids recomputing ``df``'s upstream in a SECOND action (the
    r12 `with_totals` precedent: a pin is an action of its own, so
    exchange reuse never spans it).
    """
    order = [F.col(group_col).asc(), F.col(value_col).asc()]
    ranged = (
        df.select(group_col, value_col)
        .repartitionByRange(*order)
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged = _pin(ranged)
    sizes = _pin(
        ranged.groupBy("_pid", group_col).agg(F.count(F.lit(1)).alias("_cnt"))
    )
    totals = sizes.groupBy(group_col).agg(
        F.sum("_cnt").cast("bigint").alias("n")
    )
    # one (group, name, k) row per requested order statistic —
    # explode(array(...)) over the bounded totals table, never a
    # unionAll-of-selects re-running the subtree per k
    k_long = totals.select(
        group_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("_kname"),
                        F.expr(expr).cast("bigint").alias("k"),
                    )
                    for name, expr in ks.items()
                ]
            )
        ).alias("_ks"),
    ).select(group_col, F.col("_ks._kname").alias("_kname"), F.col("_ks.k").alias("k"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "_pid",
        group_col,
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("bigint").alias("_off"),
    )
    w_loc = Window.partitionBy("_pid", group_col).orderBy(F.col(value_col).asc())
    local = ranged.withColumn("_lrn", F.row_number().over(w_loc).cast("bigint"))
    ranked = local.join(F.broadcast(offs), ["_pid", group_col]).withColumn(
        "_rk", F.col("_off") + F.col("_lrn")
    )
    picks = (
        ranked.join(F.broadcast(k_long), group_col)
        .where(F.col("_rk") == F.col("k"))
        .groupBy(group_col)
        .pivot("_kname", list(ks))
        .agg(F.first(value_col))
    )
    out = totals.join(picks, group_col, "left").select(
        group_col, "n", *ks
    )
    if with_ranged:
        return out, ranged
    return out


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Quantile normalization across groups (Bolstad et al.,
    Bioinformatics 2003 — the microarray method, here the curation
    tool that makes quality/length scores COMPARABLE across corpus
    sources whose raw distributions differ): each row's value is
    replaced by the GLOBAL distribution's value at the row's
    within-group quantile, so every group's normalized distribution
    is (a subsample of) the same global one, and cross-source
    thresholds mean the same thing everywhere.

    Exactness discipline — everything rank-based, no interpolation:
    within-group rank r of n_g maps to the midpoint quantile
    (2r−1)/(2n_g), realized as the global order statistic at
    idx = ⌈(2r−1)·N / (2n_g)⌉ (exact integer ceiling division;
    idx ∈ [1, N] for every r, and a singleton group maps to the
    global median). Both rank passes avoid skew traps: the GLOBAL
    ranking uses the repartitionByRange + per-partition row_number +
    bounded-offset-table recipe (`equi_depth_bins`' two-pass
    minimum), never an unpartitioned window; the per-GROUP rank is a
    (group)-partitioned window — the caller's group cardinality is
    the usual skew knob. The idx lookup is a plain equi-join on the
    global rank.

    Returns df's (group, tiebreak, value) plus ``qn_value``.
    """
    order = [F.col(value_col).asc(), F.col(tiebreak_col).asc()]
    ranged = (
        df.select(group_col, value_col, tiebreak_col)
        .repartitionByRange(*order)
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged = _pin(ranged)
    sizes = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = sizes.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("bigint").alias("_off"),
        F.sum("_cnt").over(w_all).cast("bigint").alias("_n"),
    )
    w_loc = Window.partitionBy("_pid").orderBy(*order)
    ranked = (
        ranged.withColumn("_lrn", F.row_number().over(w_loc).cast("bigint"))
        .join(F.broadcast(offs), "_pid")
        .withColumn("_grank", F.col("_off") + F.col("_lrn"))
    )
    ranked = _pin(ranked)
    wg = Window.partitionBy(group_col).orderBy(*order)
    grp = (
        ranked.withColumn("_gr", F.row_number().over(wg).cast("bigint"))
        .withColumn(
            "_ng",
            F.count(F.lit(1)).over(Window.partitionBy(group_col)).cast("bigint"),
        )
        .withColumn(
            "_idx",
            F.expr("((2 * _gr - 1) * _n + 2 * _ng - 1) div (2 * _ng)"),
        )
    )
    ref = ranked.select(
        F.col("_grank").alias("_idx"), F.col(value_col).alias("qn_value")
    )
    return grp.join(ref, "_idx").select(
        group_col, tiebreak_col, value_col, "qn_value"
    )


def grouped_running_totals(
    df: DataFrame,
    group_col: str,
    order_col: str,
    sum_cols: list[str],
    with_totals: bool = False,
):
    """Per-group EXCLUSIVE running totals of ``sum_cols`` in
    ``order_col`` order — the skew-safe prefix-sum primitive behind
    rank statistics (Mann-Whitney, Gini/Lorenz): a
    `PARTITION BY group ORDER BY order` window sorts each group on
    one executor (the audit's skew trap once groups are data-sized);
    this is the same repartitionByRange + per-partition window +
    bounded offset recipe as ``grouped_kth_smallest``, generalized
    from ranks to arbitrary additive columns. ``order_col`` values
    must be UNIQUE within a group (pre-aggregate to distinct keys —
    which is also what makes the offset table bounded).

    Returns df's columns plus ``{c}_before`` for each sum column.

    ``with_totals=True`` additionally returns a BOUNDED per-group
    totals table ``(group, _n_{c} = Σ c)`` as a second value,
    aggregated from the recipe's own bounded per-(partition, group)
    sizes table — i.e. one cheap re-scan of the already-pinned
    ranged leaf, NOT a second pass over the caller's input and NOT a
    second consumption of the (unpinned) prefix output. Callers that
    previously pinned the prefix stream just to split it into
    totals + a per-row pass (r12 sweep: ks/anderson-darling/bowley)
    should take the totals here and leave the prefix stream with its
    single consumer.
    """
    order = [F.col(group_col).asc(), F.col(order_col).asc()]
    ranged = _pin(
        df.repartitionByRange(*order).withColumn("_pid", F.spark_partition_id())
    )
    sizes = ranged.groupBy("_pid", group_col).agg(
        *[F.sum(c).cast("bigint").alias(f"_t_{c}") for c in sum_cols]
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "_pid",
        group_col,
        *[
            F.coalesce(F.sum(f"_t_{c}").over(w_off), F.lit(0))
            .cast("bigint")
            .alias(f"_o_{c}")
            for c in sum_cols
        ],
    )
    w_loc = (
        Window.partitionBy("_pid", group_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.select(
        "*",
        *[
            F.coalesce(F.sum(c).over(w_loc), F.lit(0))
            .cast("bigint")
            .alias(f"_l_{c}")
            for c in sum_cols
        ],
    )
    out = local.join(F.broadcast(offs), ["_pid", group_col])
    for c in sum_cols:
        out = out.withColumn(f"{c}_before", F.col(f"_o_{c}") + F.col(f"_l_{c}"))
    out = out.drop(
        "_pid", *[f"_l_{c}" for c in sum_cols], *[f"_o_{c}" for c in sum_cols]
    )
    if not with_totals:
        return out
    totals = sizes.groupBy(group_col).agg(
        *[F.sum(f"_t_{c}").cast("bigint").alias(f"_n_{c}") for c in sum_cols]
    )
    return out, totals


def grouped_local_prefix(
    df: DataFrame,
    group_col: str,
    order_col: str,
    sum_cols: list[str],
) -> DataFrame:
    """Range-partitioned tier table with ``_pid`` and per-partition
    EXCLUSIVE local prefixes ``_l_{c}`` (LONG) — the shared first
    stage of the r12 LOCAL+CROSS prefix recipes for operators whose
    output needs only per-group FOLDS of prefix expressions, never
    the per-row global prefix itself.

    Unlike :func:`grouped_running_totals` this makes exactly ONE pass
    over the ranged table: no eager pin (the subtree has a single
    consumer, so the r8 range-boundary multi-instantiation hazard
    cannot arise), no sizes aggregation, no per-row offsets join.
    The caller aggregates the result to a bounded (``_pid``, group)
    partial table that must carry ``F.sum(c)`` per-partition totals,
    then reconstructs the cross-partition offsets from those totals
    with :func:`partition_offsets` and folds them in at the BOUNDED
    level (global prefix = ``_o_{c} + _l_{c}`` term-by-term — exact
    integer reassociation; range partitioning guarantees every row of
    an earlier partition orders strictly below within the group).
    ``order_col`` values must be unique within a group, as for
    grouped_running_totals.
    """
    order = [F.col(group_col).asc(), F.col(order_col).asc()]
    ranged = df.repartitionByRange(*order).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_loc = (
        Window.partitionBy("_pid", group_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return ranged.select(
        "*",
        *[
            F.coalesce(F.sum(c).over(w_loc), F.lit(0))
            .cast("bigint")
            .alias(f"_l_{c}")
            for c in sum_cols
        ],
    )


def partition_offsets(
    part_df: DataFrame,
    group_col: str,
    total_cols: list[str],
) -> DataFrame:
    """EXCLUSIVE running totals of ``total_cols`` in ``_pid`` order
    within each group, over a BOUNDED per-(``_pid``, group) partial
    table (the aggregate of :func:`grouped_local_prefix` output):
    adds ``_o_{c}`` (BIGINT) via one tiny window — bounded by
    construction, never data-sized."""
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(F.col("_pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return part_df.select(
        "*",
        *[
            F.coalesce(F.sum(c).over(w_off), F.lit(0))
            .cast("bigint")
            .alias(f"_o_{c}")
            for c in total_cols
        ],
    )


def grouped_weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Weighted LOW median per group: the smallest value v whose
    inclusive cumulative weight reaches half the group's total
    (2 * cumw(v) >= W) — the robust center for weighted data
    (price-per-unit medians weighted by quantity), exact and
    tie-free because it is an order statistic over the
    value-AGGREGATED table, never an interpolation.

    Skew-safe: per-(group, value) weight aggregation first (the one
    data-sized pass), then the running prefix via
    :func:`grouped_running_totals` (repartitionByRange + bounded
    offset table — value is unique within a group after aggregation,
    satisfying its order-key contract), a broadcast of per-group
    totals, and a min-struct pick of the first qualifying value.
    The per-group totals ride the recipe's ``with_totals`` side table
    (aggregated from its bounded internal sizes table), so the tier
    stream has exactly ONE consumer and needs no eager pin of its own
    (r13 — the r12 KS/AD treatment applied here; the old pin was a
    full tier-table materialization).

    Returns (group, w_total, weighted_median).
    """
    vals = df.groupBy(F.col(group_col).alias("g"), F.col(value_col).alias("v")).agg(
        F.sum(F.col(weight_col).cast("bigint")).alias("w")
    )
    pre, tot = grouped_running_totals(vals, "g", "v", ["w"], with_totals=True)
    totals = tot.select("g", F.col("_n_w").alias("w_total"))
    qual = (
        pre.join(F.broadcast(totals), "g")
        .where((F.col("w_before") + F.col("w")) * 2 >= F.col("w_total"))
    )
    return (
        qual.groupBy("g", "w_total")
        .agg(F.min("v").alias("weighted_median"))
        .select(
            F.col("g").alias(group_col),
            "w_total",
            "weighted_median",
        )
    )


def cumulative_gains(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
    n_buckets: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cumulative gains table (the lift/gains chart behind campaign
    targeting and model-eval decks): sort by score DESCENDING, cut
    into ``n_buckets`` exact rank buckets, and report how much of the
    total positive class each cumulative prefix captures. Random
    targeting gains linearly; the gap is the model's value.

    Exactness and skew-safety: global ranks via the two-pass
    repartitionByRange recipe (never an unpartitioned data-sized
    window); bucket = ((rank-1) * B) div N + 1 (exact integer split
    under the deterministic (score desc, tiebreak) order); the
    cumulative window runs over the BOUNDED bucket table.
    gain_ppm = (cum_positives * scale) div total_positives.

    Returns (bucket, n_rows, positives, cum_positives, gain_ppm).
    """
    from pyspark.sql import Window

    order = [F.col(score_col).desc(), F.col(tiebreak_col).asc()]
    ranged = (
        df.select(
            score_col, tiebreak_col, F.col(label_col).cast("bigint").alias("_y")
        )
        .repartitionByRange(*order)
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged = _pin(ranged)
    sizes = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = sizes.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("bigint").alias("_off"),
        F.sum("_cnt").over(w_all).cast("bigint").alias("_n"),
    )
    w_loc = Window.partitionBy("_pid").orderBy(*order)
    ranked = (
        ranged.withColumn("_lrn", F.row_number().over(w_loc).cast("bigint"))
        .join(F.broadcast(offs), "_pid")
        .selectExpr(
            "_y",
            f"(((_off + _lrn) - 1) * {n_buckets}) div _n + 1 AS bucket",
        )
    )
    per = ranked.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("_y").cast("bigint").alias("positives"),
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        "n_rows",
        "positives",
        F.sum("positives").over(w_cum).cast("bigint").alias("cum_positives"),
        F.sum("positives").over(w_tot).cast("bigint").alias("_tot"),
    ).selectExpr(
        "bucket",
        "n_rows",
        "positives",
        "cum_positives",
        f"CAST((cum_positives * {scale}) div greatest(_tot, 1) AS BIGINT)"
        f" AS gain_ppm",
    )


def _trimmed_mean_histprune(
    base: DataFrame,
    stats: DataFrame,
    group_col: str,
    trim_ppm: int,
    scale: int,
    n_buckets: int,
) -> DataFrame:
    """The scale path of :func:`grouped_trimmed_mean` (exact — see
    its docstring): equal-width integer buckets localize the two trim
    cut ranks to one bucket each; interior buckets contribute their
    aggregated sums, and only boundary-bucket rows (~2/n_buckets of
    the data) go through the ranked recipe. ``base`` is
    (_g, _v BIGINT); ``stats`` is the cached per-group
    (_n, _lo, _hi) table."""
    # equal-width bucket in [0, n_buckets): width = (hi-lo+1)/B, i.e.
    # bucket = ((v-lo)*B) div (hi-lo+1) — exact integer, monotone in v
    bucketed = base.join(F.broadcast(stats), "_g").withColumn(
        "_b", F.expr(f"((_v - _lo) * {n_buckets}) div (_hi - _lo + 1)")
    )
    # bounded: <= groups x n_buckets rows; consumed by the cut-off
    # scan, the interior sum, and the boundary-offset table — cache
    buckets = (
        bucketed.groupBy("_g", "_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_cnt"),
            F.sum("_v").cast("bigint").alias("_sum"),
        )
        .cache()
    )
    w_cum = (
        Window.partitionBy("_g")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        buckets.withColumn("_cum", F.sum("_cnt").over(w_cum))
        .join(F.broadcast(stats.select("_g", "_n")), "_g")
        .withColumn("_k", F.expr(f"(_n * {trim_ppm}) div 1000000"))
    )
    # lo bucket holds rank k+1, hi bucket holds rank n-k (1-based
    # kept range is (k, n-k]); groups with n <= 2k emit no row later
    bounds = (
        cum.groupBy("_g")
        .agg(
            F.min(F.when(F.col("_cum") >= F.col("_k") + 1, F.col("_b"))).alias(
                "_lob"
            ),
            F.min(
                F.when(F.col("_cum") >= F.col("_n") - F.col("_k"), F.col("_b"))
            ).alias("_hib"),
        )
    )
    interior = (
        cum.join(F.broadcast(bounds), "_g")
        .where((F.col("_b") > F.col("_lob")) & (F.col("_b") < F.col("_hib")))
        .groupBy("_g")
        .agg(F.sum("_sum").cast("bigint").alias("_isum"))
    )
    # <= 2 rows per group: the boundary buckets with their rank
    # offset (ranks before the bucket) and the kept-rank window
    bnd_info = (
        cum.join(F.broadcast(bounds), "_g")
        .where((F.col("_b") == F.col("_lob")) | (F.col("_b") == F.col("_hib")))
        .select(
            "_g",
            "_b",
            (F.col("_cum") - F.col("_cnt")).alias("_before"),
            "_n",
            "_k",
        )
    )
    bnd_rows = bucketed.select("_g", "_b", "_v").join(
        F.broadcast(bnd_info), ["_g", "_b"]
    )
    # exact ranks within each (group, bucket) over the PRUNED subset —
    # the distributed-ranking recipe with a composite range key (no
    # data-sized PARTITION BY window even if one bucket is huge);
    # pinned: multi-consumer repartitionByRange (module note)
    order = [F.col("_g").asc(), F.col("_b").asc(), F.col("_v").asc()]
    ranged = _pin(
        bnd_rows.repartitionByRange(*order).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    sizes = ranged.groupBy("_pid", "_g", "_b").agg(
        F.count(F.lit(1)).alias("_pcnt")
    )
    w_off = (
        Window.partitionBy("_g", "_b")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "_pid",
        "_g",
        "_b",
        F.coalesce(F.sum("_pcnt").over(w_off), F.lit(0))
        .cast("bigint")
        .alias("_off"),
    )
    w_loc = Window.partitionBy("_pid", "_g", "_b").orderBy(F.col("_v").asc())
    kept_b = (
        ranged.withColumn("_lrn", F.row_number().over(w_loc).cast("bigint"))
        .join(F.broadcast(offs), ["_pid", "_g", "_b"])
        .withColumn("_rk", F.col("_before") + F.col("_off") + F.col("_lrn"))
        .where((F.col("_rk") > F.col("_k")) & (F.col("_rk") <= F.col("_n") - F.col("_k")))
        .groupBy("_g")
        .agg(F.sum("_v").cast("bigint").alias("_bsum"))
    )
    ks = stats.withColumn("_k", F.expr(f"(_n * {trim_ppm}) div 1000000"))
    return (
        ks.join(interior, "_g", "left")
        .join(kept_b, "_g", "left")
        .where(F.col("_n") - 2 * F.col("_k") > 0)
        .select(
            F.col("_g").alias(group_col),
            F.col("_n").alias("n"),
            F.col("_k").alias("n_trimmed_each_side"),
            F.expr(
                f"CAST(((coalesce(_isum, 0) + coalesce(_bsum, 0)) * {scale})"
                f" div (_n - 2 * _k) AS BIGINT)"
            ).alias("trimmed_mean_scaled"),
        )
    )


# Measured exact-vs-histprune crossover for grouped_trimmed_mean
# (tools/measure_trimmed_crossover.py, NOTES round 9): below this
# many input rows the full ranged recipe's fewer stages win (the
# scheduling floor dominates); above it the histogram-prune path's
# two aggregation scans beat materializing + window-ranking the
# whole table.
_TRIMMED_EXACT_MAX_ROWS = 2_000_000


def grouped_trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim_ppm: int = 100_000,
    scale: int = 1000,
    method: str = "auto",
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact per-group TRIMMED mean: drop the lowest and highest
    ``trim_ppm`` fraction of rows (by exact rank under (value, group)
    order — floor(n*trim/1e6) rows each side, the textbook definition)
    and average the integer values that remain — the robust center
    that, unlike the median, still uses the retained mass, and unlike
    the plain mean, ignores tail garbage.

    Two EXACT plans (same bit-identical answer — VERDICT r8 ask #4's
    crossover is between two exact strategies, so the oracle row stays
    green on either side):

    * ``method='exact'`` — the r8 plan: pin the range-partitioned
      table, per-(partition, group) row_number, bounded offsets. One
      full-data shuffle + materialization; fewest stages, wins small.
    * ``method='histprune'`` — the scale path: two aggregation-only
      passes (per-group n/min/max, then per-(group, equal-width
      bucket) count+sum — both map-side-combine, NO full-data
      repartitionByRange, no pin), closed-form bucket cut-off on the
      bounded bucket table, then the exact ranked recipe over ONLY
      the ≤ 2 boundary buckets per group (~2/n_buckets of the data).
      Interior buckets contribute their pre-aggregated sums wholly.
      Values must satisfy (max−min)·n_buckets < 2⁶³ (holds for any
      cents-scaled money column).
    * ``method='auto'`` — histprune's first bounded stats pass doubles
      as the row counter: below ``_TRIMMED_EXACT_MAX_ROWS`` total rows
      fall back to 'exact' (the stats pass is one narrow columnar
      scan — trivial in the regime where exact wins), else continue
      on histprune reusing the cached stats.

    Skew-safety: neither plan has a data-sized PARTITION BY window —
    exact uses the distributed-ranking recipe; histprune's only
    ranking runs over boundary-bucket rows with (group, bucket) as
    the range key. Ties at a cut rank are value-ties inside one
    bucket, so the kept SUM is order-independent. The trimmed
    sum/count are exact BIGINTs and the mean floors once at
    ``scale``.

    Returns (group, n, n_trimmed_each_side, trimmed_mean_scaled);
    groups with n ≤ 2·floor(n·trim/1e6) emit no row.
    """
    if method not in ("auto", "exact", "histprune"):
        raise ValueError(f"unknown method {method!r}")
    if method != "exact":
        # NOT pinned: histprune's three passes (stats, buckets,
        # boundary) each re-scan this projection, and re-scanning a
        # cheap source 3x beats materializing it once (measured at
        # sf5/30M rows: eager localCheckpoint of the projection 21.1 s
        # vs 12.2 s unpinned — the pin write+read dwarfs the scans).
        # Feed histprune a cheap-to-re-execute df: a pruned parquet
        # scan or a broadcast dim join, NOT an un-pinned shuffle join
        # (at 100 TB a dim join is broadcast anyway).
        base = df.select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("bigint").alias("_v"),
        )
        # bounded (one row per group), consumed by the bucketizer,
        # the cut-off table, and the final join — cache
        stats = base.groupBy("_g").agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.min("_v").alias("_lo"),
            F.max("_v").alias("_hi"),
        ).cache()
        if method == "auto":
            n_tot = sum(r["_n"] for r in stats.select("_n").collect())
            method = (
                "exact" if n_tot <= _TRIMMED_EXACT_MAX_ROWS else "histprune"
            )
        if method == "histprune":
            return _trimmed_mean_histprune(
                base, stats, group_col, trim_ppm, scale, n_buckets
            )
    order = [F.col(group_col).asc(), F.col(value_col).asc()]
    ranged = _pin(
        df.select(group_col, value_col)
        .repartitionByRange(*order)
        .withColumn("_pid", F.spark_partition_id())
    )
    sizes = ranged.groupBy("_pid", group_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "_pid",
        group_col,
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("bigint").alias("_off"),
    )
    totals = sizes.groupBy(group_col).agg(
        F.sum("_cnt").cast("bigint").alias("_n")
    )
    w_loc = Window.partitionBy("_pid", group_col).orderBy(F.col(value_col).asc())
    ranked = (
        ranged.withColumn("_lrn", F.row_number().over(w_loc).cast("bigint"))
        .join(F.broadcast(offs), ["_pid", group_col])
        .join(F.broadcast(totals), group_col)
        .withColumn("_rk", F.col("_off") + F.col("_lrn"))
        .withColumn("_k", F.expr(f"(_n * {trim_ppm}) div 1000000"))
    )
    kept = ranked.where(
        (F.col("_rk") > F.col("_k")) & (F.col("_rk") <= F.col("_n") - F.col("_k"))
    )
    return kept.groupBy(group_col).agg(
        F.max("_n").alias("n"),
        F.max("_k").alias("n_trimmed_each_side"),
        F.expr(
            f"CAST((SUM(CAST({value_col} AS BIGINT)) * {scale})"
            f" div COUNT(*) AS BIGINT)"
        ).alias("trimmed_mean_scaled"),
    )
