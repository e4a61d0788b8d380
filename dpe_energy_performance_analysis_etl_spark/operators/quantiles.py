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
    # cached: consumed by the per-partition size pass AND the ranked
    # pass — the two-pass minimum for exact global ranks (N and the
    # earlier-partition offsets must exist before bins assign); the
    # cache holds exactly one shuffle's worth of pruned columns
    # (MEMORY_AND_DISK — spills, never recomputes the range exchange)
    ranged = (
        df.select(*order_cols)
        .repartitionByRange(*order)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
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
