"""Physical write layouts for data skipping: Z-order (Morton)
clustering.

Parquet scans skip whole files/row-groups via min/max statistics —
but only if values are CLUSTERED. Sorting by one column makes its
stats tight and every other column's stats useless; interleaving the
bits of several columns (a Z-order / Morton curve) makes ALL of them
moderately tight, so multi-dimensional range predicates prune files
on every dimension. This is the layout trick behind Delta/Iceberg
``OPTIMIZE ZORDER BY`` — here as a plain parquet write (the
reference's fixed gzip dump, ``filestorage_helper.py:83-99``, has no
layout control at all).

``zorder_key`` interleaves per BIT — the top k bits of the key
alternate between the columns' top bits, so even a coarse k-file
range partitioning splits on EVERY column, not just the first (a
nibble-granularity interleave needs 2^(4·n_cols) files before the
second column prunes at all; measured exactly that failure with 16
files). The whole key is a fixed OR/shift expression tree — fully
inside whole-stage codegen. Inputs are rank-normalized to
[0, 2^bits) first so skewed/unbounded domains still spread across
the curve.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def _interleave_bits(cols: list[Column], bits: int) -> Column:
    """Interleave ``bits``-bit non-negative ints bit-wise: output bit
    positions cycle through the inputs round-robin, most-significant
    bits highest."""
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1)).cast("long")
            # column j's bit i lands at position i*n + (n-1-j): higher
            # j (later column) below earlier ones within each group
            terms.append(F.shiftleft(bit, i * n + (n - 1 - j)))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Add a ``__zorder`` column: Morton interleave of the
    tier-rank-normalized values of ``cols``.

    The curve only needs a MONOTONE map onto [0, 2^bits) per column.
    That map is built from the DISTINCT-value (tier) table: exact
    tier rank via ``global_rank_column``'s partition-offset two-pass,
    scaled to the code range, joined back on value. No unpartitioned
    window ever touches the data OR the tier table (tiers grow with
    the data for high-cardinality columns — the r11 window-class
    sweep; the old percent_rank-over-global-sort spelling moved the
    whole table into one task)."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        global_rank_column,
    )

    out = df
    scale = (1 << bits) - 1
    rank_cols = []
    for c in cols:
        rc = f"__r_{c}"
        tiers = df.select(F.col(c).alias("__tv")).where(
            F.col("__tv").isNotNull()
        ).distinct()
        ranked = global_rank_column(tiers, [F.col("__tv").asc()], "__tr")
        m = ranked.groupBy().agg(F.max("__tr").alias("__tm"))
        # Exact integer floor-division (`div` on bigints), never
        # double-divide + cast("long"): Spark truncates the double
        # quotient while DuckDB rounds, and a quotient 1 ulp above an
        # integer boundary would shift a tier code (r11 advice).
        code = (
            ranked.crossJoin(F.broadcast(m))
            .select(
                F.col("__tv").alias(c),
                F.expr(
                    f"((__tr - 1) * CAST({scale} AS BIGINT))"
                    " div greatest(__tm - 1, 1)"
                ).alias(rc),
            )
        )
        out = out.join(code, c, "left").withColumn(
            rc, F.coalesce(F.col(rc), F.lit(0))
        )
        rank_cols.append(rc)
    key = _interleave_bits([F.col(rc) for rc in rank_cols], bits)
    return out.withColumn("__zorder", key).drop(*rank_cols)


def write_zorder_parquet(
    df: DataFrame, path: str, cols: list[str], n_files: int = 16, bits: int = 16
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Z-curve of ``cols``: range-partition by the Morton key (contiguous
    curve segments per file) and sort within partitions, so min/max
    stats are tight on EVERY clustered column."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode("overwrite")
        .parquet(path)
    )
