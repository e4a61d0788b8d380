"""Temporal join operators — as-of and range joins.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive
formulation (non-equi theta join + argmax) degenerates to a
broadcast-nested-loop. These implementations are shuffle-bounded:

``asof_join`` — union-and-window technique: tag both sides, sort each
key's rows by (ts, side) once, carry the right side's payload forward
with ``last(..., ignorenulls=True)``, keep left rows. ONE shuffle +
sort per join, O(n log n) — survives 100 TB where a nested loop never
finishes.

``range_join_bucketed`` — interval join |ts_a - ts_b| ≤ window without
requiring a selective equi-key: bucket timestamps into window-sized
bins, equi-join on (key, bucket) for the bucket and its successor,
then apply the exact range predicate. Shuffle volume O(n), candidate
set per row bounded by bucket occupancy instead of the whole key
group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts (direction='backward'; 'forward' matches the
    earliest right row with right_ts >= left_ts), per ``on`` key.

    Matches DuckDB ``ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts``
    semantics, including ties (a right row AT the left timestamp
    matches). Left rows with no prior right row keep NULL payloads
    (left-outer flavor).
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_ts)]
    payload_out = [p + suffix for p in right_payload]

    left_passthrough = [c for c in left.columns if c not in (on, left_ts)]
    lhs = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_passthrough],
        *[F.lit(None).cast(right.schema[p].dataType).alias(po) for p, po in zip(right_payload, payload_out)],
    )
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_passthrough],
        *[F.col(p).alias(po) for p, po in zip(right_payload, payload_out)],
    )
    unioned = lhs.unionByName(rhs)

    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    elif direction == "forward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__ts").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        raise ValueError(f"unknown direction {direction!r}")

    filled = unioned.select(
        "*",
        *[
            F.last(po, ignorenulls=True).over(w).alias(po + "__f")
            for po in payload_out
        ],
    )
    out = (
        filled.filter(F.col("__side") == 1)
        .drop(*payload_out, "__side")
        .withColumnsRenamed({po + "__f": po for po in payload_out})
        .withColumnRenamed("__ts", left_ts)
    )
    return out


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """All (left, right) pairs with the same ``on`` key and
    0 <= right_ts - left_ts <= window_seconds.

    Bucketing: right row in bucket b can only match left rows in
    buckets b and b-1, so the left side is exploded into (bucket,
    bucket+1) — candidate pairs come from an equi-join on
    (key, bucket), never a full per-key cross product.

    When ``left_ts == right_ts`` (e.g. both sides use the default
    ``ts``) the right timestamp comes back as ``{right_ts}_right`` so
    the output never carries duplicate column names.
    """
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import epoch_double

    bucket = lambda c: F.floor(epoch_double(c) / window_seconds)  # noqa: E731
    lhs = left.withColumn("__lb", bucket(left_ts)).withColumn(
        "__bucket", F.explode(F.array(F.col("__lb"), F.col("__lb") + 1))
    )
    # alias the right timestamp to an internal name: with identical
    # left/right ts names the post-join delta would otherwise hit
    # AMBIGUOUS_REFERENCE
    rhs = right.withColumnRenamed(right_ts, "__rts").withColumn("__bucket", bucket("__rts"))
    joined = lhs.join(rhs, on=[on, "__bucket"])
    delta = epoch_double("__rts") - epoch_double(left_ts)
    out_ts = right_ts if right_ts != left_ts else f"{right_ts}_right"
    return (
        joined.filter((delta >= 0) & (delta <= window_seconds))
        .drop("__lb", "__bucket")
        .withColumnRenamed("__rts", out_ts)
    )
