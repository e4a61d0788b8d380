"""Skew mitigation: salted join.

AQE's skew-join split (on in this engine's session defaults) handles
most skew by splitting oversized partitions at runtime, but it only
works for sort-merge joins and after-the-fact. ``salted_join`` is the
explicit, plan-time fix for the pathological case — a handful of hot
keys (the NULL key, a default value, one celebrity user) that would
pin a single reducer:

  - the LEFT (large, skewed) side gets a deterministic salt in
    [0, buckets) derived from a hash of its row — same-key rows
    spread across ``buckets`` reducers;
  - the RIGHT side is replicated once per bucket (explode) — its rows
    meet every salted copy;
  - the join key becomes (key, salt); results are identical to the
    unsalted join, with the hot key's work spread ``buckets`` ways at
    the cost of a ``buckets``× blow-up of the right side (so: use for
    right sides far below the fact table, above broadcast size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _salt_expr(salt_buckets: int) -> Column:
    """Per-ROW salt in [0, buckets): hash of the row's position
    (``monotonically_increasing_id`` = partition id + offset), never of
    its content. Salting by any function of the row's VALUES degrades
    to a constant when the hot key's rows are identical (e.g. a left
    side holding only the key columns) — the hot key then lands in one
    bucket and the salt buys nothing. Position-derived salt spreads
    identical rows uniformly; the join result is salt-independent, so
    recomputation under a different partitioning stays correct."""
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join with the left side salted across ``salt_buckets``
    reducers per key. Supported ``how``: inner / left (semantics where
    the salted side is preserved)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    salted_left = left.withColumn("__salt", _salt_expr(salt_buckets))
    replicated_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_left.join(replicated_right, on=[*keys, "__salt"], how=how).drop("__salt")
