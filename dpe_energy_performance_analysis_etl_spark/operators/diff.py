"""Snapshot diff: compare two versions of a keyed table and emit
added / removed / changed rows with per-column change attribution —
the data-engineering primitive behind CDC bootstrapping, regression
checks between pipeline runs, and "what did yesterday's load touch".

Shape at scale: ONE full-outer equi-join on the key (both sides
shuffle once, co-partitioned), every comparison a null-safe codegen
expression, and unchanged rows — the overwhelming majority of a
day-over-day diff — are filtered before anything materializes. The
changed-column attribution builds an array of column names from
per-column null-safe comparisons (``array_compact`` of conditional
literals), so the output is one row per differing key regardless of
how many columns moved.

Contrast with the incremental family: ``apply_changelog``
(operators/incremental.py) CONSUMES a changelog; this PRODUCES one
from two materialized states — diff(old, new) applied to old yields
new, which is how the two round-trip (tested).

Reference analogue: the reference tracks batches by append-only
batch_id (scripts/load.py) and never diffs states; this is the
generalized tool for that gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(keys…, change, changed_cols) for every key that was added,
    removed, or changed between ``old`` and ``new``. ``change`` ∈
    {'added', 'removed', 'changed'}; ``changed_cols`` lists the
    differing columns in sorted order (empty array for added /
    removed). Keys must be non-null (join keys); values compare
    null-safely, so NULL→value and value→NULL count as changes."""
    if compare_cols is None:
        compare_cols = sorted(set(old.columns) - set(key_cols))
    o = old.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"nk_{c}") for c in key_cols],
        *[F.col(c).alias(f"n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"k_{c}") == F.col(f"nk_{c}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, on=cond, how="full_outer")

    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}")), F.lit(c)
                )
                for c in sorted(compare_cols)
            ]
        )
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"k_{c}"), F.col(f"nk_{c}")).alias(c)
            for c in key_cols
        ],
        change.alias("change"),
        F.when(
            F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull(), diffs
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
    return out.where(F.col("change").isNotNull())
