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
