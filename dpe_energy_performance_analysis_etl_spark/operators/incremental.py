"""Incremental warehouse maintenance operators: SCD2 dimension merge
and mergeable aggregate state.

The reference's load step is append-only with anti-join idempotence
(``load.py:123-165``) — it can add rows but never track changes to
existing entities, and every aggregate is recomputed from scratch.
These two operators are the scale generalizations:

- ``scd2_merge``: slowly-changing-dimension type 2. Instead of
  overwriting a changed entity, close the current version row
  (valid_to = change time) and append the new version. History is
  preserved; "current" is a flag, point-in-time queries are range
  predicates on (valid_from, valid_to].
- ``merge_agg_state``: re-aggregating 100 TB because one day of data
  arrived is the classic anti-pattern. Keep per-key partial states
  (count/sum/min/max — all commutative monoids) and MERGE the new
  batch's partial state in. Equivalent to full recompute (verified by
  the oracle), cost proportional to the delta.

Both are pure DataFrame compositions — joins, unions, aggregates —
so Catalyst plans them (broadcast small deltas, partial aggs) and
they run unchanged at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
    change_ts: str = "change_ts",
) -> DataFrame:
    """Apply a batch of updates to an SCD2 dimension.

    ``dim``: key, tracked attrs, valid_from, valid_to (NULL = open),
    is_current. ``updates``: key, tracked attrs, change_ts — at most
    one row per key (pre-aggregate upstream; enforced by the caller).

    Semantics per key:
      - update row whose tracked attrs EQUAL the current version's →
        no-op (idempotent re-delivery is safe);
      - differing attrs → current version closes at change_ts, a new
        open version starts at change_ts;
      - brand-new key, or key present only as closed history (a
        retired entity reappearing) → new open version;
      - historical (already closed) rows always pass through.

    One shuffle on the key (the join); closed history never moves
    twice because only ``is_current`` rows join the delta.
    """
    upd = updates.select(
        F.col(key),
        *[F.col(c).alias(f"__new_{c}") for c in tracked],
        F.col(change_ts).alias("__change_ts"),
    )
    current = dim.filter(F.col(is_current))
    history = dim.filter(~F.col(is_current))

    joined = current.join(upd, on=key, how="left")
    changed: Column = F.col("__change_ts").isNotNull() & ~_all_equal(tracked)

    closed = joined.select(
        *[F.col(c) for c in dim.columns if c not in (valid_to, is_current)],
        F.when(changed, F.col("__change_ts")).otherwise(F.col(valid_to)).alias(valid_to),
        F.when(changed, F.lit(False)).otherwise(F.col(is_current)).alias(is_current),
    ).select(*dim.columns)

    new_versions = (
        joined.filter(changed)
        .select(
            F.col(key),
            *[F.col(f"__new_{c}").alias(c) for c in tracked],
            F.col("__change_ts").alias(valid_from),
            F.lit(None).cast(joined.schema[valid_to].dataType).alias(valid_to),
            F.lit(True).alias(is_current),
        )
        .select(*dim.columns)
    )

    # anti-join against CURRENT keys only: a key whose versions are all
    # closed (entity retired, then reappears) gets a fresh open version
    # — anti-joining all dim keys would silently drop its update
    inserts = (
        upd.join(current.select(key).distinct(), on=key, how="left_anti")
        .select(
            F.col(key),
            *[F.col(f"__new_{c}").alias(c) for c in tracked],
            F.col("__change_ts").alias(valid_from),
            F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
            F.lit(True).alias(is_current),
        )
        .select(*dim.columns)
    )

    return history.unionByName(closed).unionByName(new_versions).unionByName(inserts)


def _all_equal(tracked: list[str]) -> Column:
    """Null-safe equality of every tracked attr with its __new_ twin."""
    cond = F.lit(True)
    for c in tracked:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__new_{c}"))
    return cond


# Aggregate state: per spec name -> (state builder, merge expression).
# All are commutative+associative, so partial states from any batch
# partitioning merge to the same result as a full recompute.


def agg_state(
    df: DataFrame, keys: list[str], specs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Build per-key aggregate state. ``specs`` maps output column ->
    (kind, input column); kind in {count, sum_dec2, min, max}.
    ``sum_dec2`` accumulates decimal(30,2) — exact and
    order-independent for money-scale doubles (see plans.queries.dsum).
    """
    aggs = []
    for out, (kind, col) in specs.items():
        if kind == "count":
            aggs.append(F.count(col).alias(out))
        elif kind == "sum_dec2":
            aggs.append(F.sum(F.col(col).cast("decimal(30,2)")).alias(out))
        elif kind == "min":
            aggs.append(F.min(col).alias(out))
        elif kind == "max":
            aggs.append(F.max(col).alias(out))
        else:
            raise ValueError(f"unknown agg kind: {kind}")
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_state(
    state: DataFrame, delta_state: DataFrame, keys: list[str], specs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Merge two per-key states (full outer on keys; absent side
    contributes the monoid identity). count/sum add, min/max take the
    extremum. Output schema = state schema."""
    merged = state.alias("s").join(delta_state.alias("d"), on=keys, how="full_outer")
    out_cols: list[Column] = [F.col(k) for k in keys]
    for out, (kind, _col) in specs.items():
        s, d = F.col(f"s.{out}"), F.col(f"d.{out}")
        if kind in ("count", "sum_dec2"):
            expr = F.coalesce(s, F.lit(0)) + F.coalesce(d, F.lit(0))
        elif kind == "min":
            expr = F.least(s, d)  # least/greatest skip NULL sides
        elif kind == "max":
            expr = F.greatest(s, d)
        else:
            raise ValueError(f"unknown agg kind: {kind}")
        out_cols.append(expr.alias(out))
    return merged.select(*out_cols)


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    ts_col: str = "ts",
    ord_col: str | None = None,
) -> DataFrame:
    """Apply a CDC changelog (I/U/D records) to a keyed snapshot —
    the change-data-capture generalization of the reference's
    append-only load: upserts overwrite, deletes remove, and only
    the LATEST change per key (by ``ts_col``, tie-broken by
    ``ord_col``) matters.

    ``changes`` columns: key, payload columns matching ``base``'s
    non-key columns, ``op_col`` in {'I','U','D'}, ``ts_col`` (+
    optional ``ord_col`` unique tiebreaker for deterministic
    last-write-wins under equal timestamps).

    Plan: window keep-latest over the changelog (shuffle 1, on key),
    full-outer merge with the snapshot (shuffle 2 reuses the key
    partitioning), delete filter. The changelog side is typically the
    small daily delta — AQE broadcasts it when it fits."""
    order = [F.desc(ts_col)] + ([F.desc(ord_col)] if ord_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", *( [ord_col] if ord_col else [] ))
    )
    payload = [c for c in base.columns if c != key]
    merged = base.alias("b").join(latest.alias("c"), on=key, how="full_outer")
    kept = merged.filter(
        F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != "D")
    )
    return kept.select(
        F.col(key),
        *[
            F.when(F.col(f"c.{op_col}").isNotNull(), F.col(f"c.{c}"))
            .otherwise(F.col(f"b.{c}"))
            .alias(c)
            for c in payload
        ],
    )


def join_view_delta(
    base_left: DataFrame,
    delta_left: DataFrame,
    base_right: DataFrame,
    delta_right: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Incremental maintenance of an inner-join view under INSERTS:
    the rows ADDED to ``(L ∪ dL) ⋈ (R ∪ dR)`` relative to ``L ⋈ R``,
    by the delta-join identity

        dV  =  dL ⋈ R  ∪  L ⋈ dR  ∪  dL ⋈ dR

    — the three joins touch the (small) deltas on at least one side,
    so refreshing the view costs O(|dL| + |dR|) probe work instead of
    re-joining two 100 TB snapshots (the Delta/iceberg MERGE-refresh
    pattern; classic view-maintenance algebra, Blakeley et al. 1986).

    Multiset semantics: each union arm is disjoint from the others by
    construction (an output row pairs a delta tuple with a base tuple
    or two delta tuples — never two base tuples), so plain UNION ALL
    is exact; duplicates WITHIN an arm are real join multiplicities.
    Inserts-only by contract (deletes/updates route through
    apply_changelog first, then a changelog-aware refresh).

    Scale shape: at a real deployment L and R are table scans with the
    join key clustered/bucketed (write_bucketed_table), so dL ⋈ R and
    L ⋈ dR each broadcast the delta side; dL ⋈ dR is delta-sized on
    both sides.
    """
    keys = [on] if isinstance(on, str) else list(on)
    arm1 = delta_left.join(base_right, on=keys)
    arm2 = base_left.join(delta_right, on=keys)
    arm3 = delta_left.join(delta_right, on=keys)
    return arm1.unionByName(arm2).unionByName(arm3)


def join_view_delta_signed(
    base_left: DataFrame,
    delta_left: DataFrame,
    base_right: DataFrame,
    delta_right: DataFrame,
    on: list[str] | str,
    weight_col: str = "w",
) -> DataFrame:
    """Incremental inner-join view maintenance under INSERTS AND
    DELETES: deltas carry signed multiplicities (+1 insert, -1
    delete, any integer for batched repeats) in ``weight_col``; the
    bilinear identity

        d(L ⋈ R)  =  dL ⋈ R  +  L ⋈ dR  +  dL ⋈ dR

    holds for signed multisets exactly (the differential-dataflow /
    DBSP Z-set algebra: join is bilinear in its inputs), with each
    output row's weight the PRODUCT of the matched weights (base rows
    weigh +1). Rows are then net-aggregated per value; net 0 rows
    (e.g. a delete cancelling an insert) drop out. Downstream applies
    the view change by adding weights per row value.

    Same O(|delta|) probe cost as the inserts-only variant; the only
    extra work is the weight product and the final per-value net
    aggregation (map-side combinable)."""
    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in base_left.columns if c not in keys]
    rcols = [c for c in base_right.columns if c not in keys]
    bl = base_left.withColumn("__wl", F.lit(1))
    br = base_right.withColumn("__wr", F.lit(1))
    dl = delta_left.withColumnRenamed(weight_col, "__wl")
    dr = delta_right.withColumnRenamed(weight_col, "__wr")
    arms = [
        dl.join(br, on=keys),
        bl.join(dr, on=keys),
        dl.join(dr.withColumnRenamed("__wr", "__wr2"), on=keys).withColumn(
            "__wr", F.col("__wr2")
        ).drop("__wr2"),
    ]
    out = None
    for a in arms:
        a = a.select(*keys, *lcols, *rcols, (F.col("__wl") * F.col("__wr")).alias("__w"))
        out = a if out is None else out.unionByName(a)
    return (
        out.groupBy(*keys, *lcols, *rcols)
        .agg(F.sum("__w").alias(weight_col))
        .where(F.col(weight_col) != 0)
    )
