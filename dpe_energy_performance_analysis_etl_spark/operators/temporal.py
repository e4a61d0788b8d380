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


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts + probabilities between
    consecutive event types per user — the sequence-model summary
    behind funnel diagnostics and next-event prediction baselines.

    One window pass per user (lag), one (prev, curr) aggregation; the
    per-prev totals come from a second aggregation over the ALREADY
    tiny transition table (|types|^2 rows), broadcast back — the
    event-scale data is shuffled exactly once, on the user key.
    ``prob = n / total`` divides two exact BIGINTs, so the double is
    engine-exact. Ordering ties broken by ``order_tiebreak`` for
    reproducibility on equal timestamps.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
    pairs = (
        events.withColumn("prev_type", F.lag(type_col).over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type"), F.col(type_col).alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        # |types|^2 rows, but derived from a full event window pass —
        # cached because it feeds both the totals agg and the join.
        .cache()
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("total"))
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias("prob"),
        )
    )


def next_event_hitrate(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
    train_frac_num: int = 4,
    train_frac_den: int = 5,
) -> DataFrame:
    """Backtest of the first-order Markov next-event predictor (the
    :func:`event_transitions` model): split each user's event stream
    by TIME — the first ``train_frac`` of rows (exact integer
    cutoff ``(n * num) div den``) trains transition counts, the rest
    evaluates top-1 accuracy — the eval loop that turns a transition
    matrix into a measured baseline (and the honest split: a random
    split would leak future behavior into the model, the CLAUDE.md
    walk-forward lesson).

    A transition (r-1 → r) is a TEST case iff its target row r is
    past the user's cutoff; train cases are everything else, so the
    boundary transition (last train row → first test row) is
    evaluated, never trained on. Prediction = argmax train count with
    lexicographic tie-break (min-struct over (-n, next)); test
    contexts unseen in training predict nothing and count as misses.

    Scale shape: one per-user window pass (the user key is the only
    data-sized shuffle), a |types|² model table broadcast back, one
    bounded output row per context type. hit_ppm divides two exact
    BIGINTs.

    Returns (prev_type, n_test, hits, hit_ppm).
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    w_all = Window.partitionBy(user_col)
    seq = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.lag(type_col).over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    cutoff = F.expr(f"(n * {train_frac_num}) div {train_frac_den}")
    train = seq.where(F.col("rk") <= cutoff)
    test = seq.where(F.col("rk") > cutoff)
    model = (
        train.groupBy("prev_type", F.col("et").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .groupBy("prev_type")
        .agg(
            F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("next_type")))
            .getField("next_type")
            .alias("predicted")
        )
    )
    scored = test.join(F.broadcast(model), "prev_type", "left")
    return (
        scored.groupBy("prev_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.count_if(F.col("predicted") == F.col("et"))
            .cast("bigint")
            .alias("hits"),
        )
        .withColumn(
            "hit_ppm", F.expr("(hits * 1000000) div n_test").cast("bigint")
        )
    )


def conversion_attribution(
    events: DataFrame,
    convert_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """First-touch / last-touch attribution: for each user's FIRST
    conversion event, the earliest and the latest non-conversion
    event strictly before it (by the (ts, tiebreak) order).

    Everything reduces on the user key in one shuffle: the first
    conversion per user is a min-struct aggregate, prior events are a
    filtered join back on the user key (the conversion table is one
    row per converting user — broadcast when users fit, shuffle-join
    otherwise; Spark's AQE picks), and first/last touch are
    min/max-struct aggregates — no window over the full event table.
    Users whose conversion has no prior events keep NULL touches.
    """
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("event_type"),
        F.col(order_tiebreak).alias("tb"),
    )
    conv = (
        ev.filter(F.col("event_type") == convert_type)
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "tb")).alias("c"))
        .select("user_id", F.col("c.ts").alias("conv_ts"), F.col("c.tb").alias("conv_tb"))
        # One row per converting user; feeds the prior-events join AND
        # the final left join — cached so the event filter+agg runs once.
        .cache()
    )
    prior = ev.join(conv, "user_id").filter(
        (F.col("ts") < F.col("conv_ts"))
        | ((F.col("ts") == F.col("conv_ts")) & (F.col("tb") < F.col("conv_tb")))
    )
    touches = prior.groupBy("user_id").agg(
        F.min(F.struct("ts", "tb", "event_type")).alias("f"),
        F.max(F.struct("ts", "tb", "event_type")).alias("l"),
        F.count(F.lit(1)).alias("n_prior_events"),
    )
    return (
        conv.join(touches, "user_id", "left")
        .select(
            "user_id",
            "conv_ts",
            F.col("f.event_type").alias("first_touch"),
            F.col("l.event_type").alias("last_touch"),
            F.coalesce("n_prior_events", F.lit(0)).alias("n_prior_events"),
        )
    )


def threshold_run_segments(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    threshold: float,
    min_len: int = 1,
    below: bool = True,
) -> DataFrame:
    """Maximal runs of consecutive below-threshold (or above-) rows
    per key — the gaps-and-islands pattern behind audio silence
    detection (RMS frames under a floor), sensor dead-zones, and
    low-activity window mining.

    Two row_numbers over the SAME (key, order) window — Catalyst
    plans them in one sort within one shuffle — then ``island =
    rn_all - rn_matching`` is constant exactly for consecutive
    matching rows, and one aggregation per (key, island) emits the
    segments. Output per segment: first/last order position, length,
    min/max value (order-independent aggregates only — a double mean
    would be partition-order-nondeterministic).
    """
    order = [F.col(c).asc() for c in order_cols]
    w_all = Window.partitionBy(key_col).orderBy(*order)
    matches = F.col(value_col) < threshold if below else F.col(value_col) > threshold
    with_rn = df.withColumn("__rn", F.row_number().over(w_all)).withColumn(
        "__m", matches
    )
    w_match = Window.partitionBy(key_col, "__m").orderBy(*order)
    runs = (
        with_rn.withColumn("__rm", F.row_number().over(w_match))
        .filter(F.col("__m"))
        .withColumn("__island", F.col("__rn") - F.col("__rm"))
    )
    firsts = [F.min(F.struct(*order_cols)).alias("__first"), F.max(F.struct(*order_cols)).alias("__last")]
    seg = (
        runs.groupBy(key_col, "__island")
        .agg(
            *firsts,
            F.count(F.lit(1)).alias("run_len"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .filter(F.col("run_len") >= min_len)
    )
    first_cols = [F.col(f"__first.{c}").alias(f"start_{c}") for c in order_cols]
    last_cols = [F.col(f"__last.{c}").alias(f"end_{c}") for c in order_cols]
    return seg.select(key_col, *first_cols, *last_cols, "run_len", "min_value", "max_value")


def common_event_paths(
    events: DataFrame,
    k: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Frequency table of each user's FIRST k event types as an
    ordered path string ("view>click>purchase") — the entry-path
    mining behind onboarding/funnel dashboards.

    collect_list is partition-order-nondeterministic, so the path is
    built by collecting (ts, tiebreak, type) STRUCTS and
    ``sort_array``-ing them row-locally — deterministic under any
    shuffle, one aggregation on the user key, then a count over the
    tiny path table."""
    structs = F.collect_list(F.struct(ts_col, order_tiebreak, type_col)).alias("evs")
    per_user = events.groupBy(user_col).agg(structs)
    path = F.concat_ws(
        ">",
        F.slice(F.transform(F.sort_array("evs"), lambda s: s[type_col]), 1, k),
    )
    return (
        per_user.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def ewma_dyadic(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window: int = 8,
) -> DataFrame:
    """Exponentially-weighted moving average with alpha = 1/2 over a
    bounded trailing window — time-series smoothing whose weights
    (2^-1, 2^-2, …) are exact powers of two, so every arithmetic step
    is an EXACT IEEE operation and the result is bit-reproducible
    across engines (a general-alpha EWMA goes through libm ``pow``
    and drifts by ulps; the dyadic special case is the reproducible
    default, like sqrt-only temperature mixing in text/mixing.py).

    smoothed_t = sum_{j=0..w-1} x_{t-j} * 2^-(j+1), renormalized by
    the finite weight mass (1 - 2^-n) so short prefixes average
    correctly. One collect_list over a rows-frame window (frame order
    = window order, deterministic), then a row-local ordered fold —
    a single shuffle on the key, state bounded by ``window``.
    """
    order = [F.col(c).asc() for c in order_cols]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    clean = df.filter(F.col(value_col).isNotNull()).withColumn(
        "__arr", F.reverse(F.collect_list(F.col(value_col).cast("double")).over(w))
    )
    # SQL shiftleft accepts a column bit count (the Python helper
    # doesn't), so the dyadic weights stay integer-derived.
    weighted = F.expr(
        "aggregate(transform(__arr, (x, i) -> x / cast(shiftleft(cast(1 as bigint), i + 1) as double)), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    norm = F.expr(
        "1.0 - 1.0 / cast(shiftleft(cast(1 as bigint), size(__arr)) as double)"
    )
    return clean.select(
        key_col,
        *order_cols,
        F.col(value_col),
        (weighted / norm).alias("ewma"),
    )


def time_embargo_split(
    df: DataFrame,
    ts_col: str = "ts",
    cutoff_us: int = 0,
    embargo_us: int = 0,
) -> DataFrame:
    """Leakage-safe temporal train/test split with an embargo gap
    (the purged-split discipline from financial ML, de Prado 2018):
    rows before ``cutoff_us`` train; rows inside the
    ``[cutoff, cutoff + embargo)`` window are DISCARDED from both
    sides (features computed over trailing windows straddle the
    boundary — the embargo absorbs that lookahead contamination);
    rows after test. Adds a ``split`` column ('train' / 'embargo' /
    'test'). Row-local epoch comparison, zero shuffle; times compared
    in integer microseconds (functions/temporal.py discipline — no
    engine-specific timestamp arithmetic)."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import epoch_micros

    us = epoch_micros(ts_col)
    return df.withColumn(
        "split",
        F.when(us < cutoff_us, F.lit("train"))
        .when(us < cutoff_us + embargo_us, F.lit("embargo"))
        .otherwise(F.lit("test")),
    )


def cusum_changepoint(
    df: DataFrame,
    period_col,
    value_cents,
) -> DataFrame:
    """CUSUM change-point screen over a per-period integer series
    (Page 1954): deviations from the period mean accumulate; the
    |cumulative| maximum marks the most likely mean-shift point.

    Exactness: with n periods and integer cents c_i, the scaled
    deviation n*c_i - total is INTEGER (the mean never materializes as
    a float), so the running sum S_i and the argmax are bit-exact on
    any engine — the PageRank discipline applied to a classic control
    chart. Returns one row per period: (period, cents,
    cusum_scaled = Σ_{j<=i} (n*c_j - total), is_peak).

    Scale shape: the raw table aggregates to one row per PERIOD
    first (map-side combinable exact-cents sums); every window below
    runs over that tiny series, so the single-partition window is
    |periods| rows, never data."""
    pcol = period_col if not isinstance(period_col, str) else F.col(period_col)
    vcol = value_cents if not isinstance(value_cents, str) else F.col(value_cents)
    per = df.groupBy(pcol.alias("period")).agg(
        F.sum(vcol.cast("bigint")).alias("cents")
    )
    w_all = Window.partitionBy()
    per = per.withColumn("n", F.count(F.lit(1)).over(w_all)).withColumn(
        "total", F.sum("cents").over(w_all)
    )
    w_ord = Window.partitionBy().orderBy("period").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dev = F.col("n") * F.col("cents") - F.col("total")
    cum = per.withColumn("cusum_scaled", F.sum(dev).over(w_ord))
    peak = F.max(F.abs(F.col("cusum_scaled"))).over(w_all)
    return cum.select(
        "period",
        "cents",
        "cusum_scaled",
        (F.abs(F.col("cusum_scaled")) == peak).alias("is_peak"),
    )


def interval_coverage(
    df: DataFrame,
    start_col: str,
    end_col: str,
    by: list[str] | str | None = None,
) -> DataFrame:
    """Merged-interval coverage per key: overlapping/touching
    [start, end] intervals union into islands; output per key the
    merged interval count and TOTAL COVERED LENGTH (the dedup-aware
    'total watch time' / machine-uptime / sensor-coverage measure —
    a plain SUM(end - start) double-counts every overlap).

    Gaps-and-islands with a running max: an interval starts a new
    island iff its start exceeds the running max end of all previous
    intervals (ordered by start; touching endpoints merge). One
    window partitioned by key + one aggregation; integer or timestamp
    bounds both work (length in the column's own units).
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    base = df.select(
        *keys, F.col(start_col).alias("__s"), F.col(end_col).alias("__e")
    )
    w = Window.partitionBy(*keys).orderBy("__s", "__e")
    prev_max_end = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    tagged = base.withColumn(
        "__brk",
        F.when(prev_max_end.isNull() | (F.col("__s") > prev_max_end), 1).otherwise(0),
    ).withColumn(
        "__gid",
        F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = tagged.groupBy(*keys, "__gid").agg(
        F.min("__s").alias("island_start"), F.max("__e").alias("island_end")
    )
    agg_keys = keys if keys else []
    out = islands.groupBy(*agg_keys).agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("island_end") - F.col("island_start")).alias("covered_length"),
    )
    return out


def seasonal_naive_eval(
    df,
    time_col: str,
    value_col: str,
    season: int,
    by=None,
):
    """Seasonal-naive forecast evaluation (forecast(t) = value(t -
    season)) scored by MASE (Hyndman & Koehler 2006) — the standard
    no-model baseline every demand/revenue forecasting pipeline must
    beat, and the denominator MASE normalizes others by.

    Expects ONE row per (key, period) with an INTEGER value (cents,
    counts) so both error sums stay BIGINT; MASE is one final
    division of exact integer products. Evaluation windows are
    well-defined and engine-identical: seasonal errors over rows with
    a t-season predecessor, naive (lag-1) errors over rows with a t-1
    predecessor — both by ROW offset on the ordered per-key series.

    Scale shape: two lag windows + one aggregation per key; series
    arrive pre-aggregated (periods per key, not raw rows), so window
    state is bounded by the series length.

    Returns (keys..., n_eval, sae_seasonal, sae_naive, mase); mase is
    NULL when either error window is empty or the naive error sum is
    zero (guarded — ANSI division).
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    w = Window.partitionBy(*keys).orderBy(time_col)
    v = F.col(value_col).cast("bigint")
    lag_s = F.lag(v, season).over(w)
    lag_1 = F.lag(v, 1).over(w)
    per = df.select(
        *keys,
        F.abs(v - lag_s).alias("__es"),
        F.abs(v - lag_1).alias("__en"),
    )
    agg = per.groupBy(*keys).agg(
        F.count("__es").cast("bigint").alias("n_eval"),
        F.sum("__es").cast("bigint").alias("sae_seasonal"),
        F.count("__en").cast("bigint").alias("__n_naive"),
        F.sum("__en").cast("bigint").alias("sae_naive"),
    )
    mase = F.when(
        (F.col("n_eval") > 0) & (F.col("sae_naive") > 0),
        (F.col("sae_seasonal") * F.col("__n_naive")).cast("double")
        / (F.col("sae_naive") * F.col("n_eval")).cast("double"),
    )
    return agg.select(
        *keys, "n_eval", "sae_seasonal", "sae_naive", mase.alias("mase")
    )


def event_trigrams(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Second-order Markov transitions: counts and conditional
    probability of the NEXT event given the last TWO — the step from
    ``event_transitions``' bigram model to the trigram model
    next-event predictors actually use (a first-order chain cannot
    distinguish 'view→cart' reached from 'search' vs from 'refund').

    Same scale shape as the bigram operator: ONE window pass per user
    (two lags in the same window — no second shuffle), one
    (t0, t1, t2) aggregation, context totals aggregated from the
    already-tiny trigram table and broadcast back. ``prob`` divides
    two exact BIGINTs — engine-exact.

    Returns (t0, t1, t2, n, context_n, prob).
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    tri = (
        events.select(
            F.lag(type_col, 2).over(w).alias("t0"),
            F.lag(type_col, 1).over(w).alias("t1"),
            F.col(type_col).alias("t2"),
        )
        .filter(F.col("t0").isNotNull() & F.col("t1").isNotNull())
        .groupBy("t0", "t1", "t2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .cache()
    )
    ctx = tri.groupBy("t0", "t1").agg(F.sum("n").cast("bigint").alias("context_n"))
    return tri.join(F.broadcast(ctx), ["t0", "t1"]).select(
        "t0",
        "t1",
        "t2",
        "n",
        "context_n",
        (F.col("n").cast("double") / F.col("context_n").cast("double")).alias("prob"),
    )


def gsp_frequent_sequences(
    events: DataFrame,
    key_col: str = "user_id",
    item_col: str = "event_type",
    order_cols: tuple = ("ts", "event_id"),
    min_support: int = 10,
    max_len: int = 3,
) -> DataFrame:
    """Frequent sequential patterns up to length ``max_len`` with
    arbitrary gaps (GSP — Srikant & Agrawal, EDBT'96; the Apriori
    level-wise recipe on SEQUENCES): a pattern ⟨i₁ → i₂ → i₃⟩ is
    frequent iff ≥ ``min_support`` distinct keys contain the items in
    that order (not necessarily adjacent — the difference from the
    n-gram/trigram family, which only sees contiguous runs).

    Candidate discipline (the house rule): level ℓ candidates come
    ONLY from joining frequent (ℓ−1)-patterns — each level prunes by
    the Apriori property before any data-sized join, so the ordered
    pair/triple enumeration is equi-keyed per key and bounded by
    frequent-item occurrences, never all-pairs over raw events.
    Support counts DISTINCT keys (one count per key regardless of
    how many times the pattern occurs inside it).

    Per-key occurrence positions use a dense ordering rank; the
    ℓ=2 join is (key)-keyed over frequent-item occurrences with a
    rank inequality; ℓ=3 extends frequent 2-patterns by frequent
    items with the same discipline. Returns
    (pattern, length, support) — pattern as '→'-joined items.
    """
    rk = F.row_number().over(
        Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    )
    ev = events.select(
        F.col(key_col).alias("k"), F.col(item_col).alias("it"), rk.alias("r")
    ).cache()

    f1 = (
        ev.select("k", "it")
        .distinct()
        .groupBy("it")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .where(F.col("support") >= min_support)
        .cache()
    )
    out = f1.select(
        F.col("it").alias("pattern"),
        F.lit(1).cast("bigint").alias("length"),
        "support",
    )
    if max_len < 2:
        return out

    # occurrences of frequent items only (Apriori prune before join)
    occ = ev.join(F.broadcast(f1.select("it")), "it", "left_semi").cache()
    p2 = (
        occ.alias("x")
        .join(occ.alias("y"), F.col("x.k") == F.col("y.k"))
        .where(F.col("x.r") < F.col("y.r"))
        .select(
            F.col("x.k").alias("k"),
            F.col("x.it").alias("i1"),
            F.col("y.it").alias("i2"),
        )
        .distinct()
    )
    f2 = (
        p2.groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .where(F.col("support") >= min_support)
        .cache()
    )
    out = out.unionByName(
        f2.select(
            F.concat_ws("→", "i1", "i2").alias("pattern"),
            F.lit(2).cast("bigint").alias("length"),
            "support",
        )
    )
    if max_len < 3:
        return out

    # level 3: first occurrence-pair per (k, i1, i2) with the
    # EARLIEST possible (min x.r, then min y.r > that) is enough for
    # existence of an extension — the classic earliest-witness
    # argument: if any (r1 < r2 < r3) embedding exists, one with the
    # minimal r2 for some r1 exists, so joining the min-r2 witness
    # per (k, i1, i2) against later frequent-item occurrences finds
    # exactly the keys containing the 3-pattern
    w2 = (
        occ.alias("x")
        .join(occ.alias("y"), F.col("x.k") == F.col("y.k"))
        .where(F.col("x.r") < F.col("y.r"))
        .join(
            F.broadcast(f2.select("i1", "i2")),
            (F.col("x.it") == F.col("i1")) & (F.col("y.it") == F.col("i2")),
            "left_semi",
        )
        .groupBy(
            F.col("x.k").alias("k"),
            F.col("x.it").alias("i1"),
            F.col("y.it").alias("i2"),
        )
        .agg(F.min(F.col("y.r")).cast("bigint").alias("r2"))
    )
    w2r = w2.withColumnRenamed("k", "wk")
    p3 = (
        w2r.join(
            occ.alias("z"),
            (F.col("wk") == F.col("z.k")) & (F.col("r2") < F.col("z.r")),
        )
        .select(F.col("wk").alias("k"), "i1", "i2", F.col("z.it").alias("i3"))
        .distinct()
    )
    f3 = (
        p3.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .where(F.col("support") >= min_support)
    )
    return out.unionByName(
        f3.select(
            F.concat_ws("→", "i1", "i2", "i3").alias("pattern"),
            F.lit(3).cast("bigint").alias("length"),
            "support",
        )
    )


def markov_removal_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    conv_type: str = "purchase",
    rounds: int = 25,
    scale: int = 10**12,
) -> DataFrame:
    """Markov-chain (removal-effect) attribution over user event
    paths (Anderl et al. 2014's data-driven alternative to
    first/last-touch — compare `attribution_first_last`): build the
    transition matrix START→…→{conversion, null}, compute the
    absorption probability P(conv | start) by fixed-round value
    iteration, then for each channel c the REMOVAL EFFECT
    1 − P_c/P where P_c re-solves the chain with every transition
    into c redirected to the null absorber.

    Exactness discipline: transition probabilities are integer-
    scaled q = div(cnt·10⁶, tot) — independent of data size — and
    each iteration is p'(s) = div(Σ_t q(s,t)·p(t), 10⁶) with
    p(conv) ≡ scale, p(null) ≡ 0: one truncating division per state
    per round, every product ≤ 10⁶·scale = 10¹⁸ < 2⁶³. A FIXED
    round count (the kmeans/pagerank recipe) makes the whole
    trajectory bit-reproducible in unrolled SQL.

    Scale shape: path extraction is the one data-sized pass (per-
    user window, cut at first conversion, lag transitions, null
    absorber for non-converters); the transition matrix is
    O(states²) BOUNDED model state — pulled to the driver like the
    naive-Bayes/imputation models, iterated in exact Python ints
    (identical `//` semantics on non-negatives), and re-emitted as
    literal rows. Returns one row per removed channel:
    (channel, p_full_scaled, p_removed_scaled, removal_ppm,
    attribution_ppm).
    """
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(order_col).alias("o"),
        F.col(type_col).alias("d"),
    )
    w = Window.partitionBy("u").orderBy("t", "o")
    r = ev.withColumn("rk", F.row_number().over(w))
    conv = (
        r.where(F.col("d") == conv_type)
        .groupBy("u")
        .agg(F.min("rk").alias("crk"))
    )
    kept = r.join(conv, "u", "left").where(
        F.col("crk").isNull() | (F.col("rk") <= F.col("crk"))
    )
    wk = Window.partitionBy("u").orderBy("rk")
    trans = kept.select(
        F.coalesce(F.lag("d").over(wk), F.lit("start")).alias("src"),
        F.col("d").alias("dst"),
    )
    tail = (
        kept.groupBy("u")
        .agg(F.max(F.struct("rk", "d")).alias("last"), F.max("crk").alias("crk"))
        .where(F.col("crk").isNull())
        .select(F.col("last.d").alias("src"), F.lit("null").alias("dst"))
    )
    counts = {
        (row["src"], row["dst"]): row["n"]
        for row in trans.unionByName(tail)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }  # bounded: O(states^2) model state

    q_unit = 10**6

    def solve(removed: str | None) -> int:
        c = {}
        for (s, d), n in counts.items():
            if s == removed:
                continue
            d2 = "null" if d == removed else d
            c[(s, d2)] = c.get((s, d2), 0) + n
        tot = {}
        for (s, _), n in c.items():
            tot[s] = tot.get(s, 0) + n
        q = {(s, d): q_unit * n // tot[s] for (s, d), n in c.items()}
        states = sorted(tot)
        p = {s: 0 for s in states}
        for _ in range(rounds):
            nxt = {}
            for s in states:
                acc = 0
                for d in states:
                    acc += q.get((s, d), 0) * p[d]
                acc += q.get((s, conv_type), 0) * scale
                nxt[s] = acc // q_unit
            p = nxt
        return p.get("start", 0)

    p_full = solve(None)
    channels = sorted(
        ({s for (s, _) in counts} | {d for (_, d) in counts})
        - {"start", "null", conv_type}
    )
    p_rem = {ch: solve(ch) for ch in channels}
    rems = {
        ch: max(q_unit - (p_rem[ch] * q_unit) // max(p_full, 1), 0)
        for ch in channels
    }
    rem_sum = max(sum(rems.values()), 1)
    rows = [
        (ch, p_full, p_rem[ch], rems[ch], rems[ch] * q_unit // rem_sum)
        for ch in channels
    ]
    return events.sparkSession.createDataFrame(
        rows,
        "channel string, p_full_scaled bigint, p_removed_scaled bigint, "
        "removal_ppm bigint, attribution_ppm bigint",
    )


DTW_INF = 1 << 40  # boundary sentinel; keep |values|·len << this


def dtw_distance(a: Column, b: Column) -> Column:
    """Dynamic Time Warping distance (Sakoe-Chiba 1978, unit costs
    |aᵢ−bⱼ|) between two BIGINT array columns — full O(n·m) dynamic
    programming evaluated ENTIRELY inside whole-stage codegen: the
    outer `aggregate` folds DP rows over b, the inner `aggregate`
    builds each row over a's positions (the (i−1, j) dependency is
    the last element appended so far). No UDF, no floats, exact
    integers — the same nested-fold trick replays in DuckDB with
    single-item-list elements (its `list_reduce` requires acc and
    element types to match), so a warped-similarity join can sit
    behind the value-hash gate.

    Intended for BOUNDED series (per-key windows of tens of points:
    n·m lambda steps per row pair); candidate pair generation stays
    the caller's job, as with every comparator in this repo.

    Empty inputs return NULL (DTW is undefined for an empty series)
    — guarded explicitly, because `sequence(1, size(a))` with size 0
    is the DESCENDING sequence [1, 0] and element_at(·, 0) aborts
    under ANSI mode. CaseWhen branches evaluate lazily, so the DP
    fold never runs for the empty case.
    """
    inf = F.lit(DTW_INF).cast("bigint")
    init = F.concat(
        F.array(F.lit(0).cast("bigint")),
        F.transform(a, lambda x: inf),
    )
    row = lambda acc, bj: F.aggregate(
        F.sequence(F.lit(1), F.size(a)),
        F.array(inf),
        lambda acc2, i: F.concat(
            acc2,
            F.array(
                F.abs(F.element_at(a, i.cast("int")) - bj)
                + F.least(
                    F.element_at(acc, i.cast("int")),
                    F.element_at(acc, i.cast("int") + 1),
                    F.element_at(acc2, F.size(acc2)),
                )
            ),
        ),
    )
    final = F.aggregate(b, init, row)
    return F.when(
        (F.size(a) == 0) | (F.size(b) == 0), F.lit(None).cast("bigint")
    ).otherwise(F.element_at(final, F.size(a) + 1))


def holt_linear_fitted(
    df: DataFrame,
    time_col: str,
    value_col: str,
    horizon: int = 3,
) -> DataFrame:
    """Holt's linear-trend (double) exponential smoothing with DYADIC
    coefficients α=1/2, β=1/4 — the trend-aware forecasting step
    between `ewma_user_values` (level only) and a seasonal model,
    exact across engines because every update is shift arithmetic:

        l_t = (y_t + l_{t−1} + b_{t−1}) div 2           (α = 1/2)
        b_t = (l_t − l_{t−1} + 3·b_{t−1}) div 4         (β = 1/4)

    init l₁ = y₁, b₁ = y₂ − y₁; one-step-ahead fit ŷ_t = l_{t−1} +
    b_{t−1}; h-step forecast l_T + h·b_T. Truncating div agrees on
    both engines for negative trends too (measured: DuckDB BIGINT //
    truncates toward zero like Spark div).

    The recurrence is sequential over the BOUNDED tier table (the
    Kaplan-Meier discipline): per-tier aggregation is the one
    data-sized pass, then ONE `aggregate` fold over the sorted tier
    array carries (level, trend, fitted-trajectory) — the DuckDB
    twin folds the same array with the acc-as-list trick.

    Returns per tier (t, y, fitted, level, trend) plus `horizon`
    forecast rows (t beyond the last tier, y NULL).
    """
    tiers = (
        df.groupBy(F.col(time_col).cast("bigint").alias("t"))
        .agg(F.sum(F.col(value_col).cast("bigint")).alias("y"))
    )
    arr = tiers.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("t", "y"))), lambda s: s["y"]
        ).alias("ys"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("t", "y"))), lambda s: s["t"]
        ).alias("ts"),
    )
    # acc: struct(l, b, fit: array) — fold over positions 2..n; the
    # position-1 fit is defined as y1 (no history), position-2 fit
    # uses the init state.
    fold = F.expr(
        """
        aggregate(
          CASE WHEN size(ys) >= 2 THEN sequence(2, size(ys))
               ELSE array() END,
          struct(
            element_at(ys, 1) AS l,
            coalesce(try_element_at(ys, 2) - element_at(ys, 1), 0L) AS b,
            array(element_at(ys, 1)) AS fit
          ),
          (acc, i) -> struct(
            (element_at(ys, CAST(i AS INT)) + acc.l + acc.b) div 2L AS l,
            (((element_at(ys, CAST(i AS INT)) + acc.l + acc.b) div 2L)
              - acc.l + 3L * acc.b) div 4L AS b,
            concat(acc.fit, array(acc.l + acc.b)) AS fit
          )
        )
        """
    )
    state = arr.select("ys", "ts", fold.alias("st")).localCheckpoint()
    n = F.size("ys")
    fitted = state.select(
        "ts", "ys", F.col("st.fit").alias("fit")
    ).select(
        F.posexplode(F.arrays_zip("ts", "ys", "fit")).alias("i", "z")
    ).select(
        F.col("z.ts").alias("t"),
        F.col("z.ys").alias("y"),
        F.col("z.fit").alias("fitted"),
    )
    fc = state.select(
        F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("h"),
        F.element_at("ts", n).alias("t_last"),
        F.col("st.l").alias("l"),
        F.col("st.b").alias("b"),
    ).select(
        (F.col("t_last") + F.col("h")).alias("t"),
        F.lit(None).cast("bigint").alias("y"),
        (F.col("l") + F.col("h") * F.col("b")).alias("fitted"),
    )
    return fitted.unionByName(fc)


def holt_winters_fitted(
    df: DataFrame,
    time_col: str,
    value_col: str,
    period: int = 12,
    horizon: int = 3,
) -> DataFrame:
    """Additive Holt-Winters (triple) exponential smoothing with
    DYADIC coefficients α=1/2, β=1/4, γ=1/2 — `holt_linear_fitted`
    plus a rotating seasonal buffer, exact across engines because
    every update stays shift/div arithmetic:

        l_t = (y_t − s_{t−m} + l_{t−1} + b_{t−1}) div 2    (α = 1/2)
        b_t = (l_t − l_{t−1} + 3·b_{t−1}) div 4            (β = 1/4)
        s_t = (y_t − l_t + s_{t−m}) div 2                  (γ = 1/2)

    Init from the first season: l₀ = (Σ y_{1..m}) div m, b₀ = 0,
    s_i = y_i − l₀. One-step-ahead fit ŷ_t = l_{t−1} + b_{t−1} +
    s_{t−m} for t > m; h-step forecast l_T + h·b_T + s_{T+h−m}.
    Truncating div agrees on both engines for negatives (measured,
    the holt_linear rule).

    The whole state — level, trend, the m-slot seasonal buffer in
    rotation order (position 3 is always s_{t−m} for the NEXT step),
    and the fitted trajectory — is ONE flat BIGINT array folded over
    the sorted tier array (the Kaplan-Meier discipline: per-tier
    aggregation is the one data-sized pass; the fold is over the
    BOUNDED tier table). The DuckDB twin folds the same layout with
    list_reduce (see the ``holt_winters_revenue`` oracle).

    Returns per tier t > m (t, y, fitted) plus ``horizon`` forecast
    rows (y NULL). Needs at least m+1 tiers for fitted rows and at
    least m tiers for forecast rows; with fewer than m tiers the init
    state is incomplete (the seasonal buffer would be shorter than
    one period), so BOTH branches yield no rows rather than indexing
    past the state array (which aborts under ANSI — ADVICE r7).
    """
    m = period
    tiers = (
        df.groupBy(F.col(time_col).cast("bigint").alias("t"))
        .agg(F.sum(F.col(value_col).cast("bigint")).alias("y"))
        # the bounded tier table feeds the fold array AND the ranked
        # fitted join — cached so the data-sized agg runs once
        .cache()
    )
    arr = tiers.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("t", "y"))), lambda s: s["y"]
        ).alias("ys"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("t", "y"))), lambda s: s["t"]
        ).alias("ts"),
    )
    l0 = f"(aggregate(slice(ys, 1, {m}), 0L, (a, x) -> a + x) div {m})"
    init = (
        f"concat(array({l0}, 0L),"
        f" transform(slice(ys, 1, {m}), y -> y - {l0}))"
    )
    lp = (
        "((y - element_at(acc, 3) + element_at(acc, 1)"
        " + element_at(acc, 2)) div 2)"
    )
    step = (
        "(acc, y) -> concat("
        f"array({lp},"
        f" (({lp}) - element_at(acc, 1) + 3 * element_at(acc, 2)) div 4),"
        f" slice(acc, 4, {m - 1}),"
        f" array((y - ({lp}) + element_at(acc, 3)) div 2),"
        f" slice(acc, {m + 3}, greatest(size(acc) - {m + 2}, 0)),"
        " array(element_at(acc, 1) + element_at(acc, 2)"
        " + element_at(acc, 3)))"
    )
    folded = arr.selectExpr(
        "ys",
        "ts",
        f"aggregate(slice(ys, {m + 1}, greatest(size(ys) - {m}, 0)),"
        f" {init}, {step}) AS st",
    ).cache()
    ranked = tiers.withColumn(
        "i", F.row_number().over(Window.orderBy("t")).cast("bigint")
    )
    fitted = (
        ranked.crossJoin(F.broadcast(folded))
        .where(F.col("i") > m)
        .selectExpr(
            "t",
            "y",
            f"CAST(element_at(st, CAST(i + 2 AS INT)) AS BIGINT) AS fitted",
        )
    )
    # Forecast needs the FULL init state: m seasonal slots + the last
    # observed tier. With size(ys) < m the element_at(st, 3+(h-1)%m)
    # and element_at(ts, size(ts)) lookups index past the state /
    # an empty array and abort under ANSI — emit no forecast rows.
    fc = folded.where(F.expr(f"size(ys) >= {m}")).selectExpr(
        *[
            f"CAST(element_at(ts, size(ts)) + {h} AS BIGINT) AS t{h}" for h in range(1, horizon + 1)
        ],
        *[
            "CAST(element_at(st, 1) + "
            f"{h} * element_at(st, 2) + "
            f"element_at(st, CAST(3 + (({h} - 1) % {m}) AS INT)) AS BIGINT)"
            f" AS f{h}"
            for h in range(1, horizon + 1)
        ],
    ).selectExpr(
        "explode(arrays_zip("
        + f"array({', '.join(f't{h}' for h in range(1, horizon + 1))}),"
        + f"array({', '.join(f'f{h}' for h in range(1, horizon + 1))})"
        + ")) AS z"
    ).selectExpr("z.`0` AS t", "CAST(NULL AS BIGINT) AS y", "z.`1` AS fitted")
    return fitted.unionByName(fc)


def shapley_attribution(
    events: DataFrame,
    conv_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """EXACT Shapley-value channel attribution (Shapley 1953; the
    coalition-game sibling of `markov_attribution`'s removal
    effects): channel i's credit is

        φᵢ = Σ_{S ∌ i} |S|!·(n−1−|S|)!/n! · (v(S∪{i}) − v(S))

    with the data-derived characteristic function v(S) = number of
    converting users whose pre-conversion channel-exposure set is
    CONTAINED in S — the standard coalition reading of "how many
    conversions could S alone have carried".

    Exactness and scale (the Markov/Bradley-Terry discipline): one
    data-sized pass reduces events to per-converter exposure
    BITMASKS and aggregates to ≤ 2ⁿ (mask, count) rows; subset sums,
    marginals and factorial weights run driver-side in exact Python
    integers. φ is returned ×n! (``phi_x_fact``) so no division ever
    happens — Σ phi_x_fact = n!·(v(full) − v(∅)) exactly, and the
    unrolled SQL twin replays every coalition bit-for-bit. Intended
    for n ≤ ~12 channels (2ⁿ coalition table) — the regime marketing
    attribution actually runs at.

    Returns (channel, phi_x_fact, fact_scale, conversions).
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    r = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.row_number().over(w).alias("rk"),
    )
    conv = (
        r.where(F.col("et") == conv_type)
        .groupBy("u")
        .agg(F.min("rk").alias("crk"))
    )
    channels = sorted(
        row["et"]
        for row in r.select("et").distinct().collect()
        if row["et"] != conv_type
    )  # bounded: the channel alphabet
    bit = {ch: 1 << i for i, ch in enumerate(channels)}
    n = len(channels)
    bit_expr = F.create_map(
        *[x for ch in channels for x in (F.lit(ch), F.lit(bit[ch]))]
    )
    exposure = (
        conv.join(r, "u", "left")
        .where((F.col("rk") < F.col("crk")) & (F.col("et") != conv_type))
        .groupBy("u")
        .agg(F.sum_distinct(bit_expr[F.col("et")]).alias("mask"))
    )
    # converters with NO prior channel events fall out of the join —
    # re-attach them at mask 0
    masks = (
        conv.join(exposure, "u", "left")
        .select(F.coalesce("mask", F.lit(0)).alias("mask"))
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )  # bounded: <= 2^n rows
    counts = {int(row["mask"]): int(row["c"]) for row in masks}

    from math import factorial

    v = [0] * (1 << n)
    for s in range(1 << n):
        v[s] = sum(c for m, c in counts.items() if m & s == m)
    rows = []
    for ch in channels:
        b = bit[ch]
        phi = 0
        for s in range(1 << n):
            if s & b:
                continue
            k = bin(s).count("1")
            phi += factorial(k) * factorial(n - 1 - k) * (v[s | b] - v[s])
        rows.append((ch, phi, factorial(n), v[(1 << n) - 1]))
    return events.sparkSession.createDataFrame(
        rows,
        "channel string, phi_x_fact bigint, fact_scale bigint,"
        " conversions bigint",
    )


def seasonal_decompose(
    df,
    time_col: str,
    value_col: str,
    period: int = 12,
    scale: int = 1000,
):
    """Additive seasonal decomposition y = trend + seasonal + remainder
    over integer time tiers — the classical-decomposition core of STL
    (Cleveland et al., J.Off.Stat 1990 §1: moving-average trend,
    per-phase seasonal summary, residual), in the repo's exact-integer
    dialect:

      trend_t    = floor(scale * Σ_{window} y / period)   (centered
                   ROWS window of exactly ``period`` tiers: offsets
                   -p/2 .. p/2-1 — the simple-MA variant; defined only
                   where the window is FULL, so edges emit no row)
      seasonal_p = LOW MEDIAN over phase p = t mod period of the
                   detrended values (median, not mean: one outlier
                   month must not leak into every year's seasonal)
      remainder  = detrended - seasonal

    Exactness: y is an exact BIGINT (cents); trend floors ONCE at
    ``scale``; the low median is an order statistic (rank
    (cnt+1) div 2 under (value, t) ordering — engine-exact,
    tie-deterministic, per the NOTES order-statistics rule); every
    later step is integer arithmetic on already-floored values.

    Scale shape: one data-sized tier aggregation; ALL windows run
    over the bounded tier table (≤ thousands of rows for monthly
    tiers over decades) — the WindowExec single-partition warning is
    the audited bounded-table exemption.

    Returns interior tiers (t, y, trend_scaled, detrended_scaled,
    seasonal_scaled, remainder_scaled).
    """
    from pyspark.sql import Window, functions as F

    half = period // 2
    # the BOUNDED month-tier table feeds the MA window, the ranked
    # seasonal pass and the output join — pinned (eager
    # localCheckpoint) so the data-sized aggregation over df runs
    # ONCE, not once per static re-expansion (r8 plan audit: the
    # un-pinned plan re-read the orders scan 6x through this chain)
    tiers = (
        df.groupBy(F.col(time_col).cast("bigint").alias("t"))
        .agg(F.sum(F.col(value_col).cast("bigint")).alias("y"))
        .localCheckpoint(eager=True)
    )
    w_ma = Window.orderBy("t").rowsBetween(-half, period - half - 1)
    ma = tiers.select(
        "t",
        "y",
        F.count(F.lit(1)).over(w_ma).alias("_wn"),
        F.sum("y").over(w_ma).alias("_ws"),
    ).where(F.col("_wn") == period)
    detr = ma.select(
        "t",
        "y",
        F.expr(f"(_ws * {scale}) div {period}").cast("bigint").alias("trend_scaled"),
    ).withColumn(
        "detrended_scaled",
        (F.col("y") * F.lit(scale) - F.col("trend_scaled")).cast("bigint"),
    )
    w_phase = Window.partitionBy(F.col("t") % period).orderBy(
        F.col("detrended_scaled").asc(), F.col("t").asc()
    )
    w_cnt = Window.partitionBy(F.col("t") % period)
    ranked = detr.select(
        "*",
        F.row_number().over(w_phase).alias("_rk"),
        F.count(F.lit(1)).over(w_cnt).alias("_cnt"),
    )
    # low median rank: integer div — `/` is DOUBLE division in Spark,
    # and (cnt+1)/2 on an even-count phase matches NO row (r8 gate catch)
    med = ranked.where(
        F.col("_rk") == F.expr("(_cnt + 1) div 2")
    ).select(
        (F.col("t") % period).alias("_phase"),
        F.col("detrended_scaled").alias("seasonal_scaled"),
    )
    return (
        detr.withColumn("_phase", F.col("t") % period)
        .join(F.broadcast(med), "_phase")
        .withColumn(
            "remainder_scaled",
            (F.col("detrended_scaled") - F.col("seasonal_scaled")).cast("bigint"),
        )
        .select(
            "t", "y", "trend_scaled", "detrended_scaled",
            "seasonal_scaled", "remainder_scaled",
        )
    )


def rolling_corr(
    df,
    time_col: str,
    x_col: str,
    y_col: str,
    window: int = 12,
):
    """Trailing rolling Pearson correlation between two measures over
    integer time tiers — the co-movement diagnostic (price vs volume,
    revenue vs quantity). Exactness discipline: per-tier sums and the
    five co-moments (Σx, Σy, Σx², Σy², Σxy over the ROWS window) are
    EXACT integers carried in DECIMAL(38,0) — a float Σx² is
    order-dependent; the classic one-pass identities

        num  = n·Σxy − Σx·Σy
        varx = n·Σx² − (Σx)²,  vary = n·Σy² − (Σy)²

    then produce corr with exactly THREE IEEE ops from exactly-
    rounded casts: CAST(num) / (sqrt(CAST(varx)) * sqrt(CAST(vary)))
    — sqrt is correctly rounded (the NOTES float-parity rule), and
    both engines round the same integers to the same doubles. Windows
    with zero variance on either side emit NULL. Only FULL windows
    emit rows. All windows run over the bounded tier table.

    Returns (t, n, corr).
    """
    from pyspark.sql import Window, functions as F

    tiers = df.groupBy(F.col(time_col).cast("bigint").alias("t")).agg(
        F.sum(F.col(x_col).cast("bigint")).cast("decimal(38,0)").alias("x"),
        F.sum(F.col(y_col).cast("bigint")).cast("decimal(38,0)").alias("y"),
    )
    w = Window.orderBy("t").rowsBetween(-(window - 1), 0)
    agg = tiers.select(
        "t",
        F.count(F.lit(1)).over(w).cast("decimal(38,0)").alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    ).where(F.col("n") == window)
    return agg.selectExpr(
        "t",
        f"CAST({window} AS BIGINT) AS n",
        "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN"
        " CAST(n * sxy - sx * sy AS DOUBLE)"
        " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
        "    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))"
        " ELSE CAST(NULL AS DOUBLE) END AS corr",
    )


def seasonal_outliers(
    df,
    time_col: str,
    value_col: str,
    period: int = 12,
    k_mad: int = 5,
    scale: int = 1000,
    top_n: int = 5,
):
    """Seasonal-adjusted anomaly audit — the composition
    :func:`seasonal_decompose` was built for: a month is anomalous
    when its REMAINDER (after removing trend and seasonality) sits
    more than ``k_mad`` robust deviations from the remainder's
    center (low-median and MAD, both exact order statistics over the
    bounded interior-tier table — one outlier must not move its own
    fence, hence median/MAD, not mean/stddev). The |dev| > k·MAD
    comparison is pure integer arithmetic on already-scaled values.

    Reported as the ``top_n`` LARGEST deviations with an is_outlier
    flag rather than a bare filter — on well-behaved data the
    violations set is empty and a 0-row green record checks nothing
    (the r8 l_diversity lesson); the margins are the audit.
    Deterministic order (dev desc, t).

    Returns top_n interior tiers (t, y, remainder_scaled,
    center_scaled, mad_scaled, dev_scaled, is_outlier).
    """
    from pyspark.sql import Window, functions as F

    # bounded interior-tier table, consumed by the center rank, the
    # dev rank and the output — pinned once
    dec = seasonal_decompose(
        df, time_col, value_col, period=period, scale=scale
    ).localCheckpoint(eager=True)
    # low median of remainder over ALL interior tiers (bounded table)
    w_all = Window.partitionBy(F.lit(1))
    w_rk = Window.partitionBy(F.lit(1)).orderBy(
        F.col("remainder_scaled").asc(), F.col("t").asc()
    )
    ranked = dec.select(
        "*",
        F.row_number().over(w_rk).alias("_rk"),
        F.count(F.lit(1)).over(w_all).alias("_cnt"),
    )
    center = ranked.where(F.col("_rk") == F.expr("(_cnt + 1) div 2")).select(
        F.col("remainder_scaled").alias("center_scaled")
    )
    devs = (
        dec.crossJoin(F.broadcast(center))
        .withColumn(
            "dev_scaled",
            F.abs(F.col("remainder_scaled") - F.col("center_scaled")).cast("bigint"),
        )
        .localCheckpoint(eager=True)  # bounded; feeds MAD rank + output
    )
    w_rk2 = Window.partitionBy(F.lit(1)).orderBy(
        F.col("dev_scaled").asc(), F.col("t").asc()
    )
    ranked2 = devs.select(
        "*",
        F.row_number().over(w_rk2).alias("_rk"),
        F.count(F.lit(1)).over(w_all).alias("_cnt"),
    )
    mad = ranked2.where(F.col("_rk") == F.expr("(_cnt + 1) div 2")).select(
        F.col("dev_scaled").alias("mad_scaled")
    )
    return (
        devs.crossJoin(F.broadcast(mad))
        .withColumn(
            "is_outlier",
            F.when(
                F.col("dev_scaled") > F.lit(k_mad) * F.col("mad_scaled"), F.lit(1)
            )
            .otherwise(F.lit(0))
            .cast("bigint"),
        )
        .orderBy(F.col("dev_scaled").desc(), F.col("t").asc())
        .limit(top_n)
        .select(
            "t",
            "y",
            "remainder_scaled",
            "center_scaled",
            "mad_scaled",
            "dev_scaled",
            "is_outlier",
        )
    )


def window_funnel(
    events,
    steps: list[str],
    window_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
):
    """Windowed funnel depth (the ClickHouse ``windowFunnel``
    analytics primitive): per user, the deepest prefix of ``steps``
    completed IN ORDER with every step inside ``window_us``
    microseconds of the chain's FIRST step. The unordered min-ts
    cascade (`funnel_stages`) cannot express the window constraint —
    a signup in 1992 must not chain to a purchase in 1995.

    Exact DP, one pass over each user's sorted step events: the state
    is anchors[k] = the LATEST possible chain-start t1 among chains
    reaching level k (maximizing the anchor dominates — later anchors
    leave strictly more slack for deeper levels), folded via the SQL
    `aggregate` HOF over the per-user sorted array (events not in
    ``steps`` are filtered BEFORE collection, so the array is the
    user's step events only). anchors[k] set implies anchors[k-1]
    set, so depth = count of set anchors. Everything integer epoch
    micros.

    Scale shape: one user-keyed shuffle (the only data-sized move),
    per-user arrays bounded by the user's step-event count, output
    bounded at len(steps)+1 rows.

    Returns (depth, n_users) for depth 0..len(steps).
    """
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )

    k_n = len(steps)
    step_expr = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i + 1))]
    )
    base = events.select(
        F.col(user_col).alias("u"),
        epoch_micros(F.col(ts_col)).alias("t"),
        F.col(order_tiebreak).cast("bigint").alias("eid"),
        step_expr[F.col(type_col)].cast("int").alias("s"),
    ).where(F.col("s").isNotNull())
    arr = base.groupBy("u").agg(
        F.array_sort(F.collect_list(F.struct("t", "eid", "s"))).alias("seq")
    )
    # try_element_at for the k-1 lookup: at k = 1 the guard is false
    # but ANSI element_at may still evaluate the dead branch (the r4
    # lesson) — try_element_at yields NULL there and the NULL
    # comparison is falsy, which is exactly the unset-anchor meaning
    step = (
        "(acc, e) -> transform(sequence(1, {k}), k -> CASE "
        "WHEN k = 1 AND e.s = 1 THEN greatest(element_at(acc, 1), e.t) "
        "WHEN k > 1 AND e.s = k AND try_element_at(acc, k - 1) >= 0 "
        " AND e.t - try_element_at(acc, k - 1) <= {w} "
        "THEN greatest(element_at(acc, k), try_element_at(acc, k - 1)) "
        "ELSE element_at(acc, k) END)"
    ).format(k=k_n, w=window_us)
    depth = arr.selectExpr(
        "u",
        f"size(filter(aggregate(seq,"
        f" transform(sequence(1, {k_n}), k -> CAST(-1 AS BIGINT)),"
        f" {step}), a -> a >= 0)) AS depth",
    )
    # count users at every depth 0..K, emitting zero-count depths too
    # (bounded output contract: always K+1 rows)
    spark = events.sparkSession
    depths = spark.range(k_n + 1).select(F.col("id").cast("bigint").alias("depth"))
    counts = depth.groupBy("depth").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    return (
        depths.join(counts, "depth", "left")
        .select(
            "depth",
            F.coalesce(F.col("n_users"), F.lit(0)).cast("bigint").alias("n_users"),
        )
    )


def croston_intermittent(
    df,
    key_col: str,
    period_col: str,
    demand_col: str,
    scale: int = 1_000_000,
):
    """Croston's method for intermittent demand (Croston, Op.Res.Q.
    1972 — the standard forecast for sparse/lumpy series where
    ordinary smoothing of the zero-filled series biases low): smooth
    the NONZERO demand sizes z and the inter-demand intervals p
    separately; the demand-rate forecast is z/p per period. Dyadic
    variant (the holt/holt-winters discipline): alpha = 1/2, so both
    updates are integer (a + x) div 2 folds — exact and bit-portable.

    Init: z = first demand size; p = the first inter-demand interval
    (needs >= 2 demand periods; keys with fewer emit no row — on
    growing data the demand count only grows, so output never
    shrinks). z smoothing starts at the SECOND demand (the n=1 branch
    already folds (z + y) div 2 while initializing p); p smoothing
    starts at the third demand, the first with a second observed
    interval to smooth against. The fold runs over
    each key's BOUNDED sorted (period, demand) tier array; the one
    data-sized pass is the (key, period) aggregation.

    Returns (key, n_demands, z_scaled..., p_scaled..., rate_ppm) —
    z and p as plain BIGINTs (already integer), rate_ppm =
    (z * scale) div p.
    """
    tiers = (
        df.groupBy(
            F.col(key_col).alias("k"), F.col(period_col).cast("bigint").alias("p")
        )
        .agg(F.sum(F.col(demand_col).cast("bigint")).alias("y"))
        .where(F.col("y") > 0)
    )
    arr = tiers.groupBy("k").agg(
        F.array_sort(F.collect_list(F.struct("p", "y"))).alias("seq")
    )
    # state: [z, p, prev_t, n]
    step = (
        "(acc, e) -> CASE "
        "WHEN element_at(acc, 4) = 0 THEN array(e.y, CAST(-1 AS BIGINT), e.p, CAST(1 AS BIGINT)) "
        "WHEN element_at(acc, 4) = 1 THEN array("
        " (element_at(acc, 1) + e.y) div 2,"
        " e.p - element_at(acc, 3), e.p, CAST(2 AS BIGINT)) "
        "ELSE array("
        " (element_at(acc, 1) + e.y) div 2,"
        " (element_at(acc, 2) + (e.p - element_at(acc, 3))) div 2,"
        " e.p, element_at(acc, 4) + 1) END"
    )
    folded = arr.selectExpr(
        "k",
        f"aggregate(seq, array(CAST(0 AS BIGINT), CAST(-1 AS BIGINT),"
        f" CAST(0 AS BIGINT), CAST(0 AS BIGINT)), {step}) AS st",
    )
    return folded.selectExpr(
        "k",
        "element_at(st, 4) AS n_demands",
        "element_at(st, 1) AS z_smoothed",
        "element_at(st, 2) AS p_smoothed",
        f"CAST((element_at(st, 1) * {scale}) div greatest(element_at(st, 2), 1)"
        f" AS BIGINT) AS rate_ppm",
    ).where(F.col("n_demands") >= 2)


def sliding_distinct_daily(
    events,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 30,
):
    """EXACT trailing-window distinct users per day (the DAU/MAU
    board metric) without ever running a per-day DISTINCT — the
    boundary-diff algorithm: a user active on day d is "in the MAU"
    for days [d, d+W-1]; merge each user's covered days into
    intervals (consecutive active days less than W apart fuse — a
    per-user sorted lag pass), emit +1 at each interval start and -1
    one past its end, and the trailing-distinct count is the prefix
    sum of the net deltas over the day grid. A naive exact MAU
    re-counts distinct users per day (365 full-data distincts per
    year); this is ONE (user, day) dedup + one per-user lag pass +
    arithmetic over the bounded day-tier table.

    DAU rides the same dedup (count per day); stickiness =
    dau/mau as exact ppm. Day = integer epoch days (the CLAUDE.md
    epoch rule).

    Returns one row per day in [min_day, max_day] (gap-filled):
    (day, dau, mau, stickiness_ppm).
    """
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )

    ud = (
        events.select(
            F.col(user_col).alias("u"),
            epoch_micros(F.col(ts_col)).alias("eus"),
        )
        .selectExpr("u", "eus div 86400000000 AS d")
        .distinct()
        .cache()
    )
    return sliding_distinct_from_user_days(ud, window_days)


def sliding_distinct_from_user_days(ud, window_days: int = 30):
    """The boundary-diff core of :func:`sliding_distinct_daily`, from
    an already-deduplicated (u, d) user-day table — shared with the
    stream-maintained twin (streaming/incremental.py keeps the (u, d)
    SET as mergeable state; this computes the metric from any state
    snapshot)."""
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    w_u = Window.partitionBy("u").orderBy("d")
    marked = ud.withColumn("prev_d", F.lag("d").over(w_u)).withColumn(
        "is_start",
        (F.col("prev_d").isNull() | (F.col("d") - F.col("prev_d") > window_days))
        .cast("bigint"),
    )
    grp = marked.withColumn(
        "g",
        F.sum("is_start").over(
            Window.partitionBy("u")
            .orderBy("d")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    intervals = grp.groupBy("u", "g").agg(
        F.min("d").alias("s"), (F.max("d") + window_days).alias("e1")
    )
    deltas = (
        intervals.selectExpr("s AS d", "CAST(1 AS BIGINT) AS delta")
        .unionByName(intervals.selectExpr("e1 AS d", "CAST(-1 AS BIGINT) AS delta"))
        .groupBy("d")
        .agg(F.sum("delta").cast("bigint").alias("net"))
    )
    bounds = ud.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = bounds.selectExpr(
        "explode(sequence(d0, d1)) AS day"
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    # windows over the bounded day grid (a few thousand rows)
    out = (
        grid.join(deltas.withColumnRenamed("d", "day"), "day", "left")
        .withColumn("net", F.coalesce(F.col("net"), F.lit(0)))
        .withColumn("mau", F.sum("net").over(w_cum).cast("bigint"))
        .join(dau.withColumnRenamed("d", "day"), "day", "left")
        .withColumn("dau", F.coalesce(F.col("dau"), F.lit(0)).cast("bigint"))
    )
    return out.selectExpr(
        "CAST(day AS BIGINT) AS day",
        "dau",
        "mau",
        "CAST((dau * 1000000) div greatest(mau, 1) AS BIGINT) AS stickiness_ppm",
    )


def zorder_key(a, b, bits: int = 6):
    """Morton/Z-order interleave of two ``bits``-bit non-negative
    integer codes — the multi-dimensional SORT KEY behind data-
    skipping layouts (Delta/Iceberg Z-ORDER BY): sorting by z keeps
    rows close in BOTH dimensions physically adjacent, so per-file
    min/max statistics prune multi-predicate scans that a
    single-column sort cannot. Pure codegen bit arithmetic (literal
    shifts only — F.shiftleft takes literal shift amounts)."""
    z = None
    for i in range(bits):
        pa = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        pb = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = pa + pb
        z = term if z is None else z + term
    return z.cast("bigint")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_near",
) -> DataFrame:
    """Nearest-match as-of join — the third as-of semantic after
    backward/forward (:func:`asof_join`): for each left row, the
    right row (same ``on`` key) with the SMALLEST |right_ts −
    left_ts| in either direction; exact ties prefer the backward
    (earlier-or-equal) match — the sensor-fusion / closest-reading
    alignment rule. Composed as one backward pass then one forward
    pass of the merge-sort-window as-of (each a single per-key
    ordered window — NO candidate pair blowup, unlike the naive
    user-keyed cross of all pairs the oracle twin runs at sf0.01),
    then a per-column CASE pick on the two deltas.

    Returns left + ``<payload><suffix>`` columns +
    ``<right_ts><suffix>`` (the matched timestamp, NULL if the key
    has no right rows) + ``__direction`` ('b'/'f'/NULL).
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_ts)]
    r2 = right.withColumn("__rts", F.col(right_ts))
    pay = list(right_payload) + ["__rts"]
    b = asof_join(
        left, r2, on, left_ts, right_ts, right_payload=pay,
        direction="backward", suffix="_b",
    )
    bf = asof_join(
        b, r2, on, left_ts, right_ts, right_payload=pay,
        direction="forward", suffix="_f",
    )
    lts = F.col(left_ts)
    db = lts - F.col("__rts_b")
    df_ = F.col("__rts_f") - lts
    pick_b = F.col("__rts_f").isNull() | (
        F.col("__rts_b").isNotNull() & (db <= df_)
    )
    out = bf
    for p in right_payload:
        out = out.withColumn(
            p + suffix,
            F.when(pick_b, F.col(p + "_b")).otherwise(F.col(p + "_f")),
        )
    out = out.withColumn(
        right_ts + suffix,
        F.when(pick_b, F.col("__rts_b")).otherwise(F.col("__rts_f")),
    ).withColumn(
        "__direction",
        F.when(F.col("__rts_b").isNull() & F.col("__rts_f").isNull(), F.lit(None).cast("string"))
        .when(pick_b, F.lit("b"))
        .otherwise(F.lit("f")),
    )
    drop = [p + "_b" for p in pay] + [p + "_f" for p in pay]
    return out.drop(*drop)
