"""Zero-extra-pass data-quality gates via Spark's Observation API.

The reference's pipeline gates are driver-side counts: non-empty
checks (``extract.py:430-432,452-454,496-498``; ``load.py:77-82``)
and shape logging (``extract.py:404,415``) — every one an extra
``df.count()`` job over the full input. ``observe`` attaches
aggregate metrics to a DataFrame that are collected AS A SIDE EFFECT
of whatever action materializes it: the gate costs nothing at 100 TB
because the data was flowing through that stage anyway.

Usage:
    gated, obs = observed(df, rows=F.count(F.lit(1)),
                          null_keys=F.count_if(F.col("k").isNull()))
    gated.write.parquet(...)            # the real action
    assert_metrics(obs, {"rows": (1, None), "null_keys": (None, 0)})
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window, functions as F


def observed(df: DataFrame, **metrics: F.Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``; returns the observed
    frame (use it in place of ``df``) and the Observation handle
    whose ``.get`` blocks until the first action completes."""
    obs = Observation()
    named = [expr.alias(name) for name, expr in metrics.items()]
    return df.observe(obs, *named), obs


def assert_metrics(
    obs: Observation, bounds: dict[str, tuple[float | None, float | None]]
) -> dict[str, float]:
    """Check observed metrics against inclusive (lo, hi) bounds
    (None = unbounded). Raises ValueError naming every violated
    bound; returns the metric values otherwise."""
    got = obs.get
    errors = []
    for name, (lo, hi) in bounds.items():
        if name not in got:
            errors.append(f"{name}: metric not observed")
            continue
        v = got[name]
        if lo is not None and v < lo:
            errors.append(f"{name}={v} below minimum {lo}")
        if hi is not None and v > hi:
            errors.append(f"{name}={v} above maximum {hi}")
    if errors:
        raise ValueError("quality gate failed: " + "; ".join(errors))
    return {k: got[k] for k in bounds}


def non_empty_gate(df: DataFrame) -> tuple[DataFrame, Observation]:
    """The reference's is-empty check as a free-rider metric."""
    return observed(df, rows=F.count(F.lit(1)))


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Single-pass column profile: (column, n_rows, n_nulls,
    n_distinct) per column, in long form.

    All per-column aggregates are computed in ONE aggregation job —
    Spark expands the multi-distinct into one shuffle — then the
    single result row unpivots to long form driver-free. The at-scale
    replacement for looping ``df[col].nunique()`` column by column
    (each a full pass in pandas)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.count(F.lit(1)).alias(f"__t_{c}"))
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"__n_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__d_{c}"))
    one = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __t_{c}, __n_{c}, __d_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS (column, n_rows, n_nulls, n_distinct)"
        )
    )


def partition_skew_report(df: DataFrame) -> DataFrame:
    """Physical-partition balance diagnostic: rows per Spark partition
    plus the skew ratio (max/mean). A ratio near 1 means even task
    sizes; >> 1 means one straggler task dominates the stage — the
    first thing to check when a 1000-executor job is waiting on one
    task (hot key, bad custom partitioner, or unsplittable input).

    One row per partition: (partition_id, n_rows, frac_of_total,
    skew_ratio — the global max/mean repeated per row for easy
    filtering). Built on ``spark_partition_id()`` + one aggregation;
    the report is at most #partitions rows, so the final window over
    a single global partition is trivially small (the data itself is
    never re-shuffled)."""
    per = df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w = Window.partitionBy()
    return per.select(
        "partition_id",
        "n_rows",
        (F.col("n_rows").cast("double") / F.sum("n_rows").over(w)).alias("frac_of_total"),
        (
            F.max("n_rows").over(w).cast("double")
            / (F.sum("n_rows").over(w) / F.count(F.lit(1)).over(w))
        ).alias("skew_ratio"),
    )


def expectation_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Declarative data-quality expectations, evaluated in ONE
    aggregation pass (the Great-Expectations-shaped API this engine's
    gates compose into). Each rule dict:

      {"rule": "not_null", "col": c}
      {"rule": "unique",   "col": c}
      {"rule": "range",    "col": c, "min": x, "max": y}   (violation: outside [x, y]; NULLs ignored)
      {"rule": "in_set",   "col": c, "values": [...]}       (NULLs ignored)

    Output: one row per rule — rule, col, n_rows, n_violations,
    violation_rate (rational BIGINT/BIGINT division), passed.

    Scale shape: every rule compiles to a conditional count inside a
    single agg (unique additionally a count_distinct, which Spark
    plans as one expand) — the table is scanned once no matter how
    many expectations are attached, the report is |rules| rows.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        c = F.col(r["col"])
        kind = r["rule"]
        if kind == "not_null":
            v = F.count_if(c.isNull())
        elif kind == "unique":
            v = F.count(c) - F.count_distinct(c)
        elif kind == "range":
            v = F.count_if(c.isNotNull() & ((c < r["min"]) | (c > r["max"])))
        elif kind == "in_set":
            vals = F.array(*[F.lit(x) for x in r["values"]])
            v = F.count_if(c.isNotNull() & ~F.array_contains(vals, c))
        else:
            raise ValueError(f"unknown rule: {kind}")
        aggs.append(v.cast("bigint").alias(f"__v{i}"))
    row = df.agg(*aggs)
    # One explode over per-rule structs, NOT a unionAll of N selects
    # from the same aggregated row — union branches each contain the
    # full-table aggregation subtree and Catalyst re-evaluates it per
    # branch (the triangle-counting lesson); explode keeps it one pass.
    structs = [
        F.struct(
            F.lit(r["rule"]).alias("rule"),
            F.lit(r["col"]).alias("col"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v{i}").alias("n_violations"),
            (
                F.col(f"__v{i}").cast("double")
                / F.greatest(F.col("__n"), F.lit(1)).cast("double")
            ).alias("violation_rate"),
            (F.col(f"__v{i}") == 0).alias("passed"),
        )
        for i, r in enumerate(rules)
    ]
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def k_anonymity_violations(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Quasi-identifier groups smaller than ``k`` — the k-anonymity
    audit a shareable dataset needs before release: any combination
    of quasi-identifiers matching fewer than k individuals
    re-identifies them. One groupBy on the quasi key; output is the
    violating groups with their sizes (the rows to suppress or
    generalize)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
    )


def l_diversity_violations(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 3
) -> DataFrame:
    """Quasi-identifier groups whose SENSITIVE attribute takes fewer
    than ``l`` distinct values — the l-diversity audit (Machanavajjhala
    et al. 2007) that k-anonymity alone misses: a group of 50
    identical quasi-rows that all share one diagnosis is 50-anonymous
    and still leaks the diagnosis. One groupBy with a count_distinct
    (Spark plans the distinct as one expand); output is the violating
    groups with size and diversity (the rows to generalize or
    suppress)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct(sensitive_col).alias("l_diversity"),
        )
        .filter(F.col("l_diversity") < l)
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
    bottom: int = 10,
) -> DataFrame:
    """Bottom-``bottom`` LEAST-diverse quasi-groups with a violates-l
    flag — the audit view of :func:`l_diversity_violations` that stays
    informative when no group actually violates (on well-mixed data the
    violations set is empty, which tells an auditor nothing about how
    close the margins are; the r8 driver-row lesson: a 0-row green
    record checks nothing). Deterministic total order: (l_diversity,
    quasi cols) — the quasi tuple is unique per group, so the limit is
    tie-stable across engines. One groupBy + one bounded sort."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_size"),
            F.countDistinct(sensitive_col).cast("bigint").alias("l_diversity"),
        )
        .withColumn(
            "violates_l",
            F.when(F.col("l_diversity") < l, F.lit(1)).otherwise(F.lit(0)).cast("bigint"),
        )
        .orderBy("l_diversity", *quasi_cols)
        .limit(bottom)
    )


# Benford first-digit probabilities log10(1 + 1/d) as literal doubles:
# literals are bit-identical across engines, so no libm runs anywhere.
BENFORD_P = [
    0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
]


def benford_digit_report(df, key_col: str, value_col: str, scale: int = 2):
    """First-significant-digit audit against Benford's law — the
    classic fraud/data-quality screen for naturally-occurring
    positive amounts. Per (group, digit): observed count, expected
    count n*P(d), and the chi-square contribution (obs-exp)^2/exp;
    the global statistic is the caller's fixed-order sum over the
    9*|groups| rows (same contract as contingency_cells).

    The value is scaled to exact integer cents first, so the leading
    digit is a string op on an exact integer, not float formatting.
    One groupBy; per-group totals broadcast back.

    Every (group, digit in 1..9) cell is emitted, with obs = 0 where
    the digit never occurs: a MISSING digit is the strongest possible
    Benford violation, and an observed-only report would contribute
    no (0-exp)^2/exp term to the caller's chi-square sum exactly when
    the deviation is most extreme. The 9-digit fan-out rides on the
    per-group totals table (one row per group before the explode).
    """
    from pyspark.sql import functions as F

    from dpe_energy_performance_analysis_etl_spark.operators.exact import scaled_long

    cents = scaled_long(F.col(value_col), scale)
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    obs = (
        df.where(cents > 0)
        .select(F.col(key_col).alias("grp"), digit.alias("digit"))
        .groupBy("grp", "digit")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    tot = obs.groupBy("grp").agg(F.sum("obs").alias("n"))
    cells = tot.withColumn(
        "digit", F.explode(F.sequence(F.lit(1), F.lit(9)))
    )
    p = F.element_at(F.array(*[F.lit(x) for x in BENFORD_P]), F.col("digit"))
    expected = F.col("n").cast("double") * p
    # left join broadcasts the RIGHT side (obs: |groups| x <=9 rows) —
    # Spark cannot build-side the stream side of a left outer join
    return (
        cells.join(F.broadcast(obs), ["grp", "digit"], "left")
        .withColumn("obs", F.coalesce(F.col("obs"), F.lit(0)))
        .select(
            F.col("grp").alias(key_col),
            "digit",
            "obs",
            "n",
            expected.alias("expected"),
            (
                (F.col("obs").cast("double") - expected)
                * (F.col("obs").cast("double") - expected)
                / expected
            ).alias("chi2_contrib"),
        )
    )


# Benford SECOND-digit probabilities P2(d) = Σ_{k=1..9} log10(1 +
# 1/(10k+d)), d = 0..9, as literal doubles (same no-libm contract as
# BENFORD_P — literals are bit-identical across engines).
BENFORD_P2 = [
    0.11967926859688073, 0.1138901034075564, 0.10882149900550823,
    0.10432956023095939, 0.10030820226757937, 0.09667723580232243,
    0.09337473578303615, 0.09035198926960332, 0.08757005357886138,
    0.08499735205769224,
]


def benford_second_digit_report(df, key_col: str, value_col: str, scale: int = 2):
    """Second-significant-digit Benford audit (Nigrini's forensic-
    accounting battery: fabricated amounts often pass the FIRST-digit
    screen — psychological anchoring shows up in the second digit,
    e.g. price points like 19.99/4.95). Same contract as
    :func:`benford_digit_report`: per (group, digit 0..9) observed
    count, expected n·P₂(d), chi-square contribution; every cell
    emitted (missing digit = strongest violation); values with fewer
    than two significant digits are excluded (no second digit
    exists). Exactness: the digit is a string op on exact integer
    cents; expected/chi2 are fixed IEEE expressions over literal
    probabilities."""
    from pyspark.sql import functions as F

    from dpe_energy_performance_analysis_etl_spark.operators.exact import scaled_long

    cents = scaled_long(F.col(value_col), scale)
    digit = F.substring(cents.cast("string"), 2, 1).cast("int")
    obs = (
        df.where(cents >= 10)
        .select(F.col(key_col).alias("grp"), digit.alias("digit"))
        .groupBy("grp", "digit")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    tot = obs.groupBy("grp").agg(F.sum("obs").alias("n"))
    cells = tot.withColumn(
        "digit", F.explode(F.sequence(F.lit(0), F.lit(9)))
    )
    p = F.element_at(
        F.array(*[F.lit(x) for x in BENFORD_P2]), F.col("digit") + 1
    )
    expected = F.col("n").cast("double") * p
    return (
        cells.join(F.broadcast(obs), ["grp", "digit"], "left")
        .withColumn("obs", F.coalesce(F.col("obs"), F.lit(0)))
        .select(
            F.col("grp").alias(key_col),
            "digit",
            "obs",
            "n",
            expected.alias("expected"),
            (
                (F.col("obs").cast("double") - expected)
                * (F.col("obs").cast("double") - expected)
                / expected
            ).alias("chi2_contrib"),
        )
    )


def calibration_report(
    df,
    prob_scaled_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 1_000_000,
):
    """Reliability / ECE audit for a probabilistic classifier (the
    standard gate on model-scored training-data filters — a quality
    classifier whose confidences don't match observed frequencies
    mis-prices every document it gates).

    ``prob_scaled_col`` is the predicted probability as an INTEGER in
    [0, scale] (integer-scaled upstream — the engine-parity discipline:
    per-bin sums stay BIGINT-exact in any engine and any order; the
    only doubles are two final divisions per bin). Per equal-width
    confidence bin: n, mean_conf, frac_pos, abs_gap, weight. The
    scalar ECE = sum(weight * abs_gap) is the caller's fixed-order sum
    over the <= n_bins rows (the benford/contingency contract).

    One aggregation pass + one tiny window over n_bins rows.
    """
    from pyspark.sql import Window, functions as F

    p = F.col(prob_scaled_col).cast("bigint")
    # integer bin: floor((p * n_bins) / scale), clamped so p == scale
    # lands in the top bin (p*n_bins <= scale*n_bins < 2^53: the
    # double division floors exactly)
    bin_col = F.least(
        F.floor((p * n_bins) / F.lit(scale)).cast("bigint"), F.lit(n_bins - 1)
    )
    agg = (
        df.select(bin_col.alias("bin"), p.alias("p"), F.col(label_col).cast("boolean").alias("y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p").alias("sum_p"),
            F.count_if(F.col("y")).alias("n_pos"),
        )
    )
    total = F.sum("n").over(Window.partitionBy())
    mean_conf = F.col("sum_p").cast("double") / (F.col("n").cast("double") * float(scale))
    frac_pos = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return agg.select(
        "bin",
        "n",
        "n_pos",
        mean_conf.alias("mean_conf"),
        frac_pos.alias("frac_pos"),
        F.abs(mean_conf - frac_pos).alias("abs_gap"),
        (F.col("n").cast("double") / total.cast("double")).alias("weight"),
    )


def fd_violation_report(
    df,
    lhs_cols: list[str],
    rhs_col: str,
):
    """Functional-dependency audit: does ``lhs_cols -> rhs_col`` hold?
    (the schema-inference / data-contract check: 'order key determines
    ship mode', 'zip determines city' — violated FDs flag dirty joins
    or mis-modeled keys before they corrupt a merge).

    One row: n_groups, n_violating_groups (LHS values mapping to >1
    RHS), n_violating_rows (rows inside those groups — the repair
    workload), holds (boolean). One groupBy on the LHS + one
    aggregation over the (bounded, one-row-per-LHS-value) group
    table; NULL RHS counts as a value (two rows NULL/non-NULL under
    one key violate)."""
    from pyspark.sql import functions as F

    groups = df.groupBy(*lhs_cols).agg(
        F.count(F.lit(1)).alias("rows_in_group"),
        # count_distinct skips NULLs; add the null-presence indicator
        (
            F.count_distinct(F.col(rhs_col))
            + F.max(F.when(F.col(rhs_col).isNull(), 1).otherwise(0))
        ).alias("n_rhs"),
    )
    viol = F.col("n_rhs") > 1
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.count_if(viol).alias("n_violating_groups"),
        F.sum(F.when(viol, F.col("rows_in_group")).otherwise(0)).alias(
            "n_violating_rows"
        ),
        (F.count_if(viol) == 0).alias("holds"),
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_num: int = 2,
    t_den: int = 10,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) for
    a CATEGORICAL sensitive attribute: a quasi-identifier group leaks
    when the distribution of the sensitive value inside it diverges
    from the global distribution by more than t — the attack both
    k-anonymity and l-diversity miss (a group can be large AND
    diverse yet still be 90% one diagnosis when the population is 5%).

    For categorical values under uniform ground distance, the earth
    mover's distance reduces to total variation: EMD = 1/2 Σ_v
    |p_g(v) − p(v)|. Computed EXACTLY in integers: with group size
    n_g, population n, per-value counts c_gv / c_v,

        EMD > t  ⟺  Σ_v |c_gv·n − c_v·n_g| > 2·t·n_g·n

    so the audit decision never touches a float; the reported
    ``t_closeness`` double is one final division of exact BIGINTs.
    The threshold arrives as a rational (t_num/t_den, default 0.2).

    Scale shape: one (quasi, value) count aggregation over the data;
    the group×value completion grid (absent values have c_gv = 0 and
    still contribute c_v·n_g) is a join of two TINY aggregate tables
    — never a fact-table cross. Returns one row per quasi-group:
    (quasi..., group_size, emd_num, t_closeness, violates).
    """
    n_total = df.count()
    gv = (
        df.groupBy(*quasi_cols, sensitive_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_gv"))
    )
    g = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g")
    )
    v = df.groupBy(sensitive_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("c_v")
    )
    grid = g.crossJoin(F.broadcast(v)).join(
        gv, [*quasi_cols, sensitive_col], "left"
    )
    term = F.abs(
        F.coalesce(F.col("c_gv"), F.lit(0)) * F.lit(n_total)
        - F.col("c_v") * F.col("n_g")
    )
    out = grid.groupBy(*quasi_cols, "n_g").agg(
        F.sum(term).cast("bigint").alias("emd_num")
    )
    return out.select(
        *quasi_cols,
        F.col("n_g").alias("group_size"),
        "emd_num",
        (
            F.col("emd_num").cast("double")
            / F.lit(float(2 * n_total)) / F.col("n_g").cast("double")
        ).alias("t_closeness"),
        (
            F.col("emd_num") * F.lit(t_den)
            > F.lit(2 * t_num) * F.col("n_g") * F.lit(n_total)
        ).alias("violates"),
    )


def encoding_advisor_int(
    df: DataFrame,
    part_col: str,
    ord_col: str,
    cols: list[str],
) -> DataFrame:
    """Storage-encoding advisor for integer columns — the profiling
    pass a 100 TB lakehouse runs before choosing parquet encodings:
    per column it measures cardinality (dictionary viability), the
    bit width of the value RANGE (bit-packing win), and the RLE run
    count under the table's natural sort (``part_col, ord_col`` —
    runs are counted within each partition key, which mirrors how
    row groups actually encode: a new group restarts the run).

    All metrics are exact integers (bit width via length(bin(range))
    — no log2/libm): one explode to (key, column, value) long form,
    one partitioned window for the run flags, one aggregation.
    Recommendation is a deterministic CASE over the measured stats.

    Returns (column, n, n_distinct, bit_width, rle_runs,
    recommendation).
    """
    from pyspark.sql import Window

    long_form = df.select(
        F.col(part_col).alias("pk"),
        F.col(ord_col).alias("ok"),
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in cols]),
                F.array(*[F.col(c).cast("bigint") for c in cols]),
            )
        ).alias("col", "v"),
    )
    # order ties broken by the value itself: the synthetic data has
    # duplicate (pk, ok) pairs and an unpinned tie order makes run
    # counts engine-nondeterministic (gate-caught)
    w = Window.partitionBy("pk", "col").orderBy("ok", "v")
    flagged = long_form.withColumn(
        "chg",
        (
            F.lag("v").over(w).isNull() | (F.lag("v").over(w) != F.col("v"))
        ).cast("bigint"),
    )
    stats = flagged.groupBy("col").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("v").cast("bigint").alias("n_distinct"),
        F.expr("CAST(length(bin(max(v) - min(v))) AS BIGINT)").alias("bit_width"),
        F.sum("chg").cast("bigint").alias("rle_runs"),
    )
    rec = (
        F.when(
            (F.col("n_distinct") <= 256)
            & (F.col("rle_runs") <= F.expr("n div 4")),
            "rle-dict",
        )
        .when(F.col("n_distinct") <= 256, "dict")
        .when(F.col("rle_runs") <= F.expr("n div 8"), "rle")
        .when(F.col("bit_width") <= 20, "bitpack")
        .otherwise("plain")
    )
    return stats.select(
        F.col("col").alias("column"),
        "n",
        "n_distinct",
        "bit_width",
        "rle_runs",
        rec.alias("recommendation"),
    )


def fd_discovery(df: DataFrame, cols: list[str]) -> DataFrame:
    """Single-column functional-dependency DISCOVERY over a bounded
    candidate column set — the profiling sibling of
    :func:`fd_violation_report` (which audits ONE user-stated FD):
    for every ordered pair (A, B) of ``cols``, does A -> B hold, and
    how badly is it broken? The TANE level-1 lattice (Huhtala et al.,
    Comput. J. 1999, section 3: A -> B iff the (A) partition equals
    the (A, B) partition in group count), restricted to single-column
    LHS — the level where profiling finds key/category/hierarchy
    structure (clerk -> nation, status -> shippriority) before anyone
    writes a join.

    Scale shape: ONE row-local explode stacks the |cols|^2 - |cols|
    ordered pairs (P is schema-bounded, so the stream is P x input
    rows, linear), then a distinct on (pair, lhs value, rhs value)
    and two bounded aggregations — never a per-pair rescan of the
    table (the oracle twin does rescan per pair: DuckDB at sf0.01 can
    afford it; a 100 TB profiler cannot). NULL is a value: encoded
    with an injective 1-char prefix ('n' for NULL, 'v' || value
    otherwise — ADVICE r8: a bare string sentinel would conflate a
    genuine value equal to the sentinel with NULL), so (NULL -> x)
    and (NULL -> y) together violate and no real value can collide.

    Returns one row per ordered pair: (lhs, rhs, n_lhs_values,
    n_lhs_rhs_pairs, n_violating_lhs, holds) with holds as 0/1
    BIGINT (driver-canonicalizer-friendly).
    """
    def enc(c: str):
        # injective: 'n' for NULL, 'v' + value otherwise — prefixes of
        # equal length, so distinct inputs stay distinct
        return F.when(F.col(c).isNull(), F.lit("n")).otherwise(
            F.concat(F.lit("v"), F.col(c).cast("string"))
        )

    pair_structs = [
        F.struct(
            F.lit(a).alias("lhs"),
            F.lit(b).alias("rhs"),
            enc(a).alias("lv"),
            enc(b).alias("rv"),
        )
        for a in cols
        for b in cols
        if a != b
    ]
    stacked = df.select(
        F.explode(F.array(*pair_structs)).alias("p")
    ).select("p.lhs", "p.rhs", "p.lv", "p.rv")
    pair_values = stacked.distinct()
    per_lv = pair_values.groupBy("lhs", "rhs", "lv").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rv")
    )
    return per_lv.groupBy("lhs", "rhs").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lhs_values"),
        F.sum("n_rv").cast("bigint").alias("n_lhs_rhs_pairs"),
        F.count_if(F.col("n_rv") > 1).cast("bigint").alias("n_violating_lhs"),
        F.when(F.max("n_rv") > 1, F.lit(0))
        .otherwise(F.lit(1))
        .cast("bigint")
        .alias("holds"),
    )


def referential_integrity_audit(
    edges: "list[tuple[DataFrame, str, DataFrame, str, str]]",
) -> DataFrame:
    """Foreign-key orphan audit across a schema's join edges: for
    each (child_df, fk_col, parent_df, pk_col, edge_name), count
    child rows, orphan rows (fk with no parent — a LEFT ANTI join,
    the exact complement of the join every query assumes is safe),
    NULL fks (excused from orphanhood like SQL FKs), and the
    distinct-fk-to-parent cardinality ratio in ppm. The data-contract
    check that catches broken ingests BEFORE a silent inner join
    drops rows.

    One anti-join + two aggregates per edge, each equi-keyed; the
    output is one bounded row per edge, unioned.

    Returns (edge, n_child, n_null_fk, n_orphans, orphan_ppm,
    n_distinct_fk, n_parent, fk_coverage_ppm).
    """
    outs = []
    for child, fk, parent, pk, name in edges:
        c = child.select(F.col(fk).alias("_fk"))
        p = parent.select(F.col(pk).alias("_pk"))
        nn = c.where(F.col("_fk").isNotNull())
        orphans = nn.join(p, nn["_fk"] == p["_pk"], "left_anti")
        stats = c.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
            F.count_if(F.col("_fk").isNull()).cast("bigint").alias("n_null_fk"),
            F.count_distinct(F.col("_fk")).cast("bigint").alias("n_distinct_fk"),
        )
        orf = orphans.agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
        par = p.agg(F.count(F.lit(1)).cast("bigint").alias("n_parent"))
        outs.append(
            stats.crossJoin(orf)
            .crossJoin(par)
            .selectExpr(
                f"'{name}' AS edge",
                "n_child",
                "n_null_fk",
                "n_orphans",
                "CAST((n_orphans * 1000000) div greatest(n_child - n_null_fk, 1)"
                " AS BIGINT) AS orphan_ppm",
                "n_distinct_fk",
                "n_parent",
                "CAST((n_distinct_fk * 1000000) div greatest(n_parent, 1)"
                " AS BIGINT) AS fk_coverage_ppm",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def key_discovery(df: DataFrame, cols: list[str]) -> DataFrame:
    """Candidate-KEY discovery over a bounded column set — the
    uniqueness sibling of :func:`fd_discovery` (single-column FDs
    find hierarchy; this finds identity): for every single column and
    every unordered PAIR of ``cols``, is the (combination of) values
    unique across the table? The profiling step that proposes primary
    keys / dedup keys before anyone writes a MERGE.

    Scale shape: ONE row-local explode stacks the |cols| + C(|cols|,2)
    candidates (schema-bounded), then one (candidate, value) distinct
    + counts — never a per-candidate rescan (the oracle twin rescans:
    fine at sf0.01, not at 100 TB). Values are encoded injectively
    ('n' for NULL, 'v' || value, pair parts length-prefixed) so no
    concatenation collision can fake uniqueness, and NULLs count as
    values (a SQL UNIQUE constraint would excuse them — a DEDUP key
    cannot, which is the use case here; documented difference).

    Returns (candidate, n_rows, n_distinct, is_key 0/1 BIGINT).
    """

    def enc(c: str):
        v = F.col(c).cast("string")
        e = F.when(v.isNull(), F.lit("n")).otherwise(F.concat(F.lit("v"), v))
        # length-prefix so pair concatenation stays injective
        return F.concat(F.length(e).cast("string"), F.lit(":"), e)

    singles = [
        F.struct(F.lit(c).alias("cand"), enc(c).alias("val")) for c in cols
    ]
    pairs = [
        F.struct(
            F.lit(f"{a}+{b}").alias("cand"),
            F.concat(enc(a), F.lit("#"), enc(b)).alias("val"),
        )
        for i, a in enumerate(cols)
        for b in cols[i + 1 :]
    ]
    stacked = df.select(
        F.explode(F.array(*(singles + pairs))).alias("p")
    ).select("p.cand", "p.val")
    return stacked.groupBy(F.col("cand").alias("candidate")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("val").cast("bigint").alias("n_distinct"),
        F.when(
            F.countDistinct("val") == F.count(F.lit(1)), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_key"),
    )
