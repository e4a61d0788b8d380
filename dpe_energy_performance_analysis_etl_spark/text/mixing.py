"""Training-mix construction: temperature-scaled source sampling and
PII pseudonymization.

``temperature_mixture_sample`` implements the standard multilingual /
multi-source rebalancing recipe (public practice: mBERT/XLM-R
exponentiated-smoothing, T5 §3.4.3 temperature mixing): small sources
are kept whole while large sources are downsampled toward
``(min_count / count)^(1/T)``. With T = 2 the exponent is 0.5 — an
exact IEEE ``sqrt`` — so the keep rates (and therefore the sampled
set, via the deterministic key hash) are bit-reproducible across
engines; other temperatures go through ``pow`` (libm, ~1-ulp
engine-dependent) and are engine-internal only.

``pseudonymize`` is the privacy step every shared training corpus
needs: replace direct identifiers with a deterministic salted sha256
so joins/dedup still work on the pseudonym but the raw value is gone.

Scale: per-source counts are one tiny aggregation broadcast back;
the keep decision and hashing are row-local expressions — no extra
shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from dpe_energy_performance_analysis_etl_spark.text.curation import _RATE_DENOM, sampling_hash


def temperature_rates(
    df: DataFrame, strata_col: str = "source", temperature: float = 2.0
) -> DataFrame:
    """Per-stratum keep rates ``(min_count / count)^(1/T)`` as a tiny
    DataFrame (strata_col, n_rows, keep_rate). T=1 equalizes source
    sizes exactly; T→∞ keeps the natural distribution; T=2 (default)
    is the common compromise — and the only value whose exponent is
    IEEE-exact (sqrt)."""
    if temperature <= 0:
        raise ValueError(f"temperature must be positive: {temperature}")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_rows"))
    min_n = counts.agg(F.min("n_rows").alias("m"))
    ratio = F.col("n_rows").cast("double")
    base = F.col("m").cast("double") / ratio
    if temperature == 2.0:
        rate = F.sqrt(base)
    else:
        rate = F.pow(base, 1.0 / temperature)
    return counts.crossJoin(F.broadcast(min_n)).select(
        strata_col, "n_rows", rate.alias("keep_rate")
    )


def temperature_mixture_sample(
    df: DataFrame,
    strata_col: str = "source",
    key_col: str = "doc_id",
    temperature: float = 2.0,
) -> DataFrame:
    """Deterministically sample ``df`` to the temperature-scaled mix:
    keep row iff ``sampling_hash(key) < keep_rate(stratum) * 10000``.
    The smallest stratum is kept whole; a stratum 4x larger is kept at
    50% (T=2). Join with the per-stratum rate table is a broadcast of
    #strata rows; the decision is row-local."""
    rates = temperature_rates(df, strata_col=strata_col, temperature=temperature)
    return (
        df.join(F.broadcast(rates.select(strata_col, "keep_rate")), on=strata_col)
        .where(
            sampling_hash(F.col(key_col)).cast("double")
            < F.col("keep_rate") * F.lit(float(_RATE_DENOM))
        )
        .drop("keep_rate")
    )


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    salt: str,
    suffix: str = "_pseud",
    drop_original: bool = True,
) -> DataFrame:
    """Replace identifier columns with deterministic salted sha256
    hex digests. Same input + same salt → same pseudonym, so equality
    joins and dedup keep working across tables pseudonymized with the
    same salt; without the salt the mapping is not invertible by
    rainbow table. Row-local, codegen'd (JVM sha2), zero shuffle."""
    if not salt:
        raise ValueError("salt must be non-empty")
    out = df
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.sha2(F.concat(F.lit(salt), F.lit(":"), F.col(c).cast("string")), 256),
        )
        if drop_original:
            out = out.drop(c)
    return out


# Identifier classes every shared corpus must scrub. Deliberately
# engine-portable regex (no lookaround, no \b): the same pattern
# string runs identically under Java regex (Spark) and RE2-style
# engines (DuckDB), so redaction is oracle-checkable bit-for-bit.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "phone": r"\+?[0-9][0-9 ()-]{7,}[0-9]",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    token_fmt: str = "[{label}]",
) -> DataFrame:
    """Replace every PII match with a class token (``[email]``,
    ``[ipv4]``, ``[phone]``) and count the matches per class.

    Unlike ``pseudonymize`` (which transforms identifier COLUMNS for
    joinability), this scrubs identifiers embedded in free TEXT — the
    pre-training-corpus step. Row-local regexp_replace chains, fully
    codegen'd, zero shuffle; patterns apply in a fixed order (emails
    before phones so a number inside an address is counted once).
    Adds ``{label}_n`` counts and rewrites ``text_col`` in place.
    """
    patterns = patterns or PII_PATTERNS
    out = df
    scrubbed = F.col(text_col)
    counts = []
    for label, pat in patterns.items():
        # count on the text as the PREVIOUS classes left it, then
        # scrub — digits consumed by an earlier class (an address's
        # local part) must not count again as a later one (a phone)
        counts.append(F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0)).alias(f"{label}_n"))
        scrubbed = F.regexp_replace(scrubbed, pat, token_fmt.format(label=label))
    other = [c for c in df.columns if c != text_col]
    return df.select(*other, *counts, scrubbed.alias(text_col))


def epoch_shard(
    df: DataFrame,
    n_shards: int,
    epoch: int = 0,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-epoch shuffle + shard assignment: every
    row gets a pseudo-random but reproducible ``shard`` in
    [0, n_shards) and a ``shuffle_key`` that orders rows within the
    shard differently each epoch. The standard data-loader contract —
    epoch N of a 100 TB corpus is the same permutation on every rerun,
    with no global sort: writers repartition by ``shard`` and
    sort WITHIN partitions by ``shuffle_key`` (sortWithinPartitions),
    so the only shuffle is the 1-pass bucket exchange.

    Portable integer hash (Knuth multiplicative, same as the sampling
    path) — any engine reproduces the identical assignment."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    mixed = (F.col(key_col).cast("bigint") + F.lit(epoch) * F.lit(1_000_003)) % F.lit(2_147_483_647)
    h = sampling_hash(mixed) * F.lit(10_007) % F.lit(_RATE_DENOM * 10)
    return df.withColumn("shard", (sampling_hash(mixed) % F.lit(n_shards)).cast("int")).withColumn(
        "shuffle_key", h.cast("bigint")
    )


def split_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Deterministic train/val/test assignment by key hash — the
    split every training pipeline needs, done WITHOUT rand() so it is
    reproducible across reruns, engines, and corpus repartitionings,
    and so a document can never migrate between splits when the
    corpus grows (leakage via re-randomization is the classic bug).

    Row-local expression, zero shuffle: bucket = sampling_hash(key)
    in [0, 10000); < train*10000 -> 'train', < (train+val)*10000 ->
    'val', else 'test'. Remaining fraction is the test share.
    """
    b = sampling_hash(F.col(key_col))
    t_hi = int(round(train * _RATE_DENOM))
    v_hi = int(round((train + val) * _RATE_DENOM))
    return df.withColumn(
        "split",
        F.when(b < t_hi, F.lit("train")).when(b < v_hi, F.lit("val")).otherwise(F.lit("test")),
    )


def group_sample_topk(
    df: DataFrame,
    group_cols: list[str],
    key_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Deterministic k-per-group sample (reservoir-sampling semantics
    with a hash in place of the RNG): rank rows inside each group by
    (sampling_hash(key), key) and keep the first k. Equivalent to a
    uniform random sample per group, but reproducible and stable —
    adding rows to a group can evict an old pick only the way a real
    reservoir would, never reshuffle the whole sample.

    One hash-partitioned window per group. For pathologically hot
    groups, pre-filter with ``sampling_hash(key) < threshold`` sized
    from an approximate group count before ranking — that caps the
    window's per-partition row count while preserving the top-k by
    hash order (the same two-phase trick as the packing operator).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        sampling_hash(F.col(key_col)).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= k)
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic weight-biased top-k sample: rank rows by the
    integer priority ``((hash(key) + 1) * 1e6) DIV weight`` ascending
    — heavier rows draw systematically smaller priorities, so the
    selection is biased toward weight (size-biased sampling by token
    count is the standard corpus-mixing move) while staying exactly
    reproducible: pure BIGINT arithmetic, no RNG, no libm pow (the
    textbook A-ES key ``u^(1/w)`` is engine-nondeterministic).

    Weights must be positive integers (token counts, byte sizes).
    One hash-partitioned window per group; the UNGROUPED path is
    TakeOrderedAndProject via ``take_ordered_ranked`` (per-partition
    k-row heaps) — a global row_number window there would
    single-partition the whole corpus (r11 window-class sweep).
    """
    from pyspark.sql import Window

    prio = F.expr(
        f"((((({key_col} * 2654435761) % 4294967296) % 10000) + 1) * 1000000) DIV {weight_col}"
    )
    if not group_cols:
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            take_ordered_ranked,
        )

        return take_ordered_ranked(
            df.withColumn("priority", prio),
            [F.col("priority").asc(), F.col(key_col).asc()],
            k,
            rank_col="sample_rank",
        )
    w = Window.partitionBy(*group_cols).orderBy(prio.asc(), F.col(key_col).asc())
    return (
        df.withColumn("priority", prio)
        .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= k)
    )


def negative_sampling_table(
    df: DataFrame,
    text_col: str = "text",
    k: int = 25,
) -> DataFrame:
    """word2vec/SGNS negative-sampling table (Mikolov et al. 2013):
    unigram counts raised to the 3/4 power, plus a deterministic
    k-word draw biased by that weight.

    The 3/4 power is the one place the published recipe wants libm —
    dodged exactly: cnt^(3/4) = sqrt(sqrt(cnt^3)), two correctly-
    rounded IEEE sqrts over a fixed-shape product, identical in any
    engine (the dyadic-EWMA trick applied to a fractional exponent
    with a power-of-two denominator). The draw ranks words by
    portable_hash(word) / weight — heavier words draw systematically
    smaller priorities — with no RNG and no engine-specific hash
    (polynomial rolling hash, base 131 mod 1e15, same as the hashed
    classifier).

    Plan: one corpus-scale explode+groupBy (the word-count table);
    weight and priority are row-local; the ranking window covers only
    the |vocab| table.
    """
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import token_bucket
    from dpe_energy_performance_analysis_etl_spark.text.tokenizer import word_count_table

    vocab = word_count_table(df, text_col)
    cd = F.col("wcount").cast("double")
    weight = F.sqrt(F.sqrt(cd * cd * cd))
    h = (token_bucket(F.col("word"), 10000) + 1).cast("double")
    out = vocab.select(
        "word",
        "wcount",
        weight.alias("weight"),
        (h / weight).alias("priority"),
    )
    # top-k via orderBy+limit => TakeOrderedAndProject (per-partition
    # heaps + driver merge of k rows) — NOT a global row_number
    # window, which would single-partition the full vocabulary; the
    # rank is then a window over the k-row result only.
    topk = out.orderBy(F.col("priority").asc(), F.col("word").asc()).limit(k)
    w = Window.orderBy(F.col("priority").asc(), F.col("word").asc())
    return (
        topk.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .select("word", "wcount", "weight", "sample_rank")
    )


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rate_pct: int = 50,
) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022):
    a deterministic ``rate_pct``% of documents are rewritten in PSM
    order — <PRE>prefix<SUF>suffix<MID>middle — with the two split
    points drawn from portable hashes of the document id, so the
    exact same corpus rewrite falls out of every engine, run, and
    partitioning (the published recipe uses RNG; hashing the id is
    the reproducible equivalent). Character-level splits; run after
    chunking so spans are token-budget-bounded.

    Zero shuffle, zero joins: selection, split points, and the
    rewrite are all row-local codegen. Adds ``mode`` ('psm'/'plain')
    and ``fim_text``.
    """
    rid = F.col(id_col).cast("bigint")
    n = F.length(F.col(text_col))
    # Selection uses an INDEPENDENT hash from the split points: if
    # pick and h1 shared one value, conditioning on pick (value mod
    # 100 < rate) would bias h1 = value mod (n-1) whenever n-1 shares
    # factors with 100 (e.g. 101-char docs would always split in the
    # first half). 0x45d9f3b on the 2^32-reduced id keeps the product
    # < 3.1e17 — ANSI-safe at any id.
    pick = (((rid % F.lit(4294967296)) * F.lit(73244475)) % F.lit(4294967296)) % 100 < rate_pct
    h1 = ((rid * F.lit(2654435761)) % F.lit(4294967296)) % F.greatest(n - 1, F.lit(1))
    h2 = ((rid * F.lit(2246822519)) % F.lit(4294967296)) % F.greatest(n - 1, F.lit(1))
    lo = F.lit(1) + F.least(h1, h2)
    hi = F.lit(1) + F.greatest(h1, h2)
    prefix = F.col(text_col).substr(F.lit(1), lo)
    middle = F.col(text_col).substr(lo + 1, hi - lo)
    suffix = F.col(text_col).substr(hi + 1, n)
    psm = F.concat(F.lit("<PRE>"), prefix, F.lit("<SUF>"), suffix, F.lit("<MID>"), middle)
    use_fim = pick & (n >= 3)
    return df.select(
        F.col(id_col),
        F.when(use_fim, F.lit("psm")).otherwise(F.lit("plain")).alias("mode"),
        F.when(use_fim, psm).otherwise(F.col(text_col)).alias("fim_text"),
    )


def preference_pairs_by_quality(
    df: DataFrame,
    score: Column,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Preference-pair construction for DPO/RLHF-style training: per
    group, the highest-scoring document becomes ``chosen`` and the
    lowest ``rejected`` (ids break score ties, so pairs are
    deterministic). ``score`` is any row-local quality expression —
    the heuristic quality score, a classifier margin, surprisal.

    One aggregation: min/max-struct per group (no windows, no
    per-group sort — the two extremes are partial-aggregatable), then
    a row-local unpack. Groups with a single document pair with
    themselves and are dropped.
    """
    tagged = df.select(
        F.col(group_col).alias("grp"), F.col(id_col).alias("rid"), score.alias("score")
    )
    ext = tagged.groupBy("grp").agg(
        F.max(F.struct(F.col("score").alias("s"), F.col("rid").alias("i"))).alias("best"),
        F.min(F.struct(F.col("score").alias("s"), F.col("rid").alias("i"))).alias("worst"),
    )
    return (
        ext.where(F.col("best.i") != F.col("worst.i"))
        .select(
            F.col("grp").alias(group_col),
            F.col("best.i").alias("chosen_id"),
            F.col("worst.i").alias("rejected_id"),
            F.col("best.s").alias("chosen_score"),
            F.col("worst.s").alias("rejected_score"),
        )
    )


def target_mixture_weights(
    df: DataFrame,
    target: dict[str, float],
    source_col: str = "source",
    size_col: str | None = None,
) -> DataFrame:
    """Per-source sampling weights that reshape the corpus toward a
    TARGET mixture (the DoReMi/data-mixing deployment step: domain
    weights come from a proxy-model run or a spec, and the pipeline
    must translate them into per-source sampling rates).

    Per source: size (rows, or sum of ``size_col`` — use token counts
    for token-budget mixing), natural share, target share, and
    ``weight = target_share / natural_share`` — the relative sampling
    rate that makes the expected post-sampling mixture equal the
    target; ``epochs_needed = max over sources of weight / max_weight
    ... `` is left to the caller (weight > 1 after normalization means
    that source must repeat). Sources absent from ``target`` get
    target share 0 (dropped); weights are emitted un-normalized so
    the caller picks the budget anchor (cap the max at 1 for
    sub-sampling only, or anchor a reference source at 1 and let
    rare sources repeat).

    One aggregation; shares/weights are two double divisions over
    exact integer sums — engine-portable. Target shares should be
    passed as e-notation-safe decimals (they are emitted as given).
    """
    sizes = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(
            (
                F.count(F.lit(1))
                if size_col is None
                else F.sum(F.col(size_col).cast("bigint"))
            ).alias("size")
        )
    )
    total = F.sum("size").over(Window.partitionBy())
    tmap = F.create_map(
        *[x for kv in target.items() for x in (F.lit(kv[0]), F.lit(float(kv[1])))]
    )
    tshare = F.coalesce(tmap.getItem(F.col("source")), F.lit(0.0))
    nshare = F.col("size").cast("double") / total.cast("double")
    return sizes.select(
        "source",
        "size",
        nshare.alias("natural_share"),
        tshare.alias("target_share"),
        (tshare / nshare).alias("weight"),
    )


def unimax_budget_allocation(
    df: DataFrame,
    group_col,
    size_col,
    budget: int,
    max_epochs: int = 4,
) -> DataFrame:
    """UniMax budget allocation (Chung et al., ICLR'23 — "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining"): split a total training-token
    ``budget`` across groups (languages/sources) as UNIFORMLY as
    possible, capping each group at ``max_epochs`` passes over its
    available data — the head languages stop hogging the mixture and
    no tail language gets oversampled into memorization.

    Waterfilling closed form, fully declarative over the BOUNDED
    per-group table: sort groups by available capacity ascending;
    the first k groups (those whose cap is below their fair share of
    what's left) are capped, the rest split the remainder equally.
    A group i is capped iff  cap_i·(G−i+1) ≤ budget − Σ_{j<i} cap_j
    (prefix sums via one window over G rows); the pivot is the last
    capped index, and the equal share is an integer floor division of
    the remaining budget — all int64, replayable in SQL.

    Scale shape: one groupBy over the corpus → G-row table; the
    window/sort run over G rows (bounded: languages/sources, not
    data). Returns (group, available, cap, allocated, epochs).
    """
    sizes = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(size_col).cast("bigint").alias("available")
    )
    cap = (F.col("available") * F.lit(max_epochs)).cast("bigint")
    w = Window.orderBy("cap", "grp")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    ranked = (
        sizes.select("grp", "available", cap.alias("cap"))
        .withColumn("i", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "cum_prev", F.coalesce(F.sum("cap").over(wprev), F.lit(0)).cast("bigint")
        )
        .withColumn("g_total", F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).cast("bigint"))
    )
    capped = F.col("cap") * (F.col("g_total") - F.col("i") + 1) <= (
        F.lit(budget) - F.col("cum_prev")
    )
    marked = ranked.withColumn("is_capped", capped)
    # remaining budget after all capped groups, split equally among
    # the uncapped ones (scalar via a bounded window — no collect)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    marked = marked.withColumn(
        "capped_sum",
        F.coalesce(
            F.sum(F.when(F.col("is_capped"), F.col("cap"))).over(wall), F.lit(0)
        ).cast("bigint"),
    ).withColumn(
        "n_uncapped",
        (F.col("g_total") - F.sum(F.col("is_capped").cast("bigint")).over(wall)).cast(
            "bigint"
        ),
    )
    share = F.expr(f"({budget}L - capped_sum) div greatest(n_uncapped, 1L)")
    alloc = F.when(F.col("is_capped"), F.col("cap")).otherwise(
        F.least(F.col("cap"), share)
    )
    return marked.select(
        F.col("grp").alias(group_col),
        "available",
        "cap",
        alloc.cast("bigint").alias("allocated"),
        (
            alloc.cast("double")
            / F.greatest(F.col("available"), F.lit(1)).cast("double")
        ).alias("epochs"),
    )
