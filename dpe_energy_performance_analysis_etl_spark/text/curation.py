"""Corpus-curation operators for LLM training-data pipelines:
repetition filtering (Gopher-style), heuristic quality gates
(C4-style), benchmark decontamination, stratified sampling, and
near-dup-cluster survivorship.

These are the steps that sit between raw crawl and training mix in a
large-scale pipeline (Rae et al. 2021 "Gopher" §A1.1, Raffel et al.
2020 "C4" §2.2 — both public papers); the reference ETL has no text
domain, so this extends it per the build mandate, in the same
expression-first style as ``text/analysis.py``.

Scale notes (the design constraints, not aspirations):
  - repetition metrics explode n-grams ONCE with a gram-size tag and
    aggregate twice ((doc, n, gram) then (doc, n)) — both partial-agg
    map-side combinable; shuffle volume is O(total tokens), never
    O(pairs);
  - decontamination joins on an md5 of the n-gram, so the shuffle
    carries fixed-width keys and the benchmark side (always tiny
    relative to the corpus) broadcasts;
  - stratified sampling is a pure per-row expression (deterministic
    key hash vs per-stratum threshold) — no shuffle at all, and
    re-running on a grown corpus keeps prior decisions stable;
  - survivorship is one window over the cluster assignment (a single
    hash partition by component).

Determinism contract: like ``analysis.py``, every operator here has
an exact SQL equivalent (see ``plans/queries.py``) — no RNG; the
sampling hash is a fixed multiplicative hash, portable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from dpe_energy_performance_analysis_etl_spark.operators.scaling import scan_fanout

from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr

# Knuth multiplicative hash constants for deterministic sampling:
# portable integer arithmetic (identical in any engine), uniform
# enough for per-row keep/drop decisions. For very large keys swap in
# xxhash64 (engine-internal use only — not cross-engine portable).
_KNUTH = 2654435761
_HASH_MOD = 4294967296  # 2^32
_RATE_DENOM = 10000


def _raw_grams(toks: Column, n: int) -> Column:
    """Word n-grams WITH multiplicity (``dedup.word_shingles`` is the
    distinct variant), empty array below n tokens."""
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)])
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fanout: int | None = None,
) -> DataFrame:
    """Per-document repetition signals (Gopher §A1.1 family):

    - ``dup_unigram_frac``: 1 − distinct/total tokens (how much of the
      doc is repeated vocabulary);
    - ``top_bigram_frac``: occurrences of the most frequent bigram /
      total bigrams (degenerate-loop detector);
    - ``dup_trigram_frac``: fraction of trigram occurrences whose
      trigram appears more than once (boilerplate detector).

    Fractions are NULL when the doc is too short to form the gram
    (< 2 / < 3 tokens); docs with zero tokens survive with
    ``n_tokens = 0``.

    Plan: ONE explode of (gram_size, gram) structs → count by
    (doc, n, gram) → roll up to (doc, n) → conditional-agg pivot to
    one row per doc, left-joined back to the id spine. Two shuffles,
    both map-side combinable, no pair blowup. ``fanout`` repartitions
    the input first (default: cluster parallelism) — a handful of
    input files must not serialize the gram expression onto a handful
    of tasks (measured 27× on a single-file scan, NOTES.md); the
    tokens array is materialized once so the tokenizer regex runs
    once per doc, not once per gram size.
    """
    if fanout is None:
        fanout = df.sparkSession.sparkContext.defaultParallelism
    base = scan_fanout(df, fanout).select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")

    # NB: the tag closure must stay single-arg — F.transform treats a
    # two-arg lambda (incl. one with a default!) as (element, index).
    def _tag(n: int):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.concat(*[F.transform(_raw_grams(toks, n), _tag(n)) for n in (1, 2, 3)])
    exploded = base.select(F.col(id_col), F.explode(tagged).alias("t")).select(
        id_col, F.col("t.n").alias("n"), F.col("t.gram").alias("gram")
    )
    gram_counts = exploded.groupBy(id_col, "n", "gram").agg(F.count(F.lit(1)).alias("c"))
    per_n = gram_counts.groupBy(id_col, "n").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("c").alias("total"),
        F.max("c").alias("mx"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup_occ"),
    )

    def _at(n: int, col: str) -> Column:
        return F.max(F.when(F.col("n") == n, F.col(col)))

    stats = per_n.groupBy(id_col).agg(
        F.coalesce(_at(1, "total"), F.lit(0)).cast("bigint").alias("n_tokens"),
        (
            F.lit(1.0)
            - _at(1, "n_distinct").cast("double") / _at(1, "total").cast("double")
        ).alias("dup_unigram_frac"),
        (_at(2, "mx").cast("double") / _at(2, "total").cast("double")).alias(
            "top_bigram_frac"
        ),
        (_at(3, "dup_occ").cast("double") / _at(3, "total").cast("double")).alias(
            "dup_trigram_frac"
        ),
    )
    spine = df.select(F.col(id_col))
    out = spine.join(stats, on=id_col, how="left")
    return out.select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        "dup_unigram_frac",
        "top_bigram_frac",
        "dup_trigram_frac",
    )


def gopher_repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_unigram: float = 0.6,
    max_top_bigram: float = 0.05,
    max_dup_trigram: float = 0.05,
) -> DataFrame:
    """Repetition metrics plus a ``keep`` verdict. A metric that is
    NULL (doc too short for the gram) does not reject — matches the
    Gopher convention of only filtering on computable signals."""
    m = repetition_metrics(df, text_col=text_col, id_col=id_col)
    keep = (
        (F.coalesce(F.col("dup_unigram_frac") <= max_dup_unigram, F.lit(True)))
        & (F.coalesce(F.col("top_bigram_frac") <= max_top_bigram, F.lit(True)))
        & (F.coalesce(F.col("dup_trigram_frac") <= max_dup_trigram, F.lit(True)))
    )
    return m.withColumn("keep", keep)


BOILERPLATE_MARKERS = ["lorem ipsum", "javascript", "{"]


def heuristic_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 80,
    min_mean_word_len: float = 4.0,
    max_mean_word_len: float = 5.0,
    max_symbol_ratio: float = 0.1,
    markers: list[str] | None = None,
) -> DataFrame:
    """C4-style structural quality gate: word-count window, mean word
    length window, symbol-character ratio, boilerplate marker phrases.
    Pure per-row expressions — runs at scan speed, no shuffle."""
    if markers is None:
        markers = BOILERPLATE_MARKERS
    text = F.col(text_col)
    toks = tokens_expr(text)
    n_words = F.size(toks).cast("bigint")
    token_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    mean_word_len = token_chars.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    symbols = F.size(F.regexp_extract_all(text, F.lit("[^a-zA-Z0-9 ]"), 0)).cast("bigint")
    symbol_ratio = symbols.cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")
    lowered = F.lower(text)
    has_boilerplate = F.lit(False)
    for m in markers:
        has_boilerplate = has_boilerplate | lowered.contains(m.lower())
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & ~has_boilerplate
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        has_boilerplate.alias("has_boilerplate"),
        keep.alias("keep"),
    )


def ngram_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    broadcast_benchmark: bool = True,
    fanout: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: which corpus documents share any
    word ``n``-gram with an eval/benchmark set (the public recipe —
    GPT-3 App. C / PaLM §7 use 8–13-gram overlap; the gram size is a
    parameter because it must scale with document length).

    Returns one row per CONTAMINATED doc: (id, n_shared_ngrams =
    distinct shared grams, n_benchmark_docs = distinct benchmark docs
    hit). Clean docs are absent — at 100 TB the contaminated set is
    the small side and this shape anti-joins cheaply downstream.

    Plan: distinct grams per side, keyed by md5(gram) (fixed-width
    join key, string payload never shuffles); the benchmark side
    broadcasts by default (eval sets are MBs, corpora are TBs).
    """
    bench_text = bench_text_col or text_col
    bench_id = bench_id_col or id_col
    if fanout is None:
        fanout = df.sparkSession.sparkContext.defaultParallelism
    left = scan_fanout(df, fanout).select(
        F.col(id_col),
        F.explode(F.array_distinct(_raw_grams(tokens_expr(F.col(text_col)), n))).alias("g"),
    ).select(id_col, F.md5("g").alias("gh"))
    right = benchmark.select(
        F.col(bench_id).alias("__bench_id"),
        F.explode(F.array_distinct(_raw_grams(tokens_expr(F.col(bench_text)), n))).alias("g"),
    ).select("__bench_id", F.md5("g").alias("gh"))
    if broadcast_benchmark:
        right = F.broadcast(right)
    return (
        left.join(right, on="gh")
        .groupBy(id_col)
        .agg(
            F.countDistinct("gh").alias("n_shared_ngrams"),
            F.countDistinct("__bench_id").alias("n_benchmark_docs"),
        )
    )


def sampling_hash(key: Column) -> Column:
    """Deterministic per-key bucket in [0, _RATE_DENOM): Knuth
    multiplicative hash mod 2^32, folded to 4 digits. Portable integer
    arithmetic — any engine computes the identical bucket, so sampling
    decisions are reproducible and stable under corpus growth."""
    return ((key.cast("bigint") * F.lit(_KNUTH)) % F.lit(_HASH_MOD)) % F.lit(_RATE_DENOM)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling for training-mix construction:
    keep a per-stratum fraction of rows, decided by a hash of the row
    key (NOT ``rand()``) so the sample is reproducible, stable across
    retries/partitionings, and consistent between pipeline stages.

    ``rates`` maps stratum value → keep fraction in [0, 1]; strata not
    listed fall back to ``default_rate``. Pure row-local expression:
    zero shuffle, and Catalyst pushes the stratum comparison into the
    scan when the source is partitioned by it.
    """
    for v in rates.values():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate out of [0,1]: {v}")
    thresh: Column = F.lit(int(round(default_rate * _RATE_DENOM)))
    for value, rate in sorted(rates.items()):
        thresh = (
            F.when(F.col(strata_col) == value, F.lit(int(round(rate * _RATE_DENOM))))
            .otherwise(thresh)
        )
    return df.where(sampling_hash(F.col(key_col)) < thresh)


def canonical_per_cluster(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "component",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Survivorship after near-dup clustering: per cluster keep the
    highest-quality document (ties → smallest id). Output is every doc
    with its ``canonical_id`` and an ``is_kept`` flag — the join shape
    a dedup pipeline needs to rewrite references to survivors.

    One window over the cluster assignment (single hash partition by
    component; components are near-dup groups, so they are small by
    construction and skew-free)."""
    joined = clusters.select(id_col, cluster_col).join(
        docs.select(id_col, quality_col), on=id_col
    )
    w = (
        Window.partitionBy(cluster_col)
        .orderBy(F.desc(quality_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    out = joined.withColumn("canonical_id", F.first(id_col).over(w))
    return out.select(
        id_col,
        cluster_col,
        F.col(quality_col).cast("bigint").alias(quality_col),
        "canonical_id",
        (F.col(id_col) == F.col("canonical_id")).alias("is_kept"),
    )


_TERMINAL_PUNCT_RE = "[.!?]$"


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_kept_lines: int = 1,
) -> DataFrame:
    """C4 §2.2 LINE-level cleaning (the half of the recipe
    ``heuristic_quality_filter`` doesn't cover): split each document
    into lines, keep only lines that end in terminal punctuation AND
    carry at least ``min_line_words`` words, rejoin, and flag
    documents left with fewer than ``min_kept_lines`` lines.

    Pure per-row array expressions (split → filter → array_join) —
    scan-speed, zero shuffle, and engine-portable: the same
    split/regex/length semantics exist in any SQL engine, so the
    whole transform is oracle-checkable."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(_TERMINAL_PUNCT_RE)
        & (F.size(F.split(ln, " ")) >= F.lit(min_line_words)),
    )
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        (F.size(kept) >= F.lit(min_kept_lines)).alias("keep_doc"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


_HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: otherwise double-unescapes &amp;lt;
]


def html_strip(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Web-corpus boilerplate step: drop tags, unescape the common
    entities, collapse whitespace. Tag removal first (entities inside
    attributes vanish with the tag); ``&amp;`` unescapes LAST so
    ``&amp;lt;`` yields the literal ``&lt;`` instead of a ``<`` —
    the standard single-pass unescape order. Pure regexp/replace
    chain, scan-speed, portable to any SQL engine."""
    c = F.regexp_replace(F.col(text_col), "<[^>]*>", " ")
    for ent, ch in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out_col, c)


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-WIDE exact paragraph deduplication (the Dolma / CCNet
    paragraph-dedup stage): every paragraph that already occurred
    earlier in the corpus — in a lower doc id, or earlier in the same
    document — is removed, and documents are reassembled from their
    surviving paragraphs. This is what strips boilerplate
    (cookie banners, license footers, nav text) that repeats across
    millions of pages while document-level dedup sees "different"
    documents.

    Shape at scale: paragraphs explode once; the first-occurrence
    resolution is ONE hash-groupBy on the paragraph's md5 (fixed-width
    key, min(struct(doc,pos)) partially aggregates map-side) + an
    equi-join back on that same key (co-partitioned with the groupBy,
    so AQE typically plans it shuffle-free), then one groupBy(doc) to
    reassemble. Nothing is quadratic and no state outlives the join.

    One row per input document: (id, clean_text, n_kept, n_dropped)
    — clean_text is '' when every paragraph was a duplicate."""
    paras = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    )
    keyed = paras.withColumn("pk", F.md5(F.col("para")))
    firsts = keyed.groupBy("pk").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    tagged = keyed.join(firsts, on="pk").withColumn(
        "kept",
        (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("pos") == F.col("first.pos")),
    )
    return tagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("kept"), F.struct("pos", "para"))
                    )
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias("clean_text"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.sum((~F.col("kept")).cast("long")).alias("n_dropped"),
    )


def source_overlap_matrix(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how
    many distinct word n-grams they share, plus the overlap
    coefficient shared / min(|A|, |B|) — the corpus-curation view of
    decontamination (is sourceX leaking into sourceY's shard?).

    Plan: one distinct (source, gram) aggregation, then a gram-keyed
    self-join whose per-gram fan-out is bounded by |sources| (each
    gram appears once per source after the distinct) — candidate
    volume is O(|grams| x |sources|^2) worst case and in practice the
    shared tail; never all-pairs over documents. The per-source gram
    counts are a |sources|-row broadcast.
    """
    from dpe_energy_performance_analysis_etl_spark.dedup.shingles import word_shingles

    sg = (
        df.select(F.col(source_col).alias("source"), word_shingles(text_col, n).alias("grams"))
        .select("source", F.explode("grams").alias("gram"))
        .distinct()
        .cache()  # feeds the per-source counts AND both join sides
    )
    sizes = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    pairs = (
        sg.alias("a")
        .join(sg.alias("b"), "gram")
        .where(F.col("a.source") < F.col("b.source"))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        pairs.join(F.broadcast(sizes.withColumnRenamed("source", "source_a").withColumnRenamed("n_grams", "na")), "source_a")
        .join(F.broadcast(sizes.withColumnRenamed("source", "source_b").withColumnRenamed("n_grams", "nb")), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            (F.col("n_shared").cast("double") / F.least("na", "nb").cast("double")).alias("overlap_coef"),
        )
    )


def greedy_max_coverage(
    pairs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    item_col: str = "item",
) -> DataFrame:
    """Greedy maximum-coverage data selection (the classic (1−1/e)
    greedy — Nemhauser/Wolsey/Fisher 1978; the submodular-selection
    recipe behind coverage-driven training-data subset selection):
    pick ``k`` documents one at a time, each maximizing the number of
    NOT-YET-COVERED items (n-grams, topics, vocab) it contributes;
    ties break to the smallest id, so the selection is a pure
    function of the input on every engine.

    Per round: one anti-join of the (id, item) pairs against the
    covered-item set + one per-id count aggregation + a 1-row argmax
    pull to the driver (a bounded scalar pull, the imputation-stats
    precedent — never data). The covered set grows by one document's
    items per round and is eagerly localCheckpoint'ed (the cascade
    rule). Rounds stop early when no document adds coverage.

    Scale: each round is O(|pairs|) equi-keyed work; k is small by
    construction (you are SELECTING a handful of exemplars). Returns
    (round, id, gain) — gain = newly covered items at pick time.
    """
    spark_s = pairs.sparkSession
    p = pairs.select(
        F.col(id_col).alias("id"), F.col(item_col).alias("item")
    ).distinct().cache()
    # picked set as a DataFrame (anti-joined, like the covered set) —
    # a growing `isin` literal list would bound selection depth by
    # driver-side expression size; the anti-join keeps the plan O(1)
    # per round regardless of k. (A fully-covered doc already drops
    # out of `gains` — the anti-join is the defensive exact mirror.)
    id_schema = p.select("id").schema
    picked = spark_s.createDataFrame([], id_schema).localCheckpoint()
    covered = p.select("item").limit(0).localCheckpoint()
    out = []
    for r in range(1, k + 1):
        gains = (
            p.join(covered, "item", "left_anti")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .join(F.broadcast(picked), "id", "left_anti")
        )
        top = gains.orderBy(F.col("gain").desc(), F.col("id")).limit(1).collect()
        if not top or top[0]["gain"] == 0:
            break
        pick_id, gain = top[0]["id"], top[0]["gain"]
        out.append((r, pick_id, gain))
        picked = picked.unionByName(
            spark_s.createDataFrame([(pick_id,)], id_schema)
        ).localCheckpoint()
        covered = (
            covered.unionByName(p.where(F.col("id") == pick_id).select("item"))
            .distinct()
            .localCheckpoint()
        )
    spark = pairs.sparkSession
    if not out:
        return spark.createDataFrame([], f"round bigint, {id_col} bigint, gain bigint")
    sel = spark.createDataFrame(out, ["round", id_col, "gain"])
    return sel.select(
        F.col("round").cast("bigint").alias("round"),
        F.col(id_col),
        F.col("gain").cast("bigint").alias("gain"),
    )
