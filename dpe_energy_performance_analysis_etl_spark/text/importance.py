"""Data-selection importance scoring (DSIR-family): score every
candidate document by how much its unigram distribution looks like a
TARGET corpus versus a REFERENCE corpus (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling"; the
hashed-ngram instantiation). The selected top slice becomes the
training mix — the standard play for steering a web-scale crawl
toward a quality domain without training a classifier.

Distributed shape (the part that must survive 100 TB):
  1. two vocabulary tables — token → count in target / reference —
     built with one explode + hash-groupBy each; vocabulary-sized,
     NOT corpus-sized.
  2. candidates explode once and equi-join the BROADCAST vocab
     tables (a vocabulary of millions of tokens is MBs — always the
     small side; the corpus never re-shuffles).
  3. per-doc aggregate of the joined weights — map-side combinable.

Two scoring columns ship:

- ``affinity`` (the driver-gate entry): exact-integer aggregates —
  Σ target-count(w) and Σ reference-count(w) over the doc's tokens,
  ratioed in ONE double division. Cross-engine bit-exact (the gate's
  value-hash bar), monotone in "target-ness" for fixed doc length.
- ``log_ratio`` (``dsir_log_ratio``): the paper's per-token
  Σ log(p_target(w)/p_ref(w)) with add-one smoothing. Numerically
  the real thing, but ``ln`` is a libm call whose last ulp differs
  between engines, so it is verified against numpy in pytest rather
  than hash-compared against DuckDB — same policy as the t-test /
  Wilcoxon stats (``operators/stats.py``).

Reference parity: the reference engine has no data-selection stage
(its corpus is structured energy records); this is part of the
LLM-pipeline mandate, sharing the tokenize/broadcast-join discipline
of ``text/curation.py::ngram_decontaminate``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Same token class as token_counts / tfidf_top_terms — one convention
# corpus-wide so vocab tables compose across operators.
_TOKEN_RE = "[a-z0-9]+"


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0)
        ).alias("tok"),
    )


def unigram_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """token → count. Vocabulary-sized output; one explode + one
    hash-groupBy with map-side partials."""
    return (
        _tokens(df, id_col, text_col)
        .groupBy(F.col("tok"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def importance_score(
    candidates: DataFrame,
    target: DataFrame,
    reference: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-candidate: (doc_id, n_tokens, target_mass, ref_mass,
    affinity) where affinity = target_mass / (n_tokens ·
    target_total) ÷ ref_mass / (n_tokens · ref_total) — i.e. the
    ratio of average per-token corpus frequencies, reduced so the
    doc-length terms cancel: (target_mass · ref_total) /
    (ref_mass · target_total). All aggregates are exact bigints; the
    single final division is the only float op. ``reference``
    defaults to the candidate corpus itself (the DSIR raw pool)."""
    ref = reference if reference is not None else candidates
    # each vocab table feeds both the token join and its grand-total —
    # cache so the corpus tokenization runs once per side, not twice
    tvoc = (
        unigram_counts(target, text_col, id_col)
        .withColumnRenamed("cnt", "tc")
        .cache()
    )
    rvoc = (
        unigram_counts(ref, text_col, id_col).withColumnRenamed("cnt", "rc").cache()
    )

    toks = _tokens(candidates, id_col, text_col)
    # the vocab tables grow with the target/reference corpora — they
    # stream through shuffle joins on `tok` (VERDICT r9 broadcast-
    # class audit); AQE promotes to broadcast when measurably small
    joined = (
        toks.join(tvoc, on="tok", how="left")
        .join(rvoc, on="tok", how="left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("tc"), F.lit(0))).alias("target_mass"),
            F.sum(F.coalesce(F.col("rc"), F.lit(0))).alias("ref_mass"),
        )
    )
    totals = tvoc.agg(F.sum("tc").alias("t_total")).crossJoin(
        rvoc.agg(F.sum("rc").alias("r_total"))
    )
    return joined.crossJoin(F.broadcast(totals)).select(
        "doc_id",
        "n_tokens",
        "target_mass",
        "ref_mass",
        # casts BEFORE the multiplies: bigint products overflow at
        # web scale (mass ~1e13 × total ~1e13 under ANSI aborts);
        # double mult/divide is IEEE-determined, so the value stays
        # bit-identical across engines.
        (
            (F.col("target_mass").cast("double") * F.col("r_total").cast("double"))
            / (F.col("ref_mass").cast("double") * F.col("t_total").cast("double"))
        ).alias("affinity"),
    )


def dsir_log_ratio(
    candidates: DataFrame,
    target: DataFrame,
    reference: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The paper's score: Σ_tokens log(p̂_target(w) / p̂_ref(w)) with
    add-one smoothing over the UNION vocabulary. Same plan shape as
    ``importance_score`` (shuffle vocab joins, one per-doc agg);
    float log-sums make it pytest-verified, not oracle-hashed."""
    ref = reference if reference is not None else candidates
    tvoc = unigram_counts(target, text_col, id_col).withColumnRenamed("cnt", "tc")
    rvoc = unigram_counts(ref, text_col, id_col).withColumnRenamed("cnt", "rc")
    vocab = (
        tvoc.join(rvoc, on="tok", how="full_outer")
        .select(
            "tok",
            F.coalesce("tc", F.lit(0)).alias("tc"),
            F.coalesce("rc", F.lit(0)).alias("rc"),
        )
        .cache()
    )
    sizes = vocab.agg(
        F.sum("tc").alias("t_total"),
        F.sum("rc").alias("r_total"),
        F.count(F.lit(1)).alias("v"),
    )
    toks = _tokens(candidates, id_col, text_col)
    w = (
        F.log((F.col("tc") + 1).cast("double") / (F.col("t_total") + F.col("v")))
        - F.log((F.col("rc") + 1).cast("double") / (F.col("r_total") + F.col("v")))
    )
    return (
        # union-vocab table grows with the corpora — shuffle join on
        # `tok`, never broadcast (VERDICT r9 broadcast-class audit)
        toks.join(vocab, on="tok", how="left")
        .crossJoin(F.broadcast(sizes))
        # OOV tokens (absent from both corpora) carry weight 0 by the
        # smoothing symmetry only when totals match; keep them explicit:
        .withColumn(
            "w",
            F.when(F.col("tc").isNull(), F.lit(0.0)).otherwise(w),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").alias("log_ratio"),
        )
    )
