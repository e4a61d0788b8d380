"""End-to-end corpus curation pipeline — the composition the operator
library exists for, as ONE runnable DataFrame program:

    raw docs → URL-level keep-first dedup → exact content dedup →
    heuristic quality gate → deterministic subsample → chunking

Each stage rule is the library operator's (text/urls normalization,
text/analysis content key + tokens, text/curation sampling hash,
text/packing chunk geometry); this module chains them and reports the
per-stage funnel (docs in → docs out) — the number every curation run
is judged by ("we started with 10 B pages and trained on 600 M
documents").

The funnel is ONE aggregation pass: each document carries survival
FLAGS for every stage (keep-first winners via per-key window minima,
quality/sample row-local), and the summary is a single conditional-
count aggregate — NOT a unionAll of per-stage counts, which would
re-evaluate the whole chain once per stage (the repeated-subtree
rule). Near-dup layers (MinHash / substring spans / winnowing) slot
between exact dedup and quality when the corpus calls for them; they
are kept out of the headline chain so the funnel stays a single
oracle-checkable pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dpe_energy_performance_analysis_etl_spark.text.analysis import normalized_text, tokens_expr
from dpe_energy_performance_analysis_etl_spark.text.curation import sampling_hash
from dpe_energy_performance_analysis_etl_spark.text.packing import chunk_documents
from dpe_energy_performance_analysis_etl_spark.text.urls import normalize_url


def _flagged(
    docs: DataFrame,
    url_col: str | None,
    min_tokens: int,
    max_mean_word_len: int,
    keep_rate_pct: int,
    chunk_tokens: int,
    overlap_tokens: int,
) -> DataFrame:
    toks = tokens_expr("text")
    n_toks = F.size(toks)
    mean_word_len = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_toks, F.lit(1))
    base = docs.select(
        "doc_id",
        F.col("text"),
        *( [normalize_url(url_col).alias("__canon")] if url_col else [] ),
        F.md5(normalized_text("text")).alias("__k"),
        n_toks.alias("__n_toks"),
        mean_word_len.alias("__mwl"),
    )
    if url_col:
        w_url = Window.partitionBy("__canon")
        url_ok = F.col("doc_id") == F.min("doc_id").over(w_url)
    else:
        url_ok = F.lit(True)
    base = base.withColumn("__url_ok", url_ok)
    # exact-dedup winner chosen AMONG url survivors (conditional min)
    w_k = Window.partitionBy("__k")
    exact_ok = F.col("__url_ok") & (
        F.col("doc_id")
        == F.min(F.when(F.col("__url_ok"), F.col("doc_id"))).over(w_k)
    )
    base = base.withColumn("__exact_ok", exact_ok)
    quality_ok = (
        F.col("__exact_ok")
        & (F.col("__n_toks") >= min_tokens)
        & (F.col("__mwl") < max_mean_word_len)
    )
    base = base.withColumn("__quality_ok", quality_ok)
    sample_ok = F.col("__quality_ok") & (
        sampling_hash(F.col("doc_id")) < keep_rate_pct * 100
    )
    base = base.withColumn("__sample_ok", sample_ok)
    stride = chunk_tokens - overlap_tokens
    n_chunks = F.when(
        F.col("__sample_ok") & (F.col("__n_toks") > 0),
        F.floor((F.col("__n_toks") - 1) / stride) + 1,
    ).otherwise(F.lit(0))
    return base.withColumn("__n_chunks", n_chunks.cast("bigint"))


def curation_funnel(
    docs: DataFrame,
    url_col: str | None = None,
    min_tokens: int = 20,
    max_mean_word_len: int = 12,
    keep_rate_pct: int = 80,
    chunk_tokens: int = 32,
    overlap_tokens: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Returns (final chunked corpus, funnel summary). The summary
    has one row per stage — (stage, stage_name, n_rows) — computed in
    one aggregation pass over the flagged corpus; the chunked corpus
    is ``chunk_documents`` over the surviving documents (a separate
    lazy consumer — materialize whichever you need). Survivor choice
    is min-doc_id everywhere: deterministic, engine-portable, stable
    under repartitioning. ``url_col=None`` skips the URL stage."""
    flagged = _flagged(
        docs, url_col, min_tokens, max_mean_word_len,
        keep_rate_pct, chunk_tokens, overlap_tokens,
    )
    aggs = [
        F.count(F.lit(1)).alias("input"),
        F.count_if(F.col("__url_ok")).alias("url_dedup"),
        F.count_if(F.col("__exact_ok")).alias("exact_dedup"),
        F.count_if(F.col("__quality_ok")).alias("quality_gate"),
        F.count_if(F.col("__sample_ok")).alias("subsample"),
        F.sum("__n_chunks").alias("chunks"),
    ]
    one = flagged.agg(*aggs)
    names = ["input", "url_dedup", "exact_dedup", "quality_gate", "subsample", "chunks"]
    structs = [
        F.struct(
            F.lit(i).alias("stage"),
            F.lit(n).alias("stage_name"),
            F.col(n).cast("bigint").alias("n_rows"),
        )
        for i, n in enumerate(names)
    ]
    summary = one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")

    survivors = flagged.where("__sample_ok").select("doc_id", "text")
    chunks = chunk_documents(
        survivors, chunk_tokens=chunk_tokens, overlap_tokens=overlap_tokens,
        text_col="text", id_col="doc_id",
    )
    return chunks, summary
