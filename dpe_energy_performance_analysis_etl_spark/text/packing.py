"""Sequence assembly for LLM training: overlapping document chunking
and token-budget sequence packing.

Training pipelines turn documents into fixed-length model sequences in
two standard moves (both public practice — GPT-2/3 data prep, T5 §2.2
"pack examples", RAG chunkers):

  - **chunking**: split each document into overlapping token windows
    (context windows for embedding/RAG, or max-length-bounded training
    examples);
  - **packing**: concatenate the corpus in a deterministic order and
    cut it into fixed token-budget bins, recording for every document
    which bin it starts in and at what offset ("concat then chunk").

Scale design:
  - chunking is a per-row explode — O(output) with no shuffle at all;
  - packing needs a GLOBAL running sum, which naively is a window
    over one partition — a single-task straggler at 100 TB. Instead it
    uses the classic two-level scan: within-bucket cumulative sums in
    parallel, bucket totals aggregated small-side, an exclusive prefix
    over the (tiny) bucket table, broadcast back. Every per-row pass
    is fully parallel; the only serial window runs over #buckets rows,
    not #rows.

Determinism: integer token counts, integer arithmetic, explicit
ordering column — exact SQL twins in ``plans/queries.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from dpe_energy_performance_analysis_etl_spark.operators.scaling import scan_fanout

from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 32,
    overlap_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    fanout: int | None = None,
) -> DataFrame:
    """Split each document into overlapping token-window chunks.

    Chunk ``k`` starts at token offset ``k * (chunk_tokens -
    overlap_tokens)`` and carries up to ``chunk_tokens`` tokens; the
    final chunk may be shorter. Documents with zero tokens produce no
    chunks. Output: (id, chunk_id, chunk_text, n_chunk_tokens).

    Per-row expressions (sequence → explode → slice); ``fanout``
    repartitions first (default: cluster parallelism) so a
    few-files scan doesn't serialize the explode onto a few tasks.
    Output volume ≈ input tokens × (1 + overlap/stride).
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive: {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens): {overlap_tokens}"
        )
    if fanout is None:
        fanout = df.sparkSession.sparkContext.defaultParallelism
    stride = chunk_tokens - overlap_tokens
    base = scan_fanout(df, fanout).select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    starts = F.when(
        F.size(toks) > 0, F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    exploded = base.select(
        F.col(id_col), toks, F.explode(starts).alias("__start")
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return exploded.select(
        id_col,
        (F.col("__start") / stride).cast("bigint").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
    )


def sequence_pack(
    df: DataFrame,
    budget: int,
    token_count_col: str = "n_tokens",
    order_col: str = "doc_id",
    bucket_size: int = 4096,
) -> DataFrame:
    """Assign each document its bin and offset under concat-then-chunk
    packing: documents are concatenated in ``order_col`` order and the
    stream is cut every ``budget`` tokens.

    Output per row: (order_col, token_count_col, ``start_token`` —
    exclusive running sum, ``bin_id`` — the bin the document STARTS
    in, ``offset_in_bin``, ``spans_boundary`` — whether it crosses
    into the next bin).

    The global running sum is computed with a two-level scan (see
    module docstring): ``order_col`` must be numeric and unique;
    ``bucket_size`` controls the parallel granularity — any value
    works, 4096 keeps the serial bucket-prefix window under ~25k rows
    per 10^8 documents.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    o, t = F.col(order_col), F.col(token_count_col).cast("bigint")
    bucket = F.floor(o / F.lit(bucket_size)).cast("bigint")
    tagged = df.select(o.alias(order_col), t.alias(token_count_col)).withColumn(
        "__bucket", bucket
    )
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_local = tagged.withColumn("__local_cum", F.sum(token_count_col).over(w_in))
    totals = tagged.groupBy("__bucket").agg(F.sum(token_count_col).alias("__tot"))
    w_b = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixes = totals.withColumn(
        "__prefix", F.sum("__tot").over(w_b) - F.col("__tot")
    ).select("__bucket", "__prefix")
    joined = with_local.join(F.broadcast(prefixes), on="__bucket")
    start = (F.col("__prefix") + F.col("__local_cum") - F.col(token_count_col)).alias(
        "start_token"
    )
    out = joined.select(order_col, token_count_col, start)
    return out.select(
        order_col,
        token_count_col,
        "start_token",
        # integer div, not floor(double/): exact past 2^53 tokens
        F.expr(f"start_token div {int(budget)}").alias("bin_id"),
        (F.col("start_token") % budget).alias("offset_in_bin"),
        (
            (F.col("start_token") % budget) + F.col(token_count_col) > F.lit(budget)
        ).alias("spans_boundary"),
    )


def length_bucket_batches(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 64,
    batch_size: int = 8,
) -> DataFrame:
    """Length-bucketed batch planning (the data-loader step between
    packing and training): sequences grouped into token-length
    buckets, deterministic batch ids within each bucket, and the
    per-batch padding bill — n_seqs * max_len - sum_len is exactly
    the wasted pad tokens a naive unbucketed batcher would multiply.

    Plan: one shuffle keyed on the bucket id; the per-bucket window
    orders by the stable id (deterministic batches across
    partitionings and engines). Bucket count is bounded by
    max_len / bucket_width, but rows per bucket are corpus-scale, so
    the window sorts within real partitions — not a single-partition
    global window.
    """
    from dpe_energy_performance_analysis_etl_spark.text.analysis import token_count

    w = Window.partitionBy("bucket").orderBy(id_col)
    seqs = (
        df.select(F.col(id_col), token_count(F.col(text_col)).alias("n_tokens"))
        .withColumn("bucket", F.expr(f"n_tokens div {bucket_width}"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("batch_id", F.expr(f"(rn - 1) div {batch_size}"))
    )
    return seqs.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.max("n_tokens").alias("max_len"),
        F.sum("n_tokens").alias("sum_len"),
        (F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens")).alias("pad_waste"),
    )
