"""Exact substring-span dedup — the ExactSubstr operator from Lee et
al., "Deduplicating Training Data Makes Language Models Better" (ACL
2022), re-expressed for Spark.

The paper removes every ≥50-token substring that repeats verbatim
across the corpus, using a corpus-wide suffix array. A suffix array is
a single global sorted structure — exactly what a distributed engine
should NOT build. The equivalent observation: a duplicated run of
``>= k`` tokens exists iff its constituent k-token windows are each
duplicated, so tagging every position whose k-gram occurs in more than
one document and merging the tagged, overlapping [pos, pos+k-1]
intervals recovers precisely the maximal cross-document duplicated
spans of length >= k (shorter repeats are invisible by construction —
k IS the paper's length threshold).

Scale shape (the reason this beats pair-based dedup at 100 TB): no
document pair is ever enumerated. The pipeline is posting-shaped —
explode positions (linear), ONE groupBy gram for document frequencies
(linear, map-side combinable), one equi-join back (linear), one
per-document interval merge (windows partitioned by doc). A gram
shared by a million documents costs a million posting rows, never a
trillion pairs; corpus-wide boilerplate is the common case this
handles gracefully where the naive pair join dies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dpe_energy_performance_analysis_etl_spark.operators.scaling import scan_fanout
from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr


def position_grams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """(doc_id, pos, gram): the k-token window starting at 0-based
    token position ``pos``. Row-local explode, zero shuffle.
    Documents shorter than k tokens contribute nothing (guarded —
    Spark's sequence(0, negative) counts DOWN)."""
    base = scan_fanout(df).select(
        F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("t")
    )
    n = F.size("t")
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        # one-arg lambda: a two-arg F.transform lambda binds (element,
        # index) and would shadow the position
        lambda i: F.struct(
            i.alias("pos"), F.array_join(F.slice("t", i + 1, k), " ").alias("gram")
        ),
    )
    return base.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram")
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
    hash_gram_key: bool = True,
) -> DataFrame:
    """Maximal cross-document duplicated token spans of length >= k:
    (doc_id, span_start, span_end, span_tokens), positions 0-based
    inclusive.

    ``hash_gram_key`` moves xxhash64 longs instead of k-word strings
    through the gram shuffle (the shingles.py trade: exact up to
    64-bit collisions, negligible below ~10^9 distinct grams).

    A position is covered when its k-gram occurs in >= ``min_docs``
    distinct documents; covered positions merge into islands wherever
    consecutive tagged windows overlap or touch (gap > k breaks the
    span). The merge is the gaps-and-islands window over per-doc
    covered positions only — tiny relative to the corpus.
    """
    g = position_grams(df, text_col, id_col, k)
    if hash_gram_key:
        g = g.select("doc_id", "pos", F.xxhash64("gram").alias("gram"))
    # cached: feeds the document-frequency agg AND the cover join
    g = g.cache()
    hot = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("gram")
    )
    cov = g.join(hot, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w) > k, F.lit(1)
    ).otherwise(F.lit(0))
    islands = cov.withColumn("brk", brk).withColumn(
        "gid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy("doc_id", "gid")
        .agg(F.min("pos").alias("span_start"), (F.max("pos") + k - 1).alias("span_end"))
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def substring_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
    hash_gram_key: bool = True,
) -> DataFrame:
    """Per-document duplication profile: (doc_id, n_tokens,
    dup_tokens, dup_fraction) for every document with at least one
    duplicated span — the remove-or-keep decision input (the paper
    deletes the spans; a filter on dup_fraction is the cheaper
    gate). Integer token counts; one final double division."""
    spans = duplicated_spans(df, text_col, id_col, k, min_docs, hash_gram_key)
    sizes = df.select(
        F.col(id_col).alias("doc_id"), F.size(tokens_expr(text_col)).alias("n_tokens")
    )
    per_doc = spans.groupBy("doc_id").agg(F.sum("span_tokens").alias("dup_tokens"))
    return (
        per_doc.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "dup_tokens",
            (F.col("dup_tokens").cast("double") / F.col("n_tokens").cast("double")).alias(
                "dup_fraction"
            ),
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
    hash_gram_key: bool = True,
) -> DataFrame:
    """The paper's action: cut every duplicated span out of the text,
    keeping the surrounding tokens (documents with no duplicated span
    pass through verbatim, whitespace-normalized). Returns (doc_id,
    clean_text, n_tokens, kept_tokens).

    Reconstruction is row-local: the doc's merged span list arrives
    as one collected array (bounded — spans per doc <= n_tokens / k),
    and a token is kept when no span contains its position."""
    spans = (
        duplicated_spans(df, text_col, id_col, k, min_docs, hash_gram_key)
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("span_start", "span_end"))
            ).alias("spans")
        )
    )
    toks = df.select(F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("t"))
    joined = toks.join(spans, "doc_id", "left").withColumn(
        "spans",
        F.coalesce(
            F.col("spans"), F.array().cast("array<struct<span_start:int,span_end:int>>")
        ),
    )
    # guard: sequence(1, 0) counts DOWN on an empty token array
    idx = F.when(F.size("t") > 0, F.sequence(F.lit(1), F.size("t"))).otherwise(
        F.array().cast("array<int>")
    )
    kept = F.filter(
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at("t", i).alias("tok"),
                F.exists(
                    "spans",
                    lambda s: (s.getField("span_start") <= i - 1)
                    & (i - 1 <= s.getField("span_end")),
                ).alias("cut"),
            ),
        ),
        lambda st: ~st.getField("cut"),
    )
    return joined.select(
        "doc_id",
        F.array_join(F.transform(kept, lambda st: st.getField("tok")), " ").alias(
            "clean_text"
        ),
        F.size("t").alias("n_tokens"),
        F.size(kept).alias("kept_tokens"),
    )
