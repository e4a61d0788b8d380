"""Content-defined chunking (the LBFS/rsync/borg dedup primitive —
Muthitacharoen et al., SOSP'01) at WORD granularity: chunk boundaries
are placed where a rolling hash of the last ``window`` tokens hits
``0 mod divisor``, so boundaries depend only on LOCAL content. Insert
or delete a paragraph and every chunk outside the edit keeps its
identity — exactly what fixed-size blocks lose (one shifted byte
re-keys every later block), and the reason CDC is the storage-dedup
standard.

Pipeline use at 100 TB: sub-document dedup between crawl snapshots —
repeated boilerplate/quotes chunk to identical md5 keys across
documents, so a hash groupBy finds shared content without any pair
enumeration (same O(n) shape as exact dedup, finer granularity than
whole-doc, cheaper than the ExactSubstr span machinery when
paragraph-ish resolution is enough).

Exactness/portability: the per-word hash is the char-fold polynomial
(base 131) mod the Mersenne prime 2^31−1, window combination is
Σ wh·131^j mod P — every product < 2^62 (int64-safe under ANSI; the
_portable_mix32 lesson), replayed verbatim in the DuckDB oracle.
Chunk identity is md5 of the space-joined tokens (portable on both
engines).

Everything up to the final groupBy is ROW-LOCAL array arithmetic
(transform/filter/aggregate inside codegen) — zero shuffle until
chunks aggregate by hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr

CDC_P = 2**31 - 1
CDC_BASE = 131


def _word_hash(tok):
    chars = F.regexp_extract_all(tok, F.lit("."), 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * CDC_BASE + F.ascii(ch)) % CDC_P,
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    divisor: int = 16,
) -> DataFrame:
    """(doc_id, chunk_idx, start_tok, n_tokens, chunk_md5) — one row
    per content-defined chunk; mean chunk length ≈ ``divisor`` tokens,
    boundaries decided by the trailing-``window`` rolling hash."""
    powers = [pow(CDC_BASE, j, CDC_P) for j in range(window)]
    toks = tokens_expr(text_col)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("t"),
        F.transform(toks, _word_hash).alias("wh"),
    ).withColumn("n", F.size("t"))

    def gram_hash(p):
        # p is a 0-based position column, p >= window-1
        s = F.lit(0).cast("bigint")
        for j, pw in enumerate(powers):
            s = s + (F.element_at("wh", p + 1 - j) * F.lit(pw)) % F.lit(CDC_P)
        return s % F.lit(CDC_P)

    cut = F.filter(
        F.when(
            F.col("n") >= window, F.sequence(F.lit(window - 1), F.col("n") - 1)
        ).otherwise(F.array().cast("array<int>")),
        lambda p: gram_hash(p) % divisor == 0,
    )
    tagged = base.withColumn("cut", cut).withColumn(
        "ends",
        F.when(F.col("n") == 0, F.array().cast("array<int>"))
        .when(
            # try_element_at: plain element_at(-1) on an empty array
            # raises under ANSI even inside a guarded branch (r4 rule)
            F.try_element_at("cut", F.lit(-1)) == F.col("n") - 1,
            F.col("cut"),
        )
        .otherwise(F.concat("cut", F.array(F.col("n") - 1))),
    ).withColumn(
        "starts",
        F.concat(
            F.when(F.col("n") > 0, F.array(F.lit(0))).otherwise(
                F.array().cast("array<int>")
            ),
            # greatest(…, 0): an empty ends array would otherwise pass
            # slice a -1 length, a runtime error under ANSI
            F.transform(
                F.slice("ends", 1, F.greatest(F.size("ends") - 1, F.lit(0))),
                lambda e: e + 1,
            ),
        ),
    )
    spans = tagged.select(
        "doc_id",
        "t",
        F.posexplode(F.arrays_zip("starts", "ends")).alias("chunk_idx", "se"),
    )
    chunk_toks = F.slice(
        "t", F.col("se.starts") + 1, F.col("se.ends") - F.col("se.starts") + 1
    )
    return spans.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("se.starts").cast("bigint").alias("start_tok"),
        (F.col("se.ends") - F.col("se.starts") + 1).cast("bigint").alias("n_tokens"),
        F.md5(F.array_join(chunk_toks, " ").cast("binary")).alias("chunk_md5"),
    )


def cdc_chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    divisor: int = 16,
) -> DataFrame:
    """Cross-document duplicated chunks: (chunk_md5, n_tokens,
    n_copies, n_docs) for every chunk appearing in ≥ 2 documents —
    one hash groupBy over the chunk table, no pair enumeration."""
    chunks = cdc_chunks(df, text_col, id_col, window, divisor)
    return (
        chunks.groupBy("chunk_md5", "n_tokens")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
    )
