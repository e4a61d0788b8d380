"""Text evaluation metrics in exact arithmetic: clipped n-gram
precision (the BLEU component — Papineni et al., ACL'02), distinct-n
diversity (Li et al., NAACL'16), and the Simpson concentration index.

BLEU itself ends in a geometric mean of the four precisions — a libm
exp/log, which this repo's cross-engine float rule forbids in checked
outputs. The COMPONENTS are exact rationals (clipped-match counts over
candidate counts), so they are what gets emitted: numerator and
denominator as BIGINTs plus the one-division double. Callers wanting
the headline BLEU combine the components downstream (the monotone
ranking information is all in the components anyway).

Scale shape: everything reduces to (id, gram) count tables — explode,
aggregate, join on (id, gram), aggregate again. All equi-keyed; per-doc
gram multisets never leave the executor as arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dpe_energy_performance_analysis_etl_spark.text.analysis import ngrams_expr, tokens_expr


def _gram_counts(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    grams = tokens_expr(text_col) if n == 1 else ngrams_expr(text_col, n)
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def ngram_precision(
    cand: DataFrame,
    ref: DataFrame,
    n: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-id modified (clipped) n-gram precision of ``cand`` against
    ``ref``: Σ_g min(cnt_cand(g), cnt_ref(g)) / Σ_g cnt_cand(g).
    Returns (id, pn_num, pn_den, precision) — integers exact,
    precision one guarded division (NULL for an empty candidate)."""
    c = _gram_counts(cand, text_col, id_col, n)
    r = _gram_counts(ref, text_col, id_col, n).withColumnRenamed("cnt", "rcnt")
    j = c.join(r, ["id", "gram"], "left")
    agg = j.groupBy("id").agg(
        F.sum(F.least("cnt", F.coalesce("rcnt", F.lit(0))))
        .cast("bigint")
        .alias("pn_num"),
        F.sum("cnt").cast("bigint").alias("pn_den"),
    )
    return agg.select(
        F.col("id").alias(id_col),
        "pn_num",
        "pn_den",
        F.when(
            F.col("pn_den") > 0,
            F.col("pn_num").cast("double") / F.col("pn_den").cast("double"),
        ).alias("precision"),
    )


def distinct_n(
    df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct-n diversity per document (Li NAACL'16): distinct
    n-grams / total n-grams — the repetitiveness signal used to judge
    generation diversity and to screen degenerate training text.
    Returns (id, n_distinct, n_total, distinct_ratio)."""
    g = _gram_counts(df, text_col, id_col, n)
    agg = g.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum("cnt").cast("bigint").alias("n_total"),
    )
    return agg.select(
        F.col("id").alias(id_col),
        "n_distinct",
        "n_total",
        F.when(
            F.col("n_total") > 0,
            F.col("n_distinct").cast("double") / F.col("n_total").cast("double"),
        ).alias("distinct_ratio"),
    )


def simpson_concentration(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """Simpson concentration per group: Σ n_i(n_i−1) / (N(N−1)) over
    item counts — the probability two draws without replacement share
    a value (1 − Simpson diversity). EXACT rational: both sums are
    BIGINT, one final division; unlike Shannon entropy it needs no
    log, which is why it is this repo's diversity metric of record
    (the mixing/l-diversity families' cross-engine-safe companion).
    Returns (group, n_items, n_values, simpson)."""
    counts = df.groupBy(F.col(group_col).alias("grp"), F.col(item_col).alias("val")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    agg = counts.groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n_items"),
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("__pairs"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_items",
        "n_values",
        F.when(
            F.col("n_items") > 1,
            F.col("__pairs").cast("double")
            / (F.col("n_items") * (F.col("n_items") - 1)).cast("double"),
        ).alias("simpson"),
    )
