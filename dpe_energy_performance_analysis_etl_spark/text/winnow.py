"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
SIGMOD 2003; the MOSS algorithm).

Where MinHash answers "how similar are these documents overall" and
the substring-span operator answers "which exact runs repeat",
winnowing is the guaranteed LOCAL fingerprinting scheme: from every
window of ``window`` consecutive k-gram hashes it keeps the rightmost
minimum, so any shared substring of at least ``window + k - 1`` tokens
contributes at least one IDENTICAL fingerprint to both documents —
a detection guarantee at a fixed ~2/(window+1) sampling density,
independent of document length.

Selection is window-frame comparisons only — no per-window explode:
position j is kept iff it is the rightmost minimum of SOME full
window containing it, i.e. for some offset d in [0, window-1] the
window [j-d, j-d+window-1] lies inside the document, all d hashes
before j are >= h_j (ties break rightward) and all window-1-d hashes
after j inside that window are > h_j. Each offset is two fixed-frame
(count, min) pairs over the same per-document ordering, so the whole
selection is 2*window window expressions sharing one sort. (The
tempting single-frame shortcut — "h_j below the min of the next w-1"
— only captures windows STARTING at j and silently drops the tail
selections of any descending hash run; the offset union is the exact
rightmost-min set.)

Scale shape: fingerprints are an ~2/(window+1) sample of positions,
so the match join moves a fraction of the posting volume the full
k-gram join would; candidates stay equi-keyed on the fingerprint
hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dpe_energy_performance_analysis_etl_spark.dedup.minhash import rolling_shingle_hash
from dpe_energy_performance_analysis_etl_spark.text.substring import position_grams


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    window: int = 4,
    portable: bool = True,
) -> DataFrame:
    """(doc_id, pos, fingerprint): the winnowed k-gram hashes.
    ``portable`` uses the polynomial rolling hash (SQL-replayable,
    the minhash-twin discipline); False uses xxhash64 (the fast
    path, same selection logic)."""
    g = position_grams(df, text_col, id_col, k)
    h = rolling_shingle_hash(F.col("gram")) if portable else F.xxhash64("gram")
    hashed = g.select("doc_id", "pos", h.alias("h"))
    base = Window.partitionBy("doc_id").orderBy("pos")
    selected = F.lit(False)
    for d in range(window):
        n_after = window - 1 - d
        cond = F.lit(True)
        if d > 0:
            wprev = base.rowsBetween(-d, -1)
            cond = cond & (F.count("h").over(wprev) == d) & (
                F.min("h").over(wprev) >= F.col("h")
            )
        if n_after > 0:
            wnext = base.rowsBetween(1, n_after)
            cond = cond & (F.count("h").over(wnext) == n_after) & (
                F.col("h") < F.min("h").over(wnext)
            )
        selected = selected | cond
    return (
        hashed.withColumn("__sel", selected)
        .where("__sel")
        .select("doc_id", "pos", F.col("h").alias("fingerprint"))
    )


def winnow_match_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    window: int = 4,
    min_shared: int = 2,
    portable: bool = True,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints
    (doc_a < doc_b, n_shared) — the MOSS candidate report. Equi-join
    on the fingerprint hash over the ~2/(window+1)-sampled posting
    list; the support threshold prunes coincidental single-gram hits
    BEFORE any pair leaves the aggregation."""
    fp = winnowing_fingerprints(df, text_col, id_col, k, window, portable)
    # distinct fingerprint VALUES per doc: repeated selections of the
    # same content hash the same, and match counting is set semantics
    fp = fp.select("doc_id", "fingerprint").distinct().cache()
    pairs = (
        fp.alias("a")
        .join(fp.alias("b"), "fingerprint")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return pairs
