"""Word-shingle construction and exact n-gram Jaccard similarity.

``shingle_pairs_jaccard`` is the EXACT baseline (and the oracle-checked
one): explode distinct shingles, self-join on shingle equality,
count intersections, Jaccard from per-doc set sizes. Cost is
O(sum of postings^2 per shingle) — fine when shingles are selective
(word 3-grams are), quadratic-blowup-prone when they aren't; the
MinHash LSH path (``minhash.py``) is the approximate scale-out that
bounds candidate generation regardless of skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dpe_energy_performance_analysis_etl_spark.operators.scaling import scan_fanout

from dpe_energy_performance_analysis_etl_spark.text import tokens_expr


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the lowercased text."""
    toks = tokens_expr(col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)])
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_pairs_jaccard(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    fanout: int | None = None,
    hash_shingle_key: bool = True,
    max_df: int | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold.

    Plan: posting list (id, shingle) → self-equi-join on shingle
    (this is the only shuffle; Catalyst hashes on the shingle) →
    per-pair intersection counts → join tiny per-doc size table →
    filter. Returns (doc_a, doc_b, n_common, jaccard), doc_a < doc_b.

    ``hash_shingle_key`` (default) replaces the shingle string with
    its xxhash64 before the self-join: the shuffle moves 8-byte longs
    instead of ~n-word strings (~3× fewer shuffle bytes, cheaper key
    compare). Exact up to 64-bit collisions — negligible below ~10⁹
    distinct shingles; pass False for strict string equality.

    ``max_df`` — the skew guard. The posting join's cost is
    Σ postings² per shingle: ONE boilerplate shingle shared by p
    documents puts p² rows through a single reducer (p=10⁶ →
    quadratic death at scale). With ``max_df`` set, shingles whose
    document frequency exceeds the cap generate NO candidates;
    candidate pairs come from the capped postings and ``n_common`` /
    ``jaccard`` are then computed EXACTLY on the full shingle sets
    (array_intersect verify, the setsim.py pattern). Every reducer is
    bounded by max_df² rows per shingle regardless of corpus skew.
    The only approximation: a pair whose ENTIRE overlap consists of
    >max_df boilerplate shingles is missed — at any sane cap such
    pairs share only corpus-wide boilerplate, which is exactly what
    near-dup detection should not fire on (same rationale as
    paragraph-dedup's boilerplate strip). Leave None for the fully
    exact join on corpora without hot shingles; the regime choice vs
    the prefix-filter join (setsim.py) is measured in NOTES.md.
    """
    if fanout is None:
        fanout = df.sparkSession.sparkContext.defaultParallelism
    df = scan_fanout(df, fanout)
    if max_df is not None:
        sets = df.select(
            F.col(id_col).alias("doc"), word_shingles(text_col, n).alias("shset")
        ).where(F.size("shset") > 0)
        if hash_shingle_key:
            sets = sets.select(
                "doc", F.transform("shset", lambda s: F.xxhash64(s)).alias("shset")
            )
        # cached: feeds candidate postings AND both verify sides
        sets = sets.cache()
        post = sets.select("doc", F.explode("shset").alias("shingle"))
        dfreq = post.groupBy("shingle").agg(F.count(F.lit(1)).alias("dfreq"))
        capped = post.join(dfreq.where(F.col("dfreq") <= max_df), "shingle")
        cand = (
            capped.alias("a")
            .join(capped.alias("b"), "shingle")
            .where(F.col("a.doc") < F.col("b.doc"))
            .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .distinct()
        )
        return (
            cand.join(sets.select(F.col("doc").alias("doc_a"), F.col("shset").alias("set_a")), "doc_a")
            .join(sets.select(F.col("doc").alias("doc_b"), F.col("shset").alias("set_b")), "doc_b")
            .withColumn("n_common", F.size(F.array_intersect("set_a", "set_b")))
            .withColumn(
                "jaccard",
                F.col("n_common").cast("double")
                / (F.size("set_a") + F.size("set_b") - F.col("n_common")).cast("double"),
            )
            .where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "n_common", "jaccard")
        )
    # cache the posting list: the self-join consumes it twice, and
    # without materialization Spark recomputes the shingle explosion
    # for both sides (at cluster scale: checkpoint to storage instead)
    sh = df.select(
        F.col(id_col).alias("doc"), F.explode(word_shingles(text_col, n)).alias("shingle")
    )
    if hash_shingle_key:
        sh = sh.select("doc", F.xxhash64("shingle").alias("shingle"))
    sh = sh.cache()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, on="shingle")
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    # sizes is one row per DOCUMENT — it grows with the corpus, so
    # both attaches stream through shuffle joins (VERDICT r9
    # broadcast-class audit); AQE promotes when measurably small
    out = (
        common.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
    return out
