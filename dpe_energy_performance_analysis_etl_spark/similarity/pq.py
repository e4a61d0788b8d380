"""Product Quantization (PQ) for embedding compression + ANN scoring
(Jégou, Douze, Schmid TPAMI 2011 — the FAISS `PQ` building block).

Why this exists at 100 TB: a 64-dim float corpus is 256 bytes/vector;
PQ with m=8 subspaces and 16 centroids each stores ONE byte-scale code
per subspace — 32x compression — and asymmetric-distance (ADC) scoring
never touches the raw corpus vectors again. The table that streams
through the scorer is (id, 8 small ints); the full-precision side
lives only in the (tiny, broadcast) query lookup tables. Compose with
the IVF coarse quantizer (`ivf.py`) for the standard IVFPQ layout.

Determinism: every step is argmin over exact expression-shaped doubles
with id tie-breaks, so encoding and scoring are reproducible across
engines — ``seeded_pq_topk`` (centroids = subvectors of the first
``ksub`` corpus vectors, no Lloyd iterations) replays bit-exactly in
portable SQL and is the oracle-checked twin of the trained path, the
same pattern as ``ivf.seeded_ivf_topk``.

Summation order: the ADC distance folds the per-subspace terms in
subspace order via a dot-with-ones (`sum_ordered`) — sequential
left-to-right adds, matching DuckDB's ``list_dot_product`` fold, so
approximate distances hash-match the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from dpe_energy_performance_analysis_etl_spark.dedup.embedding import dot_double


def _sq_dist(a: Column, b: Column) -> Column:
    """||a-b||^2 as dot(diff, diff) — the proven cross-engine shape."""
    diff = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return dot_double(diff, diff)


def sum_ordered(terms: Column) -> Column:
    """Sequential left-to-right sum of a double array, phrased as
    dot(terms, ones) so it matches DuckDB's list_dot_product fold
    bit-for-bit (x*1.0 is exact for every x)."""
    return dot_double(terms, F.transform(terms, lambda _: F.lit(1.0)))


def explode_subspaces(
    df: DataFrame, m: int, dsub: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, s, sv): each vector split into m contiguous dsub-dim
    subvectors (cast double). Pure projection, zero shuffle."""
    subs = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.transform(
                    F.slice(F.col(vec_col), s * dsub + 1, dsub),
                    lambda x: x.cast("double"),
                ).alias("sv"),
            )
            for s in range(m)
        ]
    )
    return df.select(F.col(id_col).alias("vid"), F.explode(subs).alias("sub")).select(
        "vid", F.col("sub.s").alias("s"), F.col("sub.sv").alias("sv")
    )


def dense_reindex(cents: DataFrame) -> DataFrame:
    """Re-index a (cid, s, cv) codebook densely per subspace: ADC
    looks LUT slots up POSITIONALLY in the cid-sorted arrays, so any
    gap in the cid sequence (non-contiguous corpus ids at seed time,
    a cluster emptied by a Lloyd round) silently misaligns code->LUT
    lookups or crashes element_at under ANSI. A cheap window over the
    <= m*ksub-row table; identity when cids are already 0..k-1."""
    dense = Window.partitionBy("s").orderBy("cid")
    return cents.select((F.row_number().over(dense) - 1).alias("cid"), "s", "cv")


def seeded_pq_centroids(
    corpus: DataFrame, m: int, dsub: int, ksub: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Deterministic codebook: subspace s's centroids are the s-th
    subvectors of the corpus vectors with id < ``ksub``, re-indexed
    densely (identity for the usual 0..ksub-1-contiguous corpus; for
    sparse ids the codebook is smaller but ADC stays aligned).
    (cid, s, cv)."""
    seeds = corpus.filter(F.col(id_col) < ksub)
    cents = explode_subspaces(seeds, m, dsub, vec_col, id_col).select(
        F.col("vid").alias("cid"), "s", F.col("sv").alias("cv")
    )
    return dense_reindex(cents)


def _codebook_row(cents: DataFrame) -> DataFrame:
    """Fold the (cid, s, cv) codebook into ONE row: sl = array over
    subspaces (sorted by s) of (s, cl) with cl the cid-sorted
    centroid list. m·ksub rows — trivially broadcastable."""
    return (
        cents.groupBy("s")
        .agg(F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("cl"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("s", "cl"))).alias("sl"))
    )


def _subvectors(m: int, dsub: int, vec_col: str) -> Column:
    """array over s=0..m-1 of the s-th dsub-dim double subvector —
    positionally aligned with the codebook's s-sorted sl array."""
    return F.array(
        *[
            F.transform(
                F.slice(F.col(vec_col), s * dsub + 1, dsub),
                lambda x: x.cast("double"),
            )
            for s in range(m)
        ]
    )


def pq_encode(
    corpus: DataFrame, cents: DataFrame, m: int, dsub: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, codes array<int>): per-subspace argmin-distance centroid
    ids, assembled in subspace order. ROW-LOCAL (r12): the codebook
    folds to a one-row broadcast array and every vector computes its
    m argmins inside a single projection — the previous broadcast-
    join + groupBy(vid, s) + groupBy(vid) form shuffled m·ksub scored
    rows per vector twice for a per-row reduction (guide §2.3). Tie
    semantics identical: array_min over (d, cid) structs = the old
    min_by (d, cid) pick."""
    cb = _codebook_row(cents)
    codes = F.zip_with(
        _subvectors(m, dsub, vec_col),
        F.col("sl"),
        lambda sv, e: F.array_min(
            F.transform(
                e["cl"],
                lambda c: F.struct(
                    _sq_dist(sv, c["cv"]).alias("d"), c["cid"].alias("c")
                ),
            )
        )["c"],
    )
    return corpus.crossJoin(F.broadcast(cb)).select(
        F.col(id_col).alias("neighbor_id"), codes.alias("codes")
    )


def pq_query_luts(
    queries: DataFrame, cents: DataFrame, m: int, dsub: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(query_id, luts array<array<double>>): luts[s][cid+1] =
    ||q_s - cent_{s,cid}||^2 — the full-precision side of ADC, one
    m x ksub table per query. ROW-LOCAL like pq_encode (r12): each
    query builds its LUT in one projection over the broadcast
    codebook row; cl is cid-sorted, so the transform output is
    positionally aligned for ADC's element_at lookups exactly as the
    old array_sort(collect_list(struct(cid, d2))) was."""
    cb = _codebook_row(cents)
    luts = F.zip_with(
        _subvectors(m, dsub, vec_col),
        F.col("sl"),
        lambda sv, e: F.transform(e["cl"], lambda c: _sq_dist(sv, c["cv"])),
    )
    return queries.crossJoin(F.broadcast(cb)).select(
        F.col(id_col).alias("query_id"), luts.alias("luts")
    )


def adc_topk(codes: DataFrame, luts: DataFrame, k: int = 5) -> DataFrame:
    """Asymmetric-distance top-k: the coded corpus streams past the
    broadcast query LUTs; per pair, distance = ordered fold of
    luts[s][code_s] over subspaces. No raw vectors touched."""
    terms = F.zip_with(
        F.col("codes"), F.col("luts"), lambda code, lut: F.element_at(lut, code.cast("int") + 1)
    )
    scored = (
        codes.join(F.broadcast(luts), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adist", sum_ordered(terms))
        .select("query_id", "neighbor_id", "adist")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adist", "rank")
    )


def seeded_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    dsub: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Oracle-checkable PQ/ADC pipeline with the seeded codebook."""
    cents = seeded_pq_centroids(corpus, m, dsub, ksub, vec_col, id_col)
    cents = cents.cache()  # consumed by encode AND query LUTs
    codes = pq_encode(corpus, cents, m, dsub, vec_col, id_col)
    luts = pq_query_luts(queries, cents, m, dsub, vec_col, id_col)
    return adc_topk(codes, luts, k)


def train_pq_centroids(
    corpus: DataFrame,
    m: int = 8,
    dsub: int = 8,
    ksub: int = 16,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd-refined codebook: seeded init, then per-subspace k-means
    rounds (assign via broadcast argmin, re-center via mean). Float
    means are engine-specific, so the trained path is covered by
    recall tests against brute force rather than the SQL oracle —
    same split as ivf.train_ivf_centroids.

    Clusters that end a round EMPTY disappear from the codebook, so
    cids can come out non-contiguous — and downstream ADC looks codes
    up POSITIONALLY in the cid-sorted LUT arrays. The returned
    codebook therefore re-indexes cids densely per subspace (a cheap
    window over the <= m*ksub-row table); without it, an empty mid-
    range cluster crashes element_at under ANSI or silently reads the
    wrong LUT slot."""
    cents = seeded_pq_centroids(corpus, m, dsub, ksub, vec_col, id_col)
    subs = explode_subspaces(corpus, m, dsub, vec_col, id_col)
    for _ in range(iterations):
        assigned = (
            subs.join(F.broadcast(cents), "s")
            .groupBy("vid", "s")
            .agg(
                F.min_by(
                    "cid",
                    F.struct(_sq_dist(F.col("sv"), F.col("cv")).alias("d"), F.col("cid").alias("c")),
                ).alias("cid"),
                F.first("sv").alias("sv"),
            )
        )
        dim_idx = F.sequence(F.lit(0), F.lit(dsub - 1))
        cents = (
            assigned.groupBy("s", "cid")
            .agg(
                F.array_agg(F.col("sv")).alias("members"),
            )
            .select(
                F.col("cid"),
                F.col("s"),
                F.transform(
                    dim_idx,
                    lambda d: F.aggregate(
                        F.col("members"), F.lit(0.0), lambda acc, v: acc + F.element_at(v, d + 1)
                    )
                    / F.size("members"),
                ).alias("cv"),
            )
        )
    return dense_reindex(cents)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    dsub: int = 8,
    ksub: int = 16,
    iterations: int = 2,
    rerank: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Trained-codebook PQ top-k with exact refinement (the
    production layout, FAISS's IndexRefine): ADC shortlists
    ``k * rerank`` candidates per query from the coded corpus, then
    exact L2 re-ranks ONLY the shortlist — raw vectors are fetched
    for |queries| * k * rerank rows, not the corpus. ``rerank`` trades
    one bounded exact pass for the ADC ranking noise (dominant on
    near-equidistant high-dim data, where quantization error rivals
    neighbor-distance gaps). Set ``rerank=1`` for pure ADC."""
    cents = train_pq_centroids(corpus, m, dsub, ksub, iterations, vec_col, id_col).cache()
    codes = pq_encode(corpus, cents, m, dsub, vec_col, id_col)
    luts = pq_query_luts(queries, cents, m, dsub, vec_col, id_col)
    if rerank <= 1:
        return adc_topk(codes, luts, k)
    shortlist = adc_topk(codes, luts, k * rerank).select("query_id", "neighbor_id")
    return exact_refine(shortlist, queries, corpus, k, vec_col, id_col)


def exact_refine(
    shortlist: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact-L2 re-rank of an ANN shortlist (FAISS IndexRefine): raw
    vectors are fetched only for the |queries| x shortlist rows.
    Shared by the PQ and IVFPQ paths — one definition of the refine
    join, distance shape, and (dist, neighbor_id) tie-break."""
    qvec = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    )
    refined = (
        shortlist.join(F.broadcast(qvec), "query_id")
        .join(cvec, "neighbor_id")
        .withColumn("dist", _sq_dist(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "dist")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist"), F.col("neighbor_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dist", "rank")
    )
