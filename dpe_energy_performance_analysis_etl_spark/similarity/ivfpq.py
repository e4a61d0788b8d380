"""IVFPQ: coarse inverted-file quantizer + product quantization on
RESIDUALS (Jégou et al. TPAMI 2011 §IV; FAISS's `IVFx,PQy` — the
workhorse layout for billion-vector ANN).

Why the composition matters at 100 TB: IVF alone still stores raw
vectors (memory-bound); PQ alone scans every code (compute-bound).
Together: the probe set shrinks the scan to nprobe/ncoarse of the
corpus AND each scanned item is an m-byte code — the residual
encoding keeps codes accurate because residuals live in a much
smaller ball than raw vectors (the coarse centroid absorbs the
coarse-grained variance).

Built BY COMPOSING the PQ building blocks (``pq.pq_encode``,
``pq.pq_query_luts``, ``pq.exact_refine``) rather than re-deriving
them: the encode/LUT/refine logic — including the positional
code->LUT indexing contract — has exactly one definition. The only
IVFPQ-specific plumbing here is the coarse assignment, the residual
computation, and threading the cluster key through the ADC join.

Determinism: both codebooks are seeded from the corpus (same pattern
as seeded_ivf_topk / seeded_pq_topk), every argmin carries an id
tie-break, and ADC terms fold in subspace order. The composition is
registry-listed rows-only — each building block has its own
bit-exact SQL oracle twin, and this operator is pinned by recall
tests against exact L2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dpe_energy_performance_analysis_etl_spark.similarity.pq import (
    _sq_dist,
    dense_reindex,
    exact_refine,
    explode_subspaces,
    pq_encode,
    pq_query_luts,
    sum_ordered,
)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    ncoarse: int = 8,
    nprobe: int = 2,
    m: int = 8,
    dsub: int = 8,
    ksub: int = 16,
    rerank: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Seeded IVFPQ ANN top-k with exact refinement.

    Plan shape: coarse centroids (ncoarse rows) and the PQ codebook
    (m x ksub rows) broadcast everywhere; the corpus is touched twice
    (coarse assign + residual encode, one cached intermediate) and
    thereafter only (id, cluster, codes) streams; per query, scoring
    joins the probed clusters' code lists on the cluster key —
    candidates are nprobe/ncoarse of the corpus, never all of it.
    Exact re-rank fetches raw vectors for |queries| * k * rerank rows.
    """
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    coarse = corpus.filter(F.col(id_col) < ncoarse).select(
        F.col(id_col).alias("cluster"), dvec.alias("centroid")
    )
    c = corpus.select(F.col(id_col).alias("vid"), dvec.alias("v"))
    # coarse assignment + residual, one pass; cached — feeds the PQ
    # codebook seed, the encode pass, and the cluster re-join
    assigned = (
        c.join(F.broadcast(coarse))
        .groupBy("vid")
        .agg(
            F.min_by(
                F.struct("cluster", "centroid"),
                F.struct(_sq_dist(F.col("v"), F.col("centroid")).alias("d"), F.col("cluster").alias("c")),
            ).alias("cc"),
            F.first("v").alias("v"),
        )
        .select(
            "vid",
            F.col("cc.cluster").alias("cluster"),
            F.zip_with("v", F.col("cc.centroid"), lambda a, b: a - b).alias("resid"),
        )
        .cache()
    )
    # PQ codebook seeded from the residuals of the first ksub vectors
    # (same seeded shape as pq.seeded_pq_centroids, over residuals);
    # densely re-indexed — ADC indexes LUT slots positionally, so a
    # non-contiguous corpus id space must not leave cid gaps
    cents = dense_reindex(
        explode_subspaces(
            assigned.filter(F.col("vid") < ksub), m, dsub, vec_col="resid", id_col="vid"
        ).select(F.col("vid").alias("cid"), "s", F.col("sv").alias("cv"))
    ).cache()
    codes = pq_encode(assigned, cents, m, dsub, vec_col="resid", id_col="vid").join(
        assigned.select(F.col("vid").alias("neighbor_id"), "cluster"), "neighbor_id"
    )
    # query probes; per probed (query, cluster): LUT over the QUERY
    # RESIDUAL vs the shared codebook — a synthetic id threads the
    # (query, cluster) pair through the generic LUT builder
    q = queries.select(F.col(id_col).alias("query_id"), dvec.alias("qv"))
    wq = Window.partitionBy("query_id").orderBy("qdist", "cluster")
    probed = (
        q.join(F.broadcast(coarse))
        .withColumn("qdist", _sq_dist(F.col("qv"), F.col("centroid")))
        .withColumn("qr", F.row_number().over(wq))
        .filter(F.col("qr") <= nprobe)
        .select(
            (F.col("query_id") * ncoarse + F.col("cluster")).alias("qc_id"),
            F.zip_with("qv", "centroid", lambda a, b: a - b).alias("qresid"),
        )
    )
    luts = pq_query_luts(probed, cents, m, dsub, vec_col="qresid", id_col="qc_id").select(
        F.expr(f"query_id div {ncoarse}").alias("query_id"),
        (F.col("query_id") % ncoarse).alias("cluster"),
        "luts",
    )
    terms = F.zip_with(
        F.col("codes"), F.col("luts"), lambda code, lut: F.element_at(lut, code.cast("int") + 1)
    )
    scored = (
        codes.join(F.broadcast(luts), "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adist", sum_ordered(terms))
        .select("query_id", "neighbor_id", "adist")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist"), F.col("neighbor_id"))
    if rerank <= 1:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "adist", "rank")
        )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k * rerank)
        .select("query_id", "neighbor_id")
    )
    return exact_refine(shortlist, queries, corpus, k, vec_col, id_col)
