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

Determinism: both codebooks are seeded from the corpus (same pattern
as seeded_ivf_topk / seeded_pq_topk), every argmin carries an id
tie-break, and ADC terms fold in subspace order (dot-with-ones).
The composition is registry-listed rows-only — its two building
blocks each have bit-exact SQL oracle twins, and this operator is
pinned by recall tests against exact L2 (the same split as the
trained IVF/PQ paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dpe_energy_performance_analysis_etl_spark.dedup.embedding import dot_double
from dpe_energy_performance_analysis_etl_spark.similarity.pq import (
    _sq_dist,
    explode_subspaces,
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
    (coarse assign + residual encode, one plan) and thereafter only
    (id, cluster, codes) streams; per query, scoring joins the probed
    clusters' code lists on the cluster key — candidates are
    nprobe/ncoarse of the corpus, never all of it. Exact re-rank
    fetches raw vectors for |queries| * k * rerank rows only.
    """
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    coarse = corpus.filter(F.col(id_col) < ncoarse).select(
        F.col(id_col).alias("cluster"), dvec.alias("centroid")
    )
    c = corpus.select(F.col(id_col).alias("vid"), dvec.alias("v"))
    # coarse assignment + residual, one pass
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
    )
    assigned = assigned.cache()  # feeds codebook seed + encode
    # PQ codebook over the residuals of the first ksub vectors
    cents = explode_subspaces(
        assigned.filter(F.col("vid") < ksub).select(F.col("vid"), F.col("resid")),
        m, dsub, vec_col="resid", id_col="vid",
    ).select(F.col("vid").alias("cid"), "s", F.col("sv").alias("cv"))
    cents = cents.cache()
    subs = explode_subspaces(assigned.select("vid", "resid"), m, dsub, "resid", "vid")
    codes = (
        subs.join(F.broadcast(cents), "s")
        .groupBy("vid", "s")
        .agg(
            F.min_by("cid", F.struct(_sq_dist(F.col("sv"), F.col("cv")).alias("d"), F.col("cid").alias("c"))).alias("code")
        )
        .groupBy("vid")
        .agg(F.array_sort(F.collect_list(F.struct("s", "code"))).alias("sc"))
        .join(assigned.select("vid", "cluster"), "vid")
        .select(
            F.col("vid").alias("neighbor_id"),
            "cluster",
            F.transform("sc", lambda x: x.getField("code")).alias("codes"),
        )
    )
    # query probes + per-(query, cluster) residual LUTs
    q = queries.select(F.col(id_col).alias("query_id"), dvec.alias("qv"))
    wq = Window.partitionBy("query_id").orderBy("qdist", "cluster")
    probed = (
        q.join(F.broadcast(coarse))
        .withColumn("qdist", _sq_dist(F.col("qv"), F.col("centroid")))
        .withColumn("qr", F.row_number().over(wq))
        .filter(F.col("qr") <= nprobe)
        .select(
            "query_id",
            "cluster",
            F.zip_with("qv", "centroid", lambda a, b: a - b).alias("qresid"),
        )
    )
    qsubs = explode_subspaces(
        probed.select(
            # synthetic id = query * ncoarse + cluster keeps (query, cluster) pairs distinct
            (F.col("query_id") * ncoarse + F.col("cluster")).alias("vid"), F.col("qresid")
        ),
        m, dsub, "qresid", "vid",
    )
    luts = (
        qsubs.join(F.broadcast(cents), "s")
        .withColumn("d2", _sq_dist(F.col("sv"), F.col("cv")))
        .groupBy("vid", "s")
        .agg(F.array_sort(F.collect_list(F.struct("cid", "d2"))).alias("cd"))
        .select("vid", "s", F.transform("cd", lambda x: x.getField("d2")).alias("lut"))
        .groupBy("vid")
        .agg(F.array_sort(F.collect_list(F.struct("s", "lut"))).alias("sl"))
        .select(
            F.expr(f"vid div {ncoarse}").alias("query_id"),
            (F.col("vid") % ncoarse).alias("cluster"),
            F.transform("sl", lambda x: x.getField("lut")).alias("luts"),
        )
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
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k * rerank)
        .select("query_id", "neighbor_id")
    )
    if rerank <= 1:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "adist", "rank")
        )
    refined = (
        shortlist.join(F.broadcast(q), "query_id")
        .join(c.withColumnRenamed("vid", "neighbor_id").withColumnRenamed("v", "cv2"), "neighbor_id")
        .withColumn("dist", _sq_dist(F.col("qv"), F.col("cv2")))
        .select("query_id", "neighbor_id", "dist")
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("dist"), F.col("neighbor_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dist", "rank")
    )
