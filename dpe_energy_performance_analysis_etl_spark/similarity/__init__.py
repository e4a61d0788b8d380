from dpe_energy_performance_analysis_etl_spark.similarity.ann import (
    brute_force_topk,
    hyperplane_lsh_buckets,
    lsh_topk,
)
from dpe_energy_performance_analysis_etl_spark.similarity.ivf import train_ivf_centroids, ivf_topk, seeded_ivf_topk
from dpe_energy_performance_analysis_etl_spark.similarity.projection import project_embeddings

__all__ = [
    "brute_force_topk",
    "hyperplane_lsh_buckets",
    "lsh_topk",
    "train_ivf_centroids",
    "ivf_topk",
    "seeded_ivf_topk",
    "project_embeddings",
]
