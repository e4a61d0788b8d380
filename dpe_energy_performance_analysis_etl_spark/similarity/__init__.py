from dpe_energy_performance_analysis_etl_spark.similarity.ann import (
    brute_force_topk,
    hyperplane_lsh_buckets,
    lsh_topk,
)

__all__ = ["brute_force_topk", "hyperplane_lsh_buckets", "lsh_topk"]
