from dpe_energy_performance_analysis_etl_spark.text.analysis import (
    tokens_expr,
    token_count,
    bpe_ish_token_count,
    quality_metrics,
    language_scores,
    predicted_language,
    normalized_text,
    md5_fingerprint,
    rolling_hash_fingerprint,
    STOPWORDS,
    LANG_MARKERS,
)
from dpe_energy_performance_analysis_etl_spark.text.packing import (
    chunk_documents,
    sequence_pack,
)
from dpe_energy_performance_analysis_etl_spark.text.mixing import (
    temperature_rates,
    temperature_mixture_sample,
    pseudonymize,
)
from dpe_energy_performance_analysis_etl_spark.text.curation import (
    repetition_metrics,
    gopher_repetition_filter,
    heuristic_quality_filter,
    ngram_decontaminate,
    sampling_hash,
    stratified_sample,
    canonical_per_cluster,
    BOILERPLATE_MARKERS,
)

__all__ = [
    "tokens_expr",
    "token_count",
    "bpe_ish_token_count",
    "quality_metrics",
    "language_scores",
    "predicted_language",
    "normalized_text",
    "md5_fingerprint",
    "rolling_hash_fingerprint",
    "STOPWORDS",
    "LANG_MARKERS",
    "repetition_metrics",
    "gopher_repetition_filter",
    "heuristic_quality_filter",
    "ngram_decontaminate",
    "sampling_hash",
    "stratified_sample",
    "canonical_per_cluster",
    "BOILERPLATE_MARKERS",
    "chunk_documents",
    "sequence_pack",
    "temperature_rates",
    "temperature_mixture_sample",
    "pseudonymize",
]
