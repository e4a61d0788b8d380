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
]
