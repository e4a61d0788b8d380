from dpe_energy_performance_analysis_etl_spark.multimodal.media import (
    MEDIA_SCHEMA,
    binary_metadata,
    decode_image_batch,
    extract_features,
    frame_sample,
    decode_audio_batch,
    audio_features,
    read_media_dir,
)

__all__ = [
    "MEDIA_SCHEMA",
    "binary_metadata",
    "decode_image_batch",
    "extract_features",
    "frame_sample",
    "decode_audio_batch",
    "audio_features",
    "read_media_dir",
]
