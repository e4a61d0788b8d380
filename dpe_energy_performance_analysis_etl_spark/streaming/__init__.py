from dpe_energy_performance_analysis_etl_spark.streaming.incremental import (
    incremental_append_stream,
    windowed_event_counts,
)

__all__ = ["incremental_append_stream", "windowed_event_counts"]
