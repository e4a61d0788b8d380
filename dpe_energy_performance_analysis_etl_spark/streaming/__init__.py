from dpe_energy_performance_analysis_etl_spark.streaming.incremental import (
    incremental_append_stream,
    interval_join_streams,
    windowed_event_counts,
    streaming_dedup,
    stream_to_jdbc,
    continuous_projection_stream,
    maintained_agg_stream,
    read_agg_state,
    enrich_stream_static,
    versioned_merge_stream,
    cdc_apply_stream,
    key_bounds,
    pruned_existing_keys,
    bounds_predicate_sql,
)
from dpe_energy_performance_analysis_etl_spark.streaming.stateful import (
    sessionize_stream,
    batch_closed_sessions,
)

__all__ = [
    "incremental_append_stream",
    "interval_join_streams",
    "windowed_event_counts",
    "streaming_dedup",
    "stream_to_jdbc",
    "continuous_projection_stream",
    "maintained_agg_stream",
    "read_agg_state",
    "enrich_stream_static",
    "versioned_merge_stream",
    "cdc_apply_stream",
    "key_bounds",
    "pruned_existing_keys",
    "bounds_predicate_sql",
    "sessionize_stream",
    "batch_closed_sessions",
]
