"""Structured Streaming surface (SURVEY §2.8).

The reference has no streaming — its closest constructs are weekly
cron batches with batch_id lineage and idempotent anti-join appends
(J3/J4). The Spark-native generalization:

  - ``incremental_append_stream``: a file stream over a landing
    (bronze) directory with ``Trigger.AvailableNow`` — processes
    whatever has arrived, exactly once (checkpointed offsets), runs
    the same anti-join-append semantics per micro-batch via
    ``foreachBatch``, then stops. Scheduled-batch semantics identical
    to the reference's cron flow, plus recovery the reference lacks.
  - ``windowed_event_counts``: event-time tumbling window aggregation
    with a watermark for late data — the streaming twin of the batch
    ``events_tumbling_window`` query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming import StreamingQuery


def incremental_append_stream(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    target_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    available_now: bool = True,
) -> StreamingQuery:
    """Exactly-once idempotent append from a landing directory.

    Every micro-batch: left_anti against the CURRENT target on
    ``key_cols`` (same semantics as ``load.py:133-160``), append the
    complement. Checkpointing makes re-runs no-ops even after crashes
    — strictly stronger than the reference's read-the-whole-table
    idempotence.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def upsert_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.dropDuplicates(key_cols)
        try:
            existing = batch.sparkSession.read.parquet(target_dir).select(*key_cols)
            new_rows = batch.join(existing.dropDuplicates(key_cols), on=key_cols, how="left_anti")
        except Exception:
            new_rows = batch  # first batch: target doesn't exist yet
        new_rows.write.mode("append").parquet(target_dir)

    writer = (
        stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    target_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Tumbling-window counts/sums with late-data watermark, appended
    to parquet once each window closes."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w").start.alias("window_start"), "event_type", "n_events", "total_value")
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    target_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming exact deduplication: first occurrence of each key
    wins, duplicates within the watermark horizon are dropped by the
    engine's dedup state store. The incremental twin of the batch
    ``dedup`` family — state is bounded by (keys seen within the
    watermark), so it runs forever on an unbounded stream."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicates(key_cols)
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
