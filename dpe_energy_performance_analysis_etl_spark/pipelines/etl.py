"""Composite ETL flow — rebuild of ``dpe_enedis_ademe_etl_flow``
(``etl_app.py:71-82``): extract → transform → load, passing the silver
frame in memory, all stamped with one batch_id.

Scheduling: the reference deploys this on a weekly Prefect cron
(``etl_app.py:84-95``). The Spark-native equivalent is either an
external scheduler invoking ``run_etl`` or the incremental streaming
surface (``streaming/``) with ``Trigger.AvailableNow`` — same
semantics plus exactly-once checkpointing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dpe_energy_performance_analysis_etl_spark.config import EngineConfig
from dpe_energy_performance_analysis_etl_spark.pipelines.extract import DataExtractor
from dpe_energy_performance_analysis_etl_spark.pipelines.load import DataLoader
from dpe_energy_performance_analysis_etl_spark.pipelines.transform import DataTransformer


def run_etl(
    spark: SparkSession,
    from_input: str,
    fetch_ban: Callable[[str], list[dict]],
    fetch_ademe: Callable[[str], list[dict]],
    config: EngineConfig | None = None,
    code_departement: str | None = None,
    rows: int = -1,
    read_existing_keys=None,
    append=None,
) -> dict[str, int]:
    """Run the full pipeline; returns per-table appended row counts."""
    config = config or EngineConfig()
    extractor = DataExtractor(spark, config, fetch_ban=fetch_ban, fetch_ademe=fetch_ademe)
    silver: DataFrame = extractor.extract(from_input, code_departement, rows)
    transformer = DataTransformer(spark, silver, config)
    entities = transformer.run()
    loader = DataLoader(spark, config, read_existing_keys=read_existing_keys, append=append)
    return loader.run(entities)
