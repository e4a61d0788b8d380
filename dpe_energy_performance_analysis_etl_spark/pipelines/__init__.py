"""Pipeline classes mirroring the reference's public API surface
(``pipelines/__init__.py:9-21`` re-exports DataEnedisAdemeETL /
Extractor / Transformer / Loader)."""

from dpe_energy_performance_analysis_etl_spark.pipelines.extract import DataExtractor
from dpe_energy_performance_analysis_etl_spark.pipelines.transform import DataTransformer
from dpe_energy_performance_analysis_etl_spark.pipelines.load import DataLoader
from dpe_energy_performance_analysis_etl_spark.pipelines.etl import run_etl

__all__ = ["DataExtractor", "DataTransformer", "DataLoader", "run_etl"]
