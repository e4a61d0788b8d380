"""Load pipeline — Spark rebuild of ``DataEnedisAdemeLoader.run``
(``load.py:178-212``): idempotent append of the six gold entity tables
into a relational sink, in FK-safe order.

Per table (``save_one_table``, ``load.py:85-176``): PK cast to string
→ read EXISTING KEY COLUMNS ONLY from the sink (the reference pulled
the whole table into pandas, ``load.py:127-131`` — at scale that's the
difference between reading a key index and reading terabytes) →
left_anti join J3/J4 → skip-if-empty gate → append S12.

The sink is injected as (read_existing_keys, append) callables;
production wires ``sources.read_jdbc_table`` / ``append_jdbc_table``,
tests wire an in-memory dict of DataFrames. No live database needed
for correctness coverage.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from dpe_energy_performance_analysis_etl_spark.config import EngineConfig
from dpe_energy_performance_analysis_etl_spark.operators import anti_join_new_rows
from dpe_energy_performance_analysis_etl_spark.pipelines.transform import ENTITY_PKS, LOAD_ORDER
from dpe_energy_performance_analysis_etl_spark.sources import append_jdbc_table, read_jdbc_table
from dpe_energy_performance_analysis_etl_spark.utils import log_run


class DataLoader:
    def __init__(
        self,
        spark: SparkSession,
        config: EngineConfig | None = None,
        read_existing_keys: Callable[[str, list[str]], DataFrame | None] | None = None,
        append: Callable[[DataFrame, str], None] | None = None,
        strategy: str = "append",
        upsert: Callable[[DataFrame, str, list[str]], None] | None = None,
    ):
        """``strategy="append"`` reproduces the reference exactly:
        read existing keys, anti-join, append the complement
        (existing rows are never modified). ``strategy="upsert"``
        uses the dialect layer's staging-table MERGE instead — one
        server round trip, no key read, and changed rows UPDATE in
        place (requires a PK on the target for Postgres)."""
        if strategy not in ("append", "upsert"):
            raise ValueError(f"unknown load strategy: {strategy}")
        self.spark = spark
        self.config = config or EngineConfig()
        self.strategy = strategy
        self._read_existing = read_existing_keys or self._jdbc_read_keys
        self._append = append or self._jdbc_append
        self._upsert = upsert or self._jdbc_upsert
        self.loaded_counts: dict[str, int] = {}

    # ------------------------------------------------- default JDBC sink
    def _jdbc_read_keys(self, table: str, key_cols: list[str]) -> DataFrame | None:
        cfg = self.config
        assert cfg.jdbc_url, "ENGINE_JDBC_URL not configured"
        # explicit metadata probe: a transient connectivity failure
        # must raise (run retries), not read as "table absent" — that
        # would skip the anti-join and append duplicates
        from dpe_energy_performance_analysis_etl_spark.sources import jdbc_table_exists

        if not jdbc_table_exists(self.spark, cfg.jdbc_url, table, cfg.jdbc_properties):
            return None  # table absent yet → everything is new
        return read_jdbc_table(
            self.spark, cfg.jdbc_url, table, cfg.jdbc_properties, columns=key_cols
        )

    def _jdbc_append(self, df: DataFrame, table: str) -> None:
        cfg = self.config
        assert cfg.jdbc_url, "ENGINE_JDBC_URL not configured"
        append_jdbc_table(df, cfg.jdbc_url, table, cfg.jdbc_properties)

    def _jdbc_upsert(self, df: DataFrame, table: str, pk: list[str]) -> None:
        from dpe_energy_performance_analysis_etl_spark.sources import upsert_jdbc_table

        cfg = self.config
        assert cfg.jdbc_url, "ENGINE_JDBC_URL not configured"
        upsert_jdbc_table(df, cfg.jdbc_url, table, pk, cfg.jdbc_properties)

    # ------------------------------------------------- per-table
    @log_run()
    def save_one_table(self, df: DataFrame, table: str) -> int:
        """Idempotent append (``load.py:85-176``). Returns rows written."""
        pk = ENTITY_PKS[table]
        for k in pk:
            df = df.withColumn(k, F.col(k).cast("string"))  # load.py:110-120
        if self.strategy == "upsert":
            df = df.dropDuplicates(pk)
            n = df.count()
            if n == 0:
                self.loaded_counts[table] = 0
                return 0
            self._upsert(df, table, pk)
            self.loaded_counts[table] = n
            return n
        existing = self._read_existing(table, pk)
        if existing is not None:
            df = anti_join_new_rows(df, existing, pk, broadcast_existing=True)
        # deterministic keep-first on PK within the batch (load.py:188-210)
        df = df.dropDuplicates(pk)
        n = df.count()
        if n == 0:
            self.loaded_counts[table] = 0
            return 0  # skip-if-empty gate, load.py:163-165
        self._append(df, table)
        self.loaded_counts[table] = n
        return n

    # ------------------------------------------------- flow
    def run(self, entities: dict[str, DataFrame] | None = None) -> dict[str, int]:
        """Load all entities in FK-safe order (``load.py:181-212``);
        reads the gold zone when no frames are passed."""
        if entities is None:
            entities = {
                name: self.spark.read.parquet(f"{self.config.zones.gold}/{name}")
                for name in LOAD_ORDER
            }
        for name in LOAD_ORDER:
            if name in entities:
                self.save_one_table(entities[name], name)
        return self.loaded_counts
