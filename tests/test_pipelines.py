"""End-to-end pipeline tests — offline (injected fetch fakes and an
in-memory sink; the reference's equivalent tests hit live APIs)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.pipelines import (
    DataExtractor,
    DataLoader,
    DataTransformer,
)
from dpe_energy_performance_analysis_etl_spark.pipelines.transform import LOAD_ORDER


@pytest.fixture()
def extractor(spark, zones, fake_fetch_ban, fake_fetch_ademe):
    return DataExtractor(spark, zones, fetch_ban=fake_fetch_ban, fetch_ademe=fake_fetch_ademe)


def test_extract_end_to_end(extractor, enedis_csv, zones):
    silver = extractor.extract(enedis_csv)
    assert silver.count() > 0
    cols = set(silver.columns)
    # normalized, suffixed, batch-stamped (SURVEY §3.1 step 5)
    assert "batch_id" in cols
    assert any(c.endswith("_enedis") for c in cols)
    assert any(c.endswith("_ademe") for c in cols)
    # alpha-sorted except batch_id, which is stamped after normalization
    # (reference order: extract.py:578-579)
    body = [c for c in silver.columns if c != "batch_id"]
    assert body == sorted(body)
    # silver zone written and reloadable
    reloaded = extractor.spark.read.parquet(f"{zones.zones.silver}/extraction")
    assert reloaded.count() == silver.count()


def test_extract_dept_filter_and_limit(extractor, enedis_csv):
    extractor.get_enedis_data(enedis_csv, code_departement="06", rows=5)
    got = extractor.input.collect()
    assert len(got) == 5
    assert all(r.code_departement == 6 for r in got)


def test_extract_validation_gate(spark, zones, tmp_path):
    bad = tmp_path / "bad.csv"
    bad.write_text("foo;bar\n1;2\n")
    ex = DataExtractor(spark, zones, fetch_ban=lambda a: [], fetch_ademe=lambda a: [])
    from dpe_energy_performance_analysis_etl_spark.schema import SchemaValidationError

    with pytest.raises(SchemaValidationError):
        ex.get_enedis_data(str(bad))


def test_transform_and_load_idempotent(extractor, enedis_csv, spark, zones):
    silver = extractor.extract(enedis_csv)
    entities = DataTransformer(spark, silver, zones).run()
    assert set(LOAD_ORDER) <= set(entities)
    logements = entities["logements"]
    assert logements.count() > 0
    assert "conso_kwh_m2" in logements.columns
    stats = entities["tests_statistiques_dpe"]
    srows = stats.collect()
    assert len(srows) > 0
    assert {"sample_size", "paired_t_test_p_value", "batch_id"} <= set(stats.columns)

    # in-memory sink: second run must append nothing (idempotence J3/J4)
    sink: dict[str, list] = {}

    def read_existing(table, key_cols):
        if table not in sink:
            return None
        return sink[table][0].select(*key_cols)

    def append(df, table):
        sink.setdefault(table, []).append(df.cache())
        df.count()

    loader = DataLoader(spark, zones, read_existing_keys=read_existing, append=append)
    first = loader.run(entities)
    assert sum(first.values()) > 0
    loader2 = DataLoader(spark, zones, read_existing_keys=read_existing, append=append)
    second = loader2.run(entities)
    assert sum(second.values()) == 0, f"second run appended rows: {second}"
