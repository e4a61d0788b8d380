"""Live JDBC round-trip against embedded Derby (bundled with Spark's
Hive-metastore dependencies), closing the "JDBC untested live" gap:
S11/S12 (``load.py:127-131,170-176``) exercised against a real
database — table auto-creation on append, column-pruned and
predicated reads, parallel range-partitioned scans, and the
anti-join idempotent-append pipeline (J3/J4, ``load.py:139-160``).

Identifier note: Spark's JDBC writer CREATEs columns with quoted
(case-exact) names, which in Derby makes lowercase names unreachable
from unquoted SQL. The portable convention — used here and expected
of callers — is to upper-case column names before appending so the
pushed-down projections/predicates (unquoted, case-folded by the
database) resolve.
"""

import pytest
from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.sources import append_jdbc_table, read_jdbc_table

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def upper_cols(df):
    return df.toDF(*[c.upper() for c in df.columns])


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db_dir};create=true"


@pytest.fixture(scope="module")
def props():
    return {"driver": DRIVER}


def test_jdbc_append_creates_and_reads_back(spark, derby_url, props):
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    append_jdbc_table(upper_cols(nation), derby_url, "NATION_T", props)
    back = read_jdbc_table(spark, derby_url, "NATION_T", props)
    assert back.count() == nation.count()
    assert set(c.lower() for c in back.columns) == set(nation.columns)


def test_jdbc_column_pruning_and_predicate(spark, derby_url, props):
    back = read_jdbc_table(
        spark,
        derby_url,
        "NATION_T",
        props,
        columns=["N_NATIONKEY", "N_NAME"],
        predicate="N_REGIONKEY = 2",
    )
    assert [c.lower() for c in back.columns] == ["n_nationkey", "n_name"]
    expect = (
        spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        .filter("n_regionkey = 2")
        .count()
    )
    assert back.count() == expect


def test_jdbc_parallel_range_read(spark, derby_url, props):
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    append_jdbc_table(upper_cols(cust), derby_url, "CUSTOMER_T", props)
    lo, hi = 0, cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    back = read_jdbc_table(
        spark,
        derby_url,
        "CUSTOMER_T",
        props,
        partition_column="C_CUSTKEY",
        num_partitions=4,
        lower_bound=lo,
        upper_bound=hi,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == cust.count()
    assert back.select(F.sum("C_CUSTKEY")).collect()[0][0] == cust.select(
        F.sum("c_custkey")
    ).collect()[0][0]


def test_jdbc_idempotent_append_pipeline(spark, derby_url, props):
    """Re-appending the same batch through the anti-join gate must not
    duplicate rows (the reference's idempotence contract)."""
    from dpe_energy_performance_analysis_etl_spark.operators import anti_join_new_rows

    region = upper_cols(spark.read.parquet("/root/testdata/sf0.001/region.parquet"))
    append_jdbc_table(region, derby_url, "REGION_T", props)

    existing = read_jdbc_table(spark, derby_url, "REGION_T", props, columns=["R_REGIONKEY"])
    fresh = anti_join_new_rows(region, existing, ["R_REGIONKEY"], broadcast_existing=True)
    assert fresh.count() == 0  # everything already present

    two_new = region.withColumn("R_REGIONKEY", F.col("R_REGIONKEY") + 100)
    fresh2 = anti_join_new_rows(two_new, existing, ["R_REGIONKEY"], broadcast_existing=True)
    append_jdbc_table(fresh2, derby_url, "REGION_T", props)
    assert read_jdbc_table(spark, derby_url, "REGION_T", props).count() == 2 * region.count()
