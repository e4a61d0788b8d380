"""Every registry query runs at sf0.001 with a stable schema; every
oracle key has a matching query (driver-contract invariants)."""

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 35


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    schema1 = [f.name for f in df.schema.fields]
    assert df.count() >= 0
    df2 = entry_mod.queries()[name](spark, SF)
    assert [f.name for f in df2.schema.fields] == schema1


def test_approx_distinct_error_bounded(spark):
    rows = entry_mod.queries()["approx_distinct"](spark, SF).collect()
    for r in rows:
        rel_err = abs(r.approx_orders - r.exact_orders) / max(r.exact_orders, 1)
        assert rel_err < 0.05, f"{r.l_returnflag}: {r.approx_orders} vs {r.exact_orders}"


def test_sql_front_door(spark):
    """register_tables + run_sql: arbitrary ANSI SQL over the zone
    tables, equal to the DataFrame formulation."""
    from pyspark.sql import functions as F

    from dpe_energy_performance_analysis_etl_spark.plans import run_sql

    sf = "/root/testdata/sf0.001"
    got = run_sql(
        spark,
        sf,
        """
        SELECT n.n_name, COUNT(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n_customers DESC, n_name LIMIT 5
        """,
    ).collect()
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    nat = spark.read.parquet(f"{sf}/nation.parquet")
    want = (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), "n_name")
        .limit(5)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # events view carries the nanos fix
    ev = run_sql(spark, sf, "SELECT COUNT(*) AS n FROM events WHERE ts IS NOT NULL")
    assert ev.collect()[0]["n"] > 0
