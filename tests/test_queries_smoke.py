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
