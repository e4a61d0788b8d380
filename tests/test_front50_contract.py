"""Driver-record insurance (VERDICT r4 ask #8): the first 50 registry
entries are the driver's recorded correctness window, so every one of
them must (a) exist in QUERIES, (b) carry a DuckDB oracle, and
(c) emit a SCALAR-ONLY output schema on BOTH engines — the driver's
pandas canonicalizer (sort_values → factorize) dies on list/struct/map
values, which is exactly how round 4's only red row happened
(snapshot_diff_orders, ARRAY<STRING> changed_cols) despite a locally
green 195/195. These tests turn the r4 lesson into a permanent
invariant instead of a per-round checklist item."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_queries import _arrow_nonscalar, spark_nonscalar_cols

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_front50_is_50_unique_registered():
    front = entry_mod._FRONT_50
    assert len(front) == 50
    assert len(set(front)) == 50
    qs = entry_mod.queries()
    missing = [n for n in front if n not in qs]
    assert not missing, f"front-50 names absent from QUERIES: {missing}"
    # insertion order: the driver records the FIRST 50 of queries()
    assert list(qs)[:50] == front


def test_front50_all_have_oracles():
    oracles = entry_mod.oracle_sql()
    missing = [n for n in entry_mod._FRONT_50 if n not in oracles]
    assert not missing, f"front-50 entries without an oracle: {missing}"


@pytest.mark.parametrize("name", entry_mod._FRONT_50)
def test_front50_spark_output_is_scalar_only(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    bad = spark_nonscalar_cols(df.schema)
    assert not bad, (
        f"{name} emits non-scalar columns {bad} — the driver's "
        f"canonicalizer rejects array/map/struct; stringify them"
    )


def test_front50_oracle_output_is_scalar_only():
    """DuckDB-side shape check: run every front-50 oracle at sf0.001
    and assert no list/struct/map output columns."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    oracles = entry_mod.oracle_sql()
    offenders: dict[str, list[str]] = {}
    for name in entry_mod._FRONT_50:
        tbl = con.execute(oracles[name]).fetch_arrow_table()
        bad = [f.name for f in tbl.schema if _arrow_nonscalar(f.type)]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-scalar oracle outputs: {offenders}"
