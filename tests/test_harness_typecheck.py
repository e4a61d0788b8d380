"""The local harness must SEE the oracle type-skew class that cost
rounds 1–3 (math_functions ×2, time_weighted_avg): DuckDB types
SUM(BIGINT) as HUGEINT; a float64 round trip corrupts values past
2^53 while Spark's BIGINT stays exact. tools/check_queries.py now
fetches the oracle via Arrow and fails on type skew — these tests pin
that behavior with the exact shapes that burned the rounds."""

import duckdb
import pandas as pd
import pytest

import sys

sys.path.insert(0, "/root/repo")
from tools.check_queries import compare  # noqa: E402

BIG = 12_600_000_000_000_007  # > 2^53, representative of weighted_cents_us


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (1, 12600000000000007), "
        "(1, 1)) AS v(g, x)"
    )
    return c


def test_uncast_bigint_sum_is_red(con):
    """Pre-fix shape: bare SUM(BIGINT) → HUGEINT → must FAIL even
    though the float-coerced values would compare equal."""
    spark_side = pd.DataFrame({"g": [1], "s": [BIG + 1]})  # exact int64
    tbl = con.execute("SELECT g, SUM(x) AS s FROM t GROUP BY g").fetch_arrow_table()
    problems, _ = compare("uncast", spark_side, tbl)
    assert problems, "HUGEINT oracle output must be flagged"
    assert "TYPE SKEW" in problems[0]


def test_cast_bigint_sum_is_green_with_warning(con):
    """Post-fix shape: CAST(SUM(..) AS BIGINT) → int64 both sides →
    green, with a >2^53 magnitude warning."""
    spark_side = pd.DataFrame({"g": [1], "s": [BIG + 1]})
    tbl = con.execute(
        "SELECT g, CAST(SUM(x) AS BIGINT) AS s FROM t GROUP BY g"
    ).fetch_arrow_table()
    problems, warns = compare("cast", spark_side, tbl)
    assert problems == []
    assert warns and "2^53" in warns[0]


def test_exact_int_mismatch_beyond_2_53_detected(con):
    """The value the old float-coercing compare could NOT distinguish:
    off-by-one past 2^53 must now be a mismatch."""
    spark_side = pd.DataFrame({"g": [1], "s": [BIG]})  # off by one vs BIG+1
    tbl = con.execute(
        "SELECT g, CAST(SUM(x) AS BIGINT) AS s FROM t GROUP BY g"
    ).fetch_arrow_table()
    problems, _ = compare("offbyone", spark_side, tbl)
    assert problems and "exact-int" in problems[0]
    # sanity: both values collapse to the SAME float64 — the old
    # compare would have passed this.
    assert float(BIG) == float(BIG + 1)


def test_spark_int_vs_oracle_double_is_red(con):
    """The math_functions class: spark bigint vs oracle DOUBLE."""
    spark_side = pd.DataFrame({"g": [1], "s": [3]})
    tbl = con.execute("SELECT 1 AS g, 3.0e0 AS s").fetch_arrow_table()
    problems, _ = compare("intfloat", spark_side, tbl)
    assert problems and "TYPE SKEW" in problems[0]


def test_plain_decimal_literal_is_red(con):
    """CLAUDE.md rule: plain decimal literals parse as DECIMAL(17,16);
    the harness must flag a decimal-typed oracle column."""
    spark_side = pd.DataFrame({"s": [0.301]})
    tbl = con.execute("SELECT 0.301 AS s").fetch_arrow_table()
    problems, _ = compare("declit", spark_side, tbl)
    assert problems and "TYPE SKEW" in problems[0]


def test_nullable_int_degradation_allowed(con):
    """Spark toPandas degrades nullable int64 to float64-with-NaN on
    both engines' paths — that shape must stay green."""
    spark_side = pd.DataFrame({"g": [1.0, float("nan")], "s": [2.0, float("nan")]})
    tbl = con.execute(
        "SELECT * FROM (VALUES (1, 2), (NULL, NULL)) AS v(g, s)"
    ).fetch_arrow_table()
    problems, _ = compare("nullint", spark_side, tbl)
    assert problems == []
