"""One-pass correlation matrix (operators/correlate.py) vs numpy."""

from __future__ import annotations

import numpy as np

from dpe_energy_performance_analysis_etl_spark.operators.correlate import (
    correlation_matrix,
)


def test_matches_numpy_corrcoef(spark):
    rng = np.random.default_rng(7)
    n = 2000
    x = np.round(rng.uniform(0, 50, n), 2)
    y = np.round(x * 0.4 + rng.uniform(0, 10, n), 2)  # correlated
    z = np.round(rng.uniform(0, 1, n), 2)             # independent
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {
        (r["col_a"], r["col_b"]): r
        for r in correlation_matrix(df, {"x": 2, "y": 2, "z": 2}).collect()
    }
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    want = np.corrcoef(np.vstack([x, y, z]))
    assert abs(got[("x", "y")]["corr"] - want[0, 1]) < 1e-9
    assert abs(got[("x", "z")]["corr"] - want[0, 2]) < 1e-9
    assert abs(got[("y", "z")]["corr"] - want[1, 2]) < 1e-9
    assert got[("x", "y")]["n"] == n


def test_null_rows_excluded_listwise(spark):
    rows = [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (None, 9.0), (5.0, None)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = correlation_matrix(df, {"x": 0, "y": 0}).collect()
    assert out[0]["n"] == 3
    assert abs(out[0]["corr"] - 1.0) < 1e-12  # y = 2x exactly


def test_partitioning_invariance(spark):
    """Bit-identical across partition layouts — the determinism claim."""
    rows = [(float(i % 37), float((i * 7) % 23)) for i in range(1000)]
    df = spark.createDataFrame(rows, "x double, y double")
    a = correlation_matrix(df.repartition(2), {"x": 0, "y": 0}).collect()
    b = correlation_matrix(df.repartition(17), {"x": 0, "y": 0}).collect()
    assert a[0]["corr"] == b[0]["corr"]
