"""Expectation report, k-anonymity audit (operators/quality.py) and
the two-proportion z-test (operators/stats.py)."""

from __future__ import annotations

import math

import pytest

from dpe_energy_performance_analysis_etl_spark.operators.quality import (
    expectation_report,
    k_anonymity_violations,
)
from dpe_energy_performance_analysis_etl_spark.operators.stats import (
    two_proportion_ztest,
)


def test_expectation_report_all_rules(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "F", None),
            (2, 20.0, "O", 5),
            (2, 999.0, "X", 6),   # duplicate key, out-of-range, bad status
            (3, None, "P", 7),
        ],
        "k long, v double, status string, opt int",
    )
    rules = [
        {"rule": "not_null", "col": "opt"},
        {"rule": "unique", "col": "k"},
        {"rule": "range", "col": "v", "min": 0, "max": 100},
        {"rule": "in_set", "col": "status", "values": ["F", "O", "P"]},
    ]
    got = {r.rule: r for r in expectation_report(df, rules).collect()}
    assert got["not_null"].n_violations == 1 and not got["not_null"].passed
    assert got["unique"].n_violations == 1 and not got["unique"].passed
    assert got["range"].n_violations == 1  # NULL v ignored
    assert got["in_set"].n_violations == 1
    assert all(r.n_rows == 4 for r in got.values())
    assert got["range"].violation_rate == pytest.approx(0.25)


def test_expectation_report_passing(spark):
    df = spark.createDataFrame([(1, "F"), (2, "O")], "k long, s string")
    got = expectation_report(
        df,
        [{"rule": "unique", "col": "k"},
         {"rule": "in_set", "col": "s", "values": ["F", "O"]}],
    ).collect()
    assert all(r.passed and r.n_violations == 0 for r in got)


def test_expectation_report_unknown_rule(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        expectation_report(df, [{"rule": "nope", "col": "k"}])


def test_k_anonymity(spark):
    rows = [("us", "a")] * 6 + [("us", "b")] * 2 + [("fr", "a")] * 1
    df = spark.createDataFrame(rows, "country string, seg string")
    got = {(r.country, r.seg): r.group_size
           for r in k_anonymity_violations(df, ["country", "seg"], k=5).collect()}
    assert got == {("us", "b"): 2, ("fr", "a"): 1}


def test_two_proportion_ztest_exact(spark):
    rows = [("A", True)] * 30 + [("A", False)] * 70 + [("B", True)] * 20 + [("B", False)] * 80
    df = spark.createDataFrame(rows, "arm string, ok boolean")
    r = two_proportion_ztest(df, "arm", "ok").collect()[0]
    assert (r.arm_a, r.arm_b) == ("A", "B")
    assert (r.n_a, r.succ_a, r.n_b, r.succ_b) == (100, 30, 100, 20)
    pooled = 50 / 200
    se = math.sqrt(pooled * (1 - pooled) * (1 / 100 + 1 / 100))
    assert r.z == pytest.approx((0.3 - 0.2) / se, abs=1e-15)


def test_two_proportion_ztest_degenerate(spark):
    rows = [("A", True)] * 5 + [("B", True)] * 5
    df = spark.createDataFrame(rows, "arm string, ok boolean")
    r = two_proportion_ztest(df, "arm", "ok").collect()[0]
    assert r.z is None  # zero pooled variance -> NULL, not a crash


def test_calibration_report_perfect_and_biased(spark):
    """A perfectly calibrated bin has abs_gap 0; an overconfident bin
    reports the exact gap; weights sum to 1; per-bin sums are integer
    exact."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        calibration_report,
    )
    from pyspark.sql import functions as F

    rows = []
    # bin 9 (p=0.95): 20 rows, 19 positive -> frac 0.95, gap 0
    rows += [(950_000, i < 19) for i in range(20)]
    # bin 1 (p=0.15): 20 rows, 0 positive -> gap 0.15
    rows += [(150_000, False) for _ in range(20)]
    df = spark.createDataFrame(rows, "p long, y boolean")
    out = {r.bin: r for r in calibration_report(df, "p", "y").collect()}
    assert set(out) == {1, 9}
    assert out[9].abs_gap == 0.0
    assert out[9].mean_conf == 0.95
    assert abs(out[1].abs_gap - 0.15) < 1e-15
    assert out[1].weight == 0.5 and out[9].weight == 0.5
    assert out[9].n_pos == 19


def test_calibration_top_bin_clamp(spark):
    """p == scale lands in the top bin, not an out-of-range bin 10."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        calibration_report,
    )

    df = spark.createDataFrame([(1_000_000, True), (0, False)], "p long, y boolean")
    bins = {r.bin for r in calibration_report(df, "p", "y").collect()}
    assert bins == {0, 9}


def test_l_diversity_catches_homogeneous_group(spark):
    """A 50-anonymous group with ONE sensitive value violates
    l-diversity while passing k-anonymity."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        k_anonymity_violations,
        l_diversity_violations,
    )

    rows = [("US", "A", "flu") for _ in range(50)]
    rows += [("FR", "B", f"dx{i % 5}") for i in range(50)]
    df = spark.createDataFrame(rows, "country string, seg string, diagnosis string")
    assert k_anonymity_violations(df, ["country", "seg"], k=5).count() == 0
    viol = l_diversity_violations(df, ["country", "seg"], "diagnosis", l=3).collect()
    assert len(viol) == 1
    assert (viol[0].country, viol[0].l_diversity) == ("US", 1)


def test_l_diversity_audit_bottom_n_nonempty_on_clean_data(spark):
    """The audit view reports the LEAST-diverse groups with a
    violates flag even when no group violates — a 0-row green driver
    record checks nothing (r8 front-50 lesson)."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import l_diversity_audit

    rows = [("US", "A", "flu")] * 50  # 1 distinct -> violates l=3
    rows += [("FR", "B", f"dx{i % 5}") for i in range(50)]  # 5 distinct
    rows += [("DE", "C", f"dx{i % 4}") for i in range(40)]  # 4 distinct
    df = spark.createDataFrame(rows, "country string, seg string, diagnosis string")
    got = l_diversity_audit(df, ["country", "seg"], "diagnosis", l=3, bottom=2).collect()
    assert [(r.country, r.l_diversity, r.violates_l) for r in got] == [
        ("US", 1, 1),
        ("DE", 4, 0),
    ]


def test_fd_violation_report(spark):
    from dpe_energy_performance_analysis_etl_spark.operators.quality import fd_violation_report

    df = spark.createDataFrame(
        [
            ("z1", "cityA"), ("z1", "cityA"),          # consistent
            ("z2", "cityB"), ("z2", "cityC"),          # violating (2 rhs)
            ("z3", None), ("z3", "cityD"),             # NULL counts as a value
            ("z4", None), ("z4", None),                # only NULL: consistent
        ],
        "zip string, city string",
    )
    r = fd_violation_report(df, ["zip"], "city").collect()[0]
    assert r.n_groups == 4
    assert r.n_violating_groups == 2
    assert r.n_violating_rows == 4
    assert r.holds is False

    clean = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], "k string, v int")
    r2 = fd_violation_report(clean, ["k"], "v").collect()[0]
    assert r2.holds is True and r2.n_violating_rows == 0
