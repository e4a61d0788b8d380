"""Relational + aggregate operator tests (SURVEY §2)."""

import pandas as pd

from dpe_energy_performance_analysis_etl_spark.operators import (
    anti_join_new_rows,
    dedup_keys_keep_first,
    distinct_values,
    equi_join,
    group_stats_dpe,
    impute_numeric,
    iqr_bounds,
    suffix_columns,
    union_all,
)


def test_equi_join_cast_keys(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "x": ["a", "b", "c"]}))
    right = spark.createDataFrame(pd.DataFrame({"k": ["2", "3"], "y": ["B", "C"]}))
    out = equi_join(left, right, "k", how="left", cast_keys_to_string=True).orderBy("k")
    assert [r.y for r in out.collect()] == [None, "B", "C"]


def test_anti_join_single_and_composite(spark):
    batch = spark.createDataFrame(pd.DataFrame({"pk": ["a", "b", "c"], "q": [1, 2, 3]}))
    existing = spark.createDataFrame(pd.DataFrame({"pk": ["b"]}))
    out = anti_join_new_rows(batch, existing, ["pk"])
    assert {r.pk for r in out.collect()} == {"a", "c"}
    batch2 = spark.createDataFrame(pd.DataFrame({"k1": ["a", "a"], "k2": [1, 2]}))
    exist2 = spark.createDataFrame(pd.DataFrame({"k1": ["a"], "k2": [2]}))
    out2 = anti_join_new_rows(batch2, exist2, ["k1", "k2"])
    assert [(r.k1, r.k2) for r in out2.collect()] == [("a", 1)]


def test_dedup_keep_first_deterministic(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a", "b"], "ord": [2, 1, 5], "v": ["late", "early", "only"]})
    )
    out = dedup_keys_keep_first(df, ["k"], order_by=["ord"])
    got = {r.k: r.v for r in out.collect()}
    assert got == {"a": "early", "b": "only"}


def test_suffix_and_union_and_distinct(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [1, 1], "b": ["x", "x"]}))
    sfx = suffix_columns(df, "_enedis", exclude=["a"])
    assert sfx.columns == ["a", "b_enedis"]
    u = union_all(df, df)
    assert u.count() == 4
    assert distinct_values(df, "b").count() == 1


def test_iqr_bounds_and_impute_median_vs_mean(spark):
    # col_out has an extreme outlier -> median fill; col_plain -> mean fill
    pdf = pd.DataFrame(
        {
            "col_out": [1.0, 2.0, 3.0, 4.0, 1000.0, None],
            "col_plain": [1.0, 2.0, 3.0, 4.0, 5.0, None],
        }
    )
    df = spark.createDataFrame(pdf)
    bounds = iqr_bounds(df, ["col_out"])
    lo, hi = bounds["col_out"]
    assert lo < 1.0 and hi < 1000.0  # 1000 is outside the fence
    filled, report = impute_numeric(df)
    assert "col_out" in report["median"] and "col_plain" in report["mean"]
    got = {r["col_out"] for r in filled.select("col_out").collect()}
    assert 3.0 in got  # median of [1,2,3,4,1000]
    got_plain = [r["col_plain"] for r in filled.select("col_plain").collect()]
    assert 3.0 in got_plain  # mean of [1..5]


def test_group_stats_sentinels_and_values(spark):
    pdf = pd.DataFrame(
        {
            "etiquette_dpe_ademe": ["A"] * 6 + ["B"],
            "conso_kwh_m2": [10.0, 12.0, 9.0, 11.0, 13.0, 10.5, 5.0],
            "conso_5_usages_par_m2_ef_ademe": [9.0, 11.5, 9.5, 10.0, 12.0, 10.0, 6.0],
        }
    )
    out = group_stats_dpe(spark.createDataFrame(pdf), batch_id="b1")
    rows = {r.etiquette_dpe_ademe: r for r in out.collect()}
    assert rows["B"].sample_size == 1
    assert rows["B"].paired_t_test_t_statistic == -99999.0
    a = rows["A"]
    assert a.sample_size == 6
    assert a.paired_t_test_p_value == a.paired_t_test_p_value  # not NaN
    assert 0.0 <= a.paired_t_test_p_value <= 1.0
    assert 0.0 <= a.wilcoxon_p_value <= 1.0
    assert a.batch_id == "b1"


def test_equi_join_broadcast_hint_in_plan(spark):
    left = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    right = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # no auto-broadcast
    try:
        hinted = equi_join(left, right, "o_custkey", "c_custkey", broadcast_right=True)
        plan = hinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        unhinted = equi_join(left, right, "o_custkey", "c_custkey")
        plan2 = unhinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan2  # hint is what made the difference
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
