"""Misra–Gries heavy hitters (operators/heavyhitters.py): exact
regime, undercount guarantee, frequent-item presence, bounded output,
and summary merge."""

from __future__ import annotations

from collections import Counter

from dpe_energy_performance_analysis_etl_spark.operators.heavyhitters import (
    heavy_hitters,
    mg_compress,
    mg_merge,
    mg_partials,
)

# zipf-ish stream: item i appears 2000/(i+1) times
ZIPF = [f"w{i}" for i in range(40) for _ in range(2000 // (i + 1))]


def _df(spark, items, parts=8):
    return spark.createDataFrame(
        [(x,) for x in items], "item string"
    ).repartition(parts)


def test_exact_when_k_exceeds_distinct(spark):
    """No decrement ever fires → exact counts, independent of
    partitioning — the driver-gate regime."""
    got = {r["item"]: r["cnt"] for r in heavy_hitters(_df(spark, ZIPF), "item", k=64).collect()}
    assert got == dict(Counter(ZIPF))


def test_undercount_and_error_bound(spark):
    k = 8
    got = {r["item"]: r["cnt"] for r in heavy_hitters(_df(spark, ZIPF), "item", k=k).collect()}
    true = Counter(ZIPF)
    n = len(ZIPF)
    assert len(got) <= k
    for item, c_hat in got.items():
        assert c_hat <= true[item]                  # never overcounts
        assert true[item] - c_hat <= 2 * n / (k + 1)  # two-level bound


def test_guaranteed_presence_of_heavy_items(spark):
    """Any item with c(x) > 2n/(k+1) must survive."""
    k = 8
    got = {r["item"] for r in heavy_hitters(_df(spark, ZIPF), "item", k=k).collect()}
    n = len(ZIPF)
    for item, c in Counter(ZIPF).items():
        if c > 2 * n / (k + 1):
            assert item in got, item


def test_partials_bounded_per_partition(spark):
    k = 8
    partials = mg_partials(_df(spark, ZIPF, parts=4), "item", k=k)
    import pyspark.sql.functions as F

    per_part = partials.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert all(r["count"] <= k for r in per_part)


def test_merge_matches_whole_in_exact_regime(spark):
    half = len(ZIPF) // 2
    k = 64
    s1 = mg_partials(_df(spark, ZIPF[:half]), "item", k).groupBy("item").sum("cnt").withColumnRenamed("sum(cnt)", "cnt")
    s2 = mg_partials(_df(spark, ZIPF[half:]), "item", k).groupBy("item").sum("cnt").withColumnRenamed("sum(cnt)", "cnt")
    merged = {r["item"]: r["cnt"] for r in mg_merge(mg_compress(s1, k), mg_compress(s2, k), k).collect()}
    assert merged == dict(Counter(ZIPF))


class TestCmsInnerProduct:
    def test_overestimates_and_exact_when_collision_free(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.sketch import (
            cms_build,
            cms_inner_product,
        )

        # few distinct items in a wide sketch: collision-free, so the
        # estimate is EXACTLY the true inner product
        a = spark.createDataFrame(
            [("x",)] * 5 + [("y",)] * 3 + [("z",)] * 2, "k string"
        )
        b = spark.createDataFrame([("x",)] * 4 + [("y",)] * 6, "k string")
        est = cms_inner_product(cms_build(a, "k"), cms_build(b, "k")).collect()[0][
            "est"
        ]
        assert est == 5 * 4 + 3 * 6  # 38

    def test_never_underestimates(self, spark):
        from pyspark.sql import functions as F

        from dpe_energy_performance_analysis_etl_spark.operators.sketch import (
            cms_build,
            cms_inner_product,
        )

        a = spark.range(2000).select((F.col("id") % 700).cast("string").alias("k"))
        b = spark.range(1500).select((F.col("id") % 500).cast("string").alias("k"))
        exact = (
            a.groupBy("k").count().withColumnRenamed("count", "ca")
            .join(b.groupBy("k").count().withColumnRenamed("count", "cb"), "k")
            .agg(F.sum(F.col("ca") * F.col("cb")))
            .collect()[0][0]
        )
        est = cms_inner_product(
            cms_build(a, "k", width=64), cms_build(b, "k", width=64)
        ).collect()[0]["est"]
        assert est >= exact  # collisions only ADD mass

    def test_disjoint_inputs_estimate_zero_not_null(self, spark):
        """ADVICE r7: a hash row with zero overlapping cells must
        participate in the min as 0 — fully-disjoint, collision-free
        inputs estimate 0 (the true inner product), not NULL."""
        from dpe_energy_performance_analysis_etl_spark.operators.sketch import (
            cms_build,
            cms_inner_product,
        )

        a = spark.createDataFrame([("a1",), ("a2",)], "k string")
        b = spark.createDataFrame([("b1",), ("b2",)], "k string")
        # wide sketch: 4 keys in width 4096 — vanishingly unlikely to
        # collide in EVERY depth row; any collision-free row pins 0
        row = cms_inner_product(
            cms_build(a, "k", width=4096), cms_build(b, "k", width=4096)
        ).collect()[0]
        assert row["est"] == 0
