"""Round-8 wave-5 operators: trimmed mean, top-k with ties."""

from __future__ import annotations


class TestGroupedTrimmedMean:
    def test_hand_case_drops_exact_tails(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_trimmed_mean,
        )

        # 10 values 1..10 with outliers at both ends; 10% trim drops
        # exactly one row each side -> mean of 2..9 = 5.5
        rows = [("g", v) for v in [1000, 2, 3, 4, 5, 6, 7, 8, 9, -50]]
        df = spark.createDataFrame(rows, "g string, v long")
        got = grouped_trimmed_mean(df, "g", "v", trim_ppm=100_000).collect()[0]
        assert (got["n"], got["n_trimmed_each_side"]) == (10, 1)
        assert got["trimmed_mean_scaled"] == (2+3+4+5+6+7+8+9) * 1000 // 8

    def test_zero_trim_equals_plain_mean(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_trimmed_mean,
        )

        rows = [("g", v) for v in (10, 20, 40)]
        df = spark.createDataFrame(rows, "g string, v long")
        got = grouped_trimmed_mean(df, "g", "v", trim_ppm=0).collect()[0]
        assert got["trimmed_mean_scaled"] == 70 * 1000 // 3

    def test_rebuild_stable(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_trimmed_mean,
        )

        rows = [(f"g{i % 7}", (i * 97) % 1009) for i in range(4000)]
        df = spark.createDataFrame(rows, "g string, v long")
        a = sorted(map(tuple, grouped_trimmed_mean(df, "g", "v").collect()))
        spark.catalog.clearCache()
        b = sorted(map(tuple, grouped_trimmed_mean(df, "g", "v").collect()))
        assert a == b


class TestReferentialIntegrityAudit:
    def test_orphans_nulls_and_coverage(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quality import (
            referential_integrity_audit,
        )

        child = spark.createDataFrame(
            [(1,), (1,), (2,), (9,), (None,)], "fk int"
        )
        parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
        got = referential_integrity_audit(
            [(child, "fk", parent, "pk", "c->p")]
        ).collect()[0]
        assert got["edge"] == "c->p"
        assert (got["n_child"], got["n_null_fk"], got["n_orphans"]) == (5, 1, 1)
        assert got["orphan_ppm"] == 1_000_000 // 4
        # distinct fk incl. the orphan 9, excl. NULL: {1, 2, 9}
        assert (got["n_distinct_fk"], got["n_parent"]) == (3, 3)
        assert got["fk_coverage_ppm"] == 1_000_000
