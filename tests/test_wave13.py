"""Wave-13: AMS F2 sketch, sorted-neighborhood blocking, geohash
encoding — ground-truth and contract tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.operators.entity import (
    sorted_neighborhood_candidates,
)
from dpe_energy_performance_analysis_etl_spark.operators.sketch import ams_f2
from dpe_energy_performance_analysis_etl_spark.operators.spatial import (
    geohash_encode_micro,
)


class TestAmsF2:
    def test_exact_f2_hand_computed(self, spark):
        # counts: a=3, b=2, c=1 -> F2 = 9 + 4 + 1 = 14
        rows = [("a",)] * 3 + [("b",)] * 2 + [("c",)]
        df = spark.createDataFrame(rows, "term string")
        got = ams_f2(df, "term").collect()[0]
        assert got["n_terms"] == 3
        assert got["exact_f2"] == 14
        assert got["est_over_exact"] == got["f2_est_x4"] / (4.0 * 14.0)

    def test_estimate_tracks_exact_on_uniformish_corpus(self, spark):
        # 200 distinct terms, counts 1..4 — the tug-of-war estimate
        # should land within a factor ~2.5 of exact (16 estimators,
        # median of 4 means; deterministic, so this bound is pinned)
        rows = [(f"t{i}",) for i in range(200) for _ in range(i % 4 + 1)]
        df = spark.createDataFrame(rows, "term string")
        got = ams_f2(df, "term").collect()[0]
        assert got["exact_f2"] == sum((i % 4 + 1) ** 2 for i in range(200))
        assert 0.4 < got["est_over_exact"] < 2.5

    def test_deterministic_across_partitionings(self, spark):
        rows = [(f"w{i % 37}",) for i in range(500)]
        a = ams_f2(spark.createDataFrame(rows, "term string").repartition(2), "term").collect()[0]
        b = ams_f2(spark.createDataFrame(rows, "term string").repartition(17), "term").collect()[0]
        assert a["f2_est_x4"] == b["f2_est_x4"]


class TestSortedNeighborhood:
    def _recs(self, spark, rows):
        return spark.createDataFrame(rows, "rid long, blk int, name string")

    def test_adjacent_similar_names_match(self, spark):
        df = self._recs(
            spark,
            [
                (1, 0, "smith john"),
                (2, 0, "smith jon"),
                (3, 0, "zzzz completely other"),
            ],
        )
        got = sorted_neighborhood_candidates(
            df, "rid", ["name"], "blk", window=3, verify_col="name", max_edit=2
        ).collect()
        pairs = {(r["id_a"], r["id_b"]) for r in got}
        assert (2, 1) in pairs or (1, 2) in pairs
        assert all({a, b} != {1, 3} for a, b in pairs)

    def test_window_bound_respected(self, spark):
        # 6 identical-prefix names: pair (1,6) is rank gap 5 > window
        df = self._recs(spark, [(i, 0, f"name {i}") for i in range(1, 7)])
        got = sorted_neighborhood_candidates(
            df, "rid", ["name"], "blk", window=2, verify_col="name", max_edit=2
        ).collect()
        assert all(r["rank_gap"] <= 2 for r in got)
        assert all(r["id_b"] - r["id_a"] <= 2 for r in got)

    def test_blocks_isolate(self, spark):
        df = self._recs(spark, [(1, 0, "same name"), (2, 1, "same name")])
        got = sorted_neighborhood_candidates(
            df, "rid", ["name"], "blk", window=3, verify_col="name", max_edit=2
        ).collect()
        assert got == []

    def test_candidate_count_linear_in_window(self, spark):
        # n records in one block, all pairwise-distant names with no
        # verification: exactly sum over ranks of min(w, n-rank) pairs
        n, w = 10, 3
        df = self._recs(spark, [(i, 0, f"n{i:02d}") for i in range(n)])
        got = sorted_neighborhood_candidates(df, "rid", ["name"], "blk", window=w)
        expected = sum(min(w, n - 1 - i) for i in range(n))
        assert got.count() == expected


class TestGeohash:
    def test_known_reference_point(self, spark):
        # the canonical geohash example: (57.64911, 10.40744) -> u4pru…
        df = spark.createDataFrame([(57_649_110, 10_407_440)], "lat long, lon long")
        got = df.select(
            geohash_encode_micro(F.col("lat"), F.col("lon"), 5).alias("gh")
        ).collect()[0]["gh"]
        assert got == "u4pru"

    def test_more_reference_points(self, spark):
        # geohash.org reference encodings (precision 5)
        cases = [
            (48_858_600, 2_294_450, "u09tu"),   # Eiffel Tower
            (40_689_250, -74_044_500, "dr5r7"),  # Statue of Liberty
            (-33_856_780, 151_215_300, "r3gx2"), # Sydney Opera House
        ]
        df = spark.createDataFrame(cases, "lat long, lon long, want string")
        got = df.select(
            "want",
            geohash_encode_micro(F.col("lat"), F.col("lon"), 5).alias("gh"),
        ).collect()
        for r in got:
            assert r["gh"] == r["want"], (r["want"], r["gh"])

    def test_equator_origin(self, spark):
        # (0, 0) lies at the exact center: geohash 's0000…'
        df = spark.createDataFrame([(0, 0)], "lat long, lon long")
        got = df.select(
            geohash_encode_micro(F.col("lat"), F.col("lon"), 5).alias("gh")
        ).collect()[0]["gh"]
        assert got == "s0000"

    def test_boundary_coordinates_clamp_to_last_cell(self, spark):
        # lat=+90 / lon=+180 are legal inputs; without the clamp the
        # overflowing cell index encoded as the -90/-180 corner cell.
        df = spark.createDataFrame(
            [(90_000_000, 180_000_000), (-90_000_000, -180_000_000)],
            "lat long, lon long",
        )
        got = [
            r["gh"]
            for r in df.select(
                geohash_encode_micro(F.col("lat"), F.col("lon"), 5).alias("gh")
            ).collect()
        ]
        assert got[0] == "zzzzz"  # NE corner -> last cell, not "00000"
        assert got[1] == "00000"  # SW corner unchanged

    def test_precision_prefix_property(self, spark):
        # a finer geohash always extends the coarser one
        df = spark.createDataFrame(
            [(57_649_110, 10_407_440), (-1_234_567, 98_765_432)],
            "lat long, lon long",
        )
        got = df.select(
            geohash_encode_micro(F.col("lat"), F.col("lon"), 3).alias("g3"),
            geohash_encode_micro(F.col("lat"), F.col("lon"), 5).alias("g5"),
        ).collect()
        for r in got:
            assert r["g5"].startswith(r["g3"])
