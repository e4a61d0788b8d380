"""Grid-bucketed spatial radius join (operators/spatial.py): recall
vs brute force (euclidean and haversine, including cross-cell and
boundary pairs), high-latitude longitude-shrink recall, and the
no-cartesian plan contract."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.operators import grid_radius_join, haversine_km


def _haversine_py(lat1, lon1, lat2, lon2, r=6371.0088):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = math.sin(dlat / 2) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon / 2) ** 2
    return 2 * r * math.atan2(math.sqrt(a), math.sqrt(1 - a))


def _points(spark, seed, n, lat0, lat1, lon0, lon1, prefix):
    rng = random.Random(seed)
    rows = [
        (i, lat0 + rng.random() * (lat1 - lat0), lon0 + rng.random() * (lon1 - lon0))
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, f"{prefix}_id long, lat double, lon double")


class TestEuclideanGridJoin:
    def test_matches_brute_force(self, spark):
        lrows, left = _points(spark, 1, 80, 0, 1, 0, 1, "l")
        rrows, right = _points(spark, 2, 80, 0, 1, 0, 1, "r")
        radius = 0.12
        got = {
            (r.l_id, r.r_id)
            for r in grid_radius_join(left, right, radius=radius).collect()
        }
        expect = {
            (li, ri)
            for li, la, lo in lrows
            for ri, ra, ro in rrows
            if math.sqrt((la - ra) ** 2 + (lo - ro) ** 2) <= radius
        }
        assert got == expect
        assert len(expect) > 50  # non-trivial workload

    def test_boundary_inclusive_and_cross_cell(self, spark):
        # pair at EXACTLY the radius, straddling a cell border
        left = spark.createDataFrame([(1, 0.199, 0.5)], "l_id long, lat double, lon double")
        right = spark.createDataFrame([(2, 0.299, 0.5)], "r_id long, lat double, lon double")
        out = grid_radius_join(left, right, radius=0.1).collect()
        assert [(r.l_id, r.r_id) for r in out] == [(1, 2)]
        assert out[0].distance == pytest.approx(0.1)

    def test_no_duplicate_pairs(self, spark):
        _, left = _points(spark, 3, 60, 0, 1, 0, 1, "l")
        _, right = _points(spark, 4, 60, 0, 1, 0, 1, "r")
        out = [(r.l_id, r.r_id) for r in grid_radius_join(left, right, radius=0.2).collect()]
        assert len(out) == len(set(out))

    def test_plan_has_no_cartesian(self, spark):
        _, left = _points(spark, 5, 10, 0, 1, 0, 1, "l")
        _, right = _points(spark, 6, 10, 0, 1, 0, 1, "r")
        plan = grid_radius_join(left, right, radius=0.1)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestHaversineGridJoin:
    def test_column_matches_python(self, spark):
        df = spark.createDataFrame(
            [(48.8566, 2.3522, 43.2965, 5.3698)], "lat1 double, lon1 double, lat2 double, lon2 double"
        )
        got = df.select(
            haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
        ).collect()[0].d
        assert got == pytest.approx(_haversine_py(48.8566, 2.3522, 43.2965, 5.3698), rel=1e-12)
        assert got == pytest.approx(660.9, abs=2)  # Paris-Marseille sanity

    def test_matches_brute_force_mid_latitude(self, spark):
        lrows, left = _points(spark, 7, 60, 44.0, 46.0, 4.0, 6.0, "l")
        rrows, right = _points(spark, 8, 60, 44.0, 46.0, 4.0, 6.0, "r")
        radius = 30.0  # km
        got = {
            (r.l_id, r.r_id)
            for r in grid_radius_join(left, right, radius=radius, metric="haversine_km").collect()
        }
        expect = {
            (li, ri)
            for li, la, lo in lrows
            for ri, ra, ro in rrows
            if _haversine_py(la, lo, ra, ro) <= radius
        }
        assert got == expect and len(expect) > 20

    def test_high_latitude_lon_shrink_recall(self, spark):
        # at lat 65, 1 degree lon is only ~47 km: a 50 km pair spans
        # >1 naive lat-degree cell in longitude — the widened lon cell
        # must still find it
        left = spark.createDataFrame([(1, 65.0, 10.0)], "l_id long, lat double, lon double")
        right = spark.createDataFrame([(2, 65.0, 11.0)], "r_id long, lat double, lon double")
        d = _haversine_py(65.0, 10.0, 65.0, 11.0)
        assert d < 50.0  # premise
        out = grid_radius_join(left, right, radius=50.0, metric="haversine_km").collect()
        assert [(r.l_id, r.r_id) for r in out] == [(1, 2)]

    def test_polar_guard_documented_default(self, spark):
        # beyond max_abs_lat the join may lose recall — raising the
        # parameter restores it
        left = spark.createDataFrame([(1, 80.0, 10.0)], "l_id long, lat double, lon double")
        right = spark.createDataFrame([(2, 80.0, 12.0)], "r_id long, lat double, lon double")
        d = _haversine_py(80.0, 10.0, 80.0, 12.0)
        assert d < 50.0
        out = grid_radius_join(
            left, right, radius=50.0, metric="haversine_km", max_abs_lat=80.0
        ).collect()
        assert [(r.l_id, r.r_id) for r in out] == [(1, 2)]


class TestValidation:
    def test_bad_metric(self, spark):
        df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lat double, lon double")
        with pytest.raises(ValueError):
            grid_radius_join(df, df, radius=1.0, metric="manhattan")

    def test_bad_cell(self, spark):
        df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lat double, lon double")
        with pytest.raises(ValueError):
            grid_radius_join(df, df, radius=1.0, cell_deg=0.0)


class TestDbscanGrid:
    def _run(self, spark, rows, eps, min_pts):
        from dpe_energy_performance_analysis_etl_spark.operators.spatial import dbscan_grid

        df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
        out = dbscan_grid(df, eps=eps, min_pts=min_pts)
        return {r["id"]: (r["role"], r["cluster"]) for r in out.collect()}

    def test_textbook_core_border_noise(self, spark):
        # Line A(0) B(10) C(20), eps=10, min_pts=3 (self-inclusive):
        # B sees {A,B,C} -> core; A,C see 2 -> border on B's cluster;
        # D at 100 is noise.
        got = self._run(
            spark,
            [(1, 0, 0), (2, 10, 0), (3, 20, 0), (4, 100, 0)],
            eps=10,
            min_pts=3,
        )
        assert got[2] == ("core", 2)
        assert got[1] == ("border", 2)
        assert got[3] == ("border", 2)
        assert got[4] == ("noise", -1)

    def test_two_blobs_and_chain_merge(self, spark):
        # Blob 1: clique at (0..2, 0); blob 2: clique at (1000..1002, 0);
        # they must be distinct clusters labeled by min member id.
        rows = [(i, j, 0) for i, j in [(1, 0), (2, 1), (3, 2)]] + [
            (10, 1000, 0),
            (11, 1001, 0),
            (12, 1002, 0),
        ]
        got = self._run(spark, rows, eps=5, min_pts=3)
        assert {got[i] for i in (1, 2, 3)} == {("core", 1)}
        assert {got[i] for i in (10, 11, 12)} == {("core", 10)}
        # Chain of cores merges transitively even when the ends are
        # farther than eps apart.
        rows = [(i, i * 4, 0) for i in range(1, 8)]
        got = self._run(spark, rows, eps=5, min_pts=2)
        assert {got[i] for i in range(1, 8)} == {("core", 1)}

    def test_negative_coordinates_cross_cell(self, spark):
        # A pair straddling the 0-cell boundary with negative coords:
        # floor-division cell ids must keep them adjacent.
        got = self._run(
            spark,
            [(1, -3, -3), (2, 3, 3), (3, 6, 6)],
            eps=10,
            min_pts=2,
        )
        assert got[1] == ("core", 1)
        assert got[2] == ("core", 1)
        assert got[3] == ("core", 1)

    def test_min_pts_boundary_and_all_noise(self, spark):
        # Exactly min_pts neighbors (incl. self) -> core; isolated
        # points -> all noise.
        got = self._run(spark, [(1, 0, 0), (2, 1, 0)], eps=2, min_pts=2)
        assert got[1] == ("core", 1) and got[2] == ("core", 1)
        got = self._run(
            spark, [(1, 0, 0), (2, 500, 0), (3, 1000, 0)], eps=2, min_pts=2
        )
        assert all(v == ("noise", -1) for v in got.values())

    def test_plan_no_cartesian(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.spatial import dbscan_grid

        df = spark.createDataFrame([(i, i, i) for i in range(50)], "id bigint, x bigint, y bigint")
        out = dbscan_grid(df, eps=7, min_pts=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
