"""Point-in-polygon ray casting (operators/spatial.py) and vocab id
assignment (text/retrieval.py)."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.operators.spatial import (
    point_in_polygon_tag,
)
from dpe_energy_performance_analysis_etl_spark.text.retrieval import vocab_with_ids

POLY_SCHEMA = "poly_id string, vertices array<struct<x: double, y: double>>"


def _polys(spark):
    return spark.createDataFrame(
        [
            ("square", [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0)]),
            ("lshape", [(10.0, 0.0), (14.0, 0.0), (14.0, 2.0), (12.0, 2.0), (12.0, 4.0), (10.0, 4.0)]),
        ],
        POLY_SCHEMA,
    )


def test_point_in_polygon_basic(spark):
    pts = spark.createDataFrame(
        [
            (1, 2.0, 2.0),    # inside square
            (2, 5.0, 2.0),    # outside both
            (3, 11.0, 1.0),   # inside L (lower arm)
            (4, 13.0, 3.0),   # in L's bbox but inside the notch -> outside
            (5, 11.0, 3.0),   # inside L (upper arm)
        ],
        "pid long, x double, y double",
    )
    got = {(r.pid, r.poly_id) for r in
           point_in_polygon_tag(pts, _polys(spark), "x", "y").collect()}
    assert got == {(1, "square"), (3, "lshape"), (5, "lshape")}


def test_point_in_polygon_concave_notch_excluded(spark):
    # The notch point (13, 3) sits inside the bbox, proving the ray
    # fold (not the bbox) is deciding.
    pts = spark.createDataFrame([(1, 13.0, 3.0)], "pid long, x double, y double")
    assert point_in_polygon_tag(pts, _polys(spark), "x", "y").collect() == []


def test_point_multi_polygon_tags(spark):
    overlapping = spark.createDataFrame(
        [
            ("a", [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0)]),
            ("b", [(2.0, 2.0), (2.0, 6.0), (6.0, 6.0), (6.0, 2.0)]),
        ],
        POLY_SCHEMA,
    )
    pts = spark.createDataFrame([(1, 3.0, 3.0)], "pid long, x double, y double")
    got = sorted(r.poly_id for r in
                 point_in_polygon_tag(pts, overlapping, "x", "y").collect())
    assert got == ["a", "b"]


def test_vocab_ids_frequency_ordered(spark):
    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a b")], "doc_id long, text string"
    )
    got = {r.term: r for r in vocab_with_ids(docs).collect()}
    # b: 4 occurrences, a: 3, c: 1 -> ids 0, 1, 2.
    assert got["b"].token_id == 0 and got["b"].n_occurrences == 4 and got["b"].n_docs == 2
    assert got["a"].token_id == 1
    assert got["c"].token_id == 2 and got["c"].n_docs == 1
    ids = sorted(r.token_id for r in got.values())
    assert ids == [0, 1, 2]  # contiguous


def test_vocab_ids_tie_broken_by_term(spark):
    docs = spark.createDataFrame([(1, "x y x y")], "doc_id long, text string")
    got = {r.term: r.token_id for r in vocab_with_ids(docs).collect()}
    assert got == {"x": 0, "y": 1}
