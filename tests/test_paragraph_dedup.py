"""Corpus-wide paragraph dedup (text/curation.py paragraph_dedup):
first-occurrence semantics across and within documents, empty-doc
reassembly, and order preservation."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.text.curation import paragraph_dedup


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in paragraph_dedup(df).collect()}


def test_cross_doc_duplicate_survives_only_in_lowest_doc(spark):
    out = _run(
        spark,
        [
            (0, "banner\nalpha"),
            (1, "banner\nbeta"),
            (2, "gamma\nbanner"),
        ],
    )
    assert out[0]["clean_text"] == "banner\nalpha"
    assert out[1]["clean_text"] == "beta"
    assert out[2]["clean_text"] == "gamma"
    assert out[1]["n_dropped"] == 1 and out[2]["n_dropped"] == 1


def test_within_doc_repeat_keeps_first_position(spark):
    out = _run(spark, [(0, "x\ny\nx\nz")])
    assert out[0]["clean_text"] == "x\ny\nz"
    assert out[0]["n_kept"] == 3 and out[0]["n_dropped"] == 1


def test_fully_duplicated_doc_reassembles_empty(spark):
    out = _run(spark, [(0, "a\nb"), (1, "a\nb")])
    assert out[1]["clean_text"] == ""
    assert out[1]["n_kept"] == 0 and out[1]["n_dropped"] == 2


def test_paragraph_order_preserved_after_removals(spark):
    out = _run(spark, [(0, "dup"), (1, "p1\ndup\np2\ndup\np3")])
    assert out[1]["clean_text"] == "p1\np2\np3"
