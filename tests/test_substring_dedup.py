"""Exact substring-span dedup (text/substring.py) — planted-span
fixtures, interval-merge edges, removal reconstruction."""

import pytest
from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.text.substring import (
    duplicated_spans,
    position_grams,
    remove_duplicated_spans,
    substring_dup_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_shared_run_found_exactly(spark):
    """Two docs share a 10-token run; with k=8 the merged span must
    cover exactly those 10 tokens in each doc (positions differ)."""
    shared = " ".join(f"s{i}" for i in range(10))
    df = _docs(
        spark,
        [
            (0, f"aa bb cc {shared} dd ee"),
            (1, f"{shared} xx yy zz ww qq rr tt uu vv"),
        ],
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(df, k=8).collect()
    }
    assert spans[0] == (3, 12, 10)
    assert spans[1] == (0, 9, 10)


def test_run_shorter_than_k_invisible(spark):
    """A shared 7-token run produces no k=8 gram — by construction
    (k IS the length threshold)."""
    shared = " ".join(f"s{i}" for i in range(7))
    df = _docs(spark, [(0, f"aa bb {shared}"), (1, f"{shared} xx yy")])
    assert duplicated_spans(df, k=8).count() == 0


def test_two_disjoint_runs_stay_separate_spans(spark):
    """Two shared runs separated by a non-shared gap > k merge into
    two spans, not one."""
    run1 = " ".join(f"a{i}" for i in range(8))
    run2 = " ".join(f"b{i}" for i in range(8))
    gap0 = " ".join(f"g{i}" for i in range(9))
    gap1 = " ".join(f"h{i}" for i in range(9))
    df = _docs(spark, [(0, f"{run1} {gap0} {run2}"), (1, f"{run2} {gap1} {run1}")])
    spans0 = sorted(
        (r.span_start, r.span_end)
        for r in duplicated_spans(df, k=8).where("doc_id = 0").collect()
    )
    assert spans0 == [(0, 7), (17, 24)]


def test_overlapping_windows_merge(spark):
    """A 12-token shared run yields 5 overlapping k=8 windows that
    must merge into ONE maximal span."""
    shared = " ".join(f"s{i}" for i in range(12))
    df = _docs(spark, [(0, f"{shared} pp qq"), (1, f"mm nn {shared}")])
    rows = duplicated_spans(df, k=8).where("doc_id = 0").collect()
    assert len(rows) == 1
    assert (rows[0].span_start, rows[0].span_end, rows[0].span_tokens) == (0, 11, 12)


def test_within_doc_repeat_not_flagged_by_default(spark):
    """min_docs=2 counts DISTINCT documents: a run repeated twice
    inside ONE doc is not cross-document duplication."""
    run = " ".join(f"r{i}" for i in range(8))
    filler = " ".join(f"f{i}" for i in range(9))
    df = _docs(spark, [(0, f"{run} {filler} {run}"), (1, "totally different words here")])
    assert duplicated_spans(df, k=8).count() == 0


def test_stats_and_clean_agree(spark):
    """dup_tokens == n_tokens - kept_tokens, and the cleaned text is
    the original minus exactly the span tokens."""
    shared = " ".join(f"s{i}" for i in range(9))
    df = _docs(
        spark,
        [(0, f"aa bb {shared} cc"), (1, f"{shared} zz xx ww vv uu tt rr qq")],
    )
    stats = {r.doc_id: r for r in substring_dup_stats(df, k=8).collect()}
    clean = {r.doc_id: r for r in remove_duplicated_spans(df, k=8).collect()}
    for d in (0, 1):
        assert stats[d].dup_tokens == 9
        assert clean[d].n_tokens - clean[d].kept_tokens == 9
    assert clean[0].clean_text == "aa bb cc"
    assert clean[1].clean_text == "zz xx ww vv uu tt rr qq"


def test_clean_passthrough_without_spans(spark):
    df = _docs(spark, [(0, "alpha beta gamma"), (1, "delta epsilon zeta")])
    out = {r.doc_id: r for r in remove_duplicated_spans(df, k=8).collect()}
    assert out[0].clean_text == "alpha beta gamma"
    assert out[0].kept_tokens == out[0].n_tokens == 3


def test_partitioning_invariance(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    rows = [(i, f"doc{i} unique w{i}a w{i}b {shared} tail{i}") for i in range(20)]
    df = _docs(spark, rows)
    a = sorted(map(tuple, duplicated_spans(df, k=8).collect()))
    b = sorted(map(tuple, duplicated_spans(df.repartition(7), k=8).collect()))
    assert a == b


def test_hash_gram_key_matches_string_key(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    df = _docs(spark, [(0, f"aa {shared} bb"), (1, f"cc dd {shared}")])
    a = sorted(map(tuple, duplicated_spans(df, k=8, hash_gram_key=True).collect()))
    b = sorted(map(tuple, duplicated_spans(df, k=8, hash_gram_key=False).collect()))
    assert a == b


def test_position_grams_short_doc_empty(spark):
    df = _docs(spark, [(0, "only three tokens")])
    assert position_grams(df, k=8).count() == 0
