"""Market-basket co-occurrence (operators/basket.py): support/lift
semantics, duplicate-line collapsing, min-support gate, and the
mega-basket cap."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.operators.basket import (
    cooccurrence_lift,
)

# baskets: {1: a,b,c} {2: a,b} {3: a,c} {4: b only} — 4 baskets
ROWS = [
    (1, "a"), (1, "b"), (1, "c"),
    (2, "a"), (2, "b"),
    (3, "a"), (3, "c"),
    (4, "b"),
]


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "basket long, item string")
    return {
        (r["item_a"], r["item_b"]): r
        for r in cooccurrence_lift(df, "basket", "item", **kw).collect()
    }


def test_support_and_lift_exact(spark):
    out = _run(spark, ROWS, min_support=2)
    ab = out[("a", "b")]
    assert ab["support"] == 2 and ab["supp_a"] == 3 and ab["supp_b"] == 3
    assert ab["lift"] == 2 * 4.0 / (3.0 * 3.0)
    ac = out[("a", "c")]
    assert ac["support"] == 2 and ac["lift"] == 2 * 4.0 / (3.0 * 2.0)
    assert ("b", "c") not in out  # support 1 < min_support


def test_duplicate_basket_lines_count_once(spark):
    """A basket listing the same item twice is one co-occurrence —
    the DISTINCT at ingestion, not an accident of the data."""
    out = _run(spark, ROWS + [(1, "a"), (1, "a")], min_support=2)
    assert out[("a", "b")]["support"] == 2
    assert out[("a", "b")]["supp_a"] == 3


def test_mega_basket_cap_drops_outlier(spark):
    """A 100-item basket would contribute 4950 pairs; the cap excludes
    it entirely (its pairs AND its support contributions)."""
    mega = [(9, f"i{k}") for k in range(100)] + [(9, "a"), (9, "b")]
    capped = _run(spark, ROWS + mega, min_support=2, max_basket_size=10)
    uncapped = _run(spark, ROWS + mega, min_support=2)
    assert capped[("a", "b")]["support"] == 2
    assert capped[("a", "b")]["supp_a"] == 3
    assert uncapped[("a", "b")]["support"] == 3  # mega basket counted
    assert all(not k[0].startswith("i") for k in capped)


def test_pair_canonical_order(spark):
    out = _run(spark, ROWS, min_support=1)
    assert all(a < b for a, b in out)
