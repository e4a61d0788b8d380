"""Market-basket co-occurrence mining: pair support + lift over a
(basket, item) relation — the first stage of association-rule mining
(Agrawal & Srikant 1994) and the workhorse behind
"frequently-bought-together" analytics.

Why the shape matters at 100 TB: the naive formulation is an
all-pairs explosion, but pairs only form WITHIN a basket, so the
self-join is keyed on the basket id — per-basket cost is m², bounded
by basket size (single digits for retail orders), and the shuffle is
a plain basket-keyed exchange. The one genuine risk is a mega-basket
(a crawler account with 10⁵ items turns m² into 10¹⁰ for one key):
``max_basket_size`` drops those outliers up front — the standard
practice in production basket mining, and the same skew discipline as
``operators/skew.py``.

Everything downstream is hash-aggregation on fixed-width keys:
pair support (map-side combinable), per-item support, and lift =
P(a,b) / (P(a)·P(b)) computed with casts BEFORE the multiplies so
supports at web scale (~1e10) never overflow int64 under ANSI.

Reference analogue: none (the reference has no affinity analytics);
this extends the aggregate family per the build mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cooccurrence_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """(item_a, item_b, support, supp_a, supp_b, lift) for every
    unordered item pair co-occurring in ≥ ``min_support`` baskets.
    ``item_a < item_b`` canonicalizes the pair. Lift > 1 means the
    pair co-occurs more often than independence predicts."""
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket_size is not None:
        sizes = items.groupBy("basket").agg(F.count(F.lit(1)).alias("m"))
        items = (
            items.join(sizes.filter(F.col("m") <= max_basket_size), on="basket")
            .select("basket", "item")
        )
    items = items.cache()

    n_baskets = items.select("basket").distinct().count()
    supp = items.groupBy("item").agg(F.count(F.lit(1)).alias("s"))

    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, on="basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    sa = supp.select(F.col("item").alias("item_a"), F.col("s").alias("supp_a"))
    sb = supp.select(F.col("item").alias("item_b"), F.col("s").alias("supp_b"))
    return (
        pairs.join(sa, on="item_a")
        .join(sb, on="item_b")
        .select(
            "item_a",
            "item_b",
            "support",
            "supp_a",
            "supp_b",
            (
                F.col("support").cast("double") * F.lit(float(n_baskets))
                / (F.col("supp_a").cast("double") * F.col("supp_b").cast("double"))
            ).alias("lift"),
        )
    )


def item_item_cosine(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Item-item cosine similarity from co-occurrence counts — the
    classic neighborhood recommender weight (Sarwar et al. WWW'01):
    cos(a, b) = support(a, b) / sqrt(supp_a * supp_b) over binary
    basket membership. Rides on ``cooccurrence_lift``'s bounded
    pair generation (per-basket fan-out, never all-pairs); sqrt is
    IEEE-exact so the score is engine-reproducible."""
    pairs = cooccurrence_lift(df, basket_col, item_col, min_support, max_basket_size)
    return pairs.withColumn(
        "cosine",
        F.col("support").cast("double")
        / F.sqrt(F.col("supp_a").cast("double") * F.col("supp_b").cast("double")),
    )
