"""Market-basket association mining: pairwise item co-occurrence.

The reference has no association operator; this exists because a
training-data lakehouse keeps meeting basket-shaped questions — which
tags co-occur in documents, which parts ship together, which sources
contribute to the same session. The pairwise co-occurrence count with a
support threshold is the first (and usually only distributed) step of
every frequent-itemset algorithm (A-priori's k=2 pass).

Scale shape: distinct (basket, item), then a SELF-JOIN co-located on
the basket key — one shuffle per side, pair fan-out bounded per basket
by ``max_basket_items`` (a megabasket would otherwise explode
quadratically: one 10⁶-item basket is 5·10¹¹ pairs, the skew hazard).
Oversized baskets are dropped via a distributed size filter BEFORE the
join; the threshold is explicit so the twin applies the same rule.
All-integer output — bit-exact in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def item_cooccurrence(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_items: int = 1000,
) -> DataFrame:
    """Pairs of distinct items appearing together in at least
    ``min_support`` baskets. Returns ``(item_a, item_b, n_baskets)``
    with ``item_a < item_b``; baskets holding more than
    ``max_basket_items`` distinct items are excluded (documented
    skew/explosion cap — the twin must apply the same filter)."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    items = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    ok = (
        items.groupBy("_b")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") <= max_basket_items)
        .select("_b")
    )
    kept = items.join(ok, "_b")
    a = kept.select("_b", F.col("_i").alias("item_a"))
    b = kept.select("_b", F.col("_i").alias("item_b"))
    return (
        a.join(b, "_b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_baskets"))
        .where(F.col("n_baskets") >= min_support)
    )
