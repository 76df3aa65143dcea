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


def association_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_items: int = 1000,
    scale: int = 10**6,
) -> DataFrame:
    """Market-basket LIFT scoring on top of
    :func:`item_cooccurrence`: for every supported pair, how much more
    often the items co-occur than independence predicts —
    ``lift = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)`` — the
    recommendation/affinity signal behind "customers also bought".
    Returned as the exact scaled integer ``n_ab·N·scale div
    (n_a·n_b)`` so the score is engine-independent (log-lift / PMI is
    the consumer's monotone transform; log is not div-exact).

    Scale shape: the pair pass IS item_cooccurrence (self-join with
    the megabasket cap); item supports and the basket total are two
    partial-aggregable aggregates over the same deduped (basket,
    item) frame, joined back via broadcast (item-support table is
    |items| rows)."""
    pairs = item_cooccurrence(
        df, basket_col, item_col, min_support, max_basket_items
    )
    items = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    supp = items.groupBy("_i").agg(F.count("*").alias("_n_item"))
    total = items.select("_b").distinct().agg(
        F.count("*").alias("_n_total")
    )
    return (
        pairs.join(
            F.broadcast(supp.select(F.col("_i").alias("item_a"),
                                    F.col("_n_item").alias("_na"))),
            "item_a",
        )
        .join(
            F.broadcast(supp.select(F.col("_i").alias("item_b"),
                                    F.col("_n_item").alias("_nb"))),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "n_baskets",
            F.expr(
                f"n_baskets * _n_total * {scale}L div (_na * _nb)"
            ).alias("lift_scaled"),
        )
    )
