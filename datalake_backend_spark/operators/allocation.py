"""FIFO allocation: match an ordered demand stream against an ordered
supply stream per key — inventory cost layers (FIFO COGS), payment
application against open invoices, budget burn-down against funding
lots. The engine-shaped insight: FIFO matching is NOT an iterative
scan — running totals turn each supply lot and each demand into a
half-open interval on the shared cumulative-quantity axis

    supply lot  s: [cum_s − qty_s, cum_s)
    demand      d: [cum_d − qty_d, cum_d)

and every (lot, demand) allocation is exactly the overlap of those
intervals: ``min(cum_s, cum_d) − max(cb_s, cb_d)`` where positive. Two
per-key cumulative-sum windows plus one join replace the sequential
matcher, and the result is deterministic integer arithmetic any engine
reproduces bit-for-bit.

Scale shape: both cumsums are per-key hash-partitioned windows (key
cardinality is the parallelism); the overlap join is per-key, and
because both interval chains partition the SAME axis, each lot overlaps
at most (its span ÷ min demand size) demands — output is Θ(n_s + n_d)
per key in the FIFO-typical case, never the per-key cross. Keys with
pathological single-lot/many-demand shapes degrade toward the per-key
cross the same way any interval join does; bucket on the cumulative
axis (operators/range_join.py) if a key's streams are huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fifo_allocate(
    supply: DataFrame,
    demand: DataFrame,
    keys: list[str],
    qty_col: str,
    order_cols: list[str],
    id_col: str,
) -> DataFrame:
    """Allocate each demand against supply lots in FIFO order, per
    key. Both frames need ``keys``, an integral ``qty_col`` (> 0;
    floor-scale floats upstream), deterministic ``order_cols`` (end
    with a unique id), and ``id_col``. Returns one row per
    (supply, demand) allocation:

    ``(keys..., supply_id, demand_id, alloc_qty)``

    with Σ alloc_qty per demand = its quantity (while supply lasts —
    demand beyond the total supply is simply unallocated, and vice
    versa; audit the tails by comparing per-key totals, q114-style).
    """
    def with_cum(df: DataFrame, side: str) -> DataFrame:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        q = F.col(qty_col).cast("bigint")
        return df.select(
            *keys,
            F.col(id_col).alias(f"{side}_id"),
            q.alias(f"{side}_qty"),
            F.sum(q).over(w).alias(f"{side}_cum"),
        )

    s = with_cum(supply, "supply")
    d = with_cum(demand, "demand")
    s_cb = F.col("supply_cum") - F.col("supply_qty")
    d_cb = F.col("demand_cum") - F.col("demand_qty")
    alloc = F.least(F.col("supply_cum"), F.col("demand_cum")) - F.greatest(
        s_cb, d_cb
    )
    return (
        s.join(d, on=list(keys))
        # overlap predicate: strict on both ends — zero-length overlaps
        # (lot exactly exhausted at a demand boundary) allocate nothing
        .where((s_cb < F.col("demand_cum")) & (d_cb < F.col("supply_cum")))
        .select(*keys, "supply_id", "demand_id", alloc.alias("alloc_qty"))
    )


def apportion_largest_remainder(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    seats: int,
) -> DataFrame:
    """Integer apportionment by the largest-remainder (Hamilton)
    method: split ``seats`` indivisible units across keys
    proportionally to integer weights — seat allocation, fixed
    sampling budgets per source, shard quota assignment. Every key
    gets ``floor(seats·w / W)``; the ``seats − Σ floor`` leftover
    units go to the largest fractional remainders, ties broken by
    key ascending — fully deterministic, all-integer (the remainder
    comparison uses the exact integer ``(seats·w) mod W``, never a
    float fraction).

    Scale shape: one hash aggregate collapses the data to one row
    per key; the two scalar totals (W and Σ floor) broadcast back;
    the only window ranks the per-key rows — metadata-sized, the
    same contract as ``topn_with_other``. Guard: Σ w must be > 0.
    """
    if seats < 0:
        raise ValueError("seats must be >= 0")
    w = df.groupBy(key_col).agg(
        F.sum(F.col(weight_col)).cast("long").alias("w")
    )
    total = w.agg(F.sum("w").alias("_tw"))
    j = w.crossJoin(F.broadcast(total)).select(
        key_col,
        "w",
        (F.lit(seats) * F.col("w")).alias("_num"),
        F.col("_tw"),
    )
    j = j.select(
        key_col,
        "w",
        F.expr("_num div _tw").alias("base"),
        (F.col("_num") % F.col("_tw")).alias("_rem"),
    )
    leftover = j.agg((F.lit(seats) - F.sum("base")).alias("_left"))
    rk = Window.orderBy(F.desc("_rem"), F.col(key_col))
    return (
        j.crossJoin(F.broadcast(leftover))
        .withColumn("_rk", F.row_number().over(rk))
        .select(
            key_col,
            "w",
            (
                F.col("base")
                + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0)
            ).alias("seats_alloc"),
        )
    )


def apportion_dhondt(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    seats: int,
) -> DataFrame:
    """D'Hondt (Jefferson) divisor apportionment — the
    largest-remainder method's (:func:`apportion_largest_remainder`)
    major-party-favoring counterpart, and the standard when quota
    violations must be impossible: every key generates quotients
    ``w/1, w/2, …, w/seats`` and the ``seats`` largest quotients win
    one unit each. Deterministic: quotients are IEEE divisions of
    exact integers (identical on any engine), ties break by (key,
    divisor).

    Scale shape: one hash aggregate to a row per key, a ``sequence``
    explode to key-count·seats quotient rows (metadata-sized), one
    top-``seats`` rank window, one re-aggregate. Keys winning zero
    seats still emit (seats_alloc = 0) via the left join back."""
    if seats < 1:
        raise ValueError("seats must be >= 1")
    w = df.groupBy(key_col).agg(
        F.sum(F.col(weight_col)).cast("long").alias("w")
    )
    quot = w.select(
        key_col,
        "w",
        F.explode(F.sequence(F.lit(1), F.lit(seats))).alias("_k"),
    ).withColumn(
        "_q", F.col("w").cast("double") / F.col("_k").cast("double")
    )
    rk = Window.orderBy(F.desc("_q"), F.col(key_col), F.col("_k"))
    won = (
        quot.withColumn("_rn", F.row_number().over(rk))
        .where(F.col("_rn") <= seats)
        .groupBy(key_col)
        .agg(F.count("*").alias("_won"))
    )
    return w.join(won, key_col, "left").select(
        key_col,
        "w",
        F.coalesce(F.col("_won"), F.lit(0)).cast("long").alias(
            "seats_alloc"
        ),
    )
