"""Global ranking without a single-partition window, and the exact
distributed NTILE built on it.

``Window.orderBy(...)`` with no partition moves ALL data to one task —
the classic scale killer. ``global_rank`` computes the same 1-based
dense total-order rank with the two-phase idiom used across the engine
(``packing.py``, ``dedup.sorted_neighborhood_pairs``,
``distributions.ecdf_percentile``): range-repartition on the order
key, rank within partitions, add per-partition offsets from a prefix
sum over #partitions metadata rows. ``ntile_exact`` then reproduces
the SQL-standard NTILE bucket function (first ``count mod n`` buckets
get the extra row) in closed form from (rank, count) — integer
arithmetic only, so a DuckDB ``NTILE()`` twin must agree bit-for-bit,
which is exactly what the r200 driver check asserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame, order_cols: list[str], out_col: str = "rank"
) -> DataFrame:
    """Append a 1-based global ``row_number`` over ``order_cols``
    (which must be a deterministic total order — include a unique id
    as the last column) without ever collecting the data onto one
    task."""
    part = Window.partitionBy("_p").orderBy(*order_cols)
    # freeze ONE partitioning before the offsets and rank branches
    # both consume it (spark_partition_id is assigned shuffle-read
    # side, where AQE can replan per consumer)
    base = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .withColumn("_p", F.spark_partition_id())
        .localCheckpoint(eager=True)
        .withColumn("_lr", F.row_number().over(part).cast("bigint"))
    )
    sizes = base.groupBy("_p").agg(F.count("*").alias("_n"))
    off_w = Window.orderBy("_p").rowsBetween(Window.unboundedPreceding, -1)
    # #partitions metadata rows, never data
    offsets = sizes.select(
        "_p", F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off")
    )
    return (
        base.join(F.broadcast(offsets), "_p")
        .withColumn(out_col, F.col("_lr") + F.col("_off"))
        .drop("_p", "_lr", "_off")
    )


def ntile_from_rank(rank: Column, count: Column, n: int) -> Column:
    """SQL-standard NTILE(n) from a 1-based rank and the total count:
    bucket size ``count div n``, the first ``count mod n`` buckets
    carry one extra row. Pure integer closed form — identical in any
    engine."""
    rem = count % n
    base_size = ((count - rem) / n).cast("long")  # exact: n divides count-rem
    cut = (base_size + 1) * rem  # rows covered by the fat buckets
    return F.when(
        rank <= cut, ((rank - 1) / (base_size + 1)).cast("long") + 1
    ).otherwise(
        rem + ((rank - 1 - cut) / F.greatest(base_size, F.lit(1))).cast("long") + 1
    )


def ntile_exact(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    out_col: str = "bucket",
) -> DataFrame:
    """Append the SQL-standard NTILE(n) bucket over a deterministic
    total order, computed distributed (two-phase rank + closed form),
    never via an unpartitioned window."""
    ranked = global_rank(df, order_cols, out_col="_r")
    total = ranked.groupBy().agg(F.count("*").alias("_cnt"))
    out = ranked.crossJoin(F.broadcast(total)).withColumn(
        out_col, ntile_from_rank(F.col("_r"), F.col("_cnt"), n)
    )
    return out.drop("_r", "_cnt")


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    purchase_filter: Column | None = None,
    n: int = 5,
    scale: int = 4,
) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation —
    the classic CRM / marketing-analytics operator. Per user:

    - recency_us: microseconds from the user's LAST event to the
      corpus max (integer; smaller = more recent),
    - frequency: event count,
    - monetary_scaled: floor-scaled value sum (order-independent
      integer).

    Each metric then gets an exact NTILE(n) score over a deterministic
    order (metric, user) — recency ascending (recent buyers score 1),
    frequency and monetary DESCENDING (heavy users score 1) — and the
    three digits concatenate into the segment label ("111" = best).
    All integers, so the DuckDB twin using native NTILE must match
    bit-for-bit.

    Scale shape: one groupBy(user) aggregate, then three two-phase
    global ranks over the (already aggregated) per-user frame — no
    unpartitioned data window at any size.
    """
    base = events
    if purchase_filter is not None:
        base = base.where(purchase_filter)
    anchor = base.groupBy().agg(F.max(ts_col).alias("_amax"))
    per_user = (
        base.groupBy(user_col)
        .agg(
            F.max(ts_col).alias("_last"),
            F.count("*").alias("frequency"),
            F.sum(
                F.floor(F.col(value_col) * F.lit(10**scale)).cast("bigint")
            ).alias("monetary_scaled"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            user_col,
            (F.unix_micros("_amax") - F.unix_micros("_last")).alias(
                "recency_us"
            ),
            "frequency",
            "monetary_scaled",
        )
    )
    r = ntile_exact(per_user, ["recency_us", user_col], n, out_col="r_score")
    # descending metric, ascending user tiebreak — mirror with
    # negation so the range partitioner gets one consistent sort key
    f = ntile_exact(
        r.withColumn("_negf", -F.col("frequency")),
        ["_negf", user_col],
        n,
        out_col="f_score",
    ).drop("_negf")
    m = ntile_exact(
        f.withColumn("_negm", -F.col("monetary_scaled")),
        ["_negm", user_col],
        n,
        out_col="m_score",
    ).drop("_negm")
    return m.select(
        user_col,
        "recency_us",
        "frequency",
        "monetary_scaled",
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ).alias("segment"),
    )
