"""As-of join — a time-series operator Spark lacks natively.

``asof_join(left, right)`` attaches, to every left row, the latest
right row with the same key and ``right.time <= left.time`` (backward
as-of). Implemented with the union-and-window idiom, not per-group
``merge_asof`` pandas:

1. union both sides with a source tag (right rows carry their payload,
   left rows null payload);
2. ``last(payload, ignorenulls)`` over
   ``Window.partitionBy(key).orderBy(time, tag)`` with an unbounded-
   preceding frame — each left row sees the most recent right payload;
3. keep left rows.

Cost: ONE shuffle on the key (the union is shuffle-free), one sort per
partition — the same price as a regular sort-merge join, with no
quadratic range expansion and no Python. Tag ordering makes a
same-timestamp right row visible to the left row (<= semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join with pandas ``merge_asof`` semantics, distributed.

    ``direction``: ``backward`` (latest right at-or-before left time),
    ``forward`` (earliest right at-or-after), or ``nearest`` (smaller
    absolute time gap, ties broken backward). ``tolerance`` nulls the
    payload when the matched gap exceeds it. ``on`` is the equality
    key (same name both sides); payload columns default to all right
    columns except the key and time.

    Both directions ride ONE shuffle on the key: backward is
    ``last(ignorenulls)`` over (time, src) ascending with an
    unbounded-preceding frame; forward is ``first(ignorenulls)`` over
    (time, src desc) with an unbounded-following frame — the ordering
    flip keeps a same-timestamp right row visible to both (``<=`` /
    ``>=`` semantics). Nearest computes both in the same pass."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    payload_t = (
        "struct<_rt:double,"
        + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}"
            for c in payload_cols
        )
        + ">"
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).cast("double").alias("_t"),
        F.lit(1).alias("_src"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast(payload_t).alias("_right"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).cast("double").alias("_t"),
        F.lit(0).alias("_src"),
        F.lit(None).cast(l_tagged.schema["_left"].dataType).alias("_left"),
        F.struct(
            F.col(right_time).cast("double").alias("_rt"),
            *[F.col(c) for c in payload_cols],
        ).alias("_right"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w_b = (
        Window.partitionBy("_k")
        .orderBy("_t", "_src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward = last-ignorenulls over the DESCENDING time order with an
    # unbounded-PRECEDING frame: at equal time the right row (src 0)
    # sorts before the left row under (_t desc, _src asc), keeping <= /
    # >= inclusivity. The obvious (currentRow, unboundedFollowing)
    # frame re-scans to the partition end per row in Spark — O(n²) on a
    # hot key (see timeseries.gap_fill for the measured case).
    w_f = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").desc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned
    if direction in ("backward", "nearest"):
        matched = matched.withColumn(
            "_bwd", F.last("_right", ignorenulls=True).over(w_b)
        )
    if direction in ("forward", "nearest"):
        matched = matched.withColumn(
            "_fwd", F.last("_right", ignorenulls=True).over(w_f)
        )
    matched = matched.where(F.col("_src") == 1)
    if direction == "backward":
        asof = F.col("_bwd")
    elif direction == "forward":
        asof = F.col("_fwd")
    else:
        b_gap = F.abs(F.col("_t") - F.col("_bwd._rt"))
        f_gap = F.abs(F.col("_t") - F.col("_fwd._rt"))
        asof = (
            F.when(F.col("_bwd").isNull(), F.col("_fwd"))
            .when(F.col("_fwd").isNull(), F.col("_bwd"))
            .when(f_gap < b_gap, F.col("_fwd"))
            .otherwise(F.col("_bwd"))  # ties → backward (pandas rule)
        )
    matched = matched.withColumn("_asof", asof)
    if tolerance is not None:
        matched = matched.withColumn(
            "_asof",
            F.when(
                F.abs(F.col("_t") - F.col("_asof._rt")) <= F.lit(tolerance),
                F.col("_asof"),
            ),
        )
    out_cols = [F.col(f"_left.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_asof.{c}").alias(c) for c in payload_cols]
    return matched.select(*out_cols)


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance: int,
    right_id: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Nearest-neighbor as-of join in TIME: each left row matches the
    right row with the smallest |Δt| within ``tolerance`` seconds —
    pandas ``merge_asof(direction='nearest')`` semantics, the sensor-
    fusion / quote-to-trade alignment primitive that the pure
    backward (:func:`asof_join`) and forward (r115) directions can't
    express. Ties (equal |Δt| on both sides) prefer the EARLIER right
    row, then the smaller ``right_id``.

    Scale shape: the tolerance bound makes nearest blockable exactly
    like `geometry.nearest_within_radius` does in space — left probes
    the 3 adjacent ``tolerance``-wide epoch buckets, the (by, bucket)
    equi-join prunes, and one hash-aggregate argmin refines on the
    integer composite (|Δt|, sign-preference, id). Never a cross
    join, never a raw-data window; unmatched left rows drop (inner
    semantics).

    Output: every left column plus ``nearest_<right_id>``, ``delta_s``
    (signed: right − left, negative = right earlier)."""
    if tolerance < 1:
        raise ValueError("tolerance must be >= 1 second")
    by = by or []
    lsec = F.unix_timestamp(F.col(left_ts))
    rsec = F.unix_timestamp(F.col(right_ts))
    out_rid = right_id if right_id not in set(left.columns) else f"{right_id}_r"
    r = right.select(
        *by,
        F.col(right_id).alias(out_rid),
        rsec.alias("_rs"),
    )
    neigh = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    # per-row tag so the argmin groupBy preserves LEFT ROW
    # MULTIPLICITY (pandas merge_asof keeps duplicate left rows;
    # grouping on *left.columns alone would collapse them) — the tag
    # never reaches the output
    lhs = (
        left.withColumn("_lrow", F.monotonically_increasing_id())
        .withColumn("_ls", lsec)
        .withColumn("_db", F.explode(neigh))
        .withColumn("_bk", F.expr(f"_ls div {tolerance}") + F.col("_db"))
        .drop("_db")
    )
    rhs = r.withColumn("_bk", F.expr(f"_rs div {tolerance}"))
    cand = (
        lhs.join(rhs, [*by, "_bk"])
        .withColumn("_dt", F.col("_rs") - F.col("_ls"))
        .where(F.abs(F.col("_dt")) <= tolerance)
    )
    # argmin composite: |Δt| first, then prefer the earlier right row
    # (negative Δt) on a tie, then the smaller id — all integers
    pick = F.struct(
        F.abs(F.col("_dt")).alias("a"),
        F.when(F.col("_dt") < 0, F.lit(0)).otherwise(F.lit(1)).alias("s"),
        F.col(out_rid).alias("i"),
        F.col("_dt").alias("d"),
    )
    grouped = cand.groupBy("_lrow", *left.columns).agg(F.min(pick).alias("_m"))
    return grouped.select(
        *left.columns,
        F.col("_m.i").alias(f"nearest_{right_id}"),
        F.col("_m.d").alias("delta_s"),
    )
