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
) -> DataFrame:
    """Backward as-of join: latest right payload at-or-before left time.

    ``on`` is the equality key (same name both sides); payload columns
    default to all right columns except the key and time.
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).cast("double").alias("_t"),
        F.lit(1).alias("_src"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload_cols) + ">"
        ).alias("_right"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).cast("double").alias("_t"),
        F.lit(0).alias("_src"),
        F.lit(None).cast(l_tagged.schema["_left"].dataType).alias("_left"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_right"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn(
        "_asof", F.last("_right", ignorenulls=True).over(w)
    ).where(F.col("_src") == 1)
    out_cols = [F.col(f"_left.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_asof.{c}").alias(c) for c in payload_cols]
    return matched.select(*out_cols)
