"""Range (point-in-interval) join — the second time-series operator
Spark lacks natively (alongside as-of, ``operators/asof.py``).

``range_join(points, intervals)`` matches every point row to interval
rows with the same key and ``start <= t < end``. A naive theta-join is
quadratic per key; the scalable form buckets time:

1. each interval explodes to the buckets it covers (at granularity
   ``bucket_width`` — explosion factor = interval length / width,
   bounded by construction);
2. each point maps to exactly one bucket;
3. equi-join on (key, bucket) — a plain hash-partitioned join — then
   the exact range predicate filters bucket-collision false positives.

Pick ``bucket_width`` ≈ the median interval length: explosion stays
O(1) per interval while each point meets only ~the intervals that
could match. Catalyst plans this as a standard shuffled equi-join, so
AQE/skew handling apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_time: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point to intervals containing it (``[start, end)``),
    equality on ``on``. Column names must not collide apart from ``on``.
    ``how='left'`` keeps unmatched points with null interval columns.
    """
    p_bucket = F.floor(F.col(point_time) / F.lit(bucket_width)).cast("long")
    i_first = F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long")
    # end is exclusive: a zero-length or bucket-aligned end stays in the
    # previous bucket
    i_last = F.floor(
        (F.col(end_col) - F.lit(1e-9)) / F.lit(bucket_width)
    ).cast("long")

    p = points.withColumn("_bucket", p_bucket)
    i = intervals.withColumn(
        "_bucket", F.explode(F.sequence(i_first, F.greatest(i_last, i_first)))
    )
    joined = p.join(i, [on, "_bucket"], "inner").where(
        (F.col(point_time) >= F.col(start_col))
        & (F.col(point_time) < F.col(end_col))
    ).drop("_bucket")
    if how == "inner":
        return joined
    if how == "left":
        matched = joined
        unmatched = p.drop("_bucket").join(
            matched.select(on, point_time).distinct(),
            [on, point_time],
            "left_anti",
        )
        for c in intervals.columns:
            if c != on:
                unmatched = unmatched.withColumn(
                    c, F.lit(None).cast(dict(intervals.dtypes)[c])
                )
        return matched.unionByName(unmatched)
    raise ValueError(f"unsupported how: {how}")
