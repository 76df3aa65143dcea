"""Pareto skyline (dominance frontier) over two maximize-dimensions.

The reference has no skyline operator; this exists because curation
keeps asking dominance questions — "which documents are best on BOTH
quality and freshness", "which configs are undominated on cost vs
accuracy". A point dominates another when it is ≥ on both dimensions
and strictly > on at least one; the skyline is the undominated set.

Scale shape (2-D case): the frontier can contain at most one point per
distinct x (the one with max y), so the operator first collapses to
per-x maxima (ONE hash aggregate — this is the big-data pass), then
prunes with a partition-LOCAL running-max sweep (a superset of the
frontier — local pruning can only keep extra points, never drop a
frontier point, because dominance within a partition implies global
dominance), and finishes with a global ordered sweep over the pruned
remnant. The only unpartitioned window runs over the locally-pruned
rows — already frontier-dense — never the raw data. All comparisons
are plain orderings, so the result is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Undominated (x, y) pairs, both dimensions maximized. Returns
    the distinct frontier points ``(x_col, y_col)`` sorted-free (the
    caller orders). Exact: a point survives iff no other point is ≥
    on both axes with one strict."""
    pts = df.groupBy(x_col).agg(F.max(y_col).alias(y_col))
    prev = Window.unboundedPreceding
    wl = (
        Window.partitionBy("_p")
        .orderBy(F.desc(x_col))
        .rowsBetween(prev, -1)
    )
    loc = (
        pts.withColumn("_p", F.spark_partition_id())
        .withColumn("_my", F.max(y_col).over(wl))
        .where(F.col("_my").isNull() | (F.col(y_col) > F.col("_my")))
        .drop("_p", "_my")
    )
    wg = Window.orderBy(F.desc(x_col)).rowsBetween(prev, -1)
    return (
        loc.withColumn("_my", F.max(y_col).over(wg))
        .where(F.col("_my").isNull() | (F.col(y_col) > F.col("_my")))
        .drop("_my")
    )
