"""Mode (most-frequent value) as a distributed aggregate.

A10: the reference computes every mode with ``Counter(...).most_common(1)``
on driver-collected lists (``advanced_preprocessing_vehicle.py:97-102``,
``advanced_preprocessing_people.py:113-124``, ``advanced_preprocessing_safety.py:70-71``,
``school:60-64``) — O(rows) driver memory. ``Counter.most_common`` breaks
ties by insertion order, which is nondeterministic under distribution;
this operator pins the tie-break to *highest count, then smallest value*
so results are reproducible on any cluster.

Implementation: count-per-(key,value) then a ``max_by`` over a struct
whose ordering encodes the tie-break — two map-side-combinable hash
aggregates, no window, no sort. Scales as a pair of shuffles on the
group key (the first shuffle's cardinality is |key × distinct values|,
which for low-cardinality attribute columns AQE coalesces to almost
nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mode_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str | None = None,
    exclude: list[str] | None = None,
) -> DataFrame:
    """Per-group mode of ``value_col`` with deterministic tie-break.

    ``exclude`` drops sentinel values before counting (the reference
    skips ``'Unknown'`` when picking people attributes —
    ``advanced_preprocessing_people.py:113-124``).
    """
    out_col = out_col or f"{value_col}_mode"
    counted = df.where(F.col(value_col).isNotNull())
    if exclude:
        counted = counted.where(~F.col(value_col).isin(exclude))
    counted = counted.groupBy(*group_cols, value_col).agg(F.count("*").alias("_cnt"))
    # max_by over (count, reversed value) — highest count wins, then the
    # smallest value. For string values we invert ordering via a struct
    # sort key: max on (cnt asc? no) — use min_by on (-cnt, value).
    return (
        counted.groupBy(*group_cols)
        .agg(
            F.min_by(
                F.col(value_col), F.struct((-F.col("_cnt")).alias("n"), F.col(value_col).alias("v"))
            ).alias(out_col)
        )
    )


def mode_expr(value_col: str, out_col: str, exclude: list[str] | None = None):
    """Window-free mode for use inside a single ``groupBy().agg()`` when
    the caller already aggregates other columns: collect counts via a
    map and pick deterministically. Prefer :func:`mode_agg` (no array
    materialization) when mode is the only aggregate; use this to avoid
    a second shuffle when piggybacking on an existing rollup.

    Implemented as ``min_by`` over a (count, value) struct computed from
    a ``collect_list`` → ``aggregate`` fold — still JVM-side, but holds
    one group's values in memory; fine for per-track attribute lists
    (bounded by frames-per-video), not for unbounded groups.
    """
    source = F.col(value_col)
    if exclude:
        source = F.when(~F.col(value_col).isin(exclude), F.col(value_col))
    values = F.array_compact(F.collect_list(source))
    distinct = F.array_distinct(values)
    counts = F.transform(
        distinct,
        lambda v: F.struct(
            (-F.aggregate(
                values, F.lit(0), lambda acc, x: acc + F.when(x == v, 1).otherwise(0)
            )).cast("long").alias("n"),
            v.alias("v"),
        ),
    )
    return F.array_min(counts).getField("v").alias(out_col)


def mode_of_array(values, out_col: str):
    """Mode of an already-collected array column (same tie-break)."""
    distinct = F.array_distinct(F.array_compact(values))
    counts = F.transform(
        distinct,
        lambda v: F.struct(
            (-F.aggregate(
                F.array_compact(values),
                F.lit(0),
                lambda acc, x: acc + F.when(x == v, 1).otherwise(0),
            )).cast("long").alias("n"),
            v.alias("v"),
        ),
    )
    return F.array_min(counts).getField("v").alias(out_col)
