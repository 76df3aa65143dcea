"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting (on in the engine config) covers joins, but a
single hot group in a ``groupBy`` still lands on one task. The classic
fix is salting: shard each group across ``n_salts`` sub-groups, partial-
aggregate per shard, then merge shards — turning one straggler task
into ``n_salts`` parallel ones at the cost of a second (tiny) shuffle.

Worth it only for algebraic aggregates on genuinely skewed keys (one
camera/video producing most detections, one hot parking lot); for
balanced keys the extra shuffle is pure overhead. The salt is
deterministic (hash of a uniformly distributed column or a random-free
row id), so results are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    count: bool = True,
    max_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation for algebraic aggregates.

    ``salt_source`` defaults to ``monotonically_increasing_id()`` —
    uniformly spreads rows; pass a data column (e.g. frame_number) when
    reproducible sharding matters across identical inputs.
    """
    sum_cols = sum_cols or []
    max_cols = max_cols or []
    min_cols = min_cols or []
    salt = F.pmod(
        F.xxhash64(salt_source if salt_source is not None else F.monotonically_increasing_id()),
        F.lit(n_salts),
    )
    phase1_aggs = []
    phase2_aggs = []
    for c in sum_cols:
        phase1_aggs.append(F.sum(c).alias(f"_s_{c}"))
        phase2_aggs.append(F.sum(f"_s_{c}").alias(f"sum_{c}"))
    if count:
        phase1_aggs.append(F.count("*").alias("_cnt"))
        phase2_aggs.append(F.sum("_cnt").alias("count"))
    for c in max_cols:
        phase1_aggs.append(F.max(c).alias(f"_mx_{c}"))
        phase2_aggs.append(F.max(f"_mx_{c}").alias(f"max_{c}"))
    for c in min_cols:
        phase1_aggs.append(F.min(c).alias(f"_mn_{c}"))
        phase2_aggs.append(F.min(f"_mn_{c}").alias(f"min_{c}"))

    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(*phase1_aggs)
    )
    return partial.groupBy(*group_cols).agg(*phase2_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_source: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate the SMALLER right side ``n_salts``
    times (explode over the salt range) and shard the left side by a
    deterministic salt, so a hot join key's rows spread across
    ``n_salts`` reducers instead of one straggler task.

    AQE's skew-join splitting usually handles this at runtime; the
    explicit form exists for (a) engines/paths where AQE is off, and
    (b) keys so hot a single AQE split is still too coarse. Cost:
    right side scans/shuffles ``n_salts``× — use only when right is
    small relative to the hot key's row count. Result is exactly the
    plain join (salting only re-buckets rows; oracle-checked in r88).

    ``how`` supports ``inner``/``left``: for ``left``, an unmatched
    left row appears once (its single salt shard misses), preserving
    plain-join multiplicity.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    salt = F.pmod(
        F.xxhash64(
            salt_source if salt_source is not None else F.monotonically_increasing_id()
        ),
        F.lit(n_salts),
    ).cast("int")
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_salted, [on, "_salt"], how).drop("_salt")
