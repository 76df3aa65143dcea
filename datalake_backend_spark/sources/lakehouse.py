"""Lakehouse table format + bucketing policy.

The north-star deployment stores zones as Delta/Iceberg tables
(BASELINE.json: "DataFrame API over Delta/Iceberg tables"); this
environment ships neither jar, so the format resolves at runtime:
Delta if importable, else plain parquet with the same API. Everything
engine-side is format-agnostic — only this module knows.

Bucketing: gold tables that are repeatedly joined on a key (track ids,
doc ids, bucket keys) are written ``bucketBy(n, key)`` so later joins
and aggregations on that key are co-located — no shuffle at read time.
At 100 TB this is the difference between an exchange of the whole fact
table and none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - not in this environment
    from delta.tables import DeltaTable  # noqa: F401

    DELTA_AVAILABLE = True
except Exception:  # ImportError or missing jars
    DELTA_AVAILABLE = False

TABLE_FORMAT = "delta" if DELTA_AVAILABLE else "parquet"


def write_zone(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Zone write in the resolved table format."""
    w = df.write.format(TABLE_FORMAT).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_zone(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format(TABLE_FORMAT).load(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed managed table: joins/aggregations on
    ``bucket_col`` read co-located buckets and skip the exchange."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(name, format="parquet")
