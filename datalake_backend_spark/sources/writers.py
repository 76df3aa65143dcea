"""Sinks: medallion parquet writers + reference-shaped JSON documents.

The reference's sinks (SURVEY §2.1 S2-S6) round-trip through the driver:
write temp JSON → re-read → ``toJSON().collect()`` → string-join →
``put_object`` (``minio_connector.py:45-80``). Here every JSON shape is
produced by ONE aggregate expression (``to_json`` over ``collect_list``)
executed on the cluster, and lands via a single-task text write — no
driver materialization, no temp objects.

The primary lake format stays columnar: :func:`write_table` writes
partitioned parquet (bronze/silver/gold); JSON document shapes exist for
compatibility with the reference's serving edge only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Columnar zone writer. Partition columns default to none; at lake
    scale pass (domain, ingest_date) — aligned with how every query
    filters, so partition pruning applies."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def json_array_document(df: DataFrame, sort_cols: list[str] | None = None) -> DataFrame:
    """S2 equivalent: the whole frame as ONE ``[{...}, ...]`` JSON string
    (single-row DataFrame, column ``json``). With ``sort_cols`` the
    array is deterministically ordered via array_sort over structs whose
    leading fields are the sort keys; without them the rows are packed
    as-is (struct ordering is undefined for map-typed fields, so we
    don't attempt it)."""
    cols = list(df.columns)
    if sort_cols:
        cols = [*sort_cols, *[c for c in cols if c not in sort_cols]]
        packed = F.array_sort(
            F.collect_list(F.struct(*[F.col(c).alias(c) for c in cols]))
        )
    else:
        packed = F.collect_list(F.struct(*[F.col(c).alias(c) for c in cols]))
    return df.agg(F.to_json(packed).alias("json"))


def wrapped_json_document(
    df: DataFrame, key: str = "frame_detections", sort_cols: list[str] | None = None
) -> DataFrame:
    """S3 equivalent: ``{"<key>": [rows...]}`` as one JSON string."""
    arr = json_array_document(df, sort_cols)
    return arr.select(
        F.concat(F.lit('{"' + key + '": '), F.col("json"), F.lit("}")).alias("json")
    )


def single_row_json(df: DataFrame) -> DataFrame:
    """S6 equivalent: first row rendered as one JSON object string —
    ``to_json(struct(*))`` instead of ``collect()[0].asDict``."""
    return df.limit(1).select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("json")
    )


def write_json_document(doc_df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Land a 1-row ``json``-column document as a single text object."""
    doc_df.coalesce(1).write.mode(mode).text(path)
