"""Search-index export: gold rows as bulk-indexable JSON lines.

The reference indexes into Elasticsearch one HTTP call per document
(S11 anti-pattern, ``Send_Data_To_DataLake/processing_vehicle.py:153-158``;
mappings in ``Documentations/*_Dev_Tool.txt``). The engine's serving
layer is SQL views, but deployments that still want a search index get
this: the standard bulk NDJSON format (action line + source line),
rendered entirely by column expressions and written as partitioned text
files any bulk loader can stream. ``@timestamp`` is stamped at export
(matching the reference's ingest pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bulk_index_lines(
    df: DataFrame,
    index: str,
    id_col: str | None = None,
    timestamp: bool = True,
) -> DataFrame:
    """One ``value`` column of alternating action/source NDJSON lines.

    Rendered as a single text column per row (action + "\\n" + source),
    so writing with the text sink yields a valid bulk payload.
    """
    doc = df
    if timestamp:
        doc = doc.withColumn(
            "@timestamp", F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssX")
        )
    action = (
        F.concat(
            F.lit('{"index": {"_index": "' + index + '", "_id": "'),
            F.col(id_col).cast("string"),
            F.lit('"}}'),
        )
        if id_col
        else F.lit('{"index": {"_index": "' + index + '"}}')
    )
    source = F.to_json(F.struct(*[F.col(c) for c in doc.columns]))
    return doc.select(F.concat(action, F.lit("\n"), source).alias("value"))


def write_bulk_export(
    df: DataFrame, path: str, index: str, id_col: str | None = None
) -> None:
    """Land the bulk payload as text part-files (one per partition — a
    bulk loader POSTs each file; no driver round-trip, no per-doc HTTP)."""
    bulk_index_lines(df, index, id_col).write.mode("overwrite").text(path)
