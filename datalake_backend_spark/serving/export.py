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
    # action line via to_json, never string concat — ids/index names
    # containing quotes/backslashes/newlines stay one valid NDJSON line
    meta = [F.lit(index).alias("_index")]
    if id_col:
        meta.append(F.col(id_col).cast("string").alias("_id"))
    action = F.to_json(F.struct(F.struct(*meta).alias("index")))
    source = F.to_json(F.struct(*[F.col(c) for c in doc.columns]))
    return doc.select(F.concat(action, F.lit("\n"), source).alias("value"))


def write_bulk_export(
    df: DataFrame, path: str, index: str, id_col: str | None = None
) -> None:
    """Land the bulk payload as text part-files (one per partition — a
    bulk loader POSTs each file; no driver round-trip, no per-doc HTTP)."""
    bulk_index_lines(df, index, id_col).write.mode("overwrite").text(path)


def index_mapping(df: DataFrame, text_cols: tuple = ("text",)) -> dict:
    """Derive the search-index mapping (Elasticsearch ``mappings``
    shape) from a DataFrame schema — the generated twin of the
    reference's hand-written mapping files
    (``Documentations/*_Dev_Tool.txt``), so the index schema can never
    drift from the gold schema that feeds it.

    Scalars map to their native ES type; strings default to
    ``keyword`` (gold columns are categorical/ids) unless named in
    ``text_cols`` (free text → ``text`` with a ``.raw`` keyword
    subfield); arrays use their element type (ES arrays are implicit);
    structs become ``object`` with recursive properties; maps become
    dynamic objects."""
    from pyspark.sql import types as T

    def prop(dt, name):
        if isinstance(dt, T.ArrayType):
            return prop(dt.elementType, name)
        if isinstance(dt, T.StructType):
            return {
                "properties": {
                    f.name: prop(f.dataType, f.name) for f in dt.fields
                }
            }
        if isinstance(dt, T.MapType):
            return {"type": "object", "dynamic": True}
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            return {"type": "date"}
        if isinstance(dt, T.StringType):
            if name in text_cols:
                return {
                    "type": "text",
                    "fields": {"raw": {"type": "keyword"}},
                }
            return {"type": "keyword"}
        if isinstance(dt, T.BooleanType):
            return {"type": "boolean"}
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            return {"type": "double"}
        if isinstance(dt, (T.LongType,)):
            return {"type": "long"}
        if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
            return {"type": "integer"}
        if isinstance(dt, T.DecimalType):
            return {"type": "double"}
        if isinstance(dt, T.BinaryType):
            return {"type": "binary"}
        return {"type": "keyword"}

    return {
        "mappings": {
            "properties": {
                f.name: prop(f.dataType, f.name) for f in df.schema.fields
            }
        }
    }


def write_index_template(
    df: DataFrame, path: str, index: str, text_cols: tuple = ("text",)
) -> dict:
    """Write the derived mapping as ``{path}`` (JSON) for a one-call
    ``PUT /{index}`` when a live cluster exists; returns the dict."""
    import json as _json

    body = {"index": index, **index_mapping(df, text_cols)}
    with open(path, "w") as fh:
        _json.dump(body, fh, indent=1, sort_keys=True)
    return body


def bulk_change_lines(
    changes: DataFrame, index: str, id_col: str | list[str]
) -> DataFrame:
    """Render a CDF changelog (`op` ∈ insert/update/delete + key/value
    columns, the `VersionedTable.changes` shape) as bulk NDJSON:
    inserts/updates become `index` actions (idempotent upsert by _id),
    deletes become `delete` actions. Column expressions only."""
    doc_cols = [c for c in changes.columns if c != "op"]
    # escape-safe action lines (to_json) and a collision-free composite
    # _id: a single key uses its string form, multiple keys serialize
    # as a JSON array (separator-joined ids collide when a value
    # contains the separator)
    keys = [id_col] if isinstance(id_col, str) else list(id_col)
    if len(keys) == 1:
        _id = F.col(keys[0]).cast("string")
    else:
        _id = F.to_json(F.array(*[F.col(k).cast("string") for k in keys]))
    meta = F.struct(F.lit(index).alias("_index"), _id.alias("_id"))
    action_index = F.to_json(F.struct(meta.alias("index")))
    action_delete = F.to_json(F.struct(meta.alias("delete")))
    source = F.to_json(F.struct(*[F.col(c) for c in doc_cols]))
    return changes.select(
        F.when(F.col("op") == "delete", action_delete)
        .otherwise(F.concat(action_index, F.lit("\n"), source))
        .alias("value")
    )


def sync_index_incremental(
    spark,
    tbl,
    cursor_path: str,
    out_dir: str,
    index: str,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> tuple[int, int] | None:
    """Incremental search-index sync: ship ONLY what changed in the
    gold table since the last sync, as one bulk-NDJSON delta per span.

    Composes :class:`~datalake_backend_spark.sources.versioned
    .ChangeConsumer` (checkpointed cursor, replay-on-crash) with
    :func:`bulk_change_lines`: each call writes
    ``{out_dir}/span_{v_from}_{v_to}/`` containing index actions for
    inserts/updates and delete actions for deletes, then acks. Bulk
    actions are idempotent by ``_id`` (index overwrites, delete of a
    missing doc is a no-op), so a replayed span converges — exactly
    the reference's Elasticsearch serving story
    (``Send_Data_To_DataLake/processing_vehicle.py:143-158``) without
    its full-reindex-per-upload cost OR its per-document HTTP loop.
    Returns the synced ``(v_from, v_to)`` span, or ``None`` if caught
    up."""
    import os

    from datalake_backend_spark.sources.versioned import ChangeConsumer

    con = ChangeConsumer(tbl, cursor_path)
    polled = con.poll(spark, key_cols, compare_cols)
    if polled is None:
        return None
    changes, span = polled
    path = os.path.join(out_dir, f"span_{span[0]}_{span[1]}")
    bulk_change_lines(changes, index, key_cols).write.mode(
        "overwrite"
    ).text(path)
    con.ack(span)
    return span
