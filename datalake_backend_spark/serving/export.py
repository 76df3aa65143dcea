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


# ---------------------------------------------------------------------------
# Reference-parity ES export projections
# ---------------------------------------------------------------------------

#: fields the reference's uploaders stamp at ingest time, not derived
#: from the data (``Send_Data_To_DataLake/processing_*.py``: every
#: uploader adds @timestamp/source_file/processing_date/
#: processing_version before indexing; @timestamp additionally via the
#: ``*_timestamp_pipeline`` ingest pipelines in ``*_Dev_Tool.txt``)
ES_INGEST_METADATA = frozenset(
    {"@timestamp", "source_file", "processing_date", "processing_version"}
)

#: the reference's index names, one per domain
#: (``Documentations/*_Dev_Tool.txt`` PUT lines)
ES_INDEX_NAMES = {
    "vehicle": "datalake-vehicle-data",
    "people": "datalake-people-data",
    "parking": "datalake-parking-data",
    "safety": "datalake-safety-data",
    "pose": "datalake-pose-data",
    "animal": "datalake-animal-data",
    "geolocation": "datalake-geolocation-data",
    "common": "datalake-common-data",
}

#: which tier feeds each domain's index: vehicle/people/parking upload
#: one doc per TRACKED ENTITY (the enriched per-track dicts —
#: ``processing_vehicle.py:108-137``, ``processing_people.py:54-66``,
#: ``processing_parkingLot.py:53-67``); the rest upload one doc per
#: DETECTION/FRAME (``processing_animal.py:53-65`` et al. iterate
#: ``frame_detections``)
ES_EXPORT_TIER = {
    "vehicle": "gold",
    "people": "gold",
    "parking": "gold",
    "safety": "silver",
    "pose": "silver",
    "animal": "silver",
    "geolocation": "silver",
    "common": "silver",
}


def es_export_frame(domain: str, df: DataFrame) -> DataFrame:
    """Project a domain's gold/silver frame (see :data:`ES_EXPORT_TIER`)
    to the EXACT field names + shapes the reference's Elasticsearch
    index expects — the de-facto schema registry in
    ``Send_Data_To_DataLake/Documentations/*_Dev_Tool.txt`` — so a
    user migrating dashboards can point them at our bulk export
    unchanged. Every rename/derivation below mirrors a specific
    uploader transform (cited inline); engine-internal columns that
    the reference never indexes are dropped.

    Feed the result to :func:`bulk_index_lines` /
    :func:`write_bulk_export` with ``ES_INDEX_NAMES[domain]``; the
    exporter stamps ``@timestamp`` (and callers add
    source_file/processing_date/processing_version when tracking
    file-level lineage) exactly like the reference's ingest pipeline.
    """
    if domain == "vehicle":
        # processing_vehicle.py:118-132 — counts collapse to booleans,
        # first/last_detection rename to entry/exit_time, vehicle key
        # becomes vehicle_id; Vehicle_Dev_Tool.txt:36-38 flattens the
        # time_spent_per_direction dict to one float field per key
        tspd = F.col("time_spent_per_direction")
        return df.select(
            F.col("tracker_id").alias("vehicle_id"),
            "vehicle_type",
            "vehicle_color",
            "confidence_avg",
            F.col("first_detection").alias("entry_time"),
            F.col("last_detection").alias("exit_time"),
            "duration_seconds",
            (F.col("stopped_duration") > 0).alias("stopped"),
            "frame_count",
            "avg_speed",
            "max_speed",
            "min_speed",
            "speed_variation",
            "lane_changes",
            "initial_lane",
            "final_lane",
            "most_common_lane",
            "lane_change_frequency",
            (F.col("line_crossing_count") > 0).alias("line_crossing_violation"),
            "direction",
            "direction_changes",
            (F.col("red_light_violation_count") > 0).alias("red_light_violation"),
            F.coalesce(tspd["Unknown"], F.lit(0.0)).alias(
                "time_spent_per_direction_Unknown"
            ),
            F.coalesce(tspd["Down"], F.lit(0.0)).alias(
                "time_spent_per_direction_Down"
            ),
            F.coalesce(tspd["Up"], F.lit(0.0)).alias(
                "time_spent_per_direction_Up"
            ),
            "total_distance",
            "movement_angles",
            "avg_movement_angle",
        )
    if domain == "people":
        # processing_people.py:57-62
        return df.select(
            F.col("tracker_id").alias("people_id"),
            "age",
            "gender",
            "carrying",
            "confidence_avg",
            "entered_restricted_area",
            "restricted_area_entry_time",
            F.col("first_detection").alias("entry_time"),
            F.col("last_detection").alias("exit_time"),
            "duration_seconds",
            "frame_count",
        )
    if domain == "parking":
        # processing_parkingLot.py:53-67 — one doc per slot; sessions
        # ride as the nested entry_time/exit_time/duration structs of
        # advanced_preprocessing_parkingLot.py:73-77 (session_id is
        # engine-internal, dropped). slot_id stays string: the
        # reference itself casts it to string
        # (advanced_preprocessing_parkingLot.py:42) even though
        # Parking_Dev_Tool.txt declares integer — ES coerces numeric
        # strings on index.
        return df.select(
            "slot_id",
            "slot_status",
            "total_occupied_seconds",
            "total_free_seconds",
            "free_percentage",
            "became_free",
            "became_occupied",
            F.transform(
                "parking_sessions",
                lambda s: F.struct(
                    s["entry_time"].alias("entry_time"),
                    s["exit_time"].alias("exit_time"),
                    s["duration"].alias("duration"),
                ),
            ).alias("parking_sessions"),
        )
    if domain == "safety":
        # Safety_Dev_Tool.txt:5-20 — per-detection docs; hardhat/mask/
        # safety_vest index under wearing_* names; the engine's
        # flattened bbox_x1..y2 convenience columns are not indexed
        return df.select(
            "frame_number",
            "tracker_id",
            F.col("hardhat").alias("wearing_hardhat"),
            F.col("mask").alias("wearing_mask"),
            F.col("safety_vest").alias("wearing_safety_vest"),
            "safety_status",
            "missing_items",
            "bbox",
        )
    if domain == "pose":
        # Pose_Dev_Tool.txt:5-40 — keypoints nested with INTEGER
        # landmark_id (the raw emits floats; the index contract wants
        # the ordinal)
        return df.select(
            "frame_number",
            "action",
            "confidence",
            F.transform(
                "keypoints",
                lambda k: F.struct(
                    k["landmark_id"].cast("int").alias("landmark_id"),
                    k["x"].alias("x"),
                    k["y"].alias("y"),
                    k["z"].alias("z"),
                    k["visibility"].alias("visibility"),
                ),
            ).alias("keypoints"),
        )
    if domain == "animal":
        # Animal_Dev_Tool.txt:5-15 — per-detection docs named
        # animal_type/video_timestamp (the doc'd example at :34-38)
        return df.select(
            F.col("class_name").alias("animal_type"),
            "confidence",
            "area",
            "frame_number",
            F.col("timestamp").alias("video_timestamp"),
        )
    if domain == "geolocation":
        # Geolocation_Dev_Tool.txt:5-24; geolocation_latitude/
        # longitude flattening mirrors basic_preprocessing_geolocation
        # .py:27. class_id and timestamp are declared in the mapping
        # but the producer never emits them
        # (Create_Json_Data/vehicle_service/main.py:336-342) — absent
        # here too.
        return df.select(
            "frame_number",
            F.col("class_name").alias("class"),
            "confidence",
            "bbox",
            "bbox_x1",
            "bbox_y1",
            "bbox_x2",
            "bbox_y2",
            F.col("latitude").alias("geolocation_latitude"),
            F.col("longitude").alias("geolocation_longitude"),
        )
    if domain == "common":
        # Common_Dev_Tool.txt:5-22 — bbox is an OBJECT of integer
        # corners, not the engine's array form
        b = F.col("bbox")
        return df.select(
            "frame_number",
            "tracker_id",
            "class_id",
            "class_name",
            "confidence",
            F.struct(
                b[0].cast("int").alias("x1"),
                b[1].cast("int").alias("y1"),
                b[2].cast("int").alias("x2"),
                b[3].cast("int").alias("y2"),
            ).alias("bbox"),
        )
    raise ValueError(f"no ES export projection for domain {domain!r}")
