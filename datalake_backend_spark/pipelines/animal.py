"""Animal domain: untracked detections grouped by spatial grid key (F8).

Silver ≈ ``basic_preprocessing_animal.py`` (explode, null-row drop P8,
bbox/center F6/F7). Gold ≈ ``advanced_preprocessing_animal.py`` — the
grid-key rollup (A4). Note the reference's common-domain twin has a
missing-``return`` bug (``advanced_preprocessing_common.py:30-40``
yields None); building both from this one module fixes it by
construction (SURVEY §5.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_backend_spark.core.cleaning import apply_null_defaults, clean_strings
from datalake_backend_spark.core.geometry import expand_bbox, grid_key
from datalake_backend_spark.schemas import NULL_DEFAULTS


def silver(raw: DataFrame) -> DataFrame:
    flat = raw.select(
        F.col("frame_number").alias("frame_number_frame"),
        F.col("timestamp").alias("timestamp_frame"),
        F.explode("detections").alias("d"),
    ).select("frame_number_frame", "timestamp_frame", "d.*")
    # null-row drop (basic_preprocessing_animal.py:44)
    flat = flat.na.drop(subset=["class_id", "class_name", "confidence", "bbox", "area"])
    out = clean_strings(flat)
    out = apply_null_defaults(out, NULL_DEFAULTS["animal"])
    out = expand_bbox(out)
    return out.withColumns(
        {
            "center_x": F.coalesce(
                F.col("center.x"), (F.col("bbox_x1") + F.col("bbox_x2")) / 2.0
            ),
            "center_y": F.coalesce(
                F.col("center.y"), (F.col("bbox_y1") + F.col("bbox_y2")) / 2.0
            ),
        }
    )


def gold(silver_df: DataFrame, cell: float = 10.0) -> DataFrame:
    """Proximity-bucket object rollup (A4) keyed by the F8 grid key."""
    keyed = silver_df.withColumn(
        "object_id",
        grid_key(F.col("class_name"), F.col("center_x"), F.col("center_y"), cell),
    )
    return keyed.groupBy("object_id").agg(
        F.min_by("class_name", "frame_number").alias("class_name"),
        F.min("frame_number").alias("first_frame"),
        F.max("frame_number").alias("last_frame"),
        F.count("*").alias("detection_count"),
        F.avg("confidence").alias("avg_confidence"),
        F.avg("area").alias("avg_area"),
        F.min("timestamp").alias("first_timestamp"),
        F.max("timestamp").alias("last_timestamp"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("frame_number").alias("frame_number"),
                    F.col("center_x").alias("x"),
                    F.col("center_y").alias("y"),
                )
            )
        ).alias("positions"),
    )
