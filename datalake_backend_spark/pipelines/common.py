"""Common-object domain: flat tracked detections.

Silver ≈ ``basic_processing_common.py`` (cast bbox ints→double, clean,
re-nest for output). Gold: per-tracker rollup when tracker_id is valid,
falling back to the animal-style grid key otherwise — fixing the
reference's ``_group_data``-returns-None bug
(``advanced_preprocessing_common.py:30-40``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_backend_spark.core.cleaning import apply_null_defaults, clean_strings
from datalake_backend_spark.core.geometry import expand_bbox, grid_key, with_centers
from datalake_backend_spark.schemas import NULL_DEFAULTS


def silver(raw: DataFrame) -> DataFrame:
    out = clean_strings(raw)
    out = apply_null_defaults(out, NULL_DEFAULTS["common"])
    return with_centers(expand_bbox(out))


def gold(silver_df: DataFrame, cell: float = 10.0) -> DataFrame:
    keyed = silver_df.withColumn(
        "object_id",
        F.when(
            F.col("tracker_id").isNotNull() & (F.col("tracker_id") != -1),
            F.col("tracker_id").cast("string"),
        ).otherwise(
            grid_key(F.col("class_name"), F.col("center_x"), F.col("center_y"), cell)
        ),
    )
    return keyed.groupBy("object_id").agg(
        F.min_by("class_name", "frame_number").alias("class_name"),
        F.min("frame_number").alias("first_frame"),
        F.max("frame_number").alias("last_frame"),
        F.count("*").alias("detection_count"),
        F.avg("confidence").alias("avg_confidence"),
    )
