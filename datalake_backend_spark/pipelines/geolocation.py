"""Geolocation domain: flat detections with lat/lon structs.

Silver ≈ ``basic_preprocessing_geolocation.py``: renames (P2),
confidence filter (P4), struct field extraction (P1). Gold: per-class
spatial summary (the splitter's distribution block, A13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_backend_spark.core.cleaning import apply_null_defaults, clean_strings
from datalake_backend_spark.core.geometry import expand_bbox
from datalake_backend_spark.schemas import NULL_DEFAULTS, RENAMES

CONFIDENCE_FLOOR = 0.1


def silver(raw: DataFrame) -> DataFrame:
    renamed = raw.withColumnsRenamed(RENAMES["geolocation"])
    out = clean_strings(renamed)
    out = apply_null_defaults(out, NULL_DEFAULTS["geolocation"])
    out = out.where(F.col("confidence") > CONFIDENCE_FLOOR)
    return expand_bbox(out).withColumns(
        {
            "latitude": F.col("geolocation.latitude"),
            "longitude": F.col("geolocation.longitude"),
        }
    )


def gold(silver_df: DataFrame) -> DataFrame:
    return silver_df.groupBy("class_name").agg(
        F.count("*").alias("detection_count"),
        F.avg("confidence").alias("avg_confidence"),
        F.avg("latitude").alias("avg_latitude"),
        F.avg("longitude").alias("avg_longitude"),
        F.min("latitude").alias("min_latitude"),
        F.max("latitude").alias("max_latitude"),
        F.min("longitude").alias("min_longitude"),
        F.max("longitude").alias("max_longitude"),
    )
