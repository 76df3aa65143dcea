"""School-events domain (v2): event_id rollups with flattened role lists.

Silver ≈ ``process_scripts/school/basic_preprocessing_school.py``;
gold ≈ ``advanced_preprocessing_school.py:39-88`` incl. driver-side
enrichment: alert-level mode (A10), distinct persons (A14),
duration stddev (A11), flattened person_roles (F13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_backend_spark.core.cleaning import (
    apply_null_defaults,
    clean_strings,
    parse_timestamps,
)
from datalake_backend_spark.operators.mode import mode_expr
from datalake_backend_spark.schemas import NULL_DEFAULTS


def silver(raw: DataFrame) -> DataFrame:
    flat = raw.select(
        "frame_number",
        F.col("timestamp").alias("frame_timestamp"),
        F.explode("detections").alias("d"),
    ).select(
        "frame_number",
        "frame_timestamp",
        F.col("d.*"),
    ).withColumnRenamed("timestamp", "event_timestamp")
    out = clean_strings(flat)
    out = apply_null_defaults(out, NULL_DEFAULTS["school"])
    return parse_timestamps(out, ["frame_timestamp", "event_timestamp"])


def gold(silver_df: DataFrame) -> DataFrame:
    tsec = F.col("event_timestamp").cast("double")
    dur = F.col("duration_seconds").cast("decimal(18,4)")
    n = F.count("duration_seconds").cast("double")
    s = F.sum(dur).cast("double")
    sq = F.sum(dur * dur).cast("double")
    return silver_df.groupBy("event_id").agg(
        F.min_by("event_type", "frame_number").alias("event_type"),
        F.min("event_timestamp").alias("first_seen"),
        F.max("event_timestamp").alias("last_seen"),
        (F.max(tsec) - F.min(tsec)).alias("span_seconds"),
        F.count("*").alias("occurrence_count"),
        F.avg("confidence").alias("avg_confidence"),
        F.min_by("location", "frame_number").alias("location"),
        F.max("response_required").alias("response_required"),
        F.max("multiple_persons_involved").alias("multiple_persons_involved"),
        F.array_sort(F.array_distinct(F.array_compact(
            F.collect_list("involved_person_id")
        ))).alias("persons_involved"),
        mode_expr("alert_level", "alert_level"),
        F.avg("duration_seconds").alias("avg_duration"),
        F.when(n > 1, F.sqrt((sq - s * s / n) / (n - 1.0))).alias("duration_stddev"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("person_roles")))
        ).alias("person_roles"),
    )
