"""Tracking domain: per-tracker detail objects keyed by dynamic ids.

Silver ≈ ``preprocessing/tracking_data.py:23-110`` — but where the
reference builds ``array(struct(lit(key), detections.<key>))`` over a
HARDCODED id list (``:50``, silently dropping unknown trackers), the
declared MapType schema (schemas/domains.py TRACKING_RAW) makes the
explode generic: every id present in the document appears, none named
in code. TZ-suffix strip + timestamp parse + null defaults come from
the shared cleaning kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_backend_spark.core.cleaning import (
    apply_null_defaults,
    clean_strings,
    parse_timestamps,
)
from datalake_backend_spark.schemas import NULL_DEFAULTS


def silver(raw: DataFrame) -> DataFrame:
    """One typed row per (document, tracker_id)."""
    flat = raw.select(
        "video_metadata",
        "processing_time",
        "summary",
        F.explode("detections").alias("tracker_id", "d"),
    ).select("video_metadata", "processing_time", "summary", "tracker_id", "d.*")
    out = clean_strings(flat)
    out = apply_null_defaults(out, NULL_DEFAULTS["tracking"])
    return parse_timestamps(out, ["processing_time", "entry_time", "exit_time"])


def gold(silver_df: DataFrame) -> DataFrame:
    """Per-tracker presence summary (duration from entry/exit times,
    frame span from entry/exit frames)."""
    dur = F.col("exit_time").cast("double") - F.col("entry_time").cast("double")
    return silver_df.select(
        "tracker_id",
        "gender",
        "age",
        "carrying",
        "confidence",
        "entry_time",
        "exit_time",
        dur.alias("duration_seconds"),
        (F.col("exit_frame") - F.col("entry_frame")).alias("frame_span"),
    )
