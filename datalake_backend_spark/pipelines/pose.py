"""Pose domain: keypoint arrays, confidence filter, frame-gap durations.

Silver ≈ ``basic_preprocessing_pose.py``: ``frame``→``frame_number``
alias (P2), explode pose entries, drop confidence ≤ 0.1 (P4), keep the
33-landmark keypoint array as ``array<struct>``. Gold: per-action stats
incl. the W9 frame-gap duration (``split_pose_data/split_pose.py:80-86``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_backend_spark.operators.windows import frame_gap_durations
from datalake_backend_spark.schemas import NULL_DEFAULTS
from datalake_backend_spark.core.cleaning import apply_null_defaults

CONFIDENCE_FLOOR = 0.1


def silver(raw: DataFrame) -> DataFrame:
    base = raw.withColumn(
        "frame_number", F.coalesce("frame_number", "frame")
    ).drop("frame")
    flat = base.select("frame_number", F.explode("pose_data").alias("p")).select(
        "frame_number",
        F.col("p.keypoints").alias("keypoints"),
        F.col("p.action").alias("action"),
        F.col("p.confidence").alias("confidence"),
    )
    flat = apply_null_defaults(flat, NULL_DEFAULTS["pose"])
    return flat.where(F.col("confidence") > CONFIDENCE_FLOOR)


def gold(silver_df: DataFrame, fps: float = 30.0) -> DataFrame:
    """Per-action summary with gap-aware duration (W9)."""
    durations = frame_gap_durations(
        silver_df, ["action"], frame_seconds=1.0 / fps, out_col="duration_seconds"
    )
    stats = silver_df.groupBy("action").agg(
        F.count("*").alias("frame_count"),
        F.avg("confidence").alias("avg_confidence"),
        F.min("frame_number").alias("first_frame"),
        F.max("frame_number").alias("last_frame"),
        F.avg(
            F.aggregate(
                F.col("keypoints"),
                F.lit(0.0),
                lambda acc, kp: acc + kp.getField("visibility"),
            )
            / F.greatest(F.size("keypoints"), F.lit(1))
        ).alias("avg_visibility"),
    )
    return stats.join(durations, "action", "left")
