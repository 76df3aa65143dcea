"""Safety domain: PPE gear rollups, all list-walking replaced by aggregates.

Silver ≈ ``basic_preprocessing_safety.py`` (explode ``people`` per frame).
Gold ≈ ``advanced_preprocessing_safety.py`` including its RDD-map
enrichment (``:113-123``): per-gear violation counts count ``false OR
null`` (null = undetermined counts as a violation, ``:64-67``), gear
booleans are any-true (A12), most-common missing item is a mode over the
flattened ``missing_items`` arrays, and bbox movement (W4) is the same
window-step pattern as vehicle — zero driver-side math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datalake_backend_spark.core.cleaning import apply_null_defaults, clean_strings
from datalake_backend_spark.core.geometry import expand_bbox, with_centers
from datalake_backend_spark.operators.mode import mode_of_array
from datalake_backend_spark.operators.rollup import count_if
from datalake_backend_spark.schemas import NULL_DEFAULTS


def silver(raw: DataFrame) -> DataFrame:
    flat = raw.select(
        "frame_number", F.explode("people").alias("p")
    ).select("frame_number", "p.*")
    out = clean_strings(flat)
    out = apply_null_defaults(out, NULL_DEFAULTS["safety"])
    return expand_bbox(out)


def gold(silver_df: DataFrame) -> DataFrame:
    valid = silver_df.where(
        F.col("tracker_id").isNotNull() & (F.col("tracker_id") != -1)
    )
    d = with_centers(valid)
    w = Window.partitionBy("tracker_id").orderBy("frame_number")
    step = F.hypot(
        F.col("center_x") - F.lag("center_x").over(w),
        F.col("center_y") - F.lag("center_y").over(w),
    )
    stepped = d.withColumn("_step_dist", step)

    def violation(col: str) -> F.Column:
        # false OR null counts as a violation (advanced_preprocessing_safety.py:64-67)
        return count_if(~F.coalesce(F.col(col), F.lit(False)))

    return stepped.groupBy("tracker_id").agg(
        F.min("frame_number").alias("first_frame"),
        F.max("frame_number").alias("last_frame"),
        F.count("*").alias("frame_count"),
        F.min_by("safety_status", "frame_number").alias("initial_safety_status"),
        F.max_by("safety_status", "frame_number").alias("final_safety_status"),
        F.max(F.coalesce(F.col("hardhat"), F.lit(False))).alias("had_hardhat"),
        F.max(F.coalesce(F.col("mask"), F.lit(False))).alias("had_mask"),
        F.max(F.coalesce(F.col("safety_vest"), F.lit(False))).alias("had_safety_vest"),
        violation("hardhat").alias("hardhat_violations"),
        violation("mask").alias("mask_violations"),
        violation("safety_vest").alias("safety_vest_violations"),
        count_if(F.col("safety_status") == "Unsafe").alias("total_unsafe_frames"),
        mode_of_array(
            F.flatten(F.collect_list("missing_items")), "most_common_missing_item"
        ),
        F.count("bbox_x1").alias("bbox_count"),
        F.coalesce(F.sum("_step_dist"), F.lit(0.0)).alias("bbox_movement_estimate"),
    )
