"""Vehicle domain: the reference's flagship pipeline, Spark-first.

Silver reproduces ``Preprocess_Json_Data/preprocessing/basic_preprocessing_vehicle.py``
(explode E1, renames P2, defaults F2, bbox expansion F6, timestamp parse
F4/F5) as one chain of narrow projections — a single map stage.

Gold reproduces ``advanced_preprocessing_vehicle.py`` (A1 rollup) PLUS
everything its driver-side ``_enrich_vehicle_data`` computes after
``collect()`` (mode A10, stddev A11, lane/direction changes W1, time per
direction W2, stopped duration W3, trajectory W4) — entirely in Spark:
one window pass over tracker_id adds lag-derived step columns, then one
hash aggregate per tracker computes every metric. Because the window
already hash-partitions by tracker_id, the aggregate reuses that
exchange — the whole gold stage is ONE shuffle regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datalake_backend_spark.core.cleaning import (
    apply_null_defaults,
    clean_strings,
    parse_timestamps,
)
from datalake_backend_spark.core.geometry import expand_bbox, with_centers
from datalake_backend_spark.operators.mode import mode_expr
from datalake_backend_spark.operators.rollup import count_if
from datalake_backend_spark.schemas import NULL_DEFAULTS, RENAMES, TIMESTAMP_COLUMNS

FRAME_COLS = ["frame_number", "congestion_level", "traffic_light"]


def silver(raw: DataFrame) -> DataFrame:
    """Raw frame documents → one typed row per detection."""
    exploded = raw.select(
        *FRAME_COLS, F.explode("detections").alias("d")
    ).select(*FRAME_COLS, "d.*")
    renamed = exploded.withColumnsRenamed(RENAMES["vehicle"])
    out = clean_strings(renamed)
    out = apply_null_defaults(out, NULL_DEFAULTS["vehicle"])
    out = parse_timestamps(out, TIMESTAMP_COLUMNS["vehicle"])
    return expand_bbox(out)


def gold(silver_df: DataFrame) -> DataFrame:
    """Per-tracker summary with every reference enrichment, one shuffle."""
    valid = silver_df.where(
        F.col("tracker_id").isNotNull() & (F.col("tracker_id") != -1)
    )
    d = with_centers(valid)

    w = Window.partitionBy("tracker_id").orderBy("frame_number")
    ts = F.coalesce(F.col("entry_time"), F.col("exit_time"))
    tsec = ts.cast("double")
    prev = {
        c: F.lag(F.col(c)).over(w)
        for c in ("lane", "direction", "center_x", "center_y", "stopped")
    }
    prev_tsec = F.lag(tsec).over(w)
    stepped = d.select(
        "*",
        ts.alias("_ts"),
        (tsec - prev_tsec).alias("_dt"),
        (prev["lane"].isNotNull() & (F.col("lane") != prev["lane"]))
        .cast("long")
        .alias("_lane_chg"),
        (prev["direction"].isNotNull() & (F.col("direction") != prev["direction"]))
        .cast("long")
        .alias("_dir_chg"),
        F.lag("stopped").over(w).alias("_prev_stopped"),
        F.lag("direction").over(w).alias("_prev_dir"),
        F.hypot(
            F.col("center_x") - prev["center_x"], F.col("center_y") - prev["center_y"]
        ).alias("_step_dist"),
        F.degrees(
            F.atan2(
                F.col("center_y") - prev["center_y"],
                F.col("center_x") - prev["center_x"],
            )
        ).alias("_step_angle"),
    )

    base = stepped.groupBy("tracker_id").agg(
        mode_expr("class_name", "vehicle_type"),
        mode_expr("vehicle_color", "vehicle_color"),
        F.avg("confidence").alias("confidence_avg"),
        F.min("_ts").alias("first_detection"),
        F.max("_ts").alias("last_detection"),
        (F.max(tsec) - F.min(tsec)).alias("duration_seconds"),
        F.coalesce(
            F.sum(F.when(F.col("_prev_stopped"), F.col("_dt"))), F.lit(0.0)
        ).alias("stopped_duration"),
        F.count("*").alias("frame_count"),
        F.avg("speed").alias("avg_speed"),
        F.max("speed").alias("max_speed"),
        F.min("speed").alias("min_speed"),
        F.stddev_samp("speed").alias("speed_variation"),
        F.sum("_lane_chg").alias("lane_changes"),
        F.min_by("lane", "frame_number").alias("initial_lane"),
        F.max_by("lane", "frame_number").alias("final_lane"),
        mode_expr("lane", "most_common_lane"),
        count_if(F.col("line_crossing")).alias("line_crossing_count"),
        mode_expr("direction", "direction"),
        F.sum("_dir_chg").alias("direction_changes"),
        count_if(F.col("red_light_violation")).alias("red_light_violation_count"),
        F.coalesce(F.sum("_step_dist"), F.lit(0.0)).alias("total_distance"),
        F.filter(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("frame_number").alias("f"),
                            F.col("_step_angle").alias("a"),
                        )
                    )
                ),
                lambda s: s.getField("a"),
            ),
            lambda a: a.isNotNull(),
        ).alias("movement_angles"),
        F.avg("_step_angle").alias("avg_movement_angle"),
    ).withColumn(
        "lane_change_frequency",
        F.when(
            F.col("frame_count") > 0,
            F.col("lane_changes").cast("double") / F.col("frame_count"),
        ).otherwise(0.0),
    )

    # time-spent-per-direction (W2): per (tracker, prev_direction) sums →
    # map column; separate two-level aggregate joined back on tracker_id.
    per_dir = (
        stepped.where(F.col("_prev_dir").isNotNull() & F.col("_dt").isNotNull())
        .groupBy("tracker_id", "_prev_dir")
        .agg(F.sum("_dt").alias("_secs"))
        .groupBy("tracker_id")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_prev_dir").alias("k"), F.col("_secs").alias("v")))
                )
            ).alias("time_spent_per_direction")
        )
    )
    return base.join(per_dir, "tracker_id", "left")
