"""Feature splitter: gold rollups → per-feature views + statistics.

The reference's splitters (``Preprocess_Json_Data/split_*_data/*.py``)
download refined JSON with boto3 and, in pure Python, carve it into
feature-oriented files (per-attribute projections) plus a statistics
block of distributions and min/avg/max aggregates
(``split_vehicle_data/split_vehicle.py:64-137`` and five siblings).

Here a splitter is a declarative spec: which columns form each feature
view, which attributes get distributions, which numerics get summary
stats. One pass over gold; every output shares the scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from datalake_backend_spark.operators.distributions import (
    numeric_summary,
    value_distribution,
)


@dataclass(frozen=True)
class SplitSpec:
    """Per-domain splitter description."""

    #: feature-view name → columns to project (id cols always included)
    features: dict[str, list[str]]
    #: attribute columns to histogram
    dist_cols: list[str] = field(default_factory=list)
    #: numeric columns for the statistics block
    stat_cols: list[str] = field(default_factory=list)
    #: id columns prefixed to every feature view
    id_cols: list[str] = field(default_factory=lambda: ["tracker_id"])


#: Mirrors the reference's per-domain split files (same groupings).
SPLIT_SPECS: dict[str, SplitSpec] = {
    "vehicle": SplitSpec(
        features={
            "identity": ["vehicle_type", "vehicle_color", "confidence_avg"],
            "movement": [
                "avg_speed", "max_speed", "min_speed", "speed_variation",
                "total_distance", "avg_movement_angle", "direction",
                "direction_changes",
            ],
            "lanes": [
                "initial_lane", "final_lane", "most_common_lane",
                "lane_changes", "lane_change_frequency",
            ],
            "violations": ["red_light_violation_count", "line_crossing_count"],
            "presence": [
                "first_detection", "last_detection", "duration_seconds",
                "frame_count", "stopped_duration",
            ],
        },
        dist_cols=["vehicle_type", "vehicle_color", "most_common_lane", "direction"],
        stat_cols=["avg_speed", "duration_seconds", "frame_count"],
    ),
    "people": SplitSpec(
        features={
            "demographics": ["age", "gender", "carrying"],
            "presence": [
                "first_detection", "last_detection", "duration_seconds",
                "frame_count", "confidence_avg",
            ],
            "restricted": ["entered_restricted_area", "restricted_area_entry_time"],
        },
        dist_cols=["age", "gender", "carrying"],
        stat_cols=["duration_seconds", "frame_count", "confidence_avg"],
    ),
    "safety": SplitSpec(
        features={
            "status": ["initial_safety_status", "final_safety_status",
                        "total_unsafe_frames"],
            "gear": ["had_hardhat", "had_mask", "had_safety_vest",
                      "hardhat_violations", "mask_violations",
                      "safety_vest_violations", "most_common_missing_item"],
            "movement": ["bbox_count", "bbox_movement_estimate"],
        },
        dist_cols=["final_safety_status", "most_common_missing_item"],
        stat_cols=["total_unsafe_frames", "bbox_movement_estimate"],
    ),
    "parking": SplitSpec(
        features={
            "occupancy": ["slot_status", "total_occupied_seconds",
                           "total_free_seconds", "free_percentage"],
            "transitions": ["became_occupied", "became_free"],
            "sessions": ["parking_sessions"],
        },
        dist_cols=["slot_status"],
        stat_cols=["free_percentage", "total_occupied_seconds"],
        id_cols=["video_source", "slot_id"],
    ),
}


def split_features(gold: DataFrame, spec: SplitSpec) -> dict[str, DataFrame]:
    """Feature views: id columns + the spec's projection each."""
    out = {}
    for name, cols in spec.features.items():
        present = [c for c in cols if c in gold.columns]
        out[name] = gold.select(*spec.id_cols, *present)
    return out


def split_statistics(gold: DataFrame, spec: SplitSpec) -> dict[str, DataFrame]:
    """The statistics block: one distribution frame per attribute plus a
    single-row numeric summary (the reference's ``statistics`` dict)."""
    out: dict[str, DataFrame] = {}
    for c in spec.dist_cols:
        if c in gold.columns:
            out[f"dist_{c}"] = value_distribution(gold, c)
    stat_cols = [c for c in spec.stat_cols if c in gold.columns]
    if stat_cols:
        out["summary"] = numeric_summary(gold, stat_cols)
    return out


def run_splitter(gold: DataFrame, domain: str) -> dict[str, DataFrame]:
    """All splitter outputs for a domain (feature views + statistics)."""
    spec = SPLIT_SPECS[domain]
    out = split_features(gold, spec)
    out.update(split_statistics(gold, spec))
    return out
