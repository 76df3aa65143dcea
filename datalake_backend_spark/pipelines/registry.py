"""Domain-pipeline registry (the reference's ``processors_registry.py``)."""

from __future__ import annotations

from types import ModuleType

from datalake_backend_spark.pipelines import (
    animal,
    common,
    geolocation,
    parking,
    people,
    pose,
    retail,
    safety,
    school,
    tracking,
    vehicle,
)

PIPELINES: dict[str, ModuleType] = {
    "vehicle": vehicle,
    "people": people,
    "safety": safety,
    "pose": pose,
    "animal": animal,
    "parking": parking,
    "geolocation": geolocation,
    "common": common,
    "school": school,
    "retail": retail,
    "tracking": tracking,
}


def get_pipeline(domain: str) -> ModuleType:
    """Pipeline module for ``domain`` (must expose silver()/gold())."""
    return PIPELINES[domain]
