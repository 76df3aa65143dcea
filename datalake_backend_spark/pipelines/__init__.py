"""Domain pipelines: bronze detection JSON → silver long tables → gold rollups.

One module per reference domain (SURVEY §1.4); the registry dispatches
by domain name like the reference's
``New_System_ToUpload_Json/processors_registry.py:13-41``.
"""

from datalake_backend_spark.pipelines.registry import PIPELINES, get_pipeline

__all__ = ["PIPELINES", "get_pipeline"]
