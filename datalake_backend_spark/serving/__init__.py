"""Serving layer: SQL views shaped like the reference's dashboards."""

from datalake_backend_spark.serving.views import register_serving_views

__all__ = ["register_serving_views"]
