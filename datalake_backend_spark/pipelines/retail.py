"""Retail-products domain (v2): product_id rollups.

Silver ≈ ``process_scripts/retail/basic_preprocessing_retail.py``;
gold ≈ ``advanced_preprocessing_retail.py:33-58`` incl. expiry-date
cast (F18), picked-flag any-true, distinct expiry dates (A14/U3).
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
    flat = raw.select(
        "frame_number",
        F.col("timestamp").alias("frame_timestamp"),
        F.explode("detections").alias("d"),
    ).select("frame_number", "frame_timestamp", "d.*")
    out = clean_strings(flat)
    out = apply_null_defaults(out, NULL_DEFAULTS["retail"])
    out = parse_timestamps(out, ["frame_timestamp"])
    # F18: date cast; try_to_date keeps one bad string from failing the job
    return out.withColumn(
        "expiry_date", F.try_to_timestamp(F.col("expiry_date"), F.lit("yyyy-MM-dd")).cast("date")
    )


def gold(silver_df: DataFrame) -> DataFrame:
    return silver_df.groupBy("product_id").agg(
        F.min_by("product_name", "frame_number").alias("product_name"),
        F.min_by("category", "frame_number").alias("category"),
        F.min_by("location", "frame_number").alias("location"),
        F.avg("price").alias("avg_price"),
        F.avg(F.col("stock_level").cast("double")).alias("avg_stock_level"),
        F.max("picked_by_customer").alias("picked_by_customer"),
        F.array_sort(
            F.array_distinct(F.array_compact(F.collect_list("expiry_date")))
        ).alias("expiry_dates"),
        F.count("frame_number").alias("detection_count"),
    )
