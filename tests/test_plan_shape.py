"""Plan-shape regression tests: lock in the scale guarantees.

These assert properties of the PHYSICAL PLAN, not results — a change
that silently adds a shuffle or drops pushdown fails here long before
it shows up in a 100 TB bill.
"""

from __future__ import annotations

import io
import contextlib
import re

import pytest
from pyspark.sql import functions as F

from datalake_backend_spark.operators.sessionize import sessionize_by_gap
from datalake_backend_spark.operators.windows import change_count
from datalake_backend_spark.queries import QUERIES
from datalake_backend_spark.sources.lakehouse import write_bucketed_table

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shuffle_count(plan: str) -> int:
    # node list entries like "(4) Exchange"; BroadcastExchange excluded
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))


def test_sessionize_single_shuffle(spark):
    ev = spark.createDataFrame(
        [("u", float(i)) for i in range(10)], "id string, t double"
    )
    plan = plan_of(sessionize_by_gap(ev, ["id"], "t", 2.0))
    assert shuffle_count(plan) == 1, plan


def test_window_metric_single_shuffle(spark):
    ev = spark.createDataFrame(
        [("u", float(i), "x") for i in range(10)], "id string, t double, s string"
    )
    plan = plan_of(change_count(ev, ["id"], ["t"], "s"))
    assert shuffle_count(plan) == 1, plan


def test_q01_pushdown_and_pruning(spark):
    plan = plan_of(QUERIES["q01_pricing_summary"].fn(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    read_cols = m.group(1)
    assert "l_orderkey" not in read_cols  # unused column pruned
    assert "l_quantity" in read_cols


def test_q02_broadcasts_dimension(spark):
    plan = plan_of(QUERIES["q02_shipping_priority"].fn(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # filter pushed to scan


def test_value_distribution_no_global_window(spark):
    """The share-of-total must be a broadcast scalar, never a
    partition-less WindowExec (single-partition serializer at high
    group cardinality)."""
    from datalake_backend_spark.operators.distributions import value_distribution

    df = spark.createDataFrame([(str(i % 5),) for i in range(50)], "v string")
    out = value_distribution(df, "v")
    plan = plan_of(out)
    assert "Window" not in plan, plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan, plan
    # single scan: AQE reuses the hash exchange between the counted
    # branch and the scalar-total branch at runtime
    out.collect()
    final = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final or "ReusedQueryStage" in final, final


def test_bucketed_join_skips_exchange(spark, tmp_path):
    """A join between two tables bucketed on the key plans no Exchange —
    the 100 TB co-location story, verified on the actual plan."""
    # spark.sql.warehouse.dir is static — managed tables land in the
    # default ./spark-warehouse; DROP TABLE below removes the data.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    left = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    right = spark.range(0, 1000).withColumn("w", F.col("id") + 1)
    write_bucketed_table(left, "bl", "id", n_buckets=4)
    write_bucketed_table(right, "br", "id", n_buckets=4)
    joined = spark.table("bl").join(spark.table("br"), "id")
    plan = plan_of(joined)
    try:
        assert shuffle_count(plan) == 0, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bl")
        spark.sql("DROP TABLE IF EXISTS br")
