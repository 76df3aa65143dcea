"""Tests for KMeans split (A15), as-of join, JSON-object restructuring (F9/F19)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_backend_spark.core.restructure import (
    explode_object,
    parse_json_map,
    struct_to_map,
)
from datalake_backend_spark.operators.asof import asof_join
from datalake_backend_spark.operators.clustering import cluster_summary, kmeans_clusters


def test_kmeans_clusters_separable(spark):
    # two tight blobs far apart → k=2 must separate them
    rows = [(i, 0.0 + i * 0.1, 0.0) for i in range(5)] + [
        (10 + i, 100.0 + i * 0.1, 100.0) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["id", "center_x", "center_y"])
    out = kmeans_clusters(df, ["center_x", "center_y"], k=2)
    groups = out.groupBy("cluster").agg(F.collect_set("id").alias("ids")).collect()
    sets = sorted(sorted(r.ids) for r in groups)
    assert sets == [[0, 1, 2, 3, 4], [10, 11, 12, 13, 14]]
    summary = {r.cluster: r for r in cluster_summary(out, ["center_x"]).collect()}
    assert all(r.n == 5 for r in summary.values())


def test_asof_join_backward(spark):
    ev = spark.createDataFrame(
        [(1, "u", 10.0), (2, "u", 25.0), (3, "u", 5.0), (4, "v", 50.0)],
        ["event_id", "key", "t"],
    )
    quotes = spark.createDataFrame(
        [("u", 8.0, 100.0), ("u", 20.0, 200.0), ("w", 1.0, 999.0)],
        ["key", "qt", "price"],
    )
    out = asof_join(ev, quotes, on="key", left_time="t", right_time="qt").collect()
    got = {r.event_id: r.price for r in out}
    assert got == {1: 100.0, 2: 200.0, 3: None, 4: None}


def test_asof_join_same_timestamp_inclusive(spark):
    ev = spark.createDataFrame([(1, "u", 8.0)], ["event_id", "key", "t"])
    quotes = spark.createDataFrame([("u", 8.0, 100.0)], ["key", "qt", "price"])
    out = asof_join(ev, quotes, on="key", left_time="t", right_time="qt").collect()
    assert out[0].price == 100.0  # <= semantics


def test_range_join_point_in_interval(spark):
    from datalake_backend_spark.operators.range_join import range_join

    points = spark.createDataFrame(
        [(1, "k", 5.0), (2, "k", 15.0), (3, "k", 25.0), (4, "x", 5.0)],
        ["pid", "key", "t"],
    )
    intervals = spark.createDataFrame(
        [("k", 0.0, 10.0, "a"), ("k", 4.0, 6.0, "b"), ("k", 20.0, 30.0, "c")],
        ["key", "s", "e", "label"],
    )
    out = range_join(
        points, intervals, on="key", point_time="t",
        start_col="s", end_col="e", bucket_width=5.0,
    ).collect()
    got = sorted((r.pid, r.label) for r in out)
    # t=5 ∈ [0,10) and [4,6); t=15 matches nothing; t=25 ∈ [20,30)
    assert got == [(1, "a"), (1, "b"), (3, "c")]

    left = range_join(
        points, intervals, on="key", point_time="t",
        start_col="s", end_col="e", bucket_width=5.0, how="left",
    ).collect()
    unmatched = [(r.pid, r.label) for r in left if r.label is None]
    assert sorted(unmatched) == [(2, None), (4, None)]


def test_range_join_boundary_semantics(spark):
    from datalake_backend_spark.operators.range_join import range_join

    points = spark.createDataFrame([(1, "k", 10.0)], ["pid", "key", "t"])
    intervals = spark.createDataFrame(
        [("k", 0.0, 10.0, "closed"), ("k", 10.0, 20.0, "open")],
        ["key", "s", "e", "label"],
    )
    out = range_join(
        points, intervals, on="key", point_time="t",
        start_col="s", end_col="e", bucket_width=100.0,
    ).collect()
    # [start, end): t=10 excluded from [0,10), included in [10,20)
    assert [r.label for r in out] == ["open"]


def test_struct_to_map_and_explode_object(spark):
    """F19: dynamic keys survive without any hardcoded key list (the
    reference drops ids absent from its literal list, tracking_data.py:50)."""
    schema = T.StructType(
        [
            T.StructField("frame", T.IntegerType()),
            T.StructField(
                "slots",
                T.StructType(
                    [
                        T.StructField("A", T.IntegerType()),
                        T.StructField("B", T.IntegerType()),
                        T.StructField("ZZZ", T.IntegerType()),  # unexpected key
                    ]
                ),
            ),
        ]
    )
    df = spark.createDataFrame([(1, (10, 20, 30))], schema)
    m = df.select(struct_to_map(F.col("slots"), T.IntegerType()).alias("m")).collect()[0].m
    assert m == {"A": 10, "B": 20, "ZZZ": 30}
    rows = explode_object(df, "slots", T.IntegerType()).collect()
    assert {(r.key, r.value) for r in rows} == {("A", 10), ("B", 20), ("ZZZ", 30)}
    assert all(r.frame == 1 for r in rows)


def test_parse_json_map(spark):
    df = spark.createDataFrame([('{"k": 7, "x": 1}',), (None,)], ["props"])
    out = df.select(
        parse_json_map(F.col("props"), T.LongType()).getItem("k").alias("k")
    ).collect()
    assert out[0].k == 7 and out[1].k is None
