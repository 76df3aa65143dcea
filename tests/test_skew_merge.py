"""Salted aggregation and MERGE/SCD2 emulation tests."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from datalake_backend_spark.operators.merge import scd2_apply, upsert
from datalake_backend_spark.operators.skew import salted_agg


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(100)] + [("cold", 1.0)],
        "k string, v double",
    )
    salted = {
        r["k"]: (r["count"], r["sum_v"], r["max_v"])
        for r in salted_agg(
            df, ["k"], sum_cols=["v"], max_cols=["v"], n_salts=4,
            salt_source=F.col("v"),
        ).collect()
    }
    plain = {
        r.k: (r.c, r.s, r.m)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("c"), F.sum("v").alias("s"), F.max("v").alias("m"))
        .collect()
    }
    assert salted == plain


def test_upsert_last_writer_wins(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id int, name string, v int"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21), (3, "c", 30)], "id int, name string, v int"
    )
    out = {r.id: (r.name, r.v) for r in upsert(base, updates, ["id"]).collect()}
    assert out == {1: ("a", 10), 2: ("b2", 21), 3: ("c", 30)}


def test_upsert_idempotent(spark):
    base = spark.createDataFrame([(1, "a")], "id int, name string")
    updates = spark.createDataFrame([(1, "a2")], "id int, name string")
    once = upsert(base, updates, ["id"])
    twice = upsert(once, updates, ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_closes_and_appends(spark):
    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 6, 1)
    current = spark.createDataFrame(
        [(1, "x", t0, None), (2, "y", t0, None)],
        "id int, attr string, effective_from timestamp, effective_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, "x2"), (2, "y"), (3, "z")], "id int, attr string"
    )
    out = scd2_apply(
        current, changes, ["id"], ["attr"], ts=F.lit(t1)
    ).collect()
    rows = sorted((r.id, r.attr, r.effective_to) for r in out)
    # id 1: old version closed at t1 + new open version
    assert (1, "x", t1) in rows and (1, "x2", None) in rows
    # id 2: unchanged → still one open version
    assert (2, "y", None) in rows and len([r for r in rows if r[0] == 2]) == 1
    # id 3: brand new open version
    assert (3, "z", None) in rows
    # closed v1 of id1, open v2 of id1, unchanged id2, new id3
    assert len(rows) == 4


def test_scd2_null_compare_columns(spark):
    """Match detection must not key off data-column nullness: a change
    row whose first compare column is legitimately NULL still closes the
    open version, and a brand-new key with all-NULL compare columns is
    still appended."""
    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 6, 1)
    current = spark.createDataFrame(
        [(1, "x", t0, None), (2, None, t0, None)],
        "id int, attr string, effective_from timestamp, effective_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "id int, attr string"
    )
    out = scd2_apply(current, changes, ["id"], ["attr"], ts=F.lit(t1)).collect()
    rows = {(r.id, r.attr, r.effective_to) for r in out}
    # id 1: x → NULL is a change — old version closed, new NULL version open
    assert (1, "x", t1) in rows and (1, None, None) in rows
    # id 2: NULL → NULL is NOT a change — single open version survives
    assert (2, None, None) in rows
    assert len([r for r in rows if r[0] == 2]) == 1
    # id 3: brand-new key with all-NULL compare columns is appended
    assert (3, None, None) in rows
    assert len(rows) == 4


def test_scd2_idempotent_reapply(spark):
    """Re-applying the same changes to the merged result is a no-op."""
    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 6, 1)
    current = spark.createDataFrame(
        [(1, "x", t0, None)],
        "id int, attr string, effective_from timestamp, effective_to timestamp",
    )
    changes = spark.createDataFrame([(1, "x2")], "id int, attr string")
    once = scd2_apply(current, changes, ["id"], ["attr"], ts=F.lit(t1))
    twice = scd2_apply(once, changes, ["id"], ["attr"], ts=F.lit(t1))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_cdc_roundtrip_reproduces_new_snapshot(spark):
    """apply_changelog(old, snapshot_diff(old, new, include_values))
    == new, exactly — inserts, updates, deletes, null-value updates,
    and untouched rows all covered."""
    from pyspark.sql import functions as F

    from datalake_backend_spark.operators.merge import (
        apply_changelog,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 updated, 3 null→value, 4 deleted, 5 inserted,
        # 6 inserted with null value
        [(1, "a", 10.0), (2, "B", 99.0), (3, "c", 3.5),
         (5, "e", 50.0), (6, "f", None)],
        "k int, s string, v double",
    )
    ch = snapshot_diff(old, new, ["k"], ["s", "v"], include_values=True)
    ops = {r.k: r.op for r in ch.collect()}
    assert ops == {2: "update", 3: "update", 4: "delete",
                   5: "insert", 6: "insert"}
    applied = apply_changelog(old, ch, ["k"])
    assert {tuple(r) for r in applied.collect()} == {
        tuple(r) for r in new.collect()
    }
    # empty changelog is the identity
    empty = ch.where(F.lit(False))
    assert {tuple(r) for r in apply_changelog(old, empty, ["k"]).collect()} == {
        tuple(r) for r in old.collect()
    }


def test_snapshot_diff_map_columns(spark):
    """MAP compare columns are canonicalized to sorted entries: same
    pairs in different internal order compare EQUAL; a changed value
    still registers as an update, and include_values carries the raw
    map through."""
    from datalake_backend_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, {"a": 1.0, "b": 2.0}), (2, {"x": 5.0})],
        "k int, m map<string,double>",
    )
    new = spark.createDataFrame(
        [(1, {"b": 2.0, "a": 1.0}), (2, {"x": 6.0})],
        "k int, m map<string,double>",
    )
    ch = snapshot_diff(old, new, ["k"], ["m"], include_values=True).collect()
    assert {(r.k, r.op) for r in ch} == {(2, "update")}  # key 1 unchanged
    assert dict(ch[0].m) == {"x": 6.0}
