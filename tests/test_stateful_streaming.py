"""Stateful streaming slot tracker: state carries across micro-batches."""

from __future__ import annotations

from pyspark.sql import types as T

from datalake_backend_spark.streaming.stateful import track_slot_state

SLOT_SCHEMA = T.StructType(
    [
        T.StructField("slot_id", T.StringType()),
        T.StructField("timestamp_sec", T.DoubleType()),
        T.StructField("occupied", T.BooleanType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SLOT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, src, ck, out):
    """One availableNow pass through the stateful operator, updates
    appended to ``out`` with the epoch id (foreachBatch supports
    checkpoint recovery; memory sink does not)."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(SLOT_SCHEMA).parquet(src)

    def sink(batch, epoch):
        batch.withColumn("epoch", F.lit(epoch)).write.mode("append").parquet(out)

    q = (
        track_slot_state(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_state_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "slots")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    # batch 1: slot A free→occupied
    _write_batch(spark, src, [("A", 0.0, False), ("A", 10.0, True)])
    _drain(spark, src, ck, out)
    r1 = (
        spark.read.parquet(out)
        .orderBy("epoch")
        .collect()[-1]
    )
    assert r1.became_occupied == 1 and r1.occupied
    assert r1.free_seconds == 10.0 and r1.occupied_seconds == 0.0

    # batch 2 (new files, SAME checkpoint): occupied→free at t=25,
    # plus one late row (t=5) that must be counted, not applied
    _write_batch(spark, src, [("A", 25.0, False), ("A", 5.0, True)])
    _drain(spark, src, ck, out)
    rows = spark.read.parquet(out).orderBy("epoch").collect()
    assert len(rows) >= 2, "second batch emitted no update"
    r2 = rows[-1]
    # state carried over: 15 occupied seconds (10→25), transition out
    assert r2.became_free == 1
    assert r2.occupied_seconds == 15.0
    assert r2.free_seconds == 10.0
    assert not r2.occupied
    assert r2.late_rows == 1


def test_idempotent_epoch_write_replay(spark, tmp_path):
    """A replayed micro-batch (same epoch_id) overwrites its own
    partition instead of double-appending; other epochs are untouched."""
    from datalake_backend_spark.streaming.pipeline import idempotent_epoch_write

    out = str(tmp_path / "sink")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    b2 = spark.createDataFrame([(3, "c")], "id int, v string")
    idempotent_epoch_write(b1, out, epoch_id=0)
    idempotent_epoch_write(b2, out, epoch_id=1)
    assert spark.read.parquet(out).count() == 3
    # crash-replay of epoch 1: same data rewritten, no duplicates
    idempotent_epoch_write(b2, out, epoch_id=1)
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {r.id for r in got.collect()} == {1, 2, 3}
