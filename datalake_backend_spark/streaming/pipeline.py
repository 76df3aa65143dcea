"""Streaming ingest + windowed/sessionized aggregations.

Design notes for scale:

* File-source ingest lists only NEW files per micro-batch (checkpointed
  log); with ``availableNow`` it drains the backlog and stops — the
  streaming twin of the reference's upload-triggered batch, but with
  exactly-once bookkeeping instead of its latest-file heuristics
  (``Send_Data_To_DataLake/main.py:98-99``).
* Watermarks bound state: aggregation state for windows older than the
  watermark is dropped, so long-running streams don't accumulate
  unbounded hash state.
* ``session_window`` is the streaming twin of the batch gap
  sessionization (operators/sessionize.py) — same semantics, incremental
  state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from datalake_backend_spark.schemas import DOMAIN_SCHEMAS


def read_raw_stream(
    spark: SparkSession,
    path: str,
    domain: str | None = None,
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming bronze scan over a landing directory of JSON documents."""
    if schema is None:
        if domain is None:
            raise ValueError("pass either domain or schema")
        schema = DOMAIN_SCHEMAS[domain]
    reader = (
        spark.readStream.schema(schema)
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def read_event_stream(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Streaming scan over a parquet event feed (the `events` shape).

    Parquet µs timestamps with ``isAdjustedToUTC=false`` infer as
    ``TIMESTAMP_NTZ`` in Spark 4, and ``withWatermark`` rejects NTZ
    event-time columns (``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE``). The
    batch reader normalizes NTZ → session-TZ timestamp
    (sources/readers.py ``table``); mirror that here so every streaming
    consumer gets watermark-able columns."""
    stream = spark.readStream.schema(schema).parquet(path)
    ntz = [
        f.name
        for f in stream.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    if ntz:
        stream = stream.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return stream


def windowed_counts(
    events: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts + value sums."""
    win = (
        F.window(time_col, window, slide) if slide else F.window(time_col, window)
    )
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def session_aggregate(
    events: DataFrame,
    time_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap sessions (twin of sessionize_by_gap)."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.session_window(time_col, gap).alias("s"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the FIRST arrival of each key and
    drop re-deliveries (at-least-once sources, upload retries — the
    reference re-processes whole re-uploaded objects instead,
    ``Send_Data_To_DataLake/main.py:98-99``).

    ``dropDuplicatesWithinWatermark`` holds one state entry per key
    and expires entries once the watermark passes their event time, so
    dedup state is bounded by ``watermark × arrival rate`` — NOT by
    stream lifetime, which is what plain ``dropDuplicates`` on a
    stream would cost at 100 TB. Choose ``watermark`` as the maximum
    re-delivery horizon of the source (e.g. an upload retry window),
    not the stream's full history.
    """
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def start_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> StreamingQuery:
    """Memory-sink runner for tests/smoke: drain with
    ``q.processAllAvailable()`` then query ``SELECT * FROM <name>``."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def idempotent_epoch_write(batch: DataFrame, path: str, epoch_id: int) -> None:
    """Replay-safe micro-batch parquet write: partition by the
    (checkpointed, replay-stable) ``epoch_id`` and dynamically overwrite
    ONLY that partition — a retried epoch rewrites its own directory
    instead of double-appending. An empty batch touches no partitions."""
    (
        batch.withColumn("_epoch", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_epoch")
        .parquet(path)
    )


def start_silver_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    transform=None,
) -> StreamingQuery:
    """Idempotent parquet sink via foreachBatch: applies the domain's
    silver transform per micro-batch (per-file batch semantics, like the
    reference's per-upload preprocessing, but checkpointed).

    foreachBatch alone is at-least-once — a micro-batch replayed after a
    crash would double-append. :func:`idempotent_epoch_write` makes the
    retry rewrite its own epoch partition. Readers see an extra
    ``_epoch`` partition column (prune or drop it downstream)."""

    def _write(batch: DataFrame, epoch_id: int) -> None:
        out = transform(batch) if transform else batch
        idempotent_epoch_write(out, path, epoch_id)

    return (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def versioned_epoch_commit(tbl, batch: DataFrame, epoch_id: int, transform=None) -> bool:
    """Append ``batch`` to ``tbl`` as an epoch-tagged snapshot commit,
    unless that epoch is already in the commit log (replay). Returns
    whether a commit happened — the exactly-once core of
    :func:`start_versioned_sink`, exposed for direct testing."""
    committed = tbl.committed_epochs()
    if epoch_id in committed:
        return False
    out = transform(batch) if transform else batch
    tbl.commit(out, mode="append", metadata={"epoch": epoch_id})
    return True


def start_versioned_sink(
    df: DataFrame,
    table_path: str,
    checkpoint: str,
    transform=None,
    compact_max_files: int | None = None,
) -> StreamingQuery:
    """Streaming sink into a :class:`~datalake_backend_spark.sources
    .versioned.VersionedTable`: every micro-batch appends one SNAPSHOT
    commit tagged with its (checkpointed, replay-stable) epoch id.

    foreachBatch is at-least-once; exactly-once comes from the commit
    log itself — a replayed epoch finds its id already tagged on a
    committed manifest and skips, so the retry is a metadata no-op
    instead of a double-append (the same idea as Delta's txn/appId
    dedup). Unlike :func:`start_silver_sink`'s epoch-partitioned
    layout, readers here get a clean schema (no ``_epoch`` column),
    snapshot isolation while the stream is live, and time travel to
    any micro-batch boundary.

    ``compact_max_files`` arms the auto-OPTIMIZE policy: after each
    commit, if the snapshot's file count exceeds the bound,
    ``maybe_compact`` folds the accumulated per-epoch dirs into
    target-size files as its own (non-epoch) version — the small-file
    answer for a long-running ingest stream. A compaction that loses a
    race is skipped (the NEXT epoch retries); readers and replays are
    unaffected either way."""
    from datalake_backend_spark.sources.versioned import (
        CommitConflict,
        VersionedTable,
    )

    tbl = VersionedTable(table_path)

    def _write(batch: DataFrame, epoch_id: int) -> None:
        versioned_epoch_commit(tbl, batch, epoch_id, transform)
        if compact_max_files is not None:
            try:
                tbl.maybe_compact(batch.sparkSession, max_files=compact_max_files)
            except CommitConflict:
                pass  # another writer landed mid-rewrite; next epoch retries

    return (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def upsert_epoch_commit(
    tbl,
    batch: DataFrame,
    epoch_id: int,
    key_cols: list[str],
    seq_col: str | None = None,
    delete_col: str | None = None,
) -> bool:
    """MERGE one micro-batch of change rows into ``tbl`` by key,
    exactly-once (epoch already in the commit log → no-op). The core of
    :func:`start_upsert_sink`, exposed for direct testing.

    Within the batch, ``seq_col`` orders multiple changes to one key
    (highest wins — ties broken by the delete flag, then by the
    remaining orderable payload columns, so replays pick the same
    winner even among equal ``(key, seq, flag)`` rows); the surviving
    row either upserts or, when ``delete_col`` is true, deletes the
    key. Marker columns never reach the table.

    The MERGE is a read-modify-write, so it carries the optimistic
    ``expected_head`` guard (mirroring ``VersionedTable._rmw_commit``):
    the snapshot is derived FROM the head we read and the commit is
    pinned to it; if a concurrent writer (CLI OPTIMIZE, another merge)
    lands in between, the commit raises ``CommitConflict`` and the
    whole derive re-runs from the new head — including the epoch-dedup
    check, in case the concurrent writer WAS this epoch's replay."""
    from pyspark.sql import Window

    from datalake_backend_spark.operators.merge import upsert
    from datalake_backend_spark.sources.versioned import CommitConflict

    def _orderable(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    b = batch
    if seq_col is not None:
        order = [F.col(seq_col).desc()]
        if delete_col is not None:
            order.append(F.col(delete_col).desc())
        marker = set(key_cols) | {seq_col, delete_col}
        order.extend(
            F.col(f.name).desc_nulls_last()
            for f in batch.schema.fields
            if f.name not in marker and _orderable(f.dataType)
        )
        w = Window.partitionBy(*key_cols).orderBy(*order)
        b = (
            b.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", seq_col)
        )
    if delete_col is not None:
        deletes = b.where(F.col(delete_col)).select(*key_cols).distinct()
        ups = b.where(~F.col(delete_col)).drop(delete_col)
    else:
        deletes, ups = None, b
    last: CommitConflict | None = None
    for _ in range(5):
        head = tbl.latest_version()
        committed = tbl.committed_epochs()
        if epoch_id in committed:
            return False
        if head is None:
            new = ups
        else:
            new = upsert(tbl.read(batch.sparkSession, head), ups, key_cols)
        if deletes is not None:
            new = new.join(F.broadcast(deletes), key_cols, "left_anti")
        try:
            tbl.commit(
                new,
                op="merge",
                metadata={"epoch": epoch_id},
                expected_head=head or 0,
            )
            return True
        except CommitConflict as e:
            last = e
            continue
    raise last if last is not None else CommitConflict("upsert never committed")


def start_upsert_sink(
    df: DataFrame,
    table_path: str,
    checkpoint: str,
    key_cols: list[str],
    seq_col: str | None = None,
    delete_col: str | None = None,
) -> StreamingQuery:
    """Streaming keyed upsert into a versioned table — APPLY CHANGES
    INTO: each micro-batch of change rows (inserts/updates, optional
    ``delete_col`` tombstones, optional ``seq_col`` intra-batch
    ordering) MERGEs into the snapshot by ``key_cols`` and commits one
    copy-on-write version. Exactly-once comes from the commit log's
    epoch tags exactly as in :func:`start_versioned_sink`; a replayed
    micro-batch is a metadata no-op, so the table never applies the
    same change twice. Readers see a consistent post-merge snapshot at
    every micro-batch boundary and can time travel across them — the
    streaming CDC-consumption path a warehouse sink needs."""
    from datalake_backend_spark.sources.versioned import VersionedTable

    tbl = VersionedTable(table_path)

    def _write(batch: DataFrame, epoch_id: int) -> None:
        upsert_epoch_commit(tbl, batch, epoch_id, key_cols, seq_col, delete_col)

    return (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_incremental_rollup_sink(
    df: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str],
    value_cols: list[str],
) -> StreamingQuery:
    """Streaming MATERIALIZED VIEW: maintain a per-key aggregate STATE
    table (`operators/incremental.py`) under a stream.

    Each micro-batch aggregates alone (`rollup_state`) and merges into
    the current state snapshot (`merge_rollup_state`), committed as a
    new `VersionedTable` version tagged with the epoch id — replays
    skip via the commit log, so the view is exactly-once; readers get
    a consistent snapshot at every micro-batch boundary and can time
    travel to any earlier one. The merge shuffles only the two small
    STATE tables, never re-scans stream history — the streaming twin
    of the reference's reaggregate-everything-per-upload gold step."""
    from datalake_backend_spark.operators.incremental import (
        merge_rollup_state,
        rollup_state,
    )
    from datalake_backend_spark.sources.versioned import VersionedTable

    tbl = VersionedTable(table_path)

    def _write(batch: DataFrame, epoch_id: int) -> None:
        from datalake_backend_spark.sources.versioned import CommitConflict

        bstate = rollup_state(batch, keys, value_cols)
        last: CommitConflict | None = None
        # read-modify-write: pin the commit to the head the merge read
        # (expected_head), re-derive on conflict — same contract as
        # upsert_epoch_commit / VersionedTable._rmw_commit
        for _ in range(5):
            head = tbl.latest_version()
            committed = tbl.committed_epochs()
            if epoch_id in committed:
                return
            merged = bstate
            if head is not None:
                merged = merge_rollup_state(
                    tbl.read(batch.sparkSession, head), bstate, keys
                )
            try:
                tbl.commit(
                    merged, mode="overwrite", op="rollup-merge",
                    metadata={"epoch": epoch_id},
                    expected_head=head or 0,
                )
                return
            except CommitConflict as e:
                last = e
                continue
        # NEVER fall through silently: foreachBatch would report
        # success and the checkpoint would advance past a batch whose
        # rows were dropped — raise so the stream retries the epoch
        raise last

    return (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_session(spark: SparkSession, shuffle_partitions: int = 8):
    """Session clone sized for stateful streaming.

    Every stateful operator materializes one state-store instance per
    shuffle partition per micro-batch — at the default batch-oriented
    partition count that fixed overhead dwarfs small/medium micro-batch
    work (measured on the q84 interval join at sf0.1: 32 partitions
    15.8 s → 4 partitions 2.4 s, identical output). Size this to the
    expected per-batch STATE volume, not to cluster CPU count; at
    100 TB-scale feeds raise it so each state partition stays within
    executor memory. The conf lives on a cloned session so
    concurrently-planned batch queries (bench threads, the driver's
    oracle sweep) never see it."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return ns


def streaming_tws_session(spark: SparkSession, shuffle_partitions: int = 8):
    """:func:`streaming_session` plus the RocksDB state-store provider —
    ``transformWithState`` is implemented only on RocksDB (the default
    HDFS-backed in-memory provider raises at plan time). Scoped to the
    cloned session so batch queries and the applyInPandasWithState
    streams keep the default provider."""
    ns = streaming_session(spark, shuffle_partitions)
    ns.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return ns


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    dim_cols: list[str],
) -> DataFrame:
    """Stream-static enrichment: every micro-batch of ``stream`` is
    joined against the STATIC dimension ``dim`` (the lookup-table
    shape — user→account, device→model, sku→category). The static
    side is broadcast, so enrichment is stateless and map-side: no
    streaming state, no watermark requirement, and the dimension is
    re-resolved per micro-batch (a dim refreshed between batches is
    picked up — Spark re-plans the static side each trigger).
    Left join keeps stream rows whose key has no dim match, with NULL
    attributes — an enrichment must never drop events."""
    d = dim.select(
        F.col(dim_key).alias(stream_key),
        *[F.col(c) for c in dim_cols],
    )
    return stream.join(F.broadcast(d), stream_key, "left")


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_time: str,
    right_time: str,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: right-side events that occur within
    ``(left_time, left_time + max_delay]`` of a left event with the
    same key (the click→purchase attribution shape).

    Both sides carry a watermark and the join condition bounds event
    time on both ends, so Spark can expire join state — without the
    interval condition state grows unboundedly. Columns are
    prefixed ``l_``/``r_`` to keep the output schema unambiguous."""
    l = left.withWatermark(left_time, watermark).select(
        F.col(key_col).alias("l_key"),
        F.col(left_time).alias("l_ts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (key_col, left_time)
        ],
    )
    r = right.withWatermark(right_time, watermark).select(
        F.col(key_col).alias("r_key"),
        F.col(right_time).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (key_col, right_time)
        ],
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_delay}")),
    )


def start_bitmap_reach_sink(
    df: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str],
    id_col: str,
) -> StreamingQuery:
    """Streaming EXACT-DISTINCT materialized view: maintain per-key
    bitmap-word state (`operators/incremental.py:bitmap_state`) under
    a stream — the unique-visitors / reach counter that plain
    aggregate state cannot maintain because distinct counts don't
    merge as scalars, while their bitmaps merge with an idempotent
    ``bit_or`` (a replayed batch changes NOTHING, which composes with
    the epoch-commit-log exactly-once into belt-and-suspenders).
    Per micro-batch: fold the batch's ids to words, ``bit_or``-merge
    into the snapshot, commit epoch-tagged with expected-head RMW —
    only word rows (metadata-sized) ever shuffle; stream history is
    never re-scanned. Same commit discipline as
    :func:`start_incremental_rollup_sink`."""
    from datalake_backend_spark.operators.incremental import (
        bitmap_state,
        merge_bitmap_state,
    )
    from datalake_backend_spark.sources.versioned import VersionedTable

    tbl = VersionedTable(table_path)

    def _write(batch: DataFrame, epoch_id: int) -> None:
        from datalake_backend_spark.sources.versioned import CommitConflict

        bstate = bitmap_state(batch, keys, id_col)
        last: CommitConflict | None = None
        for _ in range(5):
            head = tbl.latest_version()
            committed = tbl.committed_epochs()
            if epoch_id in committed:
                return
            merged = bstate
            if head is not None:
                merged = merge_bitmap_state(
                    tbl.read(batch.sparkSession, head), bstate, keys
                )
            try:
                tbl.commit(
                    merged, mode="overwrite", op="bitmap-merge",
                    metadata={"epoch": epoch_id},
                    expected_head=head or 0,
                )
                return
            except CommitConflict as e:
                last = e
                continue
        raise last

    return (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_kmv_reach_sink(
    df: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str],
    id_col: str,
    k: int = 256,
) -> StreamingQuery:
    """Streaming BOUNDED-STATE distinct-count materialized view: the
    KMV companion to :func:`start_bitmap_reach_sink` — the bitmap is
    exact but its word count grows with the id range, while the KMV
    sketch holds a FIXED k hashes per key at any cardinality, and its
    union (re-take the k smallest) is just as idempotent, so replays
    remain harmless on top of the epoch commit log. Per micro-batch:
    fold the batch to per-key k-minima (two-phase rank), merge with
    the snapshot over ≤ 2k metadata rows per key, commit epoch-tagged
    with expected-head RMW. The finalized estimate is bit-identical
    to the one-shot ``distributions.kmv_distinct`` over the union of
    all batches — merging k-minima IS the global k-minimum."""
    from datalake_backend_spark.operators.incremental import (
        kmv_state,
        merge_kmv_state,
    )
    from datalake_backend_spark.sources.versioned import VersionedTable

    tbl = VersionedTable(table_path)

    def _write(batch: DataFrame, epoch_id: int) -> None:
        from datalake_backend_spark.sources.versioned import CommitConflict

        bstate = kmv_state(batch, keys, id_col, k=k)
        last: CommitConflict | None = None
        for _ in range(5):
            head = tbl.latest_version()
            committed = tbl.committed_epochs()
            if epoch_id in committed:
                return
            merged = bstate
            if head is not None:
                merged = merge_kmv_state(
                    tbl.read(batch.sparkSession, head), bstate, keys, k=k
                )
            try:
                tbl.commit(
                    merged, mode="overwrite", op="kmv-merge",
                    metadata={"epoch": epoch_id},
                    expected_head=head or 0,
                )
                return
            except CommitConflict as e:
                last = e
                continue
        raise last

    return (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
