"""Sessionization — the flagship window workload (SURVEY §2.7 W7).

The reference's parking-slot analyzer runs ONE SPARK JOB PER SLOT: a
Python loop filters the frame table to each slot_id, collects it, and
walks transitions on the driver (``advanced_preprocessing_parkingLot.py:46-123``).
That is O(slots) full scans and unbounded driver memory.

Here sessionization is the classic distributed idiom, generalized over
any (entity, time, state) long table:

1. ``lag(state)`` over ``Window.partitionBy(entity).orderBy(time)``
   → per-row transition flags;
2. a running ``sum`` of "session-opening" transitions over the same
   window → monotone session ids;
3. one hash aggregate per (entity, session) → session spans;
4. one hash aggregate per entity → summary (counts, occupied/free
   seconds, percentages, final state).

Cost: a single shuffle on the entity key (both windows and both
aggregates share the partitioning, so Spark plans ONE Exchange), after
which everything is WindowExec + partial aggregation. Skewed entities
(one hot parking lot) are bounded by frames-per-video; at 100 TB the
entity key should include the video/file id, keeping partitions small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_cols: list[str],
    time_col: str,
    state_col: str,
    active_value: object = True,
) -> DataFrame:
    """Per-entity sessions of ``state_col == active_value``.

    Returns one row per session: entity cols, ``session_id`` (1-based in
    time order), ``entry_time``, ``exit_time`` (null while still active
    at end of data — the reference's tail-closing path,
    ``advanced_preprocessing_parkingLot.py:89-95``, closes with the last
    timestamp; we expose both via ``last_seen``), ``duration_seconds``.
    """
    w = Window.partitionBy(*entity_cols).orderBy(time_col)
    active = F.col(state_col) == F.lit(active_value)
    prev_active = F.lag(active).over(w)
    opens = (active & (prev_active.isNull() | ~prev_active)).cast("long")
    tsec = F.col(time_col).cast("double")

    flagged = df.select(
        *entity_cols,
        tsec.alias("_t"),
        active.alias("_a"),
        opens.alias("_open"),
    )
    w2 = Window.partitionBy(*entity_cols).orderBy("_t")
    flagged = flagged.withColumn(
        "_sid", F.sum("_open").over(w2.rowsBetween(Window.unboundedPreceding, 0))
    )

    # rows before the first active session have _sid = 0 (dropped);
    # inactive rows AFTER a session carry that session's _sid, so one
    # conditional aggregate per (entity, _sid) group yields the span AND
    # the exit (first inactive timestamp after the session opened) in a
    # single pass — no second branch, no join, and the groupBy reuses
    # the window's entity partitioning (one Exchange total). A session
    # still active at end-of-data gets exit_time = null; duration then
    # uses last_seen (tail-closing,
    # ``advanced_preprocessing_parkingLot.py:89-95``).
    return (
        flagged.where(F.col("_sid") > 0)
        .groupBy(*entity_cols, F.col("_sid").alias("session_id"))
        .agg(
            F.min(F.when(F.col("_a"), F.col("_t"))).alias("entry_time"),
            F.max(F.when(F.col("_a"), F.col("_t"))).alias("last_seen"),
            F.min(F.when(~F.col("_a"), F.col("_t"))).alias("exit_time"),
        )
        .withColumn(
            "duration_seconds",
            F.coalesce(F.col("exit_time"), F.col("last_seen")) - F.col("entry_time"),
        )
    )


def session_summary(
    df: DataFrame,
    entity_cols: list[str],
    time_col: str,
    state_col: str,
    active_value: object = True,
) -> DataFrame:
    """Per-entity state-transition summary (the reference's slot summary,
    ``advanced_preprocessing_parkingLot.py:96-123``): transition counts
    in both directions, total active/inactive seconds (Δt attributed to
    the previous sample's state), percentage inactive, and final state
    at the latest timestamp. One shuffle on the entity key.
    """
    w = Window.partitionBy(*entity_cols).orderBy(time_col)
    active = (F.col(state_col) == F.lit(active_value))
    prev_active = F.lag(active).over(w)
    tsec = F.col(time_col).cast("double")
    delta = tsec - F.lag(tsec).over(w)

    stepped = df.select(
        *entity_cols,
        tsec.alias("_t"),
        active.alias("_a"),
        prev_active.alias("_pa"),
        delta.alias("_dt"),
    )
    became_active = (F.col("_a") & ~F.col("_pa")).cast("long")
    became_inactive = (~F.col("_a") & F.col("_pa")).cast("long")
    active_secs = F.sum(F.when(F.col("_pa"), F.col("_dt")).otherwise(0.0))
    inactive_secs = F.sum(F.when(~F.col("_pa"), F.col("_dt")).otherwise(0.0))
    return stepped.groupBy(*entity_cols).agg(
        F.coalesce(F.sum(became_active), F.lit(0)).alias("became_active"),
        F.coalesce(F.sum(became_inactive), F.lit(0)).alias("became_inactive"),
        F.coalesce(active_secs, F.lit(0.0)).alias("active_seconds"),
        F.coalesce(inactive_secs, F.lit(0.0)).alias("inactive_seconds"),
        F.max_by(F.col("_a"), F.col("_t")).alias("final_active"),
        F.count("*").alias("sample_count"),
    ).withColumn(
        "inactive_percentage",
        F.when(
            (F.col("active_seconds") + F.col("inactive_seconds")) > 0,
            F.col("inactive_seconds")
            / (F.col("active_seconds") + F.col("inactive_seconds"))
            * 100.0,
        ).otherwise(0.0),
    )


def sessionized_summary(
    df: DataFrame,
    entity_cols: list[str],
    time_col: str,
    state_col: str,
    active_value: object = True,
    sessions_col: str = "sessions",
) -> DataFrame:
    """:func:`session_summary` + the ordered session array of
    :func:`sessionize`, fused into ONE pass.

    Calling the two operators separately makes Spark evaluate the input
    subtree twice (different column pruning defeats exchange reuse) and
    join the branches back — at 100 TB that is two extra scans and a
    shuffle join of two entity-sized sides. Here a single windowed
    projection feeds groupBy(entity, _sid) then groupBy(entity); both
    aggregates cluster on a superset of the entity key, so they reuse
    the window's hash partitioning: one Exchange end-to-end
    (plan-shape-tested).

    Float caveat: active/inactive seconds are summed per-session then
    per-entity. The engine's contract (queries.py module doc) keeps
    Δt values integral in their unit, so the two-level sum is exact.
    """
    w = Window.partitionBy(*entity_cols).orderBy(time_col)
    active = F.col(state_col) == F.lit(active_value)
    prev = F.lag(active).over(w)
    tsec = F.col(time_col).cast("double")
    delta = tsec - F.lag(tsec).over(w)
    opens = (active & (prev.isNull() | ~prev)).cast("long")
    stepped = df.select(
        *entity_cols,
        tsec.alias("_t"),
        active.alias("_a"),
        prev.alias("_pa"),
        delta.alias("_dt"),
        opens.alias("_open"),
    ).withColumn(
        "_sid",
        F.sum("_open").over(
            Window.partitionBy(*entity_cols)
            .orderBy("_t")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_sid = stepped.groupBy(*entity_cols, "_sid").agg(
        F.min(F.when(F.col("_a"), F.col("_t"))).alias("_entry"),
        F.max(F.when(F.col("_a"), F.col("_t"))).alias("_last_seen"),
        F.min(F.when(~F.col("_a"), F.col("_t"))).alias("_exit"),
        F.sum((F.col("_a") & ~F.col("_pa")).cast("long")).alias("_became_a"),
        F.sum((~F.col("_a") & F.col("_pa")).cast("long")).alias("_became_i"),
        F.sum(F.when(F.col("_pa"), F.col("_dt")).otherwise(0.0)).alias("_act_s"),
        F.sum(F.when(~F.col("_pa"), F.col("_dt")).otherwise(0.0)).alias("_inact_s"),
        F.max_by("_a", "_t").alias("_final_a"),
        F.max("_t").alias("_max_t"),
        F.count("*").alias("_n"),
    )
    session_struct = F.when(
        F.col("_sid") > 0,
        F.struct(
            F.col("_sid").alias("session_id"),
            F.col("_entry").alias("entry_time"),
            F.coalesce(F.col("_exit"), F.col("_last_seen")).alias("exit_time"),
            (F.coalesce(F.col("_exit"), F.col("_last_seen")) - F.col("_entry")).alias(
                "duration"
            ),
        ),
    )
    return (
        per_sid.groupBy(*entity_cols)
        .agg(
            F.coalesce(F.sum("_became_a"), F.lit(0)).alias("became_active"),
            F.coalesce(F.sum("_became_i"), F.lit(0)).alias("became_inactive"),
            F.coalesce(F.sum("_act_s"), F.lit(0.0)).alias("active_seconds"),
            F.coalesce(F.sum("_inact_s"), F.lit(0.0)).alias("inactive_seconds"),
            F.max_by("_final_a", "_max_t").alias("final_active"),
            F.sum("_n").alias("sample_count"),
            # collect_list drops the null produced for the _sid = 0
            # group (rows before the first session), so entities with no
            # sessions get [] — the old left-join + coalesce, for free.
            F.array_sort(F.collect_list(session_struct)).alias(sessions_col),
        )
        .withColumn(
            "inactive_percentage",
            F.when(
                (F.col("active_seconds") + F.col("inactive_seconds")) > 0,
                F.col("inactive_seconds")
                / (F.col("active_seconds") + F.col("inactive_seconds"))
                * 100.0,
            ).otherwise(0.0),
        )
    )


def sessionize_by_gap(
    df: DataFrame,
    entity_cols: list[str],
    time_col: str,
    gap: float,
) -> DataFrame:
    """Gap-based sessions: a new session starts when Δt > ``gap``.
    ``gap`` is in the SAME UNIT as ``time_col`` (seconds for epoch
    seconds, microseconds for epoch micros — the operator never converts).

    Not in the reference (its sessions are state-driven), but the
    canonical form for event streams; used by the events-table oracle
    queries and the streaming layer (``session_window`` is the streaming
    twin). Same single-shuffle structure as :func:`sessionize`.
    """
    w = Window.partitionBy(*entity_cols).orderBy(time_col)
    tsec = F.col(time_col).cast("double")
    delta = tsec - F.lag(tsec).over(w)
    opens = (delta.isNull() | (delta > F.lit(gap))).cast("long")
    flagged = df.select(*entity_cols, tsec.alias("_t"), opens.alias("_open"))
    w2 = Window.partitionBy(*entity_cols).orderBy("_t")
    flagged = flagged.withColumn(
        "_sid", F.sum("_open").over(w2.rowsBetween(Window.unboundedPreceding, 0))
    )
    return flagged.groupBy(*entity_cols, F.col("_sid").alias("session_id")).agg(
        F.min("_t").alias("session_start"),
        F.max("_t").alias("session_end"),
        (F.max("_t") - F.min("_t")).alias("duration_seconds"),
        F.count("*").alias("n_events"),
    )
