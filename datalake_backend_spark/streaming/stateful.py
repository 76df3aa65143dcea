"""Custom stateful streaming operator: incremental slot-state tracking.

The batch engine sessionizes parking occupancy with one windowed pass
(operators/sessionize.py). A live detection stream can't re-sort
history per micro-batch; this operator keeps per-slot state across
batches with ``applyInPandasWithState``: last occupancy flag, last
timestamp, accumulated occupied/free seconds and transition counts.
Each batch emits one updated summary row per slot seen in that batch —
the incremental version of ``session_summary``.

State size is O(slots) scalars — bounded regardless of stream length;
the shuffle key is the slot id, so state lives with its partition.
Rows inside a batch are processed in timestamp order; late rows older
than the last-seen timestamp are counted in ``late_rows`` and skipped
(a watermark upstream bounds how late data can be).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_occupied", T.BooleanType()),
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("occupied_seconds", T.DoubleType()),
        T.StructField("free_seconds", T.DoubleType()),
        T.StructField("became_occupied", T.LongType()),
        T.StructField("became_free", T.LongType()),
        T.StructField("late_rows", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("slot_id", T.StringType()),
        T.StructField("occupied", T.BooleanType()),
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("occupied_seconds", T.DoubleType()),
        T.StructField("free_seconds", T.DoubleType()),
        T.StructField("became_occupied", T.LongType()),
        T.StructField("became_free", T.LongType()),
        T.StructField("late_rows", T.LongType()),
    ]
)


def _track_slot(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (slot_id,) = key
    if state.exists:
        last_occ, last_ts, occ_s, free_s, n_occ, n_free, late = state.get
    else:
        last_occ, last_ts, occ_s, free_s, n_occ, n_free, late = (
            None, None, 0.0, 0.0, 0, 0, 0,
        )

    for pdf in pdfs:
        pdf = pdf.sort_values("timestamp_sec")
        for ts, occ in zip(pdf["timestamp_sec"], pdf["occupied"]):
            ts = float(ts)
            occ = bool(occ)
            if last_ts is not None and ts < last_ts:
                late += 1
                continue
            if last_ts is not None:
                delta = ts - last_ts
                if last_occ:
                    occ_s += delta
                else:
                    free_s += delta
                if occ and not last_occ:
                    n_occ += 1
                elif not occ and last_occ:
                    n_free += 1
            last_occ, last_ts = occ, ts

    state.update((last_occ, last_ts, occ_s, free_s, n_occ, n_free, late))
    yield pd.DataFrame(
        [
            {
                "slot_id": slot_id,
                "occupied": last_occ,
                "last_ts": last_ts,
                "occupied_seconds": occ_s,
                "free_seconds": free_s,
                "became_occupied": n_occ,
                "became_free": n_free,
                "late_rows": late,
            }
        ]
    )


def track_slot_state(stream: DataFrame, slot_col: str = "slot_id") -> DataFrame:
    """Apply the stateful tracker to a streaming long table with columns
    (slot_id, timestamp_sec, occupied). Update output mode."""
    return stream.groupBy(slot_col).applyInPandasWithState(
        _track_slot,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithState (Spark 4 "Arbitrary Stateful Processing v2") ---
#
# applyInPandasWithState (above) carries ONE flat tuple per key.
# transformWithState is its successor: named composite state variables
# (value / list / map), optional per-variable TTL, timers, and an
# initial-state relation — the API a long-lived keyed aggregation
# actually wants. running_user_profile demonstrates it with the two
# shapes the old API couldn't express cleanly: a scalar ValueState for
# totals PLUS an unbounded-key MapState for per-event-type counts
# (previously you'd serialize the map into a string column and re-parse
# it every batch).
#
# Requires the RocksDB state store (transformWithState is implemented
# only there) — streaming_tws_session() sets the provider conf.
#
# SANDBOX GAP: the Python side of transformWithState speaks a protobuf
# protocol to the JVM state server, and this container has no
# `google.protobuf` (install disallowed). The operator is complete and
# its test runs wherever protobuf exists (pytest skips on ImportError);
# in this sandbox the equivalent semantics stay covered by the
# applyInPandasWithState tracker above (driver row q74). Verified
# failure mode: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE from
# `import google.protobuf` in transform_with_state_driver_worker.

_TWS_OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, sum_value_scaled BIGINT, "
    "n_types BIGINT, top_type_cnt BIGINT"
)


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)


class UserProfileProcessor(StatefulProcessor):
    """Per-user running profile: event count, integer-scaled value sum
    (``Σ FLOOR(1000·value)`` — order-independent BIGINT, bit-exact in
    any engine), distinct event-type count and the hottest type's
    count. State: one ValueState (totals) + one MapState (type →
    count); both survive across micro-batches and restarts."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "n BIGINT, sv BIGINT")
        self._types = handle.getMapState("types", "t STRING", "c BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np
        import pandas as pd

        (uid,) = key
        n, sv = (self._totals.get() or (0, 0)) if self._totals.exists() else (0, 0)
        type_add: dict[str, int] = {}
        for pdf in rows:
            n += len(pdf)
            sv += int(
                np.floor(pdf["value"].to_numpy() * 1000.0).astype("int64").sum()
            )
            for t, c in pdf["event_type"].value_counts().items():
                type_add[t] = type_add.get(t, 0) + int(c)
        for t, c in type_add.items():
            prev = (
                self._types.getValue((t,)) if self._types.containsKey((t,)) else None
            )
            prev_c = int(prev[0]) if prev is not None else 0
            self._types.updateValue((t,), (prev_c + c,))
        self._totals.update((n, sv))
        n_types = 0
        top = 0
        for v in self._types.values():
            n_types += 1
            top = max(top, int(v[0]))
        yield pd.DataFrame(
            [
                {
                    "user_id": int(uid),
                    "n_events": n,
                    "sum_value_scaled": sv,
                    "n_types": n_types,
                    "top_type_cnt": top,
                }
            ]
        )

    def close(self) -> None:
        pass


def running_user_profile(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Apply the transformWithState user profiler to a stream with
    columns (user_id, event_type, value). Update output mode; emits one
    cumulative row per user per batch the user appears in."""
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=_TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
