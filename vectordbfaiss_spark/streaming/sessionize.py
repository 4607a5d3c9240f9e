"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §2.10 stretch; the reference has no
streaming at all — this is the north-star "custom stateful operator"
pattern for event pipelines).

Semantics: events for a user belong to one session while consecutive
event-times are within ``gap`` seconds; a session emits when the gap
expires (event-time timeout). State per user: current session's start,
last-seen time, event count, value sum — constant size regardless of
session length.

Batch twin: ``sessionize_batch`` computes identical sessions with window
functions (lag -> gap flag -> running session id), so the streaming
operator is testable against a deterministic batch oracle — the same
two-mode-one-semantics pattern used for the windowed aggregation.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "start long, last long, n long, total double"


def _make_sessionizer(gap_minutes: int):
    """Factory: a per-group stateful kernel with the gap baked in (the
    callable is pickled to executors; closure > global constant)."""
    gap_us = gap_minutes * 60 * 1_000_000  # state times in MICROSECONDS

    def _sessionize_group(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:

        def emit(rows_out):
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(rows_out),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in rows_out],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in rows_out],
                    "n_events": [n for _, _, n, _ in rows_out],
                    "sum_value": [t for _, _, _, t in rows_out],
                }
            )

        if state.hasTimedOut:
            session = state.get
            state.remove()
            yield emit([session])
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1_000).to_numpy()
        vals = rows["value"].to_numpy()

        out = []
        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = int(ts_us[0]), int(ts_us[0]) - 1, 0, 0.0

        for t, v in zip(ts_us, vals):
            t = int(t)
            if n and t - last > gap_us:
                out.append((start, last, n, total))
                start, n, total = t, 0, 0.0
            last = max(last, t)
            n += 1
            total += float(v)
        state.update((start, last, n, total))
        state.setTimeoutTimestamp(last // 1000 + gap_us // 1000)  # timeout API is ms

        if out:
            yield emit(out)

    return _sessionize_group

def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization: one bounded state record per live user;
    sessions emit on gap expiry via event-time timeout. ``events`` must be
    a streaming frame with (user_id, ts, value) and a watermark on ts."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch twin: identical session boundaries via window functions —
    lag gap flag -> running session index -> per-session aggregate."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        (
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) > gap_us
        )
        .cast("int")
        .alias("new_session"),
    ).fillna({"new_session": 0})
    sess = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
