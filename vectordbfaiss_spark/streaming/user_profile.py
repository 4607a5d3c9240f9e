"""Streaming per-user running profile via ``transformWithStateInPandas``
(Spark 4's arbitrary-stateful-processing API — the successor to
``applyInPandasWithState`` used by streaming/sessionize.py; this module
exercises the new typed-state surface: ValueState with an explicit state
schema, per-key Arrow batches).

Semantics: for every user, maintain lifetime totals (event count, value
sum, max event-time seen) and emit the UPDATED totals once per microbatch
in which the user appeared. State per user is one fixed-size row —
bounded regardless of stream length; keys partition across executors so
state scales horizontally with the shuffle, the way a 1000-executor
deployment needs.

Batch twin (the test contract): after an availableNow pass over a static
input, the LAST emitted row per user equals the plain batch
``groupBy(user).agg(count, sum, max)`` — same two-mode-one-semantics
pattern as the sessionizer.

ENVIRONMENT GATE: transformWithState's Python state client speaks
protobuf to the JVM (pyspark/sql/streaming/proto/StateMessage_pb2), and
this container has no ``protobuf`` package — so the e2e contract (final
emitted state == the batch twin) is proven UNCONDITIONALLY through
:func:`user_profile_stream_apws` (same semantics on
applyInPandasWithState, the surface this container executes), and
tests/test_user_profile_stream.py re-runs the same assertions through
the transformWithState form wherever protobuf is importable — a runtime
branch, not a skipped test. On a cluster with protobuf installed this
module is live: it also needs
``spark.sql.streaming.stateStore.providerClass =
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``,
which transformWithState requires.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

PROFILE_SCHEMA = (
    "user_id long, n_events long, sum_value double, last_seen_us long"
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_us", LongType()),
    ]
)


class UserProfileProcessor(StatefulProcessor):
    """ValueState-backed running (count, sum, max-ts) per user key."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        n, total, last_us = 0, 0.0, 0
        if self._state.exists():
            n, total, last_us = self._state.get()
        for pdf in rows:
            if not len(pdf):
                continue
            n += int(len(pdf))
            total += float(pdf["value"].sum())
            # event-time microseconds; arrives as datetime64[ns] via Arrow
            last_us = max(last_us, int(pdf["ts"].max().value // 1_000))
        self._state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n],
                "sum_value": [total],
                "last_seen_us": [last_us],
            }
        )

    def close(self) -> None:
        pass


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events(user_id, ts, value) stream -> running per-user profile rows."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserProfileProcessor(),
            outputStructType=PROFILE_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def user_profile_batch(events: DataFrame) -> DataFrame:
    """The deterministic batch twin of the streaming profile."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
        (F.unix_micros(F.max("ts"))).alias("last_seen_us"),
    )


def user_profile_stream_apws(events: DataFrame) -> DataFrame:
    """``applyInPandasWithState`` twin of :func:`user_profile_stream` —
    IDENTICAL semantics (running per-user count/sum/max-ts, one updated
    row per microbatch the user appears in) on the stateful surface this
    container can actually execute end-to-end.

    Why both exist: transformWithStateInPandas is the forward API (typed
    ValueState, timers), but its Python state client speaks protobuf to
    the JVM and this environment ships no ``protobuf`` package — so the
    e2e contract (final emitted state == the batch twin) is proven
    through THIS form unconditionally, and the transformWithState form
    re-runs the same assertions wherever protobuf exists (see
    tests/test_user_profile_stream.py). State here is the same bounded
    (n, total, last_us) row per key, tuple-typed per the
    applyInPandasWithState contract."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += int(len(pdf))
            total += float(pdf["value"].sum())
            last_us = max(last_us, int(pdf["ts"].max().value // 1_000))
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n],
                "sum_value": [total],
                "last_seen_us": [last_us],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            PROFILE_SCHEMA,
            "n long, total double, last_us long",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
