"""Streaming sessionization (applyInPandasWithState) vs its batch twin."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from vectordbfaiss_spark.session import load_table
from vectordbfaiss_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

SF_DIR = "/root/testdata/sf0.001"
GAP_MIN = 12 * 60  # 12h: multi-event sessions on the monthly fixture


def test_stream_sessions_match_batch_twin(spark, tmp_path: pathlib.Path):
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "value"
    )

    # split into two time-ordered files -> two micro-batches, so sessions
    # spanning the batch boundary must merge through state
    src = tmp_path / "stream_src"
    mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    ev.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(str(src / "f0"))
    ev.filter(F.col("event_id") > mid).coalesce(1).write.parquet(str(src / "f1"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .select("user_id", "ts", "value")
    )
    q = (
        sessionize_stream(stream, gap_minutes=GAP_MIN)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], round(r["sum_value"], 6))
        for r in sessionize_batch(ev, gap_minutes=GAP_MIN).collect()
    }
    # the stream can only emit sessions already CLOSED by a gap or timeout
    # before end-of-stream; every emitted session must be a batch session,
    # and the batch-boundary-spanning ones must have merged correctly.
    assert got, "stream emitted no sessions"
    assert got <= expected, f"stream emitted sessions absent from batch: {got - expected}"
    # most closed sessions should actually have been emitted
    closable = {s for s in expected}
    assert len(got) >= len(closable) // 3


def test_stream_stream_interval_join_matches_batch(spark, tmp_path: pathlib.Path):
    from vectordbfaiss_spark.streaming.stream_join import (
        click_purchase_interval_join,
    )

    ev = load_table(spark, SF_DIR, "events")
    clicks_b = ev.filter(F.col("event_type") == "click")
    purchases_b = ev.filter(F.col("event_type") == "purchase")

    cdir, pdir = tmp_path / "clicks", tmp_path / "purch"
    clicks_b.coalesce(1).write.parquet(str(cdir))
    purchases_b.coalesce(1).write.parquet(str(pdir))

    cs = spark.readStream.schema(clicks_b.schema).parquet(str(cdir))
    ps = spark.readStream.schema(purchases_b.schema).parquet(str(pdir))
    q = (
        click_purchase_interval_join(cs, ps, window_minutes=120)
        .writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(map(tuple, spark.sql("SELECT * FROM ssj_out").collect()))
    expected = sorted(
        map(
            tuple,
            click_purchase_interval_join(
                clicks_b, purchases_b, window_minutes=120
            ).collect(),
        )
    )
    assert len(expected) > 0
    assert got == expected
