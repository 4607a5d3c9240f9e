"""transformWithStateInPandas running user profile vs its batch twin."""

from __future__ import annotations

import pathlib

import pytest

# transformWithState's Python state client requires protobuf, absent from
# this container (see streaming/user_profile.py docstring) — the operator
# is exercised end-to-end only where protobuf exists.
pytest.importorskip("google.protobuf")

from pyspark.sql import functions as F

from vectordbfaiss_spark.session import load_table
from vectordbfaiss_spark.streaming.user_profile import (
    user_profile_batch,
    user_profile_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_profile_final_state_matches_batch(spark, tmp_path: pathlib.Path):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts", "value")

    # two time-ordered files -> two micro-batches: totals must accumulate
    # THROUGH state, not within one batch
    src = tmp_path / "profile_src"
    ckpt = tmp_path / "ckpt"
    mid = ev.select(F.unix_micros("ts").alias("us")).approxQuantile(
        "us", [0.5], 0.0
    )[0]
    ev.filter(F.unix_micros("ts") <= mid).coalesce(1).write.parquet(str(src / "f0"))
    ev.filter(F.unix_micros("ts") > mid).coalesce(1).write.parquet(str(src / "f1"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            user_profile_stream(stream)
            .writeStream.format("memory")
            .queryName("profiles_out")
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    emitted = spark.sql("SELECT * FROM profiles_out").toPandas()
    # multiple emissions per user (one per batch they appear in): keep the
    # one with the largest n_events == final state
    final = (
        emitted.sort_values(["user_id", "n_events"])
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")
    )
    want = user_profile_batch(ev).toPandas().set_index("user_id")

    assert set(final.index) == set(want.index)
    users_with_two_batches = (
        emitted.groupby("user_id").size().loc[lambda s: s > 1]
    )
    assert len(users_with_two_batches) > 0  # state actually carried over
    for uid in want.index:
        assert final.loc[uid, "n_events"] == want.loc[uid, "n_events"], uid
        assert abs(final.loc[uid, "sum_value"] - want.loc[uid, "sum_value"]) < 1e-6
        assert final.loc[uid, "last_seen_us"] == want.loc[uid, "last_seen_us"], uid
