"""Streaming CDC apply (streaming/cdc_apply.py): change-file stream folded
into a snapshot table via MERGE; final state equals the batch merge."""

from __future__ import annotations

import pathlib

from vectordbfaiss_spark.sources.snapshots import (
    current_version,
    snapshot_read,
    snapshot_write,
)
from vectordbfaiss_spark.streaming.cdc_apply import start_cdc_apply

CHANGE_SCHEMA = "id long, v string, _delete boolean"


def test_stream_of_change_batches_lands_as_versions(spark, tmp_path: pathlib.Path):
    table = str(tmp_path / "table")
    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "id long, v string"
    )
    snapshot_write(base, table)

    src = str(tmp_path / "changes")
    # two change files -> (availableNow file source may take them as one
    # or two micro-batches; final state must be identical either way
    # because the merge is keyed and the files touch disjoint keys)
    b1 = spark.createDataFrame([(2, "TWO", False), (4, "four", False)], CHANGE_SCHEMA)
    b2 = spark.createDataFrame([(3, None, True), (5, "five", False)], CHANGE_SCHEMA)
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(CHANGE_SCHEMA).parquet(src)
    q = start_cdc_apply(
        stream, table, str(tmp_path / "ckpt"), key_cols=["id"]
    )
    q.awaitTermination(120)

    got = {r["id"]: r["v"] for r in snapshot_read(spark, table).collect()}
    assert got == {1: "one", 2: "TWO", 4: "four", 5: "five"}
    # every applied micro-batch is a pinned, auditable version > 1
    assert current_version(table) >= 2
    v1 = {r["id"]: r["v"] for r in snapshot_read(spark, table, version=1).collect()}
    assert v1 == {1: "one", 2: "two", 3: "three"}
