"""Streaming inverted-index maintenance (streaming/index_stream.py):
two-microbatch run converges to exactly the full-corpus rebuild."""

from __future__ import annotations

import pathlib

from vectordbfaiss_spark.queries.search_index import token_stats
from vectordbfaiss_spark.session import load_table
from vectordbfaiss_spark.streaming.index_stream import start_index_maintenance

SF_DIR = "/root/testdata/sf0.001"


def _stats_dict(df):
    return {
        r["token"]: (r["df"], r["tf_total"]) for r in df.collect()
    }


def test_stream_index_converges_to_rebuild(spark, tmp_path: pathlib.Path):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    half1 = docs.filter(docs.doc_id % 2 == 0)
    half2 = docs.filter(docs.doc_id % 2 == 1)

    src = tmp_path / "incoming"
    state = str(tmp_path / "index_state")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    half1.coalesce(1).write.mode("overwrite").parquet(str(src / "batch1"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    start_index_maintenance(stream, state, ckpt).awaitTermination(120)
    got1 = _stats_dict(spark.read.parquet(state))
    assert got1 == _stats_dict(token_stats(half1))

    # second file arrives; only IT is folded (checkpoint skips batch1),
    # and the merged state equals a full rebuild over both halves
    half2.coalesce(1).write.mode("overwrite").parquet(str(src / "batch2"))
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    start_index_maintenance(stream2, state, ckpt).awaitTermination(120)
    got2 = _stats_dict(spark.read.parquet(state))
    assert got2 == _stats_dict(token_stats(docs))
    # and it really was incremental: batch-1 tokens absent from batch 2
    # kept their exact counts without re-reading batch-1 text
    only1 = set(got1) - set(_stats_dict(token_stats(half2)))
    for t in only1:
        assert got2[t] == got1[t]


def test_fold_batch_replay_is_idempotent(spark, tmp_path: pathlib.Path):
    """Crash-replay contract: re-folding the batch_id already recorded in
    the state sidecar (a crash after the state overwrite but before the
    streaming checkpoint commit) must be a no-op, not a df/tf
    double-count. Exercised at the fold_batch level — the same callable
    the stream sink invokes — because forcing a real mid-commit crash in
    a local stream is not deterministic."""
    import json
    import os

    from vectordbfaiss_spark.streaming import index_stream as mod

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    batch = docs.filter(docs.doc_id < 50)
    src = tmp_path / "incoming"
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    batch.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    start_index_maintenance(stream, state, ckpt).awaitTermination(120)
    once = _stats_dict(spark.read.parquet(state))
    meta = json.load(open(os.path.join(state, "_fold_meta.json")))
    replay_id = meta["last_batch_id"]

    # simulate the replay: call the fold again with the SAME batch_id via
    # a fresh stream whose checkpoint was lost (new ckpt dir => batch 0
    # replays from the beginning of the source)
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    start_index_maintenance(stream2, state, str(tmp_path / "ckpt2")).awaitTermination(120)
    assert _stats_dict(spark.read.parquet(state)) == once, (
        "replayed batch_id was folded twice"
    )
    assert json.load(open(os.path.join(state, "_fold_meta.json")))[
        "last_batch_id"
    ] == replay_id
