"""Streaming CDC apply: a change-row stream folded into a snapshot table
via MERGE, one atomic version per micro-batch.

Completes the CDC story: ``operators/merge.py`` gives batch MERGE INTO
semantics over snapshot versions; this module drives it from a stream of
keyed change rows (updates / inserts / delete flags), the shape a
Debezium-style feed or an ingest queue delivers.

``foreachBatch`` is the only sink that can express a read-modify-write
of the table; exactly-once per batch comes from the snapshot design
rather than the sink: every merge lands in a NEW ``v=n`` directory and
the ``_CURRENT`` pointer swaps last, so a crash mid-merge leaves the
previous version live and a checkpoint-replayed batch simply re-publishes
the same content as a fresh version (idempotent in content, monotone in
version number). Readers never observe a half-applied batch — the same
guarantee Delta's transaction log gives MERGE, from a pointer file.

Per-batch cost: one anti-join of the current version against the batch's
keys (batch-bounded, broadcast) + the batch itself — work scales with
|target| + |batch| per batch, never with accumulated history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from vectordbfaiss_spark.operators.merge import merge_upsert


def start_cdc_apply(
    changes_stream: DataFrame,
    table_path: str,
    checkpoint_path: str,
    key_cols: list[str],
    delete_col: str = "_delete",
):
    """changes(key..., payload..., _delete) stream -> snapshot table at
    ``table_path`` (must already hold version 1). Returns the
    StreamingQuery (availableNow trigger)."""
    spark = changes_stream.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            merge_upsert(
                spark,
                table_path,
                batch_df,
                key_cols=key_cols,
                delete_col=delete_col,
            )

    return (
        changes_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
