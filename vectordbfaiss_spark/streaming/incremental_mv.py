"""Streaming incremental materialized view: foreachBatch + algebraic state.

The batch operator (operators/incremental.py) maintains a rollup by
merging partial aggregate states; this module drives it from a stream.
Each microbatch is reduced to its partial state (a view-key-sized
DataFrame) and folded into the persisted state table — so the per-batch
work scales with the BATCH, and the merge with the VIEW, never with the
accumulated history of events.

``foreachBatch`` is the right sink here because the merge needs a
read-modify-write of the state table, which plain streaming sinks can't
express. Exactly-once comes from the checkpoint: a replayed batch merges
idempotently only if the writer is transactional — on plain parquet we
document at-least-once for a crash INSIDE the overwrite; on a cluster
the state table would be Delta/Iceberg where the overwrite commit is
atomic (same code, different format string).

The in-place overwrite requires materializing the merged state BEFORE
the write (localCheckpoint) — the merged plan's lineage reads the very
path being overwritten.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from vectordbfaiss_spark.operators.incremental import merge_states, partial_daily_state


def start_incremental_mv(
    events_stream: DataFrame, state_path: str, checkpoint_path: str
):
    """events(ts, event_type, value) stream -> maintained state table at
    ``state_path``. Returns the StreamingQuery (availableNow trigger)."""
    spark = events_stream.sparkSession

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        new_state = partial_daily_state(batch_df)
        if os.path.exists(state_path):
            old_state = spark.read.parquet(state_path)
            merged = merge_states(old_state, new_state)
        else:
            merged = new_state
        # materialize before overwriting the path the plan reads from
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            state_path
        )

    return (
        events_stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
