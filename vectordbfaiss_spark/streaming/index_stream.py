"""Streaming inverted-index maintenance: new document files fold their
token statistics into a persisted dictionary artifact.

The batch twin is ``inverted_index_incremental`` (queries/search_index.py):
df/tf are additive over disjoint document sets, so each microbatch reduces
to a vocabulary-sized (token, df, tf_total) frame and merges into the
store with one full-outer join — per-batch work scales with the BATCH,
the merge with the VOCABULARY, never with the indexed history.

Same sink rationale as ``streaming/incremental_mv.py``: foreachBatch
because the merge is a read-modify-write; the checkpoint dedupes batches
so a document file is folded exactly once per query lineage. The merge
itself is made IDEMPOTENT per batch_id: the state artifact carries a
sidecar recording the last folded batch_id (atomic write-then-rename via
plans/ivf's ``_publish_sidecar``), so a replayed batch — a crash after
the state overwrite but before the streaming checkpoint commit — is
detected and skipped instead of double-counting its df/tf. On plain
parquet the state overwrite itself is still not atomic (on a cluster the
state table would be Delta/Iceberg, where the commit is — same code,
different format string). The disjointness contract (a doc_id appears in
exactly one batch) is the file-source's natural behavior: each file is
read once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from vectordbfaiss_spark.queries.search_index import merge_token_stats, token_stats


def start_index_maintenance(
    docs_stream: DataFrame, state_path: str, checkpoint_path: str
):
    """documents(doc_id, text, ...) stream -> maintained (token, df,
    tf_total) dictionary at ``state_path``. Returns the StreamingQuery
    (availableNow trigger)."""
    import json

    from vectordbfaiss_spark.plans.ivf import _publish_sidecar

    spark = docs_stream.sparkSession

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        meta_path = os.path.join(state_path, "_fold_meta.json")
        if os.path.exists(state_path):
            # replay guard: a batch_id already folded into the state (crash
            # between state overwrite and checkpoint commit) must be a no-op
            try:
                with open(meta_path) as fh:
                    if json.load(fh).get("last_batch_id") == batch_id:
                        return
            except (OSError, ValueError):
                pass  # missing/truncated sidecar: fold (at-least-once floor)
            old = spark.read.parquet(state_path)
            merged = merge_token_stats(old, token_stats(batch_df))
        else:
            merged = token_stats(batch_df)
        # materialize before overwriting the path the plan reads from
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            state_path
        )
        _publish_sidecar(state_path, "_fold_meta.json", {"last_batch_id": batch_id})

    return (
        docs_stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
