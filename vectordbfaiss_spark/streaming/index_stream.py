"""Streaming inverted-index maintenance: new document files fold their
token statistics into a persisted dictionary artifact.

The batch twin is ``inverted_index_incremental`` (queries/search_index.py):
df/tf are additive over disjoint document sets, so each microbatch reduces
to a vocabulary-sized (token, df, tf_total) frame and merges into the
store with one full-outer join — per-batch work scales with the BATCH,
the merge with the VOCABULARY, never with the indexed history.

Same sink rationale and durability contract as
``streaming/incremental_mv.py``: foreachBatch because the merge is a
read-modify-write; the checkpoint dedupes batches so a document file is
folded exactly once per query lineage; on plain parquet a crash INSIDE
the overwrite is at-least-once (on a cluster the state table would be
Delta/Iceberg, where the overwrite commit is atomic — same code,
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
    spark = docs_stream.sparkSession

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        new = token_stats(batch_df)
        if os.path.exists(state_path):
            old = spark.read.parquet(state_path)
            merged = merge_token_stats(old, new)
        else:
            merged = new
        # materialize before overwriting the path the plan reads from
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            state_path
        )

    return (
        docs_stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
