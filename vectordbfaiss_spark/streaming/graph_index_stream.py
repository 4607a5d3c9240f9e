"""Streaming graph-ANN maintenance: each microbatch of new embeddings is
inserted into the published search graph as one immutable delta edge
segment (``operators/graph_ann_incremental.py``) — the graph twin of
``streaming/vector_index_stream.py``'s IVF delta-segment shape, and the
same durability contract: one segment directory PER MICROBATCH named by
batch_id, rewritten whole on replay; the streaming checkpoint guarantees
each source file lands in exactly one batch_id per query lineage.

Per-batch work is |batch|-proportional plus the visited-set-bounded beam
traversal per new point — nothing over the base graph or earlier
segments is rewritten. ``compact_graph`` folds segments in at
maintenance time and re-applies the degree cap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from vectordbfaiss_spark.operators.graph_ann_incremental import graph_index_append
from vectordbfaiss_spark.streaming.vector_index_stream import _SEG_PREFIX


def start_graph_index_ingest(
    emb_stream: DataFrame,
    base_edges_path: str,
    base_emb: DataFrame,
    segments_root: str,
    checkpoint_path: str,
    k: int = 16,
    beam: int = 24,
    rounds: int = 10,
):
    """embeddings(vec_id, embedding, ...) stream -> one delta edge segment
    per microbatch under ``segments_root``. Returns the StreamingQuery
    (availableNow trigger)."""

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        base_edges = spark.read.parquet(base_edges_path).select("src", "dst")
        seg = os.path.join(segments_root, f"{_SEG_PREFIX}{batch_id:05d}")
        graph_index_append(
            batch_df, base_edges, base_emb, seg, k=k, beam=beam, rounds=rounds
        )

    return (
        emb_stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
