"""Streaming shard publisher: curated documents stream out as WebDataset
tar shards, one shard set per microbatch.

The last mile of a streaming curation pipeline: upstream stages clean /
dedup / score documents; this sink publishes the survivors in the layout
training jobs consume (sources/tar_shards.py). Each microbatch writes its
own shard files into a batch-scoped subdirectory (``batch-{id:06d}/``),
so a replayed batch after a crash overwrites ITS OWN directory and never
corrupts earlier batches — per-batch idempotence on top of the writer's
per-shard atomic publish. A dataloader (or the tar_shards reader) can
consume every published batch directory as it lands.

foreachBatch rather than a custom streaming sink: the tar writer is a
batch DataSource, and foreachBatch is the supported bridge that reuses a
batch writer under streaming semantics.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from vectordbfaiss_spark.sources.tar_shards import TarShardsDataSource


def start_shard_publish(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_path: str,
    shards_per_batch: int = 2,
):
    """documents(doc_id, text, lang, source) stream -> tar shard sets
    under ``out_dir``/batch-NNNNNN/. Returns the StreamingQuery
    (availableNow trigger)."""
    spark = docs_stream.sparkSession
    spark.dataSource.register(TarShardsDataSource)

    def publish_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_dir = os.path.join(out_dir, f"batch-{batch_id:06d}")
        # replay safety: a re-run batch rebuilds its own directory whole
        shutil.rmtree(batch_dir, ignore_errors=True)
        (
            batch_df.select("doc_id", "text", "lang", "source")
            .repartition(shards_per_batch)
            .write.format("tar_shards")
            .option("path", batch_dir)
            .mode("append")
            .save()
        )

    return (
        docs_stream.writeStream.foreachBatch(publish_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
