"""Streaming vector-index maintenance: each microbatch of new embeddings
becomes one immutable DELTA SEGMENT of the published IVF index.

The batch twin is ``ivf_append_search`` (queries/sources_io.py): a batch
is assigned to the FROZEN coarse quantizer (plans.ivf.ivf_index_append —
FAISS ``index.add()``) and written cluster-partitioned next to the base.
Readers union base + segments under one cluster_id routing predicate, so
serving sees every ingested vector without ever rewriting the base;
``compact_segments`` (plans.ivf.ivf_compact) folds segments in at
maintenance time, exactly like the batch query family.

Durability contract: one segment directory PER MICROBATCH, named by
batch_id — a replayed batch rewrites ITS OWN directory whole (idempotent
overwrite, same rationale as streaming/shard_publish.py); the streaming
checkpoint guarantees each source file lands in exactly one batch_id per
query lineage. Per-batch work is |batch|-proportional: one mapInPandas
centroid-routing pass + a |batch|-sized partitioned write — nothing over
the base corpus or earlier segments runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from vectordbfaiss_spark.plans.ivf import ivf_compact, ivf_index_append

_SEG_PREFIX = "delta_"


def start_vector_index_ingest(
    emb_stream: DataFrame,
    centroids,
    segments_root: str,
    checkpoint_path: str,
    vec_col: str = "embedding",
):
    """embeddings(vec_id, embedding, ...) stream -> one cluster-partitioned
    delta segment per microbatch under ``segments_root``. Returns the
    StreamingQuery (availableNow trigger)."""

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        seg = os.path.join(segments_root, f"{_SEG_PREFIX}{batch_id:05d}")
        # no delta_key: a replayed batch must REWRITE its directory (the
        # directory name, not a fingerprint, is the idempotency unit here)
        ivf_index_append(batch_df, centroids, seg, vec_col=vec_col)

    return (
        emb_stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def list_segments(segments_root: str) -> list[str]:
    """Completed segment paths (have a _SUCCESS marker), oldest first."""
    if not os.path.isdir(segments_root):
        return []
    out = []
    for name in sorted(os.listdir(segments_root)):
        p = os.path.join(segments_root, name)
        if name.startswith(_SEG_PREFIX) and os.path.isfile(
            os.path.join(p, "_SUCCESS")
        ):
            out.append(p)
    return out


def read_index(
    spark: SparkSession, base_path: str, segments_root: str
) -> DataFrame:
    """The serving view: base ∪ all completed delta segments. Every part
    is cluster-partitioned, so a cluster_id routing predicate partition-
    prunes each of them."""
    df = spark.read.parquet(base_path)
    for seg in list_segments(segments_root):
        df = df.unionByName(spark.read.parquet(seg))
    return df


def compact_segments(
    spark: SparkSession,
    base_path: str,
    segments_root: str,
    out_path: str,
    compact_key: str | None = None,
) -> None:
    """Maintenance: fold every completed segment into a fresh base (see
    plans.ivf.ivf_compact). Callers swap serving to ``out_path`` and
    retire the folded segments afterwards."""
    ivf_compact(
        spark, base_path, list_segments(segments_root), out_path,
        compact_key=compact_key,
    )
