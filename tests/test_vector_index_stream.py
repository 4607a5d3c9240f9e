"""Streaming IVF delta-segment maintenance (streaming/vector_index_stream):
two-microbatch ingest serves exactly the batch-built index content, and
compaction is content-neutral."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from vectordbfaiss_spark.plans.ivf import build_ivf_index
from vectordbfaiss_spark.session import load_table
from vectordbfaiss_spark.streaming.vector_index_stream import (
    compact_segments,
    list_segments,
    read_index,
    start_vector_index_ingest,
)

SF_DIR = "/root/testdata/sf0.001"


def _content(df):
    return {
        (r["vec_id"], r["cluster_id"]) for r in df.select("vec_id", "cluster_id").collect()
    }


def test_stream_segments_match_batch_build_and_compact(spark, tmp_path: pathlib.Path):
    emb = load_table(spark, SF_DIR, "embeddings")
    base_half = emb.filter(F.col("vec_id") % 3 == 0)
    new1 = emb.filter(F.col("vec_id") % 3 == 1)
    new2 = emb.filter(F.col("vec_id") % 3 == 2)

    base = str(tmp_path / "base")
    centroids = build_ivf_index(base_half, base, n_clusters=4, seed=42)

    src = tmp_path / "incoming"
    src.mkdir()
    segroot = str(tmp_path / "segments")
    ckpt = str(tmp_path / "ckpt")

    new1.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema(emb.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    start_vector_index_ingest(stream, centroids, segroot, ckpt).awaitTermination(120)
    assert len(list_segments(segroot)) == 1

    new2.coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))
    stream2 = (
        spark.readStream.schema(emb.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    # checkpoint skips b1: exactly one NEW segment appears
    start_vector_index_ingest(stream2, centroids, segroot, ckpt).awaitTermination(120)
    assert len(list_segments(segroot)) == 2

    # serving view == one-shot batch build over the full corpus with the
    # same frozen centroids (same (vec_id, cluster_id) content)
    from vectordbfaiss_spark.plans.ivf import _nearest_centroids
    from vectordbfaiss_spark.functions.vector import l2_normalize

    serving = read_index(spark, base, segroot)
    norm = emb.withColumn("embedding", l2_normalize(F.col("embedding")).cast("array<float>"))
    expect = (
        _nearest_centroids(norm, "embedding", centroids, 1)
        .select("vec_id", F.element_at("cluster_ids", 1).alias("cluster_id"))
    )
    assert _content(serving) == _content(expect)

    # compaction folds both segments and is content-neutral
    out = str(tmp_path / "compacted")
    compact_segments(spark, base, segroot, out, compact_key="v1")
    assert _content(spark.read.parquet(out)) == _content(serving)
