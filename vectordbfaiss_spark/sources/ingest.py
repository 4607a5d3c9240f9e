"""Batch ingest / index build — the Spark-native form of the reference's
``GET /load-documents`` and ``POST /add`` paths.

Reference flow (/root/reference/server.js:161-190, 102-124; SURVEY §3.2):
directory scan -> whole-file read -> chunkText(1000, 50) -> chunk name
``{stem}_chunk_{i+1}`` -> embed -> INSERT OR IGNORE (dedup on chunk text)
-> in-memory index add.

Spark mapping, one declarative pipeline:
- ``spark.read.text(dir, wholetext=True)`` + ``input_file_name()``  (S1)
- chunker as a pure expression + ``posexplode``                      (F2)
- chunk names via ``format_string``                                  (F9)
- deterministic hash embedder pandas_udf                             (U1)
- in-batch ``dropDuplicates`` + cross-batch left-anti join           (A5/S5)
- content-hash doc ids (``xxhash64`` of chunk text) — stable across
  rebuilds, no AUTOINCREMENT coordination (SURVEY §4.3)
- append-mode Parquet sink.

At scale: the text source parallelizes per file; the only shuffles are the
dedup aggregation (hash partition on content hash) and the anti-join against
the existing store (both on the same key, so AQE can reuse the exchange).
The embedder runs AFTER dedup — never embed a chunk you are about to drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vectordbfaiss_spark.functions.text import (
    DEFAULT_CHUNK_M,
    DEFAULT_CHUNK_N,
    chunk_text,
    filename_stem,
    hash_embed_udf,
)


def load_text_dir(spark: SparkSession, path: str) -> DataFrame:
    """S1: whole-file text scan with source names (server.js:161-170).

    Output: (file STRING, stem STRING, content STRING) — one row per file.
    """
    return (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(path)
        .select(
            F.input_file_name().alias("file"),
            filename_stem(F.input_file_name()).alias("stem"),
            F.col("value").alias("content"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    content_col: str = "content",
    stem_col: str = "stem",
    n: int = DEFAULT_CHUNK_N,
    m: int = DEFAULT_CHUNK_M,
) -> DataFrame:
    """F2+F9: explode documents into named chunks.

    Output: (stem, chunk_idx, chunk_name, content) — ``chunk_name`` follows
    the reference's ``{stem}_chunk_{i+1}`` template (server.js:111,176; the
    reference computes it then drops it — we persist it, implementing the
    *intended* semantics per SURVEY §2.11).
    """
    return docs.select(
        F.col(stem_col).alias("stem"),
        F.posexplode(chunk_text(F.col(content_col), n, m)).alias("chunk_idx", "content"),
    ).select(
        "stem",
        "chunk_idx",
        F.format_string("%s_chunk_%d", F.col("stem"), F.col("chunk_idx") + 1).alias(
            "chunk_name"
        ),
        "content",
    )


def embed_chunks(chunks: DataFrame, dim: int = 64, content_col: str = "content") -> DataFrame:
    """U1: attach embeddings (deterministic hash embedder by default;
    swap the udf for real model inference in production)."""
    return chunks.withColumn("embedding", hash_embed_udf(dim)(F.col(content_col)))


def write_dedup_append(
    batch: DataFrame,
    store_path: str,
    spark: SparkSession,
    content_col: str = "content",
) -> DataFrame:
    """A5/S5: the INSERT OR IGNORE analog for an append-only Parquet store.

    1. in-batch dedup: ``dropDuplicates([content])`` — first writer wins;
    2. cross-batch dedup: left-anti join on content hash vs the existing
       store (exact replacement for the UNIQUE constraint, server.js:29,198;
       correct as long as this pipeline is the single writer);
    3. content-hash ``doc_id`` (xxhash64) — deterministic, rebuild-stable;
    4. append to Parquet.

    Returns the DataFrame of rows actually written (post-dedup).
    """
    deduped = batch.dropDuplicates([content_col]).withColumn(
        "doc_id", F.xxhash64(F.col(content_col))
    )
    try:
        existing = spark.read.parquet(store_path).select("doc_id")
        deduped = deduped.join(existing, "doc_id", "left_anti")
    except Exception:
        pass  # first batch: store does not exist yet
    # Materialize and BREAK LINEAGE before the append: the plan reads the
    # same path it is about to write, and Spark invalidates/recaches plans
    # by path on append — a plain cache() would recompute the anti-join
    # against the post-append store and report 0 rows written.
    deduped = deduped.localCheckpoint(eager=True)
    deduped.write.mode("append").parquet(store_path)
    return deduped


def canonical_dedup_chunks(chunks: DataFrame) -> DataFrame:
    """Deterministic in-batch chunk dedup: one row per distinct content,
    winner = smallest (stem, chunk_idx).

    ``dropDuplicates`` keeps an *arbitrary* duplicate — fine for the
    reference's first-writer-wins semantics (server.js:198) but the winner
    then depends on task scheduling, so rebuilds are not reproducible and
    the result is not oracle-checkable. A min-struct aggregate costs the
    same single hash shuffle on content and pins the winner.
    """
    return (
        chunks.groupBy("content")
        .agg(F.min(F.struct("stem", "chunk_idx", "chunk_name")).alias("w"))
        .select("w.stem", "w.chunk_idx", "w.chunk_name", "content")
    )


def ingest_text_dir(
    spark: SparkSession,
    src_dir: str,
    store_path: str,
    n: int = DEFAULT_CHUNK_N,
    m: int = DEFAULT_CHUNK_M,
    dim: int = 64,
) -> DataFrame:
    """End-to-end /load-documents: scan -> chunk -> dedup -> embed -> append.

    Embedding runs after dedup (the reference embeds before its dedup check,
    server.js:192-198, wasting an embedding call per duplicate — at 100 TB
    that ordering is the difference between embedding the corpus once and
    embedding it per-ingest-attempt).
    """
    files = load_text_dir(spark, src_dir)
    chunks = chunk_documents(files, n=n, m=m)
    written = write_dedup_append(
        embed_chunks(canonical_dedup_chunks(chunks), dim),
        store_path,
        spark,
    )
    return written
