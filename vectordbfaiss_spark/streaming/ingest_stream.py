"""Structured Streaming surface — the incremental analog of ``POST /add``.

The reference's only incrementality is per-request insert + in-memory index
add (/root/reference/server.js:102-124,203-205). The streaming form is the
same chunk -> embed -> dedup transform over an unbounded file source
(SURVEY §2.10): new text files landing in a directory become searchable
chunks, exactly-once per content hash.

Design:
- file source (``readStream.text``) — each micro-batch is the new files;
- the batch chunk/embed transform is REUSED verbatim (same functions as
  sources.ingest — one code path for batch and streaming);
- dedup: ``dropDuplicates`` on content hash — streaming-stateful, covers
  in-stream duplicates; cross-run dedup comes from the store anti-join
  inside foreachBatch (idempotent restarts);
- sink: ``foreachBatch`` -> the SAME ``write_dedup_append`` as batch
  ingest. Parquet-append via foreachBatch keeps the store layout identical
  for batch readers.
- windowed aggregation with watermark (late-data bound) for event streams;
  its batch equivalent (``F.window``) is what the DuckDB oracle checks in
  the registry (tumbling_window_daily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vectordbfaiss_spark.functions.text import filename_stem
from vectordbfaiss_spark.sources.ingest import (
    chunk_documents,
    embed_chunks,
    write_dedup_append,
)


def _stream_chunks(spark: SparkSession, src_dir: str, n: int, m: int) -> DataFrame:
    """Shared streaming source stanza: text file source -> (file, stem,
    content) -> chunk explode. NO streaming-stateful dedup here — plain
    ``dropDuplicates`` would keep every content ever seen in the state
    store (unbounded on a long-running stream, the hazard stream_dedup's
    docstring describes); exact dedup is fully handled per micro-batch by
    ``write_dedup_append`` (in-batch dropDuplicates + store anti-join)."""
    files = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .load(src_dir)
        .select(
            F.input_file_name().alias("file"),
            filename_stem(F.input_file_name()).alias("stem"),
            F.col("value").alias("content"),
        )
    )
    return chunk_documents(files, n=n, m=m)


def _read_store_or_none(spark: SparkSession, path: str, columns: list[str]):
    """Read a parquet store, returning None ONLY when the path does not
    exist yet (first batch). Any other failure — corrupt footer, IO error,
    permissions — re-raises, so a transient fault fails the micro-batch
    (checkpoint retries it) instead of silently skipping dedup tiers and
    contaminating the append-only store.

    PATH_NOT_FOUND is matched on the error class alone — an existence
    probe via ``os.path`` would misclassify every failure on object-store
    URIs (s3a://...) as "missing". AnalysisException is imported from
    ``pyspark.errors`` (the base both JVM-captured and Spark Connect
    subclasses share)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path).select(*columns)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e):
            return None
        raise


def _read_derived_or_none(spark: SparkSession, path: str):
    """Read a DERIVED artifact (e.g. the signature sidecar): any read
    failure returns None — derived data is rebuilt from the source of
    truth, so unreadable/absent/empty all mean 'rebuild', never 'fail'.

    Catches Exception, not just AnalysisException: a corrupt sidecar footer
    surfaces as a SparkException/Py4JJavaError at schema inference, and a
    narrow catch would fail the micro-batch forever instead of rebuilding
    (the strict any-failure-raises handling is reserved for the
    source-of-truth store read above)."""
    try:
        df = spark.read.parquet(path)
        df.schema  # force footer/schema resolution now, not at action time
        return df
    except Exception:
        return None


def stream_ingest_text(
    spark: SparkSession,
    src_dir: str,
    store_path: str,
    checkpoint_dir: str,
    n: int = 1000,
    m: int = 50,
    dim: int = 64,
):
    """Start (availableNow) a streaming ingest of text files into the
    parquet chunk store. Returns the StreamingQuery; callers awaitTermination.

    availableNow processes the backlog then stops — the batch-compatible
    trigger for tests and scheduled incremental runs; swap for
    ``processingTime`` in an always-on deployment.
    """
    chunks = _stream_chunks(spark, src_dir, n, m)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # batch-local (bounded) content dedup BEFORE embedding — never
        # embed a chunk write_dedup_append is about to drop
        write_dedup_append(
            embed_chunks(batch_df.dropDuplicates(["content"]), dim),
            store_path,
            batch_df.sparkSession,
        )

    return (
        chunks.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming dedup with BOUNDED state: ``dropDuplicatesWithinWatermark``
    holds a key's dedup state only for the watermark horizon, then evicts.

    Plain streaming ``dropDuplicates`` keeps every key ever seen — on an
    unbounded 100 TB stream that state grows forever and eventually OOMs
    the state store. The within-watermark variant trades that for a
    bounded-staleness contract: duplicates arriving within ``watermark``
    of the first occurrence are dropped; a re-occurrence after the horizon
    may pass (and is then caught by the batch store anti-join in
    ``write_dedup_append`` — the same two-tier dedup as ingest).
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts over a streaming events frame —
    the streaming twin of the oracle-checked ``tumbling_window_daily``
    registry query (identical aggregation expression; watermark bounds
    state for late data).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_ingest_neardup(
    spark: SparkSession,
    src_dir: str,
    store_path: str,
    checkpoint_dir: str,
    n: int = 1000,
    m: int = 50,
    dim: int = 64,
    jaccard_threshold: float = 0.7,
):
    """Streaming ingest with NEAR-duplicate suppression against the
    published store: each micro-batch's chunks are banded against the
    existing corpus (minhash_lsh_incremental — an A x B candidate join
    proportional to the batch), and chunks near-duplicating a stored chunk
    above ``jaccard_threshold`` are dropped BEFORE embedding/append. Exact
    dedup (in-batch + store anti-join) still applies via
    ``write_dedup_append`` — this adds the fuzzy tier the reference's
    UNIQUE constraint can't express.

    Chunk ids are content-hashes on both sides (disjointness with the
    store holds for any chunk that is not an EXACT duplicate; exact dupes
    are removed by the anti-join regardless, so the near-dup comparison
    never needs colliding ids).

    Per-batch cost stays batch-proportional on the banding side: the
    store's MinHash signatures are PERSISTED in a ``<store>_sigs`` sidecar
    (appended with each accepted batch), so each micro-batch reads a
    narrow signature table instead of re-running the shingle explode +
    hash aggregate over the whole corpus; store TEXT is consulted only for
    the candidate set during verification. A crash between the chunk
    append and the sidecar append leaves some chunks unsigned — they stay
    searchable and exact-deduped, merely invisible to fuzzy banding until
    a sidecar rebuild (never wrong results).
    """
    from vectordbfaiss_spark.operators.dedup import (
        minhash_lsh_incremental,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    sig_path = store_path.rstrip("/") + "_sigs"
    chunks = _stream_chunks(spark, src_dir, n, m)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        # batch-local content dedup FIRST: a re-delivered file would put
        # the same (doc_id, content) row in twice, double-counting every
        # (id, shingle) pair in the verify step and inflating Jaccard —
        # falsely suppressing all copies of genuinely fresh content
        batch = (
            batch_df.dropDuplicates(["content"])
            .withColumn("doc_id", F.xxhash64("content"))
        )
        # in-batch FUZZY tier: a burst of near-identical (but not
        # byte-identical) files in one micro-batch would all pass the
        # store comparison — none is in the store yet. Band the batch
        # against itself (batch-sized work) and keep one representative
        # per near-dup group: drop any chunk with a smaller-id near-dup
        # neighbor, so exactly the group's minimum survives (chains
        # collapse to their least id — deterministic under re-delivery
        # because ids are content hashes).
        in_batch = minhash_lsh_pairs(
            batch, "doc_id", "content", threshold=jaccard_threshold
        )
        dropped = in_batch.select(F.col("id_b").alias("doc_id")).distinct()
        batch = batch.join(dropped, "doc_id", "left_anti")
        existing = _read_store_or_none(sess, store_path, ["doc_id", "content"])
        if existing is not None:
            # exact dupes share the store's doc_id — drop them BEFORE both
            # the near-dup comparison (disjoint id spaces) and the
            # embedder (never embed a chunk about to be dropped)
            batch = batch.join(existing.select("doc_id"), "doc_id", "left_anti")
            existing_sigs = _read_derived_or_none(sess, sig_path)
            if existing_sigs is None:
                # legacy store without a sidecar (or unreadable sidecar):
                # rebuild it ONCE from store text so every stored row is
                # visible to banding from this batch onward
                existing_sigs = minhash_signatures(
                    existing, "doc_id", "content"
                ).localCheckpoint(eager=True)
                existing_sigs.write.mode("overwrite").parquet(sig_path)
            near = minhash_lsh_incremental(
                existing,
                batch,
                "doc_id",
                "content",
                threshold=jaccard_threshold,
                check_disjoint=False,
                existing_signatures=existing_sigs,
            )
            near_ids = near.select(F.col("new_id").alias("doc_id")).distinct()
            batch = batch.join(near_ids, "doc_id", "left_anti")
        written = write_dedup_append(
            embed_chunks(batch.drop("doc_id"), dim), store_path, sess
        )
        # sidecar append AFTER the store append (see docstring for the
        # crash-window semantics); signatures computed on the written rows
        # only — batch-sized work. A fully-suppressed batch appends
        # nothing (an empty parquet append would leave a schemaless dir).
        if not written.isEmpty():
            minhash_signatures(written, "doc_id", "content").write.mode(
                "append"
            ).parquet(sig_path)

    return (
        chunks.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
