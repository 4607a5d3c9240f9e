"""MERGE INTO (upsert + delete) over snapshot-versioned parquet tables.

The reference's only write semantics is INSERT-OR-IGNORE on content
identity (``server.js:29,198`` — mirrored by
``sources/ingest.py::write_dedup_append``). A curated-corpus pipeline
also needs the full CDC merge: apply a batch of keyed updates, inserts
and deletes as ONE atomic new table version (Delta/Iceberg
``MERGE INTO``, expressed over plain parquet + the snapshot pointer from
``sources/snapshots.py``).

Semantics per change row (key = ``key_cols``):
- delete flag set and key matches  -> row removed;
- delete flag set, key absent      -> no-op;
- delete flag clear, key matches   -> row replaced (update);
- delete flag clear, key absent    -> row inserted.

Plan shape at scale: the target is touched ONCE — a left-anti join
against just the change keys (broadcast when the batch is bounded, the
normal CDC case) keeps untouched rows, and surviving change rows union
on top. No full-outer join, no second scan of the target; the write
publishes through the snapshot pointer, so readers flip atomically from
v_n to v_n+1 and a crashed merge leaves v_n intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vectordbfaiss_spark.sources.snapshots import snapshot_read, snapshot_write


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    key_cols: list[str],
    delete_col: str = "_delete",
    broadcast_changes: bool = True,
) -> int:
    """Apply ``changes`` to the table's current snapshot; publish and
    return the new version number.

    ``changes`` carries the target schema plus an optional boolean
    ``delete_col``. ``broadcast_changes=True`` (default) hints the
    anti-join's key side — correct for batch-bounded CDC sets; pass
    False for corpus-sized change sets and let AQE pick the join."""
    target = snapshot_read(spark, table_path)
    ch = changes
    if delete_col not in ch.columns:
        ch = ch.withColumn(delete_col, F.lit(False))
    keys = ch.select(*key_cols).dropDuplicates(key_cols)
    if broadcast_changes:
        keys = F.broadcast(keys)
    untouched = target.join(keys, key_cols, "left_anti")
    survivors = ch.filter(~F.col(delete_col)).drop(delete_col)
    merged = untouched.unionByName(survivors.select(*target.columns))
    return snapshot_write(merged, table_path)
