"""Table maintenance: small-file compaction.

Incremental ingest (sources/ingest.py append batches, streaming foreachBatch
micro-batches) accretes many small parquet files; at 100 TB a scan's task
count and open-file overhead are dominated by file COUNT, not bytes.
Compaction rewrites a table into size-targeted files. Without a table
format's atomic commit (Delta/Iceberg are out of public-only scope here)
the rewrite goes to a NEW directory and the caller swaps readers to it —
the rename is the (posix-atomic-enough) publish step for a single-writer
pipeline, mirroring how the ingest path already assumes one writer
(SURVEY §7 risk (d)).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F


def table_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of a parquet table, via the Hadoop FS API so
    it works for any supported filesystem URI, not just file://."""
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n += 1
        total += st.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite ``path`` into ``out_path`` with ~``target_file_bytes`` files.

    Unpartitioned: the file count is sized from the CURRENT on-disk bytes
    (already compressed parquet, so the estimate is honest) and the rewrite
    is a shuffle-free ``coalesce`` — merging files needs no exchange.
    With ``partition_by`` (e.g. an IVF table's cluster_id dirs) the frame
    is hash-``repartition``-ed on the partition columns instead, so every
    partition value lands in exactly one task -> exactly one file per
    directory — the canonical partitioned-compaction shape.
    Returns the target file count (unpartitioned) or partition count.
    """
    df: DataFrame = spark.read.parquet(path)
    if partition_by:
        out = df.repartition(*[df[c] for c in partition_by])
        out.write.mode("overwrite").partitionBy(*partition_by).parquet(out_path)
        return df.select(*partition_by).distinct().count()
    _, total = table_file_stats(spark, path)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df.coalesce(n_out).write.mode("overwrite").parquet(out_path)
    return n_out


def compact_sorted(
    spark: SparkSession,
    path: str,
    out_path: str,
    sort_cols: list[str],
    n_files: int = 8,
) -> int:
    """Clustered rewrite: range-partition on ``sort_cols`` then sort within
    each partition before writing.

    This is the data-layout half of predicate pushdown: parquet stores
    min/max stats per row group, but stats only PRUNE when the layout makes
    value ranges disjoint across files/row-groups. After this rewrite a
    range filter on ``sort_cols`` touches ~1 file instead of all of them.
    Covers single-key access patterns (time-range, id-range); for
    two-column predicates see :func:`zorder_compact` below.

    ``repartitionByRange`` samples the key distribution, so output files
    are balanced even under skew. Returns ``n_files``.
    """
    df: DataFrame = spark.read.parquet(path)
    cols = [df[c] for c in sort_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_files


def _interleave_bits(qa, qb, bits: int):
    """Morton/Z-value: interleave ``bits`` bits of two quantized longs —
    pure column arithmetic (shifts + masks), fully codegen'd."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(qa, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(qb, i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(bit_a, 2 * i) + F.shiftleft(bit_b, 2 * i + 1)
    return z


def zorder_compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_files: int = 16,
) -> int:
    """Two-column clustered rewrite on the Morton (Z-order) curve.

    ``compact_sorted`` makes ONE column's per-file ranges disjoint; a
    predicate on any other column still touches every file. Z-order
    quantizes two columns to ``bits``-bit grid cells, interleaves the
    bits, and range-partitions on the interleaved value — files become
    rectangles on the (a, b) grid, so min/max skipping prunes for
    predicates on EITHER column (or both). This is the lakehouse
    multi-dimensional clustering technique (Delta/Iceberg OPTIMIZE
    ZORDER BY) expressed as plain DataFrame arithmetic: quantization and
    bit interleaving are codegen'd column expressions, the layout comes
    from repartitionByRange + sortWithinPartitions, and the skipping
    comes from parquet's own footer stats — no format extension needed.

    Quantization is min/max-scaled; the two driver-side scalars come from
    one aggregate over the source (a maintenance job reads its table
    anyway). Returns ``n_files``.
    """
    df: DataFrame = spark.read.parquet(path)
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    levels = (1 << bits) - 1

    def quantize(col, lo, hi):
        span = float(hi) - float(lo)
        if span <= 0:
            return F.lit(0).cast("long")
        return F.least(
            F.floor((F.col(col).cast("double") - float(lo)) / span * levels),
            F.lit(levels),
        ).cast("long")

    z = _interleave_bits(
        quantize(col_a, lo_a, hi_a), quantize(col_b, lo_b, hi_b), bits
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_files
