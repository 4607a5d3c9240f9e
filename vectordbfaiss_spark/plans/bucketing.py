"""Bucketed-table layout for shuffle-free (co-located) joins.

At 100 TB, the dominant cost of ``fact JOIN fact`` is shuffling both sides
by the join key. Writing both tables bucketed (and sorted) by that key
moves the shuffle to WRITE time, once; every subsequent join of the two
tables on the bucket key is planned WITHOUT an Exchange on either side —
bucket i of A joins bucket i of B in place.

This is the persistent-layout complement of plans/ivf.py (where the layout
encodes the ANN index, here it encodes the join partitioning). Both are
instances of the same north-star idea: make the storage layout do the work
so Catalyst's built-in rules (partition pruning there, bucket-join here)
apply without custom strategies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
) -> None:
    """Persist ``df`` as an external bucketed+sorted parquet table.

    Bucket hashing is Spark's Murmur3 on the bucket column — both sides of
    a future join must use the SAME n_buckets to co-locate.
    """
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key; with
    matching bucket specs Catalyst plans a sort-merge join with ZERO
    exchanges (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
