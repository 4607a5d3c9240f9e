"""Snapshot versioning: publish, pin, rollback, vacuum — reproducible
corpus versions over plain parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordbfaiss_spark.session import load_table
from vectordbfaiss_spark.sources.snapshots import (
    current_version,
    snapshot_read,
    snapshot_rollback,
    snapshot_vacuum,
    snapshot_write,
)

SF_DIR = "/root/testdata/sf0.001"


def test_publish_read_rollback_vacuum(spark, tmp_path):
    table = str(tmp_path / "corpus")
    docs = load_table(spark, SF_DIR, "documents")

    v1 = snapshot_write(docs.filter(F.col("doc_id") < 30), table)
    v2 = snapshot_write(docs.filter(F.col("doc_id") < 50), table)
    assert (v1, v2) == (1, 2)
    assert current_version(table) == 2
    assert snapshot_read(spark, table).count() == 50

    # pinned read: v1 is still bit-addressable after v2 published
    assert snapshot_read(spark, table, version=1).count() == 30

    snapshot_rollback(table, 1)
    assert snapshot_read(spark, table).count() == 30

    with pytest.raises(ValueError):
        snapshot_rollback(table, 99)

    v3 = snapshot_write(docs, table)
    assert snapshot_read(spark, table).count() == docs.count()
    # vacuum keeps the newest two and never the current
    removed = snapshot_vacuum(table, keep_last=2)
    assert removed == [1]
    assert snapshot_read(spark, table, version=2).count() == 50
    assert current_version(table) == v3


def test_unpublished_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, str(tmp_path / "nope"))


def test_partial_version_not_published_but_numbering_skips_it(spark, tmp_path):
    import os

    from vectordbfaiss_spark.sources.snapshots import (
        _versions,
        snapshot_rollback,
        snapshot_write,
    )

    table = str(tmp_path / "corpus")
    docs = load_table(spark, SF_DIR, "documents")
    snapshot_write(docs.filter(F.col("doc_id") < 10), table)

    # simulate a writer that crashed mid-write: v=2 exists, no _SUCCESS
    partial = os.path.join(table, "v=2")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as fh:
        fh.write(b"garbage")

    assert _versions(table) == [1]  # unpublished => invisible to readers
    with pytest.raises(ValueError):
        snapshot_rollback(table, 2)  # cannot point at partial data

    # the next write must NOT collide with the partial directory
    v = snapshot_write(docs.filter(F.col("doc_id") < 20), table)
    assert v == 3
    assert snapshot_read(spark, table).count() == 20


def test_pinned_read_refuses_partial_version(spark, tmp_path):
    import os

    from vectordbfaiss_spark.sources.snapshots import snapshot_write

    table = str(tmp_path / "corpus")
    docs = load_table(spark, SF_DIR, "documents")
    snapshot_write(docs.limit(5), table)
    partial = os.path.join(table, "v=2")
    os.makedirs(partial)
    with pytest.raises(ValueError):
        snapshot_read(spark, table, version=2)
