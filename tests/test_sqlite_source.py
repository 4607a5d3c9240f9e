"""Python DataSource for the reference's SQLite format: partitioned read,
blob decode, append-with-dedup write (schema per server.js:26-33)."""

from __future__ import annotations

import sqlite3
import struct

import pytest

from vectordbfaiss_spark.sources.sqlite_source import (
    SQLiteDocumentsDataSource,
    decode_f32le,
    encode_f32le,
)


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "vectors.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE documents (id INTEGER PRIMARY KEY AUTOINCREMENT, "
        "content TEXT UNIQUE, vector BLOB)"
    )
    rows = [
        (f"chunk number {i}", struct.pack("<4f", i, i + 0.5, -i, 0.25 * i))
        for i in range(57)
    ]
    con.executemany(
        "INSERT INTO documents (content, vector) VALUES (?, ?)", rows
    )
    con.commit()
    con.close()
    return path


def _register(spark):
    spark.dataSource.register(SQLiteDocumentsDataSource)


def test_read_roundtrips_all_rows_and_vectors(spark, db):
    _register(spark)
    df = (
        spark.read.format("sqlite_documents")
        .option("path", db)
        .option("numPartitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    got = {r.id: (r.content, r.vector) for r in df.collect()}
    assert len(got) == 57
    assert got[3][0] == "chunk number 2"  # id 3 = third insert
    assert got[3][1] == pytest.approx([2.0, 2.5, -2.0, 0.5])


def test_partitions_cover_disjointly(spark, db):
    _register(spark)
    one = (
        spark.read.format("sqlite_documents")
        .option("path", db)
        .option("numPartitions", "1")
        .load()
        .collect()
    )
    many = (
        spark.read.format("sqlite_documents")
        .option("path", db)
        .option("numPartitions", "16")
        .load()
        .collect()
    )
    assert sorted(r.id for r in one) == sorted(r.id for r in many)


def test_write_appends_with_content_dedup(spark, db):
    _register(spark)
    new = spark.createDataFrame(
        [
            (None, "chunk number 0", [9.0, 9.0]),  # duplicate content: ignored
            (None, "a brand new chunk", [1.0, 2.0]),
        ],
        "id LONG, content STRING, vector ARRAY<FLOAT>",
    ).coalesce(1)
    new.write.format("sqlite_documents").option("path", db).mode("append").save()

    con = sqlite3.connect(db)
    n, = con.execute("SELECT count(*) FROM documents").fetchone()
    blob, = con.execute(
        "SELECT vector FROM documents WHERE content = 'a brand new chunk'"
    ).fetchone()
    dup, = con.execute(
        "SELECT count(*) FROM documents WHERE content = 'chunk number 0'"
    ).fetchone()
    con.close()
    assert n == 58  # 57 + 1 new, duplicate ignored
    assert dup == 1
    assert decode_f32le(blob) == pytest.approx([1.0, 2.0])


def test_blob_codec_roundtrip():
    v = [0.1, -2.5, 3.25]
    assert decode_f32le(encode_f32le(v)) == pytest.approx(v, abs=1e-6)
    assert encode_f32le(None) is None and decode_f32le(None) is None


def test_empty_table_reads_empty(spark, tmp_path):
    path = str(tmp_path / "empty.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE documents (id INTEGER PRIMARY KEY, content TEXT, vector BLOB)")
    con.commit(); con.close()
    _register(spark)
    df = spark.read.format("sqlite_documents").option("path", path).load()
    assert df.count() == 0
