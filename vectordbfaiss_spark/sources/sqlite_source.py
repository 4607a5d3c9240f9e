"""Python DataSource: partitioned reader (and append writer) for the
reference's SQLite storage format.

The reference persists its corpus in SQLite — table
``documents(id INTEGER PRIMARY KEY, content TEXT UNIQUE, vector BLOB)``
with vectors serialized as little-endian float32 bytes
(server.js:26-33, 194). This source lets the Spark engine read that
exact format directly, so a reference deployment's ``vectors.db`` is a
first-class input:

    spark.dataSource.register(SQLiteDocumentsDataSource)
    df = (spark.read.format("sqlite_documents")
          .option("path", "/data/vectors.db").load())

Scale shape: ``partitions()`` splits the table into rowid ranges (SQLite
rowid range scans are index scans, not full scans), so N partitions read
concurrently from N executors — the standard parallel-JDBC-read pattern,
implemented over stdlib ``sqlite3`` since this is a file format, not a
server. One partition per ``numPartitions`` option (default 8); each
task opens the file read-only and decodes the float32 blobs to
``array<float>``.

The writer appends with ``INSERT OR IGNORE`` — the reference's own
dedup-on-content semantics (server.js:198) — one connection per task,
executemany per Arrow-sized chunk. SQLite serializes writers at the file
level, so the writer documents itself as a small-output escape hatch
(exporting winners back to a reference deployment), not a 100 TB sink.
"""

from __future__ import annotations

import sqlite3
import struct
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("content", StringType()),
        StructField("vector", ArrayType(FloatType())),
    ]
)


def decode_f32le(blob: bytes | None) -> list[float] | None:
    """server.js:194 inverse: little-endian float32 bytes -> list."""
    if blob is None:
        return None
    return list(struct.unpack(f"<{len(blob) // 4}f", blob))


def encode_f32le(vec: list[float] | None) -> bytes | None:
    if vec is None:
        return None
    return struct.pack(f"<{len(vec)}f", *vec)


@dataclass
class _RowidRange(InputPartition):
    path: str
    table: str
    lo: int
    hi: int  # inclusive


class _SQLiteReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.table = options.get("table", "documents")
        self.num_partitions = int(options.get("numPartitions", "8"))

    def partitions(self):
        con = sqlite3.connect(f"file:{self.path}?mode=ro", uri=True)
        try:
            row = con.execute(
                f"SELECT min(rowid), max(rowid) FROM {self.table}"
            ).fetchone()
        finally:
            con.close()
        if row is None or row[0] is None:
            return [_RowidRange(self.path, self.table, 0, -1)]
        lo, hi = row
        n = max(1, min(self.num_partitions, hi - lo + 1))
        step = (hi - lo + 1 + n - 1) // n
        return [
            _RowidRange(self.path, self.table, lo + i * step,
                        min(hi, lo + (i + 1) * step - 1))
            for i in range(n)
        ]

    def read(self, partition: _RowidRange):
        # yield Arrow RecordBatches, not tuples: the per-row Python<->JVM
        # bridge is ~10k rows/s, the Arrow path is columnar (measured 3.3s
        # -> sub-second for a 5k-row read at sf0.1)
        import pyarrow as pa

        if partition.hi < partition.lo:
            return
        con = sqlite3.connect(f"file:{partition.path}?mode=ro", uri=True)
        try:
            cur = con.execute(
                f"SELECT id, content, vector FROM {partition.table} "
                "WHERE rowid BETWEEN ? AND ? ORDER BY rowid",
                (partition.lo, partition.hi),
            )
            while True:
                chunk = cur.fetchmany(2048)
                if not chunk:
                    break
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([r[0] for r in chunk], pa.int64()),
                        pa.array([r[1] for r in chunk], pa.string()),
                        pa.array(
                            [decode_f32le(r[2]) for r in chunk],
                            pa.list_(pa.float32()),
                        ),
                    ],
                    names=["id", "content", "vector"],
                )
        finally:
            con.close()


@dataclass
class _WriteDone(WriterCommitMessage):
    n: int


class _SQLiteWriter(DataSourceWriter):
    """Append-only writer for the reference's documents.db format.

    Commit semantics: each TASK commits its own transaction inside
    ``write()`` — there is no driver-side two-phase commit, so a job that
    fails after some tasks finished leaves those tasks' rows visible
    (partial append). That is accepted for this documented small-export
    escape hatch because INSERT OR IGNORE on the UNIQUE content key makes
    re-running the whole write idempotent: the retry converges to exactly
    the full result, the same recovery model as the reference's own ingest
    (server.js:196-213). Not a 100 TB path — parquet sinks are.
    """

    def __init__(self, options: dict):
        self.path = options["path"]
        self.table = options.get("table", "documents")

    def write(self, rows: Iterator) -> _WriteDone:
        con = sqlite3.connect(self.path, timeout=60.0)
        try:
            con.execute(
                f"CREATE TABLE IF NOT EXISTS {self.table} ("
                "id INTEGER PRIMARY KEY AUTOINCREMENT, "
                "content TEXT UNIQUE, vector BLOB)"
            )
            n = 0
            sql = (
                f"INSERT OR IGNORE INTO {self.table} (content, vector) "
                "VALUES (?, ?)"  # OR IGNORE == the reference's content dedup
            )
            batch: list[tuple] = []
            for row in rows:
                batch.append((row["content"], encode_f32le(row["vector"])))
                if len(batch) >= 1024:
                    con.executemany(sql, batch)
                    n += len(batch)
                    batch.clear()
            if batch:
                con.executemany(sql, batch)
                n += len(batch)
            con.commit()
            return _WriteDone(n)
        finally:
            con.close()


class SQLiteDocumentsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sqlite_documents"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> _SQLiteReader:
        return _SQLiteReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> _SQLiteWriter:
        if overwrite:
            raise NotImplementedError(
                "sqlite_documents supports append only (INSERT OR IGNORE)"
            )
        return _SQLiteWriter(self.options)
