"""Ingest pipeline tests: chunker reference semantics (property checks per
SURVEY §5.4), dedup idempotence, end-to-end directory ingest."""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from vectordbfaiss_spark.functions.text import chunk_text
from vectordbfaiss_spark.sources.ingest import ingest_text_dir, load_text_dir


def _chunks_reference(text: str, n: int, m: int) -> list[str]:
    """Direct transcription of the reference loop semantics
    (embed.js:183-195) used as the expected value — stride n-m, break once a
    window reaches the end."""
    import re

    words = re.split(r"\s+", text.rstrip())
    out = []
    i = 0
    while i < len(words):
        out.append(" ".join(words[i : i + n]))
        if i + n >= len(words):
            break
        i += n - m
    return out


@pytest.mark.parametrize(
    "n_words,n,m",
    [(1, 10, 2), (9, 10, 2), (10, 10, 2), (11, 10, 2), (25, 10, 2), (100, 7, 3), (8, 10, 2)],
)
def test_chunker_matches_reference_semantics(spark, n_words, n, m):
    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame([(text,)], ["t"])
    got = df.select(chunk_text("t", n, m).alias("c")).collect()[0]["c"]
    assert got == _chunks_reference(text, n, m)


def test_chunker_property_coverage_and_overlap(spark):
    """Every word appears in >= 1 chunk; consecutive chunks overlap by m
    words except possibly the final partial chunk (SURVEY §5.4)."""
    n, m = 10, 3
    text = " ".join(f"w{i}" for i in range(53))
    df = spark.createDataFrame([(text,)], ["t"])
    chunks = [c.split(" ") for c in df.select(chunk_text("t", n, m).alias("c")).collect()[0]["c"]]
    covered = {w for c in chunks for w in c}
    assert covered == {f"w{i}" for i in range(53)}
    for a, b in zip(chunks, chunks[1:]):
        assert a[n - m :] == b[: len(a[n - m :])]


def test_ingest_end_to_end_and_dedup_idempotent(spark, tmp_path: pathlib.Path):
    src = tmp_path / "docs"
    src.mkdir()
    (src / "a.txt").write_text(" ".join(f"alpha{i}" for i in range(25)))
    (src / "b.txt").write_text(" ".join(f"beta{i}" for i in range(8)))
    store = str(tmp_path / "store")

    written1 = ingest_text_dir(spark, str(src), store, n=10, m=2, dim=16)
    rows1 = written1.collect()
    # a.txt: 25 words, n=10, stride 8 -> chunks at 0,8,16 (16+10>=25) = 3
    # b.txt: 8 words -> 1 chunk
    assert len(rows1) == 4
    stored = spark.read.parquet(store)
    assert stored.count() == 4
    assert set(stored.columns) >= {"doc_id", "content", "embedding", "chunk_name", "stem"}
    # chunk names follow {stem}_chunk_{i+1} (server.js:111,176)
    names = {r["chunk_name"] for r in stored.select("chunk_name").collect()}
    assert "a_chunk_1" in names and "b_chunk_1" in names
    # embeddings are unit-norm 16-dim
    emb = stored.select("embedding").first()["embedding"]
    assert len(emb) == 16
    assert abs(sum(x * x for x in emb) - 1.0) < 1e-5

    # re-ingest: INSERT OR IGNORE semantics -> nothing new (server.js:198)
    written2 = ingest_text_dir(spark, str(src), store, n=10, m=2, dim=16)
    assert written2.count() == 0
    assert spark.read.parquet(store).count() == 4

    # new file -> only its chunks are appended
    (src / "c.txt").write_text("gamma0 gamma1 gamma2")
    written3 = ingest_text_dir(spark, str(src), store, n=10, m=2, dim=16)
    assert written3.count() == 1
    assert spark.read.parquet(store).count() == 5


def test_load_text_dir_stems(spark, tmp_path: pathlib.Path):
    src = tmp_path / "txt"
    src.mkdir()
    (src / "hello.world.txt").write_text("x")
    got = load_text_dir(spark, str(src)).select("stem").first()["stem"]
    assert got == "hello.world"  # strip only the FINAL extension (F10)
