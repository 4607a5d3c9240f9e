"""End-to-end ingest / index build as an oracle-gated registry query.

This is the reference's ``GET /load-documents`` path run twice against the
same store (/root/reference/server.js:161-190): directory scan (S1) ->
filename stem (F10) -> sliding-window chunker (F2, embed.js:183-195) ->
chunk names (F9) -> deterministic in-batch dedup (A5) -> hash embedder
(U1) -> dedup-append sink (S5, the INSERT OR IGNORE analog,
server.js:196-213). The SECOND ingest must write zero rows — that is the
UNIQUE-constraint semantics — and the query surfaces it as the
``rewrite_rows`` column so the idempotence claim is hash-checked too.

The corpus is a committed fixture directory (``fixtures/ingest_docs``:
alpha/beta plus gamma, a byte-identical duplicate of alpha, so cross-file
chunk dedup fires). The DuckDB oracle rebuilds the whole pipeline in SQL:
``read_text`` for the scan, the closed-form chunk arithmetic proven by
``text_chunk_documents``, a window for the deterministic dedup winner, and
the md5 bucket/sign/normalize embedder checksum proven by
``hash_embedder_checksum``.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from vectordbfaiss_spark.queries.reference_parity import _hexpair
from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.sources.ingest import ingest_text_dir

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
SRC_DIR = os.path.join(_REPO_ROOT, "fixtures", "ingest_docs")

_N, _M = 40, 5  # fixture-scale chunking; production default is 1000/50
_STRIDE = _N - _M
_DIM = 64

_INGEST_ORACLE = f"""
WITH files AS (
  SELECT regexp_replace(regexp_extract(filename, '[^/]*$'), '\\.[^.]*$', '') AS stem,
         content
  FROM read_text('{SRC_DIR}/*.txt')
), w AS (
  SELECT stem, string_split_regex(rtrim(content), '\\s+') AS words FROM files
), nn AS (
  SELECT stem, words,
         greatest(1, CAST(ceil((len(words) - {_N}) / {float(_STRIDE)}) AS BIGINT) + 1)
           AS n_chunks
  FROM w
), chunks0 AS (
  SELECT stem, CAST(i AS BIGINT) AS chunk_idx,
         stem || '_chunk_' || CAST(i + 1 AS VARCHAR) AS chunk_name,
         array_to_string(list_slice(words, i * {_STRIDE} + 1,
                                    i * {_STRIDE} + {_N}), ' ') AS content
  FROM nn, unnest(generate_series(0, n_chunks - 1)) AS t(i)
), chunks AS (
  -- n_words recounted from the chunk STRING (rtrim + split), identically
  -- to the Spark side: a newline-terminated source file yields a trailing
  -- empty word (JS split(/\\s+/) semantics, embed.js:184), which joins as
  -- a trailing space and must not count as a word here
  SELECT stem, chunk_idx, chunk_name, content,
         CAST(len(string_split_regex(rtrim(content), '\\s+')) AS BIGINT)
           AS n_words
  FROM chunks0
), canon AS (
  SELECT stem, chunk_idx, chunk_name, content, n_words FROM (
    SELECT c.*, row_number() OVER (PARTITION BY content
                                   ORDER BY stem, chunk_idx) AS rn
    FROM chunks c) WHERE rn = 1
), toks AS (
  SELECT content, unnest(string_split_regex(trim(lower(content)), '\\s+')) AS tok
  FROM canon
), hx AS (
  SELECT content, md5(tok) AS h FROM toks
), b AS (
  SELECT content,
         ({_hexpair(1)} + 256 * {_hexpair(3)} + 65536 * {_hexpair(5)}
          + 16777216 * {_hexpair(7)}) % {_DIM} AS bucket,
         CASE WHEN {_hexpair(9)} % 2 = 1 THEN 1.0 ELSE -1.0 END AS sign
  FROM hx
), acc AS (
  SELECT content, bucket, sum(sign) AS val FROM b GROUP BY 1, 2
), nrm AS (
  SELECT content, sqrt(sum(val * val)) AS n FROM acc GROUP BY 1
), vec AS (
  SELECT a.content, a.bucket, CAST(a.val / nrm.n AS REAL) AS v
  FROM acc a JOIN nrm ON a.content = nrm.content
), sums AS (
  SELECT content,
         round(sum(CAST(v AS DOUBLE) * (bucket + 1)), 6) AS checksum,
         round(sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 6) AS sq_norm
  FROM vec GROUP BY content
)
SELECT c.stem, c.chunk_idx, c.chunk_name, c.content, c.n_words,
       s.checksum, s.sq_norm, CAST(0 AS BIGINT) AS rewrite_rows
FROM canon c JOIN sums s USING (content)
"""


@register("ingest_index_build", _INGEST_ORACLE)
def q_ingest_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+F10+F2+F9+A5+U1+S5 composed: the /load-documents pipeline run
    twice into a fresh store; returns the store contents with per-chunk
    embedder checksums plus the second run's written-row count (must be 0).
    """
    store = os.path.join(
        tempfile.mkdtemp(prefix="vdbf_ingest_"), "store.parquet"
    )
    try:
        ingest_text_dir(spark, SRC_DIR, store, n=_N, m=_M, dim=_DIM)
        second = ingest_text_dir(spark, SRC_DIR, store, n=_N, m=_M, dim=_DIM)
        rewrite_rows = second.count()  # S5 idempotence: 0 on re-ingest
        stored = spark.read.parquet(store)
        ex = stored.select(
            "stem",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            "chunk_name",
            "content",
            F.posexplode("embedding").alias("bucket", "val"),
        )
        out = (
            ex.groupBy("stem", "chunk_idx", "chunk_name", "content")
            .agg(
                F.round(
                    F.sum(F.col("val").cast("double") * (F.col("bucket") + 1)), 6
                ).alias("checksum"),
                F.round(
                    F.sum(F.col("val").cast("double") * F.col("val").cast("double")),
                    6,
                ).alias("sq_norm"),
            )
            .select(
                "stem",
                "chunk_idx",
                "chunk_name",
                "content",
                F.size(F.split(F.rtrim("content"), r"\s+")).cast("long").alias(
                    "n_words"
                ),
                "checksum",
                "sq_norm",
                F.lit(rewrite_rows).cast("long").alias("rewrite_rows"),
            )
        )
        # the store is a throwaway under /tmp; materialize before cleanup
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)
    return out
