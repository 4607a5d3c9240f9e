"""Reference-parity queries: the remaining SURVEY §2 operators as
oracle-checked declarations — text pipeline (F3/F4 verbatim-pattern strip +
tokenize, K2/K3 truncations), the deterministic hash embedder U1 itself
(validated bucket-by-bucket via checksums), the commented-out char-code mock
embedder F11, the debug dump S3, and the IN-list lookup S4/P2."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vectordbfaiss_spark.functions.text import (
    HTML_NAME_PATTERN,
    hash_embed_udf,
    strip_html_names,
    tokenize,
)
from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import load_table

# ---------------------------------------------------------------------------
# F3 + F4 + K2 + K3: HTML-name strip -> tokenize -> truncate
# ---------------------------------------------------------------------------

_TOKENIZE_ORACLE = rf"""
WITH cleaned AS (
  SELECT doc_id,
         regexp_replace(text, '{HTML_NAME_PATTERN}', '', 'g') AS clean
  FROM documents
), toks AS (
  SELECT doc_id, clean,
         list_filter(string_split_regex(clean, '[^A-Za-z0-9_]+'),
                     t -> t <> '') AS tokens
  FROM cleaned
)
SELECT doc_id,
       CAST(len(tokens) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(tokens, 1, 12), ' ') AS first_tokens,
       substr(clean, 1, 80) AS prompt_budgeted
FROM toks
"""


@register("text_pipeline_tokenize", _TOKENIZE_ORACLE)
def q_text_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's tokenizeContent pipeline (embed.js:29-40): strip the
    fixed HTML tag/attr name list (F3, same alternation), word-tokenize on
    non-alphanumerics dropping empties (F4, natural.WordTokenizer
    semantics), keep the first tokens (K2, embed.js:33), and cut the raw
    string to a prompt budget (K3, embed.js:59-67)."""
    docs = load_table(spark, sf_dir, "documents")
    clean = strip_html_names(F.col("text"))
    toks = tokenize(clean)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_join(F.slice(toks, 1, 12), " ").alias("first_tokens"),
        F.substring(clean, 1, 80).alias("prompt_budgeted"),
    )


# ---------------------------------------------------------------------------
# U1: the deterministic feature-hash embedder, oracle-checked end-to-end
# ---------------------------------------------------------------------------

def _hexpair(a: int) -> str:
    """SQL for byte value at hex positions (a, a+1) of column ``h``."""
    return (
        f"((strpos('0123456789abcdef', substr(h, {a}, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr(h, {a + 1}, 1)) - 1))"
    )


_EMBED_DIM = 64

# int.from_bytes(h[:4], 'little') = b0 + 256 b1 + 65536 b2 + 16777216 b3
_EMBED_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
), hx AS (
  SELECT doc_id, md5(tok) AS h FROM toks
), b AS (
  SELECT doc_id,
         ({_hexpair(1)} + 256 * {_hexpair(3)} + 65536 * {_hexpair(5)}
          + 16777216 * {_hexpair(7)}) % {_EMBED_DIM} AS bucket,
         CASE WHEN {_hexpair(9)} % 2 = 1 THEN 1.0 ELSE -1.0 END AS sign
  FROM hx
), acc AS (
  SELECT doc_id, bucket, sum(sign) AS val FROM b GROUP BY 1, 2
), nrm AS (
  SELECT doc_id, sqrt(sum(val * val)) AS n FROM acc GROUP BY 1
), vec AS (
  SELECT a.doc_id, a.bucket, CAST(a.val / nrm.n AS REAL) AS v
  FROM acc a JOIN nrm ON a.doc_id = nrm.doc_id
)
SELECT doc_id,
       round(sum(CAST(v AS DOUBLE) * (bucket + 1)), 6) AS checksum,
       round(sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 6) AS sq_norm
FROM vec GROUP BY doc_id
"""


@register("hash_embedder_checksum", _EMBED_ORACLE)
def q_hash_embedder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 end-to-end: run the pandas_udf hash embedder (functions.text,
    the hermetic replacement for the ada-002 call, embed.js:135-151) and
    project bucket-weighted checksums; the oracle recomputes the identical
    md5 -> bucket/sign -> accumulate -> L2-normalize -> float32 pipeline in
    SQL, so every bucket value is hash-validated (a wrong bucket, sign, or
    normalization changes the checksum)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = docs.select("doc_id", hash_embed_udf(_EMBED_DIM)(F.col("text")).alias("v"))
    ex = emb.select("doc_id", F.posexplode("v").alias("bucket", "val"))
    ex = ex.filter(F.col("val") != 0.0)
    return ex.groupBy("doc_id").agg(
        F.round(F.sum(F.col("val").cast("double") * (F.col("bucket") + 1)), 6).alias(
            "checksum"
        ),
        F.round(
            F.sum(F.col("val").cast("double") * F.col("val").cast("double")), 6
        ).alias("sq_norm"),
    )


# ---------------------------------------------------------------------------
# F11: the commented-out char-code mock embedder (server.js:98-100)
# ---------------------------------------------------------------------------

_CHARCODE_ORACLE = """
SELECT doc_id,
       CAST(list_sum(list_transform(string_split(substr(text, 1, 32), ''),
                     c -> ascii(c) % 10)) AS BIGINT) AS code_sum,
       CAST(length(substr(text, 1, 32)) AS BIGINT) AS n_chars
FROM documents
"""


@register("charcode_mock_embed", _CHARCODE_ORACLE)
def q_charcode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: the reference's commented-out mock embedder — char codes mod 10
    (server.js:98-100) — over the first 32 chars, reduced to a checksum."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, 32)
    codes = F.transform(F.split(prefix, ""), lambda c: F.ascii(c) % 10)
    return docs.select(
        "doc_id",
        F.aggregate(codes, F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "code_sum"
        ),
        F.length(prefix).cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# S3: debug dump; S4/P2: IN-list keyed lookup
# ---------------------------------------------------------------------------

_DUMP_ORACLE = "SELECT doc_id, text, lang, source, n_chars FROM documents"


@register("documents_dump", _DUMP_ORACLE)
def q_dump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: the /documents debug full dump (server.js:271-276) — SELECT *."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


_LOOKUP_IDS = [1, 7, 42, 99, 123, 200, 314, 499]

_LOOKUP_ORACLE = f"""
SELECT doc_id, text FROM documents
WHERE doc_id IN ({", ".join(map(str, _LOOKUP_IDS))})
"""


@register("in_list_lookup", _LOOKUP_ORACLE)
def q_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/P2: keyed IN-list hydration lookup (server.js:231-242). The
    predicate pushes down to the parquet scan (PushedFilters: In(doc_id))."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(_LOOKUP_IDS))
        .select("doc_id", "text")
    )
