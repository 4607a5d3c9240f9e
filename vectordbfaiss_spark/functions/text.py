"""Text pipeline functions — chunking, tokenization, HTML-name strip,
deterministic hash embedder.

Reference semantics (all re-derived, none copied):
- chunker  : ``chunkText(text, N, M)`` /root/reference/embed.js:183-195 —
  whitespace split, windows of N words at stride N-M, final partial window
  kept, generation stops at the first window whose end reaches the word
  count. Called with N=1000, M=50 (embed.js:201).
- tokenizer: ``natural.WordTokenizer`` via ``tokenizeContent``
  /root/reference/embed.js:29-34 — splits on non-alphanumerics, drops
  empties, truncates to the first 3000 tokens.
- HTML strip: ``removeHTMLElementNamesFromString`` embed.js:36-40 — deletes
  a fixed word-bounded list of tag/attr names (pattern reproduced
  semantically below).
- embedder : the reference calls OpenAI ada-002 (embed.js:135-151). Our
  default is a deterministic local feature-hash embedder (SURVEY §2.9 U1)
  so tests are hermetic: md5(token) -> bucket & sign, L2-normalized.

Everything except the embedder is a pure column expression (JVM-side).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F, types as T

# The tag/attribute names stripped by the reference (embed.js:37-38), as a
# word-bounded alternation. Semantics: delete the word, keep separators.
HTML_NAME_PATTERN = (
    r"\b(div|span|li|a|ul|section|script|footer|body|html|link|img|href|svg"
    r"|alt|target|js|javascript|lang|head|gtag|meta|charset|utf|woff2"
    r"|crossorigin|anonymous|rel|preload|as|font|assets|fonts|Inter|UI|var"
    r"|type|css|stylesheet|text)\b"
)

# natural.WordTokenizer splits on anything that is not [A-Za-z0-9_].
TOKEN_SEP_PATTERN = r"[^A-Za-z0-9_]+"

DEFAULT_CHUNK_N = 1000  # embed.js:201 / server.js:106,172
DEFAULT_CHUNK_M = 50
MAX_TOKENS = 3000  # embed.js:33


def strip_html_names(col: Column | str) -> Column:
    """F3: delete HTML tag/attr words (embed.js:36-40)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(col, HTML_NAME_PATTERN, "")


def tokenize(col: Column | str, max_tokens: int = MAX_TOKENS) -> Column:
    """F4+K2: word-tokenize and keep the first ``max_tokens`` tokens
    (embed.js:29-34). Returns ``ARRAY<STRING>`` without empty tokens.
    """
    col = F.col(col) if isinstance(col, str) else col
    toks = F.split(col, TOKEN_SEP_PATTERN)
    toks = F.filter(toks, lambda t: t != F.lit(""))
    return F.slice(toks, 1, max_tokens)


def chunk_words(col: Column | str) -> Column:
    """Whitespace word split exactly as the chunker does (embed.js:184).

    JS ``split(/\\s+/)`` emits a leading "" for leading whitespace but no
    trailing "" — we reproduce that by trimming only the trailing side.
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.split(F.rtrim(col), r"\s+")


def chunk_count(n_words: Column, n: int, m: int) -> Column:
    """Number of chunks the reference loop emits for ``n_words`` words:
    the smallest c >= 1 with (c-1)*(n-m) + n >= n_words.
    """
    stride = n - m
    return F.greatest(
        F.lit(1),
        (F.ceil((n_words - F.lit(n)).cast("double") / F.lit(float(stride))) + 1).cast("int"),
    )


def chunk_text(
    col: Column | str,
    n: int = DEFAULT_CHUNK_N,
    m: int = DEFAULT_CHUNK_M,
) -> Column:
    """F2: sliding-window chunker (embed.js:183-195) as one expression.

    Returns ``ARRAY<STRING>`` of chunks: chunk i covers words
    ``[i*(n-m), i*(n-m)+n)``; the last chunk is the first whose end reaches
    the word count (possibly partial). Explode downstream for one row per
    chunk (see sources.ingest).
    """
    if m >= n:
        raise ValueError("overlap m must be < chunk size n (reference loop diverges otherwise)")
    words = chunk_words(col)
    stride = n - m
    n_chunks = chunk_count(F.size(words), n, m)
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * stride + 1, n), " "),
    )


def filename_stem(path_col: Column | str) -> Column:
    """F10: basename without the final extension (server.js:111,176)."""
    path_col = F.col(path_col) if isinstance(path_col, str) else path_col
    base = F.element_at(F.split(path_col, "/"), -1)
    return F.regexp_replace(base, r"\.[^.]*$", "")


# ---------------------------------------------------------------------------
# Deterministic hash embedder (U1 default — replaces the OpenAI call)
# ---------------------------------------------------------------------------

def _hash_embed_text(text: str, dim: int) -> np.ndarray:
    """Feature-hash a string to an L2-normalized float32 vector.

    md5(token) -> (bucket, sign); deterministic across processes (no PYTHONHASHSEED
    dependence). Mirrors the *role* of embed.js:135-151 without the network.
    """
    vec = np.zeros(dim, dtype=np.float64)
    for tok in text.lower().split():
        h = hashlib.md5(tok.encode("utf-8")).digest()
        bucket = int.from_bytes(h[:4], "little") % dim
        sign = 1.0 if h[4] & 1 else -1.0
        vec[bucket] += sign
    norm = float(np.linalg.norm(vec))
    if norm > 0.0:
        vec /= norm
    return vec.astype(np.float32)


def hash_embed_udf(dim: int = 64):
    """Arrow-batched pandas_udf: STRING -> ARRAY<FLOAT> (dim-d, unit norm).

    The pluggable-embedder seam: swap for a real model-inference UDF in
    production; identical signature (SURVEY §2.9 U1).

    The md5 per token is memoized across the Arrow batch (natural text
    repeats its vocabulary heavily — Zipf), so the per-row work is a
    dict lookup + one exact integer accumulation (`np.add.at` over ±1
    in float64 is exact below 2^53, so summation order cannot change a
    bit) instead of re-hashing every occurrence. Bit-identical output
    to the per-token form (`_hash_embed_text`, kept as the scalar
    reference); measured on the syn ladder in SCALE.md round-8.
    """

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(s: pd.Series) -> pd.Series:
        cache: dict[str, tuple[int, float]] = {}

        def lookup(tok: str) -> tuple[int, float]:
            bs = cache.get(tok)
            if bs is None:
                h = hashlib.md5(tok.encode("utf-8")).digest()
                bs = (
                    int.from_bytes(h[:4], "little") % dim,
                    1.0 if h[4] & 1 else -1.0,
                )
                cache[tok] = bs
            return bs

        def embed_one(t: str | None) -> np.ndarray:
            toks = (t if t is not None else "").lower().split()
            vec = np.zeros(dim, dtype=np.float64)
            if toks:
                pairs = np.asarray([lookup(tok) for tok in toks], dtype=np.float64)
                np.add.at(vec, pairs[:, 0].astype(np.int64), pairs[:, 1])
            norm = float(np.linalg.norm(vec))
            if norm > 0.0:
                vec /= norm
            return vec.astype(np.float32)

        return s.map(embed_one)

    return _embed
