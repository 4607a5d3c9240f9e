"""Text-analysis query declarations over ``documents`` (operator impls:
operators/textstats.py; chunker: functions/text.py)."""

from __future__ import annotations

from vectordbfaiss_spark.functions.text import chunk_text
from vectordbfaiss_spark.operators import textstats as TS
from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import load_table

from pyspark.sql import DataFrame, SparkSession, functions as F

_TOKEN_STATS_ORACLE = """
WITH w AS (SELECT doc_id, string_split_regex(rtrim(text), '\\s+') AS words FROM documents)
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
       round(len(list_distinct(words)) / len(words), 6) AS ttr,
       round(list_sum(list_transform(words, w -> length(w))) / len(words), 6) AS avg_token_len
FROM w
"""


@register("text_token_stats", _TOKEN_STATS_ORACLE)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + lexical diversity per document."""
    docs = load_table(spark, sf_dir, "documents")
    out = TS.token_stats(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "ttr",
        "avg_token_len",
    )


_STOPLIST_SQL = "['" + "','".join(TS.EN_STOPWORDS) + "']"

_QUALITY_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split_regex(rtrim(text), '\\s+') AS words FROM documents),
m AS (
  SELECT doc_id,
         len(words) AS n_tokens,
         len(list_filter(words, t -> list_contains({_STOPLIST_SQL}, t))) AS n_stop,
         len(list_distinct(words)) / len(words) AS ttr
  FROM w
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(n_stop / n_tokens, 6) AS stopword_ratio,
       round(0.4 * least(n_tokens / 64.0, 1.0)
           + 0.3 * least(n_stop / n_tokens * 3, 1.0)
           + 0.3 * least(ttr * 2, 1.0), 6) AS quality
FROM m
"""


@register("text_quality_score", _QUALITY_ORACLE)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality score (length / stopword / diversity mix)."""
    docs = load_table(spark, sf_dir, "documents")
    out = TS.quality_score(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "stopword_ratio",
        "quality",
    )


def _lang_oracle() -> str:
    ratio_cols = ",\n         ".join(
        "len(list_filter(words, t -> list_contains(['"
        + "','".join(prof)
        + f"'], t))) / len(words) AS r_{lang}"
        for lang, prof in sorted(TS.LANG_PROFILES.items())
    )
    langs = sorted(TS.LANG_PROFILES)
    # fold ties toward the earliest language code, same as the Spark impl
    guess = f"'{langs[0]}'"
    score = f"r_{langs[0]}"
    for lang in langs[1:]:
        guess = f"CASE WHEN r_{lang} > {score} THEN '{lang}' ELSE {guess} END"
        score = f"CASE WHEN r_{lang} > {score} THEN r_{lang} ELSE {score} END"
    return f"""
WITH w AS (SELECT doc_id, string_split_regex(rtrim(text), '\\s+') AS words FROM documents),
r AS (
  SELECT doc_id,
         {ratio_cols}
  FROM w
)
SELECT doc_id, {guess} AS lang_guess, round({score}, 6) AS lang_score FROM r
"""


@register("text_language_id", _lang_oracle())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (deterministic heuristic)."""
    docs = load_table(spark, sf_dir, "documents")
    return TS.language_id(docs, "doc_id", "text")


_FINGERPRINT_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split_regex(rtrim(lower(text)), '\\s+') AS words
  FROM documents
)
SELECT doc_id,
       md5(array_to_string(words, ' ')) AS fp_exact,
       list_min(list_transform(words, w -> md5(w))) AS fp_minhash
FROM w
"""


@register("text_fingerprint", _FINGERPRINT_ORACLE)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash fingerprints (exact id + 1-hash MinHash sketch)."""
    docs = load_table(spark, sf_dir, "documents")
    return TS.fingerprint(docs, "doc_id", "text")


_TERMFREQ_ORACLE = """
SELECT tok, count(*) AS n
FROM (SELECT unnest(string_split_regex(rtrim(text), '\\s+')) AS tok FROM documents)
GROUP BY tok
ORDER BY n DESC, tok
LIMIT 20
"""


@register("text_term_freq_top20", _TERMFREQ_ORACLE)
def q_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 term frequencies (deterministic U3 replacement)."""
    docs = load_table(spark, sf_dir, "documents")
    return TS.term_frequencies(docs, "text", top_n=20)


_CHUNK_N = 40
_CHUNK_M = 5

_CHUNK_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split_regex(rtrim(text), '\\s+') AS words FROM documents),
n AS (
  SELECT doc_id, words,
         greatest(1, CAST(ceil((len(words) - {_CHUNK_N}) / {float(_CHUNK_N - _CHUNK_M)}) AS BIGINT) + 1) AS n_chunks
  FROM w
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(words, i * {_CHUNK_N - _CHUNK_M} + 1,
                                  i * {_CHUNK_N - _CHUNK_M} + {_CHUNK_N}), ' ') AS chunk,
       CAST(len(list_slice(words, i * {_CHUNK_N - _CHUNK_M} + 1,
                           i * {_CHUNK_N - _CHUNK_M} + {_CHUNK_N})) AS BIGINT) AS n_words
FROM n, unnest(generate_series(0, n_chunks - 1)) AS t(i)
"""


@register("text_chunk_documents", _CHUNK_ORACLE)
def q_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference sliding-window chunker (embed.js:183-195) at N=40, M=5
    (scaled to fixture text lengths; production default stays 1000/50).
    One output row per chunk with its index and word count.
    """
    docs = load_table(spark, sf_dir, "documents")
    chunks = docs.select(
        "doc_id", F.posexplode(chunk_text("text", _CHUNK_N, _CHUNK_M)).alias("chunk_idx", "chunk")
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk",
        F.size(F.split(F.col("chunk"), r"\s+")).cast("long").alias("n_words"),
    )


_RELEVANT_ORACLE = """
WITH toks AS (
  SELECT source, unnest(string_split_regex(rtrim(text), '\\s+')) AS tok
  FROM documents
), counts AS (
  SELECT source, tok, count(*) AS n FROM toks GROUP BY source, tok
), ranked AS (
  SELECT source, tok, n,
         row_number() OVER (PARTITION BY source ORDER BY n DESC, tok) AS rnk
  FROM counts
)
SELECT source,
       string_agg(tok, ' ' ORDER BY rnk) AS relevant_tokens
FROM ranked WHERE rnk <= 5
GROUP BY source
"""


@register("relevant_tokens_report", _RELEVANT_ORACLE)
def q_relevant_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3+U4 composed: per-source "most relevant tokens" (deterministic
    TF ranking replacing the gpt-3.5 call, embed.js:51-98) assembled into
    the space-joined report string and round-tripped through the CSV sink
    (saveRelevantTokensToCsv, embed.js:106-127) — the oracle checks the
    final report content, so the whole explode -> count -> rank -> join ->
    CSV write/read chain is validated."""
    import os
    import tempfile

    from pyspark.sql import Window as W2, types as T2

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.rtrim("text"), r"\s+")).alias("tok")
    )
    counts = toks.groupBy("source", "tok").agg(F.count("*").alias("n"))
    w = W2.partitionBy("source").orderBy(F.desc("n"), F.asc("tok"))
    ranked = counts.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)
    report = ranked.groupBy("source").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rnk", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("relevant_tokens")
    )
    from vectordbfaiss_spark.queries.sources_io import _sf_digest

    tmp = os.path.join(tempfile.gettempdir(), f"vdbf_rel_{_sf_digest(sf_dir)}")
    report.write.mode("overwrite").option("header", "true").csv(tmp)
    schema = T2.StructType(
        [
            T2.StructField("source", T2.StringType()),
            T2.StructField("relevant_tokens", T2.StringType()),
        ]
    )
    return spark.read.schema(schema).option("header", "true").csv(tmp)


_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(rtrim(text), '\\s+')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
), df AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.tok,
         round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
), ranked AS (
  SELECT doc_id, tok, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rnk
  FROM scored
)
SELECT doc_id, tok, tfidf, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
"""


@register("tfidf_top_terms", _TFIDF_ORACLE)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document: term-frequency x ln(N/df), ranked
    with deterministic tie-break. The document-frequency table is tiny
    (vocab-sized) -> broadcast; the heavy side is one explode + two hash
    aggregates. (ln agrees across engines well under 6dp rounding.)"""
    docs = load_table(spark, sf_dir, "documents")
    from vectordbfaiss_spark.session import fan_out

    toks = fan_out(docs).select(
        "doc_id", F.explode(F.split(F.rtrim("text"), r"\s+")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size as a broadcast 1-row aggregate inside the SAME plan — a
    # driver-side .count() here would be an extra eager job per invocation
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        # df is OPEN-VOCABULARY (one row per distinct token — grows with
        # the corpus): shuffle-hash, never a forced broadcast (the same
        # class as the 100x-audit fixes; bm25's query-term df stays
        # broadcast because it is term-list-bounded, this one is not)
        tf.join(df.hint("SHUFFLE_HASH"), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W2

    w = W2.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tfidf", F.col("rnk").cast("long").alias("rnk"))
    )


_CURATION_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang, source, text,
         string_split_regex(rtrim(text), '\\s+') AS words
  FROM documents
), m AS (
  SELECT doc_id, lang, source, text, words,
         len(words) AS n_tokens,
         len(list_filter(words, t -> list_contains({_STOPLIST_SQL}, t))) AS n_stop,
         len(list_distinct(words)) / len(words) AS ttr
  FROM w
), scored AS (
  SELECT doc_id, lang, source, text, n_tokens,
         round(0.4 * least(n_tokens / 64.0, 1.0)
             + 0.3 * least(n_stop / n_tokens * 3, 1.0)
             + 0.3 * least(ttr * 2, 1.0), 6) AS quality
  FROM m
), kept AS (
  SELECT *, md5(text) AS fp FROM scored
  WHERE quality >= 0.5 AND n_tokens >= 24 AND lang IN ('en', 'de')
), dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
)
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(least(n_tokens, 48)) AS BIGINT) AS token_budget,
       CAST(sum(CAST(round(quality * 1000000) AS BIGINT)) AS BIGINT) AS quality_sum_micro
FROM dedup
GROUP BY lang, source
"""


@register("curation_pipeline", _CURATION_ORACLE)
def q_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation pipeline in ONE declarative plan:
    quality scoring -> threshold + length + language filters -> exact dedup
    on content hash (first-doc-wins) -> per-(lang, source) corpus stats with
    a truncation token budget (K2). Every stage is an operator declared
    individually elsewhere; this query proves they compose, and the oracle
    checks the composition end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.rtrim("text"), r"\s+")
    stop_arr = F.array(*[F.lit(x) for x in TS.EN_STOPWORDS])
    n_tokens = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    ttr = F.size(F.array_distinct(words)) / n_tokens
    quality = F.round(
        F.lit(0.4) * F.least(n_tokens / F.lit(64.0), F.lit(1.0))
        + F.lit(0.3) * F.least(n_stop / n_tokens * 3, F.lit(1.0))
        + F.lit(0.3) * F.least(ttr * 2, F.lit(1.0)),
        6,
    )
    scored = docs.select(
        "doc_id", "lang", "source", "text",
        n_tokens.alias("n_tokens"), quality.alias("quality"),
    )
    kept = scored.filter(
        (F.col("quality") >= 0.5)
        & (F.col("n_tokens") >= 24)
        & F.col("lang").isin("en", "de")
    ).withColumn("fp", F.md5("text"))
    from pyspark.sql import Window as W3

    dedup = (
        kept.withColumn(
            "rn", F.row_number().over(W3.partitionBy("fp").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
    )
    # integer-exact quality aggregation: an avg of rounded floats can land
    # on a 6dp rounding boundary and flip by summation order across engines;
    # micro-unit integer sums cannot.
    return dedup.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.least(F.col("n_tokens"), F.lit(48))).cast("long").alias("token_budget"),
        F.sum(F.round(F.col("quality") * 1_000_000).cast("long")).alias(
            "quality_sum_micro"
        ),
    )


# ---------------------------------------------------------------------------
# BPE-style pretokenizer counting (the "token budget" estimator)
# ---------------------------------------------------------------------------

# GPT-2-style pretokenizer, simplified to the dialect-portable core:
# a token is an optionally-space-prefixed run of letters, digits, or
# punctuation. Identical semantics in Java regex (Spark) and RE2 (DuckDB).
_BPE_PATTERN = r"(?: ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+)"

_BPE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS n_bpe,
         len(string_split_regex(rtrim(text), '\\s+')) AS n_ws,
         length(text) AS n_chars
  FROM documents
)
SELECT doc_id, lang,
       CAST(n_bpe AS BIGINT) AS n_bpe,
       CAST(n_ws AS BIGINT) AS n_ws,
       round(CAST(n_chars AS DOUBLE) / n_bpe, 6) AS chars_per_token
FROM t
"""


@register("text_bpe_token_count", _BPE_ORACLE)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pretokenizer regex alongside the plain
    whitespace count — the per-document token-budget estimate every mixing/
    packing stage needs (reference analog: the 3000-token cap, embed.js:33).
    Pure regexp_extract_all expression — no Python in the hot path."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.rtrim(F.col("text")), r"\s+")
    bpe = F.regexp_extract_all("text", F.lit(f"({_BPE_PATTERN})"))
    return d.select(
        "doc_id",
        "lang",
        F.size(bpe).cast("long").alias("n_bpe"),
        F.size(words).cast("long").alias("n_ws"),
        F.round(F.length("text").cast("double") / F.size(bpe), 6).alias(
            "chars_per_token"
        ),
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filtering (Rae et al. 2021 §A1.1 repetition rules)
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split_regex(rtrim(text), '\\s+') AS words FROM documents
  WHERE text IS NOT NULL
), g AS (
  SELECT doc_id, words,
         list_transform(generate_series(0, greatest(1, len(words) - 2) - 1),
                        i -> array_to_string(list_slice(words, i + 1, i + 3), ' ')) AS grams
  FROM w
), tw AS (
  SELECT doc_id, unnest(words) AS word FROM w
), pw AS (
  SELECT doc_id, word, count(*) AS cnt FROM tw GROUP BY doc_id, word
), agg AS (
  SELECT doc_id, sum(cnt) AS n_words, count(*) AS n_distinct, max(cnt) AS top_cnt
  FROM pw GROUP BY doc_id
), gm AS (
  SELECT doc_id,
         greatest(len(grams), 1) AS n_grams,
         len(list_distinct(grams)) AS n_distinct_grams
  FROM g
)
SELECT a.doc_id,
       CAST(a.n_words AS BIGINT) AS n_words,
       round(1.0 - a.n_distinct / a.n_words, 6) AS dup_word_frac,
       round(a.top_cnt / a.n_words, 6) AS top_word_frac,
       round(1.0 - gm.n_distinct_grams / gm.n_grams, 6) AS dup_3gram_frac,
       (1.0 - gm.n_distinct_grams / gm.n_grams) <= 0.6
         AND a.top_cnt / a.n_words <= 0.2 AS keep
FROM agg a JOIN gm ON a.doc_id = gm.doc_id
"""


@register("text_repetition_filter", _REPETITION_ORACLE)
def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filtering (the Gopher rules, Rae et al.
    2021: duplicate word fraction, most-frequent-word fraction, duplicate
    n-gram fraction -> keep/drop flag) — the standard pre-training pass
    that catches boilerplate and degenerate repetition that perplexity
    and stopword heuristics miss.

    Plan shape: ONE explode feeds a per-(doc, word) count and its rollup
    (two narrow shuffles on doc_id — no Expand, no countDistinct mix);
    the 3-gram uniqueness ratio is computed entirely expression-side
    (array arithmetic, no second explode). Thresholds are Gopher's,
    loosened to the synthetic corpus' natural repetition."""
    from vectordbfaiss_spark.operators.dedup import gram_array
    from vectordbfaiss_spark.session import fan_out

    # single-file fixture parquet is unsplittable — spread rows before the
    # explode and the per-row n-gram array work (no-op on real tables).
    # NULL texts are excluded up front (both engines) — see the oracle.
    docs = fan_out(
        load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    words = F.split(F.rtrim("text"), r"\s+")
    grams = gram_array(F.col("text"), 3)
    gm = docs.select(
        "doc_id",
        F.greatest(F.size(grams), F.lit(1)).alias("n_grams"),
        F.size(F.array_distinct(grams)).alias("n_distinct_grams"),
    )
    tw = docs.select("doc_id", F.explode(words).alias("word"))
    pw = tw.groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    agg = pw.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
    )
    # both sides are DOC-grain (corpus-proportional): shuffle-hash on
    # doc_id, never a static broadcast off a post-aggregate estimate
    # (the 100x-step OOM class, SCALE.md round 4)
    j = agg.join(gm.hint("SHUFFLE_HASH"), "doc_id")
    dup3 = 1.0 - F.col("n_distinct_grams") / F.col("n_grams")
    topf = F.col("top_cnt") / F.col("n_words")
    return j.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 6).alias(
            "dup_word_frac"
        ),
        F.round(topf, 6).alias("top_word_frac"),
        F.round(dup3, 6).alias("dup_3gram_frac"),
        ((dup3 <= 0.6) & (topf <= 0.2)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# C4-style cross-document span dedup (Raffel et al. 2020 §2.2: drop any
# span that occurs verbatim in more than one document)
# ---------------------------------------------------------------------------

_XDOC_SPAN = 8  # span length in words (C4 used 3 sentences; fixture has no
# sentence punctuation, so fixed-width word windows carry the semantics)

_XDOC_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split_regex(rtrim(text), '\\s+') AS words FROM documents
  WHERE text IS NOT NULL
), s AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(0, greatest(len(words) - {_XDOC_SPAN}, 0)),
             i -> array_to_string(list_slice(words, i + 1, i + {_XDOC_SPAN}), ' ')))) AS span
  FROM w
), df AS (
  SELECT span, count(*) AS n_docs FROM s GROUP BY span
)
SELECT span, CAST(n_docs AS BIGINT) AS n_docs
FROM df WHERE n_docs >= 2
"""


@register("crossdoc_span_dedup", _XDOC_ORACLE)
def q_crossdoc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document verbatim span detection — the C4 dedup rule (any
    8-word span occurring in 2+ documents is boilerplate/duplication to
    scrub). Output: the offending spans with their document frequency;
    the scrub step is a semi-join of exploded spans against this set.

    Plan shape: per-doc DISTINCT spans come from array_distinct inside the
    explode expression (no per-doc shuffle), then ONE hash-agg on the span
    — at corpus scale this is the same single-shuffle profile as exact
    dedup, and the span strings can be md5'd down to 16 bytes if the raw
    text is wide."""
    from vectordbfaiss_spark.operators.dedup import word_shingles
    from vectordbfaiss_spark.session import fan_out

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    spans = fan_out(docs).select(
        "doc_id",
        F.explode(word_shingles("text", _XDOC_SPAN)).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("span", F.col("n_docs").cast("long").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken '03 — the rolling-hash
# document fingerprinting used by MOSS-style near-dup/plagiarism detection)
# ---------------------------------------------------------------------------

_WIN_K = 8   # k-gram length in characters
_WIN_W = 16  # winnowing window (positions per selection window)

_WINNOW_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lower(text) AS t FROM documents WHERE text IS NOT NULL
), h AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(1, length(t) - {_WIN_K} + 1)),
                        i -> md5(substr(t, i, {_WIN_K}))) AS hashes
  FROM d
), sel AS (
  SELECT doc_id, hashes,
         list_distinct(list_transform(
             generate_series(1, greatest(1, len(hashes) - {_WIN_W} + 1)),
             j -> list_min(list_slice(hashes, j, j + {_WIN_W} - 1)))) AS fps
  FROM h
)
SELECT doc_id,
       CAST(len(fps) AS BIGINT) AS n_fingerprints,
       list_min(fps) AS fp_min,
       md5(array_to_string(list_sort(fps), '')) AS fp_set_digest
FROM sel
"""


@register("winnowing_fingerprints", _WINNOW_ORACLE)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints: hash every k-char gram, keep the
    minimum hash of each w-position window, dedup — the rolling-hash
    fingerprint family (guaranteed to share fingerprints with any document
    overlapping by >= w+k-1 chars, the winnowing theorem). Output is the
    fingerprint-set size, its minimum, and an order-insensitive digest so
    the whole selected set is hash-verified. Expression-side per row (the
    O(len * w) window-min is fine at document granularity; a mapInPandas
    kernel with a true rolling deque is the drop-in at book-length docs).
    """
    from vectordbfaiss_spark.session import fan_out

    docs = fan_out(
        load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    # lower(text) is projected ONCE per row first: referencing it inside
    # the transform lambda would re-lower the whole string per gram
    # position (Catalyst does not CSE across lambda invocations — O(len^2)
    # character work). Built via F.expr: substr with a COLUMN start (the
    # window index) — the F.substring API only takes literal starts.
    lowered = docs.select("doc_id", F.lower("text").alias("t"))
    hashes = F.expr(
        f"transform(sequence(1, greatest(1, length(t) - {_WIN_K - 1})),"
        f" i -> md5(substr(t, i, {_WIN_K})))"
    )
    sel = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(1, size(h) - {_WIN_W - 1})),"
            f" j -> array_min(slice(h, j, {_WIN_W})))"
        )
    )
    out = lowered.select("doc_id", hashes.alias("h")).select(
        "doc_id", sel.alias("fps")
    )
    return out.select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.array_min("fps").alias("fp_min"),
        F.md5(F.array_join(F.array_sort("fps"), "")).alias("fp_set_digest"),
    )


# ---------------------------------------------------------------------------
# Fingerprint reverse-lookup (attribution)
# ---------------------------------------------------------------------------

_ATTR_NPROBES = 3  # snippets cut from the first docs (in-query, so the
_ATTR_OFF = 100  # probe text tracks whatever fixture the driver generates)
_ATTR_LEN = 200
_ATTR_TOPN = 3


def _winnow_fps_sql(src: str, id_col: str, text_expr: str) -> str:
    """Winnowing fingerprint set (same k/w as winnowing_fingerprints)."""
    return f"""(
  SELECT {id_col},
         list_distinct(list_transform(
             generate_series(1, greatest(1, len(hashes) - {_WIN_W} + 1)),
             j -> list_min(list_slice(hashes, j, j + {_WIN_W} - 1)))) AS fps
  FROM (
    SELECT {id_col},
           list_transform(generate_series(1, greatest(1, length(t) - {_WIN_K} + 1)),
                          i -> md5(substr(t, i, {_WIN_K}))) AS hashes
    FROM (SELECT {id_col}, {text_expr} AS t FROM {src}) x
  ) h)"""


_ATTR_ORACLE = f"""
WITH doc_fp AS (
  SELECT doc_id, unnest(fps) AS fp
  FROM {_winnow_fps_sql('(SELECT doc_id, text FROM documents WHERE text IS NOT NULL)',
                        'doc_id', 'lower(text)')} t
), probe_fp AS (
  SELECT probe_id, unnest(fps) AS fp
  FROM {_winnow_fps_sql(
      f'(SELECT doc_id AS probe_id, substr(text, {_ATTR_OFF}, {_ATTR_LEN}) AS text '
      f'FROM documents WHERE doc_id < {_ATTR_NPROBES})',
      'probe_id', 'lower(text)')} t
), shared AS (
  SELECT p.probe_id, d.doc_id, count(*) AS n_shared
  FROM probe_fp p JOIN doc_fp d ON p.fp = d.fp
  GROUP BY 1, 2
), ranked AS (
  SELECT probe_id, doc_id, n_shared,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY n_shared DESC, doc_id) AS rnk
  FROM shared)
SELECT probe_id, doc_id, n_shared, rnk AS rank,
       probe_id = doc_id AS self_match
FROM ranked WHERE rnk <= {_ATTR_TOPN}
ORDER BY probe_id, rank
"""


@register("fingerprint_attribution", _ATTR_ORACLE)
def q_fingerprint_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse fingerprint lookup: which corpus documents does a quoted
    snippet come from? Probe snippets (cut in-query from the first docs,
    so the query tracks any regenerated fixture) are winnowed with the
    SAME k/w as the corpus index; attribution = fingerprint-equality join
    + count, top-N sources per probe. The winnowing theorem guarantees a
    snippet overlapping a doc by >= w+k-1 chars shares a fingerprint, so
    the true source surfaces with the maximum count (self_match marks
    it — rank 1 expected).

    Scale shape: the corpus fingerprint explode is the INDEX (built once,
    ~len/w entries per doc); probes are tiny; the join is equi on the
    fingerprint hash and the per-probe ranking is a WindowGroupLimit.
    This is memorization/contamination attribution at corpus scale — the
    reverse direction of crossdoc_span_dedup.
    """
    from vectordbfaiss_spark.session import fan_out

    def winnow_fps(df, id_col):
        hashes = F.expr(
            f"transform(sequence(1, greatest(1, length(t) - {_WIN_K - 1})),"
            f" i -> md5(substr(t, i, {_WIN_K})))"
        )
        sel = F.array_distinct(
            F.expr(
                f"transform(sequence(1, greatest(1, size(h) - {_WIN_W - 1})),"
                f" j -> array_min(slice(h, j, {_WIN_W})))"
            )
        )
        return (
            df.select(id_col, F.lower("text").alias("t"))
            .select(id_col, hashes.alias("h"))
            .select(id_col, F.explode(sel).alias("fp"))
        )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    doc_fp = winnow_fps(fan_out(docs), "doc_id")
    probes = docs.filter(F.col("doc_id") < _ATTR_NPROBES).select(
        F.col("doc_id").alias("probe_id"),
        F.substring("text", _ATTR_OFF, _ATTR_LEN).alias("text"),
    )
    probe_fp = winnow_fps(probes, "probe_id")
    shared = (
        doc_fp.join(F.broadcast(probe_fp), "fp")
        .groupBy("probe_id", "doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    from pyspark.sql import Window as W2

    rnk = F.row_number().over(
        W2.partitionBy("probe_id").orderBy(F.desc("n_shared"), "doc_id")
    )
    return (
        shared.withColumn("rank", rnk)
        .filter(F.col("rank") <= _ATTR_TOPN)
        .select(
            "probe_id",
            "doc_id",
            "n_shared",
            "rank",
            (F.col("probe_id") == F.col("doc_id")).alias("self_match"),
        )
        .orderBy("probe_id", "rank")
    )


_PMI_MIN_COUNT = 5
_PMI_TOPK = 50

_PMI_ORACLE = f"""
WITH w AS (
  SELECT string_split_regex(rtrim(text), '\\s+') AS words
  FROM documents WHERE text IS NOT NULL
), bi AS (
  SELECT words[i] AS w1, words[i+1] AS w2
  FROM w, UNNEST(range(1, len(words))) AS t(i)
), uni AS (
  SELECT unnest(words) AS w FROM w
), uc AS (
  SELECT w, count(*) AS c FROM uni GROUP BY w
), bc AS (
  SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2
  HAVING count(*) >= {_PMI_MIN_COUNT}
), tot AS (
  SELECT (SELECT count(*) FROM uni) AS t_uni,
         (SELECT count(*) FROM bi) AS t_bi
), scored AS (
  SELECT bc.w1, bc.w2, bc.c12,
         round(ln((bc.c12 / tot.t_bi)
                  / ((u1.c / tot.t_uni) * (u2.c / tot.t_uni))), 6) AS pmi
  FROM bc
  JOIN uc u1 ON bc.w1 = u1.w
  JOIN uc u2 ON bc.w2 = u2.w
  CROSS JOIN tot
), ranked AS (
  SELECT w1, w2, CAST(c12 AS BIGINT) AS n_pair, pmi,
         row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rnk
  FROM scored
)
SELECT w1, w2, n_pair, pmi, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_PMI_TOPK}
"""


@register("pmi_collocations", _PMI_ORACLE)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information —
    PMI = ln(p(w1,w2) / (p(w1)p(w2))) with a min-count floor, the
    classic collocation/phrase-mining signal (and the building block of
    word-association features and phrase vocabularies for tokenizers).

    Scale shape: one explode for unigrams, one slice+zip explode for
    bigrams (both ride the scan), two |vocab|-grain hash aggregates with
    map-side combine, and the bigram->unigram count joins are
    SHUFFLE_HASH (OPEN-VOCABULARY frames — one row per distinct token /
    token pair, growing with the corpus, so never a forced broadcast);
    corpus totals are two 1-row broadcast aggregates in the same plan.
    The min-count floor prunes the bigram table BEFORE the joins, and the
    final top-k is a TakeOrderedAndProject, never a global sort. PMI is
    rounded to 6dp before ranking with a (w1, w2) tie-break so both
    engines pick identical winners.
    """
    from vectordbfaiss_spark.session import fan_out

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = fan_out(docs).select(
        F.split(F.rtrim("text"), r"\s+").alias("words")
    )
    n = F.size("words")
    bi = words.select(
        F.explode(
            F.arrays_zip(
                F.slice("words", 1, n - 1).alias("w1"),
                F.slice("words", 2, n - 1).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    uni = words.select(F.explode("words").alias("w"))
    uc = uni.groupBy("w").agg(F.count("*").alias("c"))
    bc = (
        bi.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .filter(F.col("c12") >= _PMI_MIN_COUNT)
    )
    tot = uni.agg(F.count("*").alias("t_uni")).crossJoin(
        bi.agg(F.count("*").alias("t_bi"))
    )
    u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bc.join(u1.hint("SHUFFLE_HASH"), "w1")
        .join(u2.hint("SHUFFLE_HASH"), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("n_pair"),
            F.round(
                F.log(
                    (F.col("c12") / F.col("t_bi"))
                    / ((F.col("c1") / F.col("t_uni")) * (F.col("c2") / F.col("t_uni")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    from pyspark.sql import Window as W2

    w = W2.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _PMI_TOPK)
        .select("w1", "w2", "n_pair", "pmi", F.col("rnk").cast("long").alias("rnk"))
    )
