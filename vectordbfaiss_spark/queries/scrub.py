"""PII-redaction and URL-hygiene queries over ``documents``.

The fixture corpus is clean word-salad, so each query first DERIVES a
deterministic "dirty" text/URL from fixture columns with the identical
string expression on both engines (Spark and the DuckDB oracle) — the
operator under test is the scrub, and it sees realistic shapes (emails,
SSNs, IPv4s, phone numbers, tracking URLs, blocked domains) without
synthesizing any out-of-band input data.

Impl: operators/scrub.py (pure column expressions — map-only, zero
shuffle, survives any scale; see that module's docstring).
"""

from __future__ import annotations

from vectordbfaiss_spark.operators import scrub as S
from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import load_table

from pyspark.sql import DataFrame, SparkSession, functions as F

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

_DIRTY_SQL = """substr(text, 1, 80)
      || ' contact user' || CAST(doc_id AS VARCHAR) || '@' || source || '.Example.COM'
      || ' ssn 987-65-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.42.' || CAST(doc_id % 100 AS VARCHAR)
      || ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"""

_PII_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_DIRTY_SQL} AS dirty FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(dirty, '{S.EMAIL_RE}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(dirty, '{S.SSN_RE}')) AS BIGINT) AS n_ssn,
       CAST(len(regexp_extract_all(dirty, '{S.IPV4_RE}')) AS BIGINT) AS n_ip,
       CAST(len(regexp_extract_all(dirty, '{S.PHONE_RE}')) AS BIGINT) AS n_phone,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(dirty, '{S.EMAIL_RE}', '<EMAIL>', 'g'),
             '{S.SSN_RE}', '<SSN>', 'g'),
           '{S.IPV4_RE}', '<IP>', 'g'),
         '{S.PHONE_RE}', '<PHONE>', 'g') AS clean_text
FROM d
"""


def _dirty_col() -> F.Column:
    did = F.col("doc_id")
    pad4 = F.lpad((did % 10000).cast("string"), 4, "0")
    return F.concat(
        F.substring("text", 1, 80),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".Example.COM"),
        F.lit(" ssn 987-65-"),
        pad4,
        F.lit(" ip 10."),
        (did % 256).cast("string"),
        F.lit(".42."),
        (did % 100).cast("string"),
        F.lit(" tel 555-"),
        pad4,
    )


@register("pii_redact_docs", _PII_ORACLE)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count and redact emails / SSNs / IPv4s / phone numbers
    in one pass. Pure regexp expressions (operators/scrub.py) — the whole
    query is a single codegen'd map over the scan; per-pattern counts are
    taken on the pre-redaction text (patterns are mutually non-overlapping
    by construction)."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = docs.select("doc_id", _dirty_col().alias("dirty"))
    return dirty.select(
        "doc_id",
        *S.pii_counts(F.col("dirty")),
        S.redact(F.col("dirty")).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# URL normalization + blocklist filter
# ---------------------------------------------------------------------------

_URL_SQL = """CASE WHEN doc_id % 3 = 0
      THEN 'https://Ads.' || source || '.Tracker.NET:443/click/'
           || CAST(doc_id AS VARCHAR) || '/?utm_campaign=x&cid=' || CAST(doc_id % 7 AS VARCHAR)
      ELSE 'HTTP://WWW.' || source || '.Example.COM/page/'
           || CAST(doc_id AS VARCHAR) || '?utm_source=rss&q=ok'
      END"""

_BLOCK_SQL = "['" + "','".join(S.URL_BLOCKLIST) + "']"

_URL_ORACLE = f"""
WITH u AS (
  SELECT doc_id, {_URL_SQL} AS url FROM documents
), p AS (
  SELECT doc_id,
         lower(regexp_extract(url, '{S._HOST_RE}', 1)) AS host,
         regexp_replace(regexp_extract(url, '{S._PATH_RE}', 1), '/$', '') AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM u
), n AS (
  SELECT doc_id, host,
         regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
         path,
         array_to_string(
           list_filter(string_split(query, '&'),
                       x -> NOT starts_with(x, 'utm_') AND x <> ''), '&') AS kept
  FROM p
)
SELECT doc_id, host, domain,
       'https://' || host || path
         || CASE WHEN kept <> '' THEN '?' || kept ELSE '' END AS norm_url,
       NOT list_contains({_BLOCK_SQL}, domain) AS keep
FROM n
"""


def _url_col() -> F.Column:
    did = F.col("doc_id")
    return F.when(
        did % 3 == 0,
        F.concat(
            F.lit("https://Ads."),
            F.col("source"),
            F.lit(".Tracker.NET:443/click/"),
            did.cast("string"),
            F.lit("/?utm_campaign=x&cid="),
            (did % 7).cast("string"),
        ),
    ).otherwise(
        F.concat(
            F.lit("HTTP://WWW."),
            F.col("source"),
            F.lit(".Example.COM/page/"),
            did.cast("string"),
            F.lit("?utm_source=rss&q=ok"),
        )
    )


@register("url_normalize_filter", _URL_ORACLE)
def q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL hygiene: parse host/registrable-domain/path/query, canonicalize
    (lowercase host, drop port + trailing slash + utm_* tracking params,
    force https), and flag blocklisted ad/tracker domains. Expression-only
    map; the blocklist is a literal IN-list (at scale: broadcast anti-join
    against a blocklist table — same plan shape as
    ``benchmark_decontamination``)."""
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", _url_col().alias("url"))
    parts = S.url_parts(F.col("url"))
    return u.select(
        "doc_id",
        parts["host"].alias("host"),
        parts["domain"].alias("domain"),
        S.normalize_url(F.col("url")).alias("norm_url"),
        (~parts["domain"].isin(*S.URL_BLOCKLIST)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# C4 cross-document span SCRUB — the rewrite step that completes
# crossdoc_span_dedup (queries/text_analysis.py detects the offending
# spans; this removes them, keeping the first occurrence)
# ---------------------------------------------------------------------------

_SCRUB_SPAN = 8  # words per span — same width as crossdoc_span_dedup

_SPAN_SCRUB_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split_regex(rtrim(text), '\\s+') AS words
  FROM documents WHERE text IS NOT NULL
), s AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(0, greatest(len(words) - {_SCRUB_SPAN}, 0)),
           i -> {{'start': i,
                 'span': array_to_string(list_slice(words, i + 1, i + {_SCRUB_SPAN}), ' ')}})) AS u
  FROM w
), s2 AS (
  SELECT doc_id, u.start AS start, u.span AS span FROM s
), dup AS (
  SELECT span, min(doc_id) AS keeper
  FROM (SELECT DISTINCT doc_id, span FROM s2)
  GROUP BY span HAVING count(*) >= 2
), fl AS (
  SELECT s2.doc_id, s2.start FROM s2 JOIN dup USING (span)
  WHERE s2.doc_id <> dup.keeper
), cov AS (
  SELECT doc_id, list(DISTINCT start) AS starts FROM fl GROUP BY doc_id
), kept AS (
  SELECT w.doc_id, words,
         list_filter(words, (x, i) ->
           len(list_filter(coalesce(cov.starts, CAST([] AS BIGINT[])),
                           s -> s <= i - 1 AND i - 1 <= s + {_SCRUB_SPAN - 1})) = 0
         ) AS clean_words
  FROM w LEFT JOIN cov USING (doc_id)
)
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(len(words) - len(clean_words) AS BIGINT) AS n_removed,
       coalesce(array_to_string(clean_words, ' '), '') AS clean_text
FROM kept
"""


@register("crossdoc_span_scrub", _SPAN_SCRUB_ORACLE)
def q_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document span REMOVAL (Raffel et al. 2020 §2.2),
    keep-first semantics: any 8-word span occurring in 2+ documents
    survives only in the lowest-doc_id document; every word covered by a
    flagged span occurrence is dropped from the other documents.

    Plan shape (scale path): posexplode of the per-start gram array →
    one hash-agg for the global (span → keeper) table → shuffle join back
    on span → per-doc collect_set of flagged starts → ONE left join onto
    the corpus and a codegen'd higher-order filter rebuilds the text. No
    all-pairs stage anywhere; span keys are xxhash64-compressed to longs
    before the first shuffle (8 bytes instead of ~50-byte strings).

    Both joins carry explicit SHUFFLE_HASH hints: the build sides (the
    span→keeper table, the per-doc flagged-starts table) are
    CORPUS-PROPORTIONAL, but Catalyst's post-aggregate selectivity
    estimate shrinks them under the broadcast threshold — at a 100x
    local scale step the unhinted plan materialized a 4.5 GiB span-table
    broadcast and OOM'd the session. Measured, not hypothetical
    (SCALE.md round-4 section); plan-pinned no-broadcast in
    tests/test_plans.py."""
    from vectordbfaiss_spark.operators.dedup import gram_array
    from vectordbfaiss_spark.session import fan_out

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    spans = fan_out(docs).select(
        "doc_id",
        F.posexplode(gram_array("text", _SCRUB_SPAN)).alias("start", "span"),
    )
    # compress the join key BEFORE the shuffle: an 8-word span string is
    # ~50 bytes; xxhash64 makes it an 8-byte long, cutting both shuffle
    # legs' volume. The hash is Spark-internal (never output), so the
    # oracle still replays exact strings; a 64-bit collision wrongly
    # merges two spans with p ~ n^2/2^65 — immaterial for a scrub stage
    # (C4's own implementation hashes spans the same way).
    spans = spans.select("doc_id", "start", F.xxhash64("span").alias("span"))
    dup = (
        spans.dropDuplicates(["doc_id", "span"])
        .groupBy("span")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") >= 2)
    )
    flagged = (
        spans.join(dup.hint("SHUFFLE_HASH"), "span")
        .filter(F.col("doc_id") != F.col("keeper"))
        .groupBy("doc_id")
        .agg(F.collect_set("start").alias("starts"))
    )
    base = docs.select(
        "doc_id", F.split(F.rtrim("text"), r"\s+").alias("words")
    )
    j = base.join(flagged.hint("SHUFFLE_HASH"), "doc_id", "left").withColumn(
        "starts_c",
        F.coalesce(F.col("starts"), F.array().cast("array<int>")),
    )
    kept = F.filter(
        F.col("words"),
        lambda x, i: ~F.exists(
            F.col("starts_c"),
            lambda s: (i >= s) & (i <= s + F.lit(_SCRUB_SPAN - 1)),
        ),
    )
    return j.select(
        "doc_id",
        F.size("words").cast("long").alias("n_words"),
        (F.size("words") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# Intra-document repetition SCRUB — the rewrite companion to the Gopher
# repetition FILTER (text_repetition_filter flags degenerate docs; this
# removes repeated spans inside a doc, keeping the first occurrence)
# ---------------------------------------------------------------------------

_SELFREP_SPAN = 4  # words per span

_SELFREP_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split_regex(rtrim(text), '\\s+') AS words
  FROM documents WHERE text IS NOT NULL
), s AS (
  SELECT doc_id, words,
         list_transform(generate_series(0, greatest(len(words) - {_SELFREP_SPAN}, 0)),
                        i -> array_to_string(list_slice(words, i + 1, i + {_SELFREP_SPAN}), ' ')) AS spans
  FROM w
), r AS (
  SELECT doc_id, words,
         list_filter(generate_series(0, len(spans) - 1),
                     i -> coalesce(list_position(list_slice(spans, 1, i), spans[i + 1]), 0) > 0) AS rep_starts
  FROM s
), k AS (
  SELECT doc_id, words,
         list_filter(words, (x, p) ->
           len(list_filter(rep_starts,
                           s -> s <= p - 1 AND p - 1 <= s + {_SELFREP_SPAN - 1})) = 0) AS clean_words
  FROM r
)
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(len(words) - len(clean_words) AS BIGINT) AS n_removed,
       coalesce(array_to_string(clean_words, ' '), '') AS clean_text
FROM k
"""


@register("selfrep_span_scrub", _SELFREP_ORACLE)
def q_selfrep_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition removal, keep-first: any 4-word span that
    already occurred EARLIER in the same document marks its covered words
    for removal — degenerate loops ("buy now buy now buy now ...")
    collapse to one occurrence while legitimate single repetitions of
    words survive (the span, not the word, must repeat).

    Entirely expression-level: span array, repeat-start detection and the
    position mask are nested higher-order array functions evaluated
    per-row — ZERO shuffle at scale (fan_out only fires on the
    unsplittable single-row-group fixture), the scrub rides the scan like
    the PII pass. Per-row cost is O(words^2 / span) worst-case, bounded
    by document length, not corpus size — the right trade at 100 TB where
    shuffles, not per-row arithmetic, are the scarce resource. Repeat
    detection is `array_position(spans, spans[i]) < i+1` ("this span's
    FIRST occurrence is earlier") — same O(i) scan as an exists-over-
    prefix but with early exit and no per-index prefix-array copy
    (A/B at sf0.1: 4.2 s -> 4.0 s single-task before fan_out)."""
    from vectordbfaiss_spark.session import fan_out

    docs = fan_out(
        load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    from vectordbfaiss_spark.operators.dedup import gram_array

    words = F.split(F.rtrim("text"), r"\s+")
    spans = gram_array("text", _SELFREP_SPAN)
    base = docs.select(
        "doc_id", words.alias("words"), spans.alias("spans")
    )
    rep_starts = F.filter(
        F.sequence(F.lit(0), F.size("spans") - 1),
        lambda i: F.array_position(
            F.col("spans"), F.element_at(F.col("spans"), i + 1)
        )
        < (i + 1).cast("long"),
    )
    withrep = base.withColumn("rep_starts", rep_starts)
    kept = F.filter(
        F.col("words"),
        lambda x, p: ~F.exists(
            F.col("rep_starts"),
            lambda s: (p >= s) & (p <= s + F.lit(_SELFREP_SPAN - 1)),
        ),
    )
    return withrep.select(
        "doc_id",
        F.size("words").cast("long").alias("n_words"),
        (F.size("words") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )
