"""Text-analysis operators for training-data curation: token statistics,
quality scoring, language identification, document fingerprinting.

The reference's text analysis is tokenize + truncate + an LLM call asked to
pick "relevant tokens" (/root/reference/embed.js:29-34,51-98). Our engine
replaces the LLM stages with deterministic, oracle-checkable built-ins
(SURVEY §2.9 U3 local default) and adds the standard curation metrics.

All pure column expressions — no UDFs, fully codegen'd, and portable to the
DuckDB oracle. Transcendental functions are deliberately avoided in scores
(exp/log bit-patterns can differ across engines); scores are rational
arithmetic + least/greatest only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language-ID (a deterministic mini-fastText stand-in).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "a", "of", "to", "and", "is", "in"),
    "es": ("el", "la", "los", "que", "y", "es", "en"),
    "fr": ("le", "la", "les", "et", "un", "est", "dans"),
    "zh": ("de5", "shi4", "zai4", "le5", "wo3", "you3", "he2"),
}

EN_STOPWORDS = LANG_PROFILES["en"] + ("that", "it", "for", "on", "with", "as")


def _words(text_col) -> Column:
    text_col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.rtrim(text_col), r"\s+")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token counting + lexical-diversity stats per document.

    n_tokens / n_distinct / type-token-ratio / avg token length — the
    counting layer of every quality filter (cf. reference token cap K2,
    embed.js:33).
    """
    words = _words(text_col)
    return df.select(
        F.col(id_col),
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.round(F.size(F.array_distinct(words)) / F.size(words), 6).alias("ttr"),
        F.round(
            F.aggregate(
                words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
            )
            / F.size(words),
            6,
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic document quality score in [0,1]:

      0.4 * min(n_tokens/64, 1)          (length credit)
    + 0.3 * stopword_ratio * 3 capped 1  (natural-language-ness)
    + 0.3 * min(ttr * 2, 1)              (lexical diversity)

    Rational arithmetic only — bit-identical across engines. The weights are
    this engine's own convention (the reference has no quality scoring).
    """
    words = _words(text_col)
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_tokens = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    ttr = F.size(F.array_distinct(words)) / n_tokens
    score = (
        F.lit(0.4) * F.least(n_tokens / F.lit(64.0), F.lit(1.0))
        + F.lit(0.3) * F.least(n_stop / n_tokens * 3, F.lit(1.0))
        + F.lit(0.3) * F.least(ttr * 2, F.lit(1.0))
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(n_stop / n_tokens, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-profile language ID: per language, the fraction of tokens in
    that language's profile; winner = highest ratio, ties broken by language
    code ascending. Deterministic and SQL-portable (no model).
    """
    words = _words(text_col)
    n_tokens = F.size(words)

    def _in_profile(prof):
        # N.B. the lambda must take exactly ONE arg — pyspark passes a
        # Column per declared parameter (default args included).
        arr = F.array(*[F.lit(x) for x in prof])
        return lambda w: F.array_contains(arr, w)

    # argmax via struct sort: (-ratio, lang) ascending puts the highest
    # ratio first with ties broken by language code ascending — identical
    # to a strict-greater CASE chain, but each ratio subtree appears ONCE
    # (the chain form duplicates subtrees quadratically and costs seconds
    # of codegen compilation).
    entries = F.array(
        *[
            F.struct(
                (-(F.size(F.filter(words, _in_profile(prof))) / n_tokens)).alias(
                    "neg"
                ),
                F.lit(lang).alias("lang"),
            )
            for lang, prof in sorted(LANG_PROFILES.items())
        ]
    )
    best = F.element_at(F.array_sort(entries), 1)
    return df.select(
        F.col(id_col),
        best["lang"].alias("lang_guess"),
        F.round(-best["neg"], 6).alias("lang_score"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprints for exact/near dedup keys:

    - ``fp_exact``   : md5 of the canonicalized text (lowercase, whitespace
      collapsed to single spaces) — the content-hash id the engine uses in
      place of AUTOINCREMENT (SURVEY §4.3, server.js:28);
    - ``fp_minhash`` : min over md5(token) — a 1-hash MinHash sketch, the
      cheap rolling-hash-style near-dup key.
    """
    text_col_c = F.col(text_col) if isinstance(text_col, str) else text_col
    canon = F.array_join(F.split(F.rtrim(F.lower(text_col_c)), r"\s+"), " ")
    words = F.split(F.rtrim(F.lower(text_col_c)), r"\s+")
    return df.select(
        F.col(id_col),
        F.md5(canon).alias("fp_exact"),
        F.array_min(F.transform(words, lambda w: F.md5(w))).alias("fp_minhash"),
    )


def term_frequencies(
    df: DataFrame, text_col: str, top_n: int = 20
) -> DataFrame:
    """Corpus-level term frequency top-N (deterministic U3 replacement:
    explode -> count -> rank, embed.js:51-98's LLM call made exact).
    Tie-break: count DESC then token ASC.
    """
    from vectordbfaiss_spark.session import fan_out

    toks = fan_out(df).select(F.explode(_words(text_col)).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    return (
        counts.orderBy(F.desc("n"), F.asc("tok"))
        .limit(top_n)
    )
