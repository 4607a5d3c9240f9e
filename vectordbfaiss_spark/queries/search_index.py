"""Text-search index family: inverted-index build, positional phrase
search, and token-budget context packing for RAG.

The reference is a retrieval engine (vector search over chunked text,
server.js:53-60); a production corpus also serves LEXICAL retrieval from
the same chunks. This module builds the classic search-index artifacts as
declarative Spark plans:

- ``inverted_index_build``: token -> (df, tf_total, capped postings list)
  — the dictionary + postings shape every lexical index (Lucene-style)
  materializes, here as two token-partitioned aggregations.
- ``phrase_search_postings``: two-term phrase matching via positional
  postings intersection — the adjacency self-join that a positional index
  answers without touching raw text.
- ``rag_context_budget_pack``: per-query greedy packing of top-ranked
  docs under a prompt token budget — the reference's topK+prompt-budget
  loop (server.js:62-78, K chunks then truncate-to-budget) re-expressed
  as rank + running-sum windows.

Tokenization convention (shared by all three, mirrored digit-for-digit in
the DuckDB oracles): lowercase, whitespace-split, strip non-[a-z0-9],
drop tokens shorter than 2 chars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import fan_out, load_table

_POSTINGS_CAP = 20  # doc_ids materialized per token (df/tf stay exact)
_TOP_TOKENS = 100  # dictionary rows returned (ordered by df)
_MIN_TOKEN_LEN = 2

# RAG packing knobs
_RAG_TERMS = ("join", "hash", "vector", "filter", "merge")
_RAG_CANDIDATES = 50  # retrieval depth before packing
_RAG_BUDGET = 1024  # prompt token budget per query


def _tokens(df: DataFrame) -> DataFrame:
    """(doc_id, token) rows under the module tokenization convention.
    Fanned out before the explode (single-file fixture parquet)."""
    raw = fan_out(df).select(
        "doc_id",
        F.explode(F.split(F.rtrim(F.lower(F.col("text"))), r"\s+")).alias("raw"),
    )
    return raw.select(
        "doc_id", F.regexp_replace("raw", "[^a-z0-9]", "").alias("token")
    ).filter(F.length("token") >= _MIN_TOKEN_LEN)


_SQL_TOKENS = f"""
w AS (SELECT doc_id, unnest(string_split_regex(rtrim(lower(text)), '\\s+')) AS raw
      FROM documents),
tok AS (SELECT doc_id, regexp_replace(raw, '[^a-z0-9]', '', 'g') AS token FROM w),
tok2 AS (SELECT doc_id, token FROM tok WHERE length(token) >= {_MIN_TOKEN_LEN})
"""


# ---------------------------------------------------------------------------
# Inverted index build
# ---------------------------------------------------------------------------

_INVERTED_ORACLE = f"""
WITH {_SQL_TOKENS},
per_doc AS (SELECT token, doc_id, count(*) AS tf FROM tok2 GROUP BY 1, 2),
stats AS (SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total
          FROM per_doc GROUP BY 1),
ranked AS (SELECT token, doc_id,
                  row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
           FROM per_doc),
post AS (SELECT token,
                string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
         FROM ranked WHERE rn <= {_POSTINGS_CAP} GROUP BY 1)
SELECT s.token, s.df, s.tf_total, p.postings
FROM stats s JOIN post p USING (token)
ORDER BY s.df DESC, s.token
LIMIT {_TOP_TOKENS}
"""


@register("inverted_index_build", _INVERTED_ORACLE)
def q_inverted_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary + postings build: token -> (df, tf_total, first-20 postings).

    Plan shape (and why it scales):
    - ONE shuffle on (token, doc_id) produces per-doc term frequencies;
      both downstream aggregates consume it.
    - df/tf_total roll up per token from the (token, doc_id) grain — a
      plain two-level aggregate, never count+countDistinct in one agg
      (that form plans an Expand duplicating every input row).
    - The postings list is CAPPED before collection: a row_number window
      partitioned by token with an rn <= cap filter plans a
      WindowGroupLimit in this Spark, so a stopword's billion postings
      never materialize — only cap rows per token reach collect_list.
      df/tf_total stay exact because they aggregate the uncapped grain.
    - The final df-ordered dictionary page is orderBy+limit =
      TakeOrderedAndProject: per-partition top-k, no global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_doc = _tokens(docs).groupBy("token", "doc_id").agg(F.count("*").alias("tf"))
    # two consumers (stats rollup + capped postings) — materialize the
    # (token, doc) grain once or the whole tokenize+explode runs twice
    per_doc = per_doc.localCheckpoint(eager=True)
    stats = per_doc.groupBy("token").agg(
        F.count("*").alias("df"), F.sum("tf").alias("tf_total")
    )
    rn = F.row_number().over(W.partitionBy("token").orderBy("doc_id"))
    capped = per_doc.withColumn("rn", rn).filter(F.col("rn") <= _POSTINGS_CAP)
    post = capped.groupBy("token").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list("doc_id")), lambda d: d.cast("string")
            ),
        ).alias("postings")
    )
    return (
        # both sides are vocabulary-grain aggregates already partitioned
        # by token: SHUFFLE_HASH reuses that partitioning and keeps the
        # planner from broadcasting an open-vocabulary table (the 100x
        # scale step showed post-aggregate estimates make it try)
        stats.join(post.hint("SHUFFLE_HASH"), "token")
        .select("token", "df", "tf_total", "postings")
        .orderBy(F.desc("df"), "token")
        .limit(_TOP_TOKENS)
    )


# ---------------------------------------------------------------------------
# Positional phrase search
# ---------------------------------------------------------------------------

_PHRASE_A, _PHRASE_B = "order", "fast"

_PHRASE_ORACLE = f"""
WITH w AS (SELECT doc_id,
                  string_split_regex(rtrim(lower(text)), '\\s+') AS words
           FROM documents),
p AS (SELECT doc_id, i AS pos,
             regexp_replace(words[i], '[^a-z0-9]', '', 'g') AS token
      FROM w, unnest(generate_series(1, len(words))) AS t(i)),
a AS (SELECT doc_id, pos FROM p WHERE token = '{_PHRASE_A}'),
b AS (SELECT doc_id, pos FROM p WHERE token = '{_PHRASE_B}')
SELECT a.doc_id AS doc_id, count(*) AS n_matches
FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY 1
ORDER BY doc_id
"""


@register("phrase_search_postings", _PHRASE_ORACLE)
def q_phrase_search_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase query "order fast" via positional-postings intersection.

    The positional-index answer shape: filter each term's postings (tiny
    vs the corpus — this is the point of an index), then an equi-join on
    (doc_id, adjacent position). Spark extracts ``b.pos == a.pos + 1`` as
    a hash-join key pair (each side's expression references one side
    only), so this is a shuffled hash join on two already-filtered
    posting streams — never a cartesian, never a scan-side position loop.
    Both postings derive from one explode pass over the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.rtrim(F.lower(F.col("text"))), r"\s+")
    pos = fan_out(docs).select(
        "doc_id", F.posexplode(words).alias("pos", "raw")
    ).select(
        "doc_id", "pos", F.regexp_replace("raw", "[^a-z0-9]", "").alias("token")
    )
    a = pos.filter(F.col("token") == _PHRASE_A).select("doc_id", "pos")
    b = pos.filter(F.col("token") == _PHRASE_B).select(
        F.col("doc_id").alias("b_doc"), F.col("pos").alias("b_pos")
    )
    return (
        # posting sizes are term-frequency-dependent (a stopword's list
        # is corpus-proportional): shuffle-hash on the positional key,
        # never a broadcast build of a posting list
        a.join(
            b.hint("SHUFFLE_HASH"),
            (a.doc_id == b.b_doc) & (b.b_pos == a.pos + 1),
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"))
        # match-grain output, order-insensitive oracle: no display sort
    )


# ---------------------------------------------------------------------------
# RAG context packing under a token budget
# ---------------------------------------------------------------------------

_RAG_TERMS_SQL = ", ".join(f"('{t}')" for t in _RAG_TERMS)

_RAG_ORACLE = f"""
WITH {_SQL_TOKENS},
terms(term) AS (VALUES {_RAG_TERMS_SQL}),
tf AS (SELECT t.term, k.doc_id, count(*) AS tf
       FROM tok2 k JOIN terms t ON k.token = t.term GROUP BY 1, 2),
len AS (SELECT doc_id,
               len(string_split_regex(rtrim(lower(text)), '\\s+')) AS n_tokens
        FROM documents),
ranked AS (SELECT term, doc_id, tf,
                  row_number() OVER (PARTITION BY term
                                     ORDER BY tf DESC, doc_id) AS rnk
           FROM tf),
cand AS (SELECT r.term, r.doc_id, r.rnk, l.n_tokens
         FROM ranked r JOIN len l USING (doc_id)
         WHERE r.rnk <= {_RAG_CANDIDATES}),
packed AS (SELECT term, doc_id, rnk AS rank, n_tokens,
                  CAST(sum(n_tokens) OVER (PARTITION BY term ORDER BY rnk)
                       AS BIGINT) AS cum_tokens
           FROM cand)
SELECT term, doc_id, rank, n_tokens, cum_tokens
FROM packed WHERE cum_tokens <= {_RAG_BUDGET}
ORDER BY term, rank
"""


@register("rag_context_budget_pack", _RAG_ORACLE)
def q_rag_context_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query greedy context packing: top-ranked docs while the running
    token total stays under the prompt budget.

    Reference semantics: server.js retrieves K chunks then truncates the
    assembled prompt to a token budget (SURVEY §2 K2/K3); this is that
    loop as a plan. Retrieval depth is bounded FIRST (rank window with
    rnk <= candidates plans a WindowGroupLimit — per-group top-k, so the
    running-sum window that follows sees at most ``candidates`` rows per
    query regardless of corpus size), then the cumulative token sum packs
    in rank order. Both windows partition by query term: parallel across
    queries, bounded per query — no global window, no driver loop.
    """
    docs = load_table(spark, sf_dir, "documents")
    # literal IN-list predicate, not a join: the term set is a query-time
    # constant, so it belongs in codegen where it filters DURING the
    # explode output scan
    tf = (
        _tokens(docs)
        .filter(F.col("token").isin(*_RAG_TERMS))
        .select(F.col("token").alias("term"), "doc_id")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    n_tokens = F.size(F.split(F.rtrim(F.lower(F.col("text"))), r"\s+"))
    lens = docs.select("doc_id", n_tokens.alias("n_tokens"))
    rnk = F.row_number().over(
        W.partitionBy("term").orderBy(F.desc("tf"), "doc_id")
    )
    cand = (
        tf.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= _RAG_CANDIDATES)
        .join(lens, "doc_id")
    )
    cum = F.sum("n_tokens").over(
        W.partitionBy("term").orderBy("rnk").rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        cand.select(
            "term",
            "doc_id",
            F.col("rnk").alias("rank"),
            "n_tokens",
            cum.alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= _RAG_BUDGET)
        .orderBy("term", "rank")
    )


# ---------------------------------------------------------------------------
# Incremental inverted-index maintenance
# ---------------------------------------------------------------------------

_INC_TOP = 100


def token_stats_from_tokens(toks: DataFrame) -> DataFrame:
    """(token, df, tf_total) from (doc_id, token) rows — the persisted
    aggregate form of an inverted index's dictionary."""
    per_doc = toks.groupBy("token", "doc_id").agg(F.count("*").alias("tf"))
    return per_doc.groupBy("token").agg(
        F.count("*").alias("df"), F.sum("tf").alias("tf_total")
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """(token, df, tf_total) for a documents frame (doc_id, text, ...)."""
    return token_stats_from_tokens(_tokens(docs))


def merge_token_stats(a: DataFrame, b: DataFrame) -> DataFrame:
    """Additive merge of two token-stat frames over DISJOINT doc sets
    (df and tf are additive only if no document is counted twice — the
    caller's contract, same as dedup's incremental store). Vocabulary-
    sized full-outer join; never touches any corpus text."""
    a2 = a.withColumnRenamed("df", "df_a").withColumnRenamed("tf_total", "tf_a")
    b2 = b.withColumnRenamed("df", "df_b").withColumnRenamed("tf_total", "tf_b")
    # full-outer can't broadcast; hash-join the vocabulary-keyed sides
    # instead of paying SortMergeJoin's per-partition sorts (dictionary
    # rows are narrow and hash-partition evenly on token)
    a2 = a2.hint("SHUFFLE_HASH")
    return a2.join(b2, "token", "full_outer").select(
        "token",
        (F.coalesce("df_a", F.lit(0)) + F.coalesce("df_b", F.lit(0))).alias("df"),
        (F.coalesce("tf_a", F.lit(0)) + F.coalesce("tf_b", F.lit(0))).alias(
            "tf_total"
        ),
    )


def _sql_half_stats(tag: str, parity: int) -> str:
    return f"""
pd_{tag} AS (SELECT token, doc_id, count(*) AS tf FROM tok2
             WHERE doc_id % 2 = {parity} GROUP BY 1, 2),
st_{tag} AS (SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total
             FROM pd_{tag} GROUP BY 1)"""


_INC_ORACLE = f"""
WITH {_SQL_TOKENS},
{_sql_half_stats('s', 0)},
{_sql_half_stats('b', 1)},
merged AS (
  SELECT coalesce(s.token, b.token) AS token,
         coalesce(s.df, 0) + coalesce(b.df, 0) AS df,
         coalesce(s.tf_total, 0) + coalesce(b.tf_total, 0) AS tf_total
  FROM st_s s FULL OUTER JOIN st_b b ON s.token = b.token),
rebuild AS (
  SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total
  FROM (SELECT token, doc_id, count(*) AS tf FROM tok2 GROUP BY 1, 2)
  GROUP BY 1)
SELECT m.token, m.df, m.tf_total,
       (m.df = r.df AND m.tf_total = r.tf_total) AS matches_rebuild
FROM merged m JOIN rebuild r ON m.token = r.token
ORDER BY m.df DESC, m.token
LIMIT {_INC_TOP}
"""


@register("inverted_index_incremental", _INC_ORACLE)
def q_inverted_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance: merge a new batch's postings stats
    into an existing index WITHOUT re-tokenizing the store, and prove the
    merge equals a full rebuild in-query.

    The production ingest shape (same contract as
    ``dedup_minhash_incremental``): the store half (even doc_ids) stands
    for the already-indexed corpus whose per-token aggregates are a
    persisted artifact; the batch half (odd doc_ids) is the only text
    tokenized at ingest time. df/tf are additive over disjoint doc sets,
    so the merge is a full-outer join of two token-keyed aggregate frames
    — |vocabulary|-sized, never corpus-sized. The full rebuild here is
    the verification twin (the ``matches_rebuild`` boolean); a real
    deployment never runs it.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    st_s = token_stats_from_tokens(toks.filter(F.col("doc_id") % 2 == 0))
    st_b = token_stats_from_tokens(toks.filter(F.col("doc_id") % 2 == 1))
    merged = merge_token_stats(st_s, st_b)
    rebuild = token_stats_from_tokens(toks).withColumnRenamed(
        "df", "df_r"
    ).withColumnRenamed("tf_total", "tf_r")
    return (
        merged.hint("SHUFFLE_HASH").join(rebuild, "token")
        .select(
            "token",
            "df",
            "tf_total",
            (
                (F.col("df") == F.col("df_r"))
                & (F.col("tf_total") == F.col("tf_r"))
            ).alias("matches_rebuild"),
        )
        .orderBy(F.desc("df"), "token")
        .limit(_INC_TOP)
    )


# ---------------------------------------------------------------------------
# Search snippet extraction
# ---------------------------------------------------------------------------

_SNIP_TERM = "vector"
_SNIP_WIN = 10  # tokens

_SNIP_ORACLE = f"""
WITH w AS (SELECT doc_id,
                  string_split_regex(rtrim(lower(text)), '\\s+') AS words
           FROM documents),
p AS (SELECT doc_id, i - 1 AS pos,
             regexp_replace(words[i], '[^a-z0-9]', '', 'g') AS token
      FROM w, unnest(generate_series(1, len(words))) AS t(i)),
occ AS (SELECT doc_id, pos FROM p WHERE token = '{_SNIP_TERM}'),
dens AS (SELECT a.doc_id, a.pos, count(*) AS n_in_window
         FROM occ a JOIN occ b
           ON a.doc_id = b.doc_id
          AND b.pos >= a.pos AND b.pos < a.pos + {_SNIP_WIN}
         GROUP BY 1, 2),
best AS (SELECT doc_id, pos, n_in_window,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY n_in_window DESC, pos) AS rn
         FROM dens)
SELECT b.doc_id, b.pos AS offset, b.n_in_window,
       array_to_string(list_slice(w.words, b.pos + 1,
                                  b.pos + {_SNIP_WIN}), ' ') AS snippet
FROM best b JOIN w ON b.doc_id = w.doc_id
WHERE b.rn = 1
ORDER BY b.doc_id
"""


@register("search_snippet_extraction", _SNIP_ORACLE)
def q_search_snippet_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-window snippet per matching document: the densest
    ``_SNIP_WIN``-token window (anchored at a term occurrence, ties to the
    earliest offset) — what a search results page shows under each hit.

    Candidate windows are anchored at TERM OCCURRENCES only, so the
    density join is occurrences x occurrences within a doc (tiny, both
    sides pre-filtered from the positional postings), joined on doc_id
    with the window range as a residual — a hash join, not a cartesian
    and never a windows x positions blow-up. The final snippet slice
    touches only the winning offset per doc.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.rtrim(F.lower(F.col("text"))), r"\s+")
    pos = fan_out(docs).select(
        "doc_id", F.posexplode(words).alias("pos", "raw")
    ).select(
        "doc_id", "pos", F.regexp_replace("raw", "[^a-z0-9]", "").alias("token")
    )
    occ = pos.filter(F.col("token") == _SNIP_TERM).select("doc_id", "pos")
    occ = occ.localCheckpoint(eager=True)  # anchors + window-members
    b = occ.select(F.col("doc_id").alias("b_doc"), F.col("pos").alias("b_pos"))
    dens = (
        # positional self-join of the term's occurrence list: size is the
        # term's document frequency — shuffle-hash, same rationale as the
        # phrase join
        occ.join(
            b.hint("SHUFFLE_HASH"),
            (occ.doc_id == b.b_doc)
            & (b.b_pos >= occ.pos)
            & (b.b_pos < occ.pos + _SNIP_WIN),
        )
        .groupBy("doc_id", "pos")
        .agg(F.count("*").alias("n_in_window"))
    )
    from pyspark.sql import Window as W2

    rn = F.row_number().over(
        W2.partitionBy("doc_id").orderBy(F.desc("n_in_window"), "pos")
    )
    best = dens.withColumn("rn", rn).filter(F.col("rn") == 1)
    snip = docs.select("doc_id", words.alias("words"))
    return (
        # snip is the FULL corpus word arrays — corpus-grain, never a
        # broadcast build; shuffle-hash on doc_id (best is match-grain,
        # bounded only by the term's document frequency)
        best.join(snip.hint("SHUFFLE_HASH"), "doc_id")
        .select(
            "doc_id",
            F.col("pos").alias("offset"),
            "n_in_window",
            F.array_join(
                F.slice(F.col("words"), F.col("pos") + 1, _SNIP_WIN), " "
            ).alias("snippet"),
        )
        # corpus-grain output, order-insensitive oracle: no display sort
    )
