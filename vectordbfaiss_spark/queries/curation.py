"""Dataset-curation operators for training pipelines: deterministic
sampling, split assignment, per-class balancing, text normalization.

Sampling in a 100 TB curation pipeline must be REPRODUCIBLE and
join-stable: `df.sample()` depends on partitioning and row order, so two
runs (or the same run after a repartition) select different rows. The
engine's sampling primitive is therefore content-hash based — a row is
selected iff md5(id) falls under the rate threshold — which is (a) exactly
re-derivable by any engine (the DuckDB oracle hash-checks every query
here), (b) stable under any shuffle/partitioning, and (c) a pure
map-side filter: no shuffle, full predicate pushdown of everything else.
The reference has no sampling at all (SURVEY §2); this family is part of
the north-star LLM-data-pipeline additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import load_table

# md5-hex prefix -> uniform int in [0, 16^6) — 6 hex digits = 24 bits of
# uniformity, plenty for percent-level rates, cheap to replicate in SQL.
_HEX_SPAN = 16**6


def _hash_bucket(col) -> "F.Column":
    """Deterministic uniform bucket in [0, 16^6) from md5 of a column."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 6), 16, 10).cast("long")


def _sql_hash_bucket(expr: str) -> str:
    """DuckDB replica of :func:`_hash_bucket` (no hex-cast builtin there:
    positional digit arithmetic over the md5 hex prefix)."""
    digit = (
        "(strpos('0123456789abcdef', substr(md5(CAST({e} AS VARCHAR)), {i}, 1)) - 1)"
    )
    terms = " + ".join(
        digit.format(e=expr, i=i + 1) + f" * {16 ** (5 - i)}" for i in range(6)
    )
    return f"({terms})"


def _split_expr(bucket) -> "F.Column":
    """80/10/10 train/val/test CASE over a hash bucket — THE split rule,
    shared by every split-assigning query (and its SQL twin below)."""
    return (
        F.when(bucket < int(0.8 * _HEX_SPAN), "train")
        .when(bucket < int(0.9 * _HEX_SPAN), "val")
        .otherwise("test")
    )


def _sql_split_case(bucket_expr: str) -> str:
    """DuckDB replica of :func:`_split_expr`."""
    return (
        f"CASE WHEN {bucket_expr} < {int(0.8 * _HEX_SPAN)} THEN 'train' "
        f"WHEN {bucket_expr} < {int(0.9 * _HEX_SPAN)} THEN 'val' "
        f"ELSE 'test' END"
    )


_SAMPLE_ORACLE = f"""
SELECT lang, count(*) AS n_sampled,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(max(doc_id) AS BIGINT) AS max_id
FROM documents
WHERE {_sql_hash_bucket('doc_id')} < {int(0.2 * _HEX_SPAN)}
GROUP BY lang
"""


@register("deterministic_sample_docs", _SAMPLE_ORACLE)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20% deterministic sample of documents: selection = md5(doc_id) under
    threshold. Reproducible across runs/engines/partitionings — unlike
    df.sample() — and executes as a pure map-side filter."""
    d = load_table(spark, sf_dir, "documents")
    sampled = d.filter(_hash_bucket(F.col("doc_id")) < int(0.2 * _HEX_SPAN))
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_sampled"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


_SPLIT_ORACLE = f"""
WITH assigned AS (
  SELECT lang,
         {_sql_split_case(_sql_hash_bucket('doc_id'))} AS split
  FROM documents
)
SELECT lang, split, count(*) AS n_docs
FROM assigned GROUP BY lang, split
"""


@register("train_test_split_assign", _SPLIT_ORACLE)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment from the same hash
    bucket — a document's split never changes when the corpus grows, which
    is the property that prevents train/test leakage across dataset
    versions."""
    d = load_table(spark, sf_dir, "documents")
    split = _split_expr(_hash_bucket(F.col("doc_id")))
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


_BALANCE_N = 40

_BALANCE_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {_sql_hash_bucket('doc_id')}, doc_id
         ) AS rn
  FROM documents
)
SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_BALANCE_N}
"""


@register("balanced_downsample_per_lang", _BALANCE_ORACLE)
def q_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: at most N docs per language, chosen by
    hash order (deterministic pseudo-random, id tie-break). The window
    shuffles once on the class key; at scale the same shape handles
    per-domain / per-source caps in data mixing."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(_hash_bucket(F.col("doc_id")), "doc_id")
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _BALANCE_N)
        .select("doc_id", "lang", F.col("rn").cast("long").alias("rn"))
    )


_PACK_BUDGET = 2048
_PACK_SHARDS = 16

_PACKING_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         len(string_split_regex(rtrim(text), '\\s+')) AS n_tokens,
         {_sql_hash_bucket('doc_id')} AS hkey
  FROM documents
), ordered AS (
  SELECT doc_id, n_tokens, hkey % {_PACK_SHARDS} AS shard,
         sum(n_tokens) OVER (PARTITION BY hkey % {_PACK_SHARDS}
                             ORDER BY hkey, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
), binned AS (
  SELECT doc_id, n_tokens, shard, (cum - n_tokens) // {_PACK_BUDGET} AS bin_id
  FROM ordered
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(bin_id AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM binned GROUP BY shard, bin_id
"""


def packing_binned(d: DataFrame, shards: int | None = _PACK_SHARDS) -> DataFrame:
    """(doc_id, n_tokens, shard, bin_id) streaming-pack assignment.

    ``shards=N``: docs are hashed into N independent streams and the
    running-token cumsum is computed per shard (``partitionBy("shard")``)
    — N parallel windows, each holding 1/N of the corpus, so no single
    partition ever sees the whole dataset. Bin keys are ``(shard,
    bin_id)``; each bin still packs to ~budget tokens, and determinism is
    preserved because shard and intra-shard order are both hash-derived.

    ``shards=None``: the single-stream global form (one total order, one
    partition — the textbook shape, kept as the small-data cross-check;
    its WindowExec funnels the whole corpus through one task, which is
    exactly what the sharded form exists to avoid at 100 TB).
    """
    toks = d.select(
        "doc_id",
        F.size(F.split(F.rtrim("text"), r"\s+")).alias("n_tokens"),
        _hash_bucket(F.col("doc_id")).alias("hkey"),
    )
    if shards is None:
        toks = toks.withColumn("shard", F.lit(0).cast("long"))
        w = W.orderBy("hkey", "doc_id").rowsBetween(W.unboundedPreceding, 0)
    else:
        toks = toks.withColumn("shard", F.col("hkey") % shards)
        w = (
            W.partitionBy("shard")
            .orderBy("hkey", "doc_id")
            .rowsBetween(W.unboundedPreceding, 0)
        )
    return toks.select(
        "doc_id",
        "n_tokens",
        "shard",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_BUDGET).alias(
            "bin_id"
        ),
    )


@register("sequence_packing_bins", _PACKING_ORACLE)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, shard-parallel: hash documents into independent
    streams, run the running-token cumsum per shard, and cut a new bin
    whenever the stream crosses the budget — near-budget-sized training
    sequences with no global sort and no single-partition window (the
    global form survives only as a test cross-check in
    :func:`packing_binned`)."""
    d = load_table(spark, sf_dir, "documents")
    return packing_binned(d).groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


_NORMALIZE_ORACLE = """
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id,
       CAST(length(norm_text) AS BIGINT) AS n_chars_norm,
       md5(norm_text) AS norm_digest
FROM norm
"""


@register("text_normalize_docs", _NORMALIZE_ORACLE)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation text normalization: lowercase, strip non-alphanumerics,
    collapse whitespace — the canonical form used for exact dedup keys.
    The md5 digest of the normalized text IS the output, so the oracle
    checks the normalization byte-for-byte."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return d.select(
        "doc_id",
        F.length(norm).cast("long").alias("n_chars_norm"),
        F.md5(norm).alias("norm_digest"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: n-gram collision against a held-out set
# ---------------------------------------------------------------------------

_DECON_N = 5  # tokens per shingle (big enough to be phrase-specific)

_DECON_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(rtrim(text), '\\s+') AS l
  FROM documents
), sh AS (
  SELECT doc_id,
         array_to_string(l[i : i + {_DECON_N} - 1], ' ') AS shingle
  FROM toks, LATERAL unnest(generate_series(1, len(l) - {_DECON_N} + 1)) AS t(i)
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id < 10
), corpus AS (
  SELECT doc_id, shingle FROM sh WHERE doc_id >= 10
), hits AS (
  SELECT c.doc_id, count(DISTINCT c.shingle) AS n_hits
  FROM corpus c JOIN bench b ON c.shingle = b.shingle
  GROUP BY c.doc_id
), totals AS (
  SELECT doc_id, count(DISTINCT shingle) AS n_shingles FROM corpus GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(t.n_shingles AS BIGINT) AS n_shingles,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_contaminated,
       round(coalesce(h.n_hits, 0) * 1.0 / t.n_shingles, 6) AS contamination
FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id
WHERE coalesce(h.n_hits, 0) > 0
"""


@register("benchmark_decontamination", _DECON_ORACLE)
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-set decontamination: flag corpus documents sharing 5-token
    shingles with a held-out benchmark set (docs 0-9 stand in for the
    eval set). THE hygiene pass before any pretraining run — eval
    answers leaking into training data invalidate the benchmark. Plan:
    both sides shingle once (posexplode over the token array); the
    benchmark's distinct-shingle set is benchmark-sized (tiny) and
    BROADCAST against the corpus shingles, so the collision check is a
    map-side semi-ish join — no corpus-sized shuffle beyond the per-doc
    distinct aggregate. Only contaminated docs are emitted."""
    from vectordbfaiss_spark.session import fan_out

    docs = load_table(spark, sf_dir, "documents")
    n = _DECON_N

    def _shingled(frame):
        toks = frame.select("doc_id", F.split(F.rtrim("text"), r"\s+").alias("l"))
        return toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("l") - n),
                    lambda i: F.concat_ws(" ", F.slice("l", i + 1, n)),
                )
            ).alias("shingle"),
        )

    # benchmark side from its OWN pushed-filter subtree (10 docs), not a
    # filter over the corpus explode: deriving both sides from one `sh`
    # frame made the corpus-sized explode execute once per consumer
    # (bench + hits + totals = 3x inside the final action, round 9).
    bench = (
        _shingled(docs.filter(F.col("doc_id") < 10)).select("shingle").distinct()
    )
    corpus = _shingled(fan_out(docs.filter(F.col("doc_id") >= 10)))
    # one corpus pass, one aggregate: mark each shingle row against the
    # broadcast benchmark set, then count total and contaminated distinct
    # shingles in the SAME groupBy (two filtered count-distincts — the
    # x2 Expand is cheaper than re-running the explode per aggregate and
    # the totals-hits join it fed)
    marked = corpus.join(
        F.broadcast(bench.withColumn("_hit", F.lit(1))), "shingle", "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shingles"),
            F.countDistinct(
                F.when(F.col("_hit") == 1, F.col("shingle"))
            ).alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_hits").cast("long").alias("n_contaminated"),
            F.round(F.col("n_hits") * 1.0 / F.col("n_shingles"), 6).alias(
                "contamination"
            ),
        )
    )


_NLL_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(rtrim(text), '\\s+')) AS tok
  FROM documents
), g AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), n AS (
  SELECT count(*) AS total FROM toks
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_toks,
       round(avg(-ln(g.c * 1.0 / n.total)), 6) AS avg_nll
FROM toks t JOIN g ON t.tok = g.tok CROSS JOIN n
GROUP BY t.doc_id
"""


@register("unigram_logprob_quality", _NLL_ORACLE)
def q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring, unigram edition: per-document mean
    negative log-likelihood under the corpus's own unigram distribution —
    the cheap statistical stand-in for model-based perplexity filtering
    (docs full of rare junk score high, formulaic boilerplate scores
    low; both tails get inspected before training). The model IS a
    vocab-sized aggregate joined back over one token explode — but the
    raw-token vocabulary grows with the corpus (Heaps' law plus junk
    tokens), so the model join is SHUFFLE_HASH, not broadcast: at 100 TB
    an open-vocabulary table is GBs, and the 100x scale step showed
    Catalyst's post-aggregate estimates will happily plan such tables as
    broadcast builds until they OOM (SCALE.md). A production variant
    that caps the vocab (top-K + OOV bucket) can re-earn the broadcast."""
    from vectordbfaiss_spark.session import fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id", F.explode(F.split(F.rtrim("text"), r"\s+")).alias("tok")
    )
    g = toks.groupBy("tok").agg(F.count("*").alias("c"))
    n = toks.agg(F.count("*").alias("total"))
    return (
        toks.join(g.hint("SHUFFLE_HASH"), "tok")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.round(F.avg(-F.log(F.col("c") * 1.0 / F.col("total"))), 6).alias(
                "avg_nll"
            ),
        )
    )


_WINSOR_ORACLE = """
WITH bounds AS (
  SELECT quantile_cont(value, 0.01) AS p01,
         quantile_cont(value, 0.99) AS p99
  FROM events
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN e.value < b.p01 OR e.value > b.p99 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped,
       round(avg(least(greatest(e.value, b.p01), b.p99)), 6) AS winsor_mean,
       round(avg(e.value), 6) AS raw_mean
FROM events e CROSS JOIN bounds b
GROUP BY e.event_type
"""


@register("winsorize_event_values", _WINSOR_ORACLE)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized statistics: clip values to the global [p01, p99] band
    before averaging — the robust-mean preprocessing a feature pipeline
    applies before normalization so a single corrupt reading can't move
    the statistics. Two passes: an exact-percentile scalar (one row,
    broadcast back over the scan) then one hash aggregate; at 100 TB the
    first pass swaps to approx_percentile with no other change
    (the approx_percentiles_order_value entry demonstrates that path)."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.percentile("value", F.lit(0.01)).alias("p01"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    out_of_band = (F.col("value") < F.col("p01")) | (F.col("value") > F.col("p99"))
    return (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(out_of_band, 1).otherwise(0)).cast("long").alias("n_clipped"),
            F.round(F.avg(clipped), 6).alias("winsor_mean"),
            F.round(F.avg("value"), 6).alias("raw_mean"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus health rollup (per-source pipeline dashboard)
# ---------------------------------------------------------------------------

_HEALTH_ORACLE = """
WITH m AS (
  SELECT source, lang, text,
         len(string_split_regex(rtrim(text), '\\s+')) AS n_tokens
  FROM documents
), per_source AS (
  SELECT source,
         count(*) AS n_docs,
         count(DISTINCT text) AS n_unique,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         round(avg(n_tokens), 6) AS mean_tokens
  FROM m GROUP BY source
), lang_p AS (
  SELECT source, lang, count(*) / sum(count(*)) OVER (PARTITION BY source) AS p
  FROM m GROUP BY source, lang
), ent AS (
  SELECT source, round(-sum(p * ln(p)), 6) AS lang_entropy FROM lang_p GROUP BY source
)
SELECT s.source, s.n_docs,
       round(1.0 - s.n_unique / s.n_docs, 6) AS dup_rate,
       s.total_tokens, s.mean_tokens, e.lang_entropy
FROM per_source s JOIN ent e ON s.source = e.source
"""


@register("corpus_health_report", _HEALTH_ORACLE)
def q_corpus_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health dashboard: document counts, exact-duplicate
    rate, token totals/means, and language-distribution entropy — the
    one-look report a curation pipeline publishes per snapshot. Plan: one
    narrow projection feeds three hash-aggs on source(+lang/+text) that
    join on the tiny source dimension; token counting stays expression-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "source",
        "lang",
        "text",
        F.size(F.split(F.rtrim("text"), r"\s+")).alias("n_tokens"),
    )
    # distinct texts per source via two-level agg (no Expand); NULL texts
    # are excluded to reproduce count(DISTINCT text) semantics
    uniq = (
        m.filter(F.col("text").isNotNull())
        .groupBy("source", "text")
        .agg(F.lit(1))
        .groupBy("source")
        .agg(F.count("*").alias("n_unique"))
    )
    per_source = m.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
    )
    lang_counts = m.groupBy("source", "lang").agg(F.count("*").alias("c"))
    p = F.col("c") / F.sum("c").over(W.partitionBy("source"))
    ent = (
        lang_counts.withColumn("p", p)
        .groupBy("source")
        .agg(F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 6).alias("lang_entropy"))
    )
    return (
        # LEFT join + coalesce: a source whose texts are all NULL has no
        # uniq row, but count(DISTINCT)=0 still yields a report line
        per_source.join(F.broadcast(uniq), "source", "left")
        .join(F.broadcast(ent), "source")
        .select(
            "source",
            "n_docs",
            F.round(
                1.0 - F.coalesce("n_unique", F.lit(0)) / F.col("n_docs"), 6
            ).alias("dup_rate"),
            "total_tokens",
            "mean_tokens",
            "lang_entropy",
        )
    )


# ---------------------------------------------------------------------------
# Mixture sampling plan (pre-training data mixing)
# ---------------------------------------------------------------------------

_MIX_BUDGET_FRAC = 0.5  # token budget = 50% of corpus tokens

_MIXTURE_ORACLE = f"""
WITH m AS (
  SELECT source,
         CAST(sum(len(string_split_regex(rtrim(text), '\\s+'))) AS BIGINT)
           AS available_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(available_tokens) AS corpus_tokens,
         count(*) AS n_sources
  FROM m
)
SELECT m.source,
       m.available_tokens,
       round({_MIX_BUDGET_FRAC} * t.corpus_tokens / t.n_sources, 6)
         AS target_tokens,
       round(least(1.0, ({_MIX_BUDGET_FRAC} * t.corpus_tokens / t.n_sources)
                        / m.available_tokens), 6) AS sampling_rate,
       round(least(m.available_tokens,
                   {_MIX_BUDGET_FRAC} * t.corpus_tokens / t.n_sources), 6)
         AS expected_tokens
FROM m, tot t
"""


@register("mixture_sampling_plan", _MIXTURE_ORACLE)
def q_mixture_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training data-mixing plan: given a token budget (here 50% of
    corpus tokens, split uniformly across sources — swap in any target
    share vector), compute each source's sampling rate and expected token
    yield, capped at availability. This is the planning step that turns
    "we want equal representation" into per-source rates the deterministic
    hash samplers (deterministic_sample_docs) execute. Plan: one per-source
    agg + a broadcast 1-row total; all arithmetic, no data movement beyond
    the count shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.rtrim("text"), r"\s+")))
        .cast("long")
        .alias("available_tokens")
    )
    tot = m.agg(
        F.sum("available_tokens").cast("double").alias("corpus_tokens"),
        F.count("*").cast("double").alias("n_sources"),
    )
    target = _MIX_BUDGET_FRAC * F.col("corpus_tokens") / F.col("n_sources")
    return m.crossJoin(F.broadcast(tot)).select(
        "source",
        "available_tokens",
        F.round(target, 6).alias("target_tokens"),
        F.round(
            F.least(F.lit(1.0), target / F.col("available_tokens")), 6
        ).alias("sampling_rate"),
        F.round(
            F.least(F.col("available_tokens").cast("double"), target), 6
        ).alias("expected_tokens"),
    )


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (Xie et al. 2023,
# arXiv:2302.03169): hashed n-gram importance weights log(p_target/p_raw)
# ---------------------------------------------------------------------------

_DSIR_B = 256  # hashed feature buckets (paper: 10k; fixture vocab is tiny)
_DSIR_ALPHA = 0.5  # add-alpha smoothing of both bucket distributions

_DSIR_GRAMS_SQL = """
    list_concat(
      words,
      list_transform(generate_series(0, greatest(len(words) - 2, 0)),
                     i -> array_to_string(list_slice(words, i + 1, i + 2), ' ')))
"""

_DSIR_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang,
         string_split_regex(rtrim(text), '\\s+') AS words
  FROM documents WHERE text IS NOT NULL
), f0 AS (
  SELECT doc_id, lang, unnest({_DSIR_GRAMS_SQL}) AS g FROM w
), f AS (
  SELECT doc_id, lang, {_sql_hash_bucket('g')} % {_DSIR_B} AS bucket FROM f0
), per_doc AS (
  SELECT doc_id, bucket, count(*) AS n FROM f GROUP BY doc_id, bucket
), raw_d AS (
  SELECT bucket, count(*) AS r FROM f GROUP BY bucket
), tgt_d AS (
  SELECT bucket, count(*) AS t FROM f WHERE lang = 'en' GROUP BY bucket
), tot AS (
  SELECT (SELECT count(*) FROM f) AS r_total,
         (SELECT count(*) FROM f WHERE lang = 'en') AS t_total
), probs AS (
  SELECT raw_d.bucket,
         (coalesce(t, 0) + {_DSIR_ALPHA}) / (t_total + {_DSIR_ALPHA} * {_DSIR_B}) AS pt,
         (r + {_DSIR_ALPHA}) / (r_total + {_DSIR_ALPHA} * {_DSIR_B}) AS pr
  FROM raw_d LEFT JOIN tgt_d USING (bucket) CROSS JOIN tot
)
SELECT per_doc.doc_id,
       CAST(sum(n) AS BIGINT) AS n_feats,
       round(sum(n * (ln(pt) - ln(pr))), 6) AS dsir_weight
FROM per_doc JOIN probs USING (bucket)
GROUP BY per_doc.doc_id
"""


@register("dsir_importance_weights", _DSIR_ORACLE)
def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: every document scored by how much its
    hashed unigram+bigram feature distribution looks like the TARGET
    domain (here: the English sub-corpus) versus the raw corpus —
    weight = sum over feature occurrences of log(p_target/p_raw), with
    add-alpha smoothing on both bucket distributions. Selection then
    resamples by weight (``deterministic_sample_docs``/
    ``weighted_sample_docs`` supply that step).

    Scale shape: one explode over the corpus -> per-(doc, bucket) counts
    (single shuffle); the two bucket distributions are {_DSIR_B}-row
    aggregates of the SAME exploded frame, broadcast back onto the
    per-doc counts; final per-doc sum is map-side-combinable. The hash
    bucketing (md5-prefix mod B) is the engine-shared rule, so DuckDB
    replays it exactly."""
    from vectordbfaiss_spark.operators.dedup import gram_array

    from vectordbfaiss_spark.session import fan_out

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    grams = fan_out(docs).select(
        "doc_id",
        "lang",
        F.explode(
            F.concat(gram_array("text", 1), gram_array("text", 2))
        ).alias("g"),
    )
    feats = grams.select(
        "doc_id", "lang", (_hash_bucket(F.col("g")) % _DSIR_B).alias("bucket")
    )
    # ONE pass over the exploded grams: aggregate to per-(doc, bucket)
    # counts first (lang rides along — it is functionally determined by
    # doc_id, so the groups are identical), then derive the raw/target
    # bucket distributions and totals by ROLLING UP the narrow counts
    # instead of re-reading `feats`. Left as four consumers of `feats`,
    # the scan + explode + md5 subtree executed once per branch (4x the
    # corpus work in one action, measured via the job profile); per_doc
    # is docs x distinct-buckets rows — corpus-linear and narrow — so one
    # checkpoint bounds every downstream aggregate to it (guide §2.3:
    # aggregate before you shuffle, reuse the aggregated frame).
    per_doc = (
        feats.groupBy("doc_id", "lang", "bucket")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    raw_d = per_doc.groupBy("bucket").agg(F.sum("n").alias("r"))
    tgt_d = (
        per_doc.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.sum("n").alias("t"))
    )
    tot = per_doc.agg(
        F.sum("n").alias("r_total"),
        F.sum(F.when(F.col("lang") == "en", F.col("n")).otherwise(0)).alias(
            "t_total"
        ),
    )
    probs = (
        raw_d.join(tgt_d, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                (F.coalesce("t", F.lit(0)) + F.lit(_DSIR_ALPHA))
                / (F.col("t_total") + F.lit(_DSIR_ALPHA * _DSIR_B))
            ).alias("pt"),
            (
                (F.col("r") + F.lit(_DSIR_ALPHA))
                / (F.col("r_total") + F.lit(_DSIR_ALPHA * _DSIR_B))
            ).alias("pr"),
        )
    )
    return (
        per_doc.join(F.broadcast(probs), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_feats"),
            F.round(
                F.sum(F.col("n") * (F.log("pt") - F.log("pr"))), 6
            ).alias("dsir_weight"),
        )
    )


_PACK_PAYLOAD_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, text,
         len(string_split_regex(rtrim(text), '\\s+')) AS n_tokens,
         {_sql_hash_bucket('doc_id')} AS hkey
  FROM documents
), ordered AS (
  SELECT doc_id, text, n_tokens, hkey, hkey % {_PACK_SHARDS} AS shard,
         sum(n_tokens) OVER (PARTITION BY hkey % {_PACK_SHARDS}
                             ORDER BY hkey, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
), binned AS (
  SELECT doc_id, text, n_tokens, hkey, shard,
         (cum - n_tokens) // {_PACK_BUDGET} AS bin_id
  FROM ordered
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(bin_id AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       md5(string_agg(text, ' <eot> ' ORDER BY hkey, doc_id)) AS packed_md5
FROM binned GROUP BY shard, bin_id
"""


@register("sequence_packing_payload", _PACK_PAYLOAD_ORACLE)
def q_sequence_packing_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing step's actual DELIVERABLE: each (shard, bin) emits its
    documents concatenated in packing order with an end-of-text separator
    — the training sequence a loader would tokenize. The md5 of the
    packed payload is what's hash-checked (the full string would bloat
    the compare; the digest pins every byte and the order).

    Order inside a bin is (hkey, doc_id) — the same hash order that
    formed the bins, so the payload is reproducible across engines, runs
    and partitionings. Same shard-parallel shape as
    ``sequence_packing_bins``: per-shard window, no single-partition
    stage; the packed-array aggregation is per-bin (budget-bounded), so
    collect_list holds ~budget tokens, never a corpus slice."""
    d = load_table(spark, sf_dir, "documents")
    binned = packing_binned(d)
    joined = binned.join(d.select("doc_id", "text"), "doc_id").withColumn(
        "hkey", _hash_bucket(F.col("doc_id"))
    )
    packed = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("hkey", "doc_id", "text"))
            ),
            lambda s: s["text"],
        ),
        " <eot> ",
    )
    return joined.groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.md5(packed).alias("packed_md5"),
    )


_BIGRAM_NLL_ORACLE = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(rtrim(text), '\s+') AS syms FROM documents
), bi AS (
  SELECT w.doc_id, w.syms[t.i] AS wa, w.syms[t.i + 1] AS wb
  FROM w, unnest(generate_series(1, len(w.syms) - 1)) AS t(i)
), cab AS (
  SELECT wa, wb, count(*) AS c_ab FROM bi GROUP BY 1, 2
), ca AS (
  SELECT wa, count(*) AS c_a FROM bi GROUP BY 1
), v AS (
  SELECT count(DISTINCT tok) AS vocab
  FROM (SELECT unnest(string_split_regex(rtrim(text), '\s+')) AS tok FROM documents)
)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln((cab.c_ab + 1.0) / (ca.c_a + v.vocab))), 6) AS avg_nll
FROM bi b
JOIN cab ON b.wa = cab.wa AND b.wb = cab.wb
JOIN ca ON b.wa = ca.wa
CROSS JOIN v
GROUP BY b.doc_id
"""


@register("bigram_logprob_quality", _BIGRAM_NLL_ORACLE)
def q_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring, bigram edition: per-document mean
    NLL of p(w_i | w_{i-1}) under the corpus's own add-1-smoothed bigram
    model — one modeling step past `unigram_logprob_quality` toward the
    perplexity filters production pipelines run, with the same shape: the
    model is two aggregates (bigram counts + context counts), joined
    back over one bigram explode. The model joins carry explicit
    SHUFFLE_HASH hints: bigram vocab outgrows a broadcast at corpus
    scale, and leaving it to the planner is NOT safe — AQE only converts
    shuffle joins TO broadcast from observed sizes, while the STATIC
    planner converts the other way from estimates and can pick a
    broadcast build it cannot afford (measured at the 100x step,
    SCALE.md)."""
    from vectordbfaiss_spark.session import fan_out

    docs = load_table(spark, sf_dir, "documents")
    syms_df = fan_out(docs).select(
        "doc_id", F.split(F.rtrim("text"), r"\s+").alias("syms")
    )
    bi = syms_df.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(syms) < 2 THEN array() ELSE "
                "transform(sequence(1, size(syms) - 1),"
                " i -> named_struct('wa', element_at(syms, i),"
                "                   'wb', element_at(syms, i + 1))) END"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.wa").alias("wa"), F.col("p.wb").alias("wb"))
    cab = bi.groupBy("wa", "wb").agg(F.count("*").alias("c_ab"))
    ca = bi.groupBy("wa").agg(F.count("*").alias("c_a"))
    v = (
        fan_out(docs)
        .select(F.explode(F.split(F.rtrim("text"), r"\s+")).alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab"))
    )
    return (
        bi.join(cab.hint("SHUFFLE_HASH"), ["wa", "wb"])
        .join(ca.hint("SHUFFLE_HASH"), "wa")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                F.avg(-F.log((F.col("c_ab") + 1.0) / (F.col("c_a") + F.col("vocab")))),
                6,
            ).alias("avg_nll"),
        )
    )
