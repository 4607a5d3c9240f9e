"""Pipeline extras: a runtime Bloom-filter join prune, temperature-scaled
mixture weights, an event-transition (Markov) matrix, and length-bucketed
inference batching.

Each is a pattern a 100 TB training-data pipeline leans on daily: runtime
filters cut shuffle input before it exists, temperature weights set the
source mixture an LLM pre-training run samples from (the multinomial
alpha-sampling of multilingual/multi-source corpora), transition matrices
summarize behavioral streams, and length-bucketed batches bound padding
waste for batched inference/scoring jobs.

Hash arithmetic reuses the engine-shared md5-bucket rule from
``queries/curation.py`` so every DuckDB oracle replays it digit for digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from vectordbfaiss_spark.queries.curation import _hash_bucket, _sql_hash_bucket
from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import load_table

# ---------------------------------------------------------------------------
# Bloom-filter runtime join prune
# ---------------------------------------------------------------------------

_BLOOM_M = 8192  # bits
_BLOOM_K = 3  # hash functions
_BLOOM_BAL = 9000  # build-side selectivity: high-balance customers


def _bloom_pos(key_col, j: int):
    return _hash_bucket(F.concat(key_col.cast("string"), F.lit(f":{j}"))) % _BLOOM_M


def _sql_bloom_pos(expr: str, j: int) -> str:
    salted = "(CAST({e} AS VARCHAR) || ':{j}')".format(e=expr, j=j)
    return f"({_sql_hash_bucket(salted)} % {_BLOOM_M})"


_BLOOM_ORACLE = f"""
WITH build AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > {_BLOOM_BAL}
), bits AS (
  SELECT DISTINCT {_sql_bloom_pos('c_custkey', 0)} AS p FROM build
  UNION SELECT DISTINCT {_sql_bloom_pos('c_custkey', 1)} FROM build
  UNION SELECT DISTINCT {_sql_bloom_pos('c_custkey', 2)} FROM build
), probe AS (
  SELECT o_orderkey, o_custkey FROM orders
), passed AS (
  SELECT o_orderkey FROM probe
  WHERE {_sql_bloom_pos('o_custkey', 0)} IN (SELECT p FROM bits)
    AND {_sql_bloom_pos('o_custkey', 1)} IN (SELECT p FROM bits)
    AND {_sql_bloom_pos('o_custkey', 2)} IN (SELECT p FROM bits)
), trueM AS (
  SELECT o_orderkey FROM probe WHERE o_custkey IN (SELECT c_custkey FROM build)
)
SELECT (SELECT count(*) FROM probe) AS n_probe,
       (SELECT count(*) FROM passed) AS n_pass,
       (SELECT count(*) FROM trueM) AS n_true,
       (SELECT count(*) FROM trueM
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM passed)) = 0
         AS no_false_negatives,
       round(((SELECT count(*) FROM passed) - (SELECT count(*) FROM trueM))
             / greatest((SELECT count(*) FROM probe)
                        - (SELECT count(*) FROM trueM), 1), 4)
         AS false_positive_rate
"""


@register("bloom_prefilter_join", _BLOOM_ORACLE)
def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning, made explicit at the query level.

    The build side (high-balance customers) sets k=3 bit positions in an
    m=8192-bit filter; the probe side (orders) is pruned by k broadcast
    semi-joins on those positions BEFORE the real join — the same shape
    Spark's internal runtime bloom filter / DPP injects, here as an
    operator whose false-positive behavior is measured in-query.

    Why this scales: the filter state is the set of DISTINCT bit
    positions, bounded by m regardless of build-side row count — that is
    the Bloom property. It ships to the probe as a BROADCAST (the
    InSubquery shape Spark's own runtime filters plan): three broadcast
    hash LEFT SEMI joins, one per hash function, so the probe side is
    never shuffled and nothing is ever collected to Python (an
    ``isin(<~m literals>)`` formulation computes identically but spends
    seconds building the literal tree driver-side — measured 5.6 s at
    m=8192). The exact semi-join that follows only verifies (Bloom
    passes are a superset of true matches — ``no_false_negatives``
    proves the lossless direction, ``false_positive_rate`` measures the
    waste).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    build = cust.filter(F.col("c_acctbal") > _BLOOM_BAL).select("c_custkey")
    bits_df = build.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("c_custkey"), j) for j in range(_BLOOM_K)])
        ).alias("p")
    ).distinct()
    # three consumers (one per hash fn) — materialize the tiny position set
    bits_df = bits_df.localCheckpoint(eager=True)

    passed = orders.select("o_orderkey", "o_custkey")
    for j in range(_BLOOM_K):
        bj = bits_df.withColumnRenamed("p", f"p{j}")
        passed = passed.join(
            F.broadcast(bj),
            _bloom_pos(F.col("o_custkey"), j) == bj[f"p{j}"],
            "left_semi",
        )
    probe = orders.select("o_orderkey", "o_custkey")
    passed = passed.select("o_orderkey")
    passed = passed.localCheckpoint(eager=True)  # feeds count + FN check
    # `build` (acctbal-filtered customers) scales with the data — the
    # exact-check semi-join is left to file stats rather than forced
    true_m = probe.join(
        build, probe.o_custkey == build.c_custkey, "left_semi"
    ).select("o_orderkey")
    true_m = true_m.localCheckpoint(eager=True)

    missed = true_m.join(passed, "o_orderkey", "left_anti")
    return (
        probe.agg(F.count("*").alias("n_probe"))
        .crossJoin(passed.agg(F.count("*").alias("n_pass")))
        .crossJoin(true_m.agg(F.count("*").alias("n_true")))
        .crossJoin(missed.agg((F.count("*") == 0).alias("no_false_negatives")))
        .select(
            "n_probe",
            "n_pass",
            "n_true",
            "no_false_negatives",
            F.round(
                (F.col("n_pass") - F.col("n_true"))
                / F.greatest(F.col("n_probe") - F.col("n_true"), F.lit(1)),
                4,
            ).alias("false_positive_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixture weights
# ---------------------------------------------------------------------------

_TEMP_ALPHA = 0.3

_TEMP_ORACLE = f"""
WITH c AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
), p AS (
  SELECT source, n_docs, pow(n_docs, {_TEMP_ALPHA}) AS na,
         sum(pow(n_docs, {_TEMP_ALPHA})) OVER () AS denom,
         sum(n_docs) OVER () AS total
  FROM c
)
SELECT source, n_docs,
       round(na / denom, 6) AS weight,
       round((na / denom) * total / n_docs, 4) AS boost
FROM p
"""


@register("source_temperature_weights", _TEMP_ORACLE)
def q_source_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.3) multinomial sampling weights per
    source — the standard rebalancing for multi-source/multilingual
    pre-training mixtures: w_i = n_i^a / sum_j n_j^a (the corpus-size
    term cancels, so the weights need only the per-source counts).
    ``boost`` is each source's up/down-sampling factor vs natural
    frequency. Plan: one two-phase count agg collapses the corpus to
    |sources| rows; everything after (power, normalize) runs on that
    tiny aggregate via one broadcast of the 1-row denominator — the
    post-agg window in the oracle is |sources|-sized on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    c = c.withColumn("na", F.pow(F.col("n_docs").cast("double"), F.lit(_TEMP_ALPHA)))
    denom = c.agg(
        F.sum("na").alias("denom"), F.sum("n_docs").alias("total")
    )
    return c.crossJoin(F.broadcast(denom)).select(
        "source",
        "n_docs",
        F.round(F.col("na") / F.col("denom"), 6).alias("weight"),
        F.round(
            (F.col("na") / F.col("denom")) * F.col("total") / F.col("n_docs"), 4
        ).alias("boost"),
    )


# ---------------------------------------------------------------------------
# Event-transition (Markov) matrix
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type FROM seq WHERE prev_type IS NOT NULL
), agg AS (
  SELECT prev_type, next_type, count(*) AS n FROM pairs GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       round(n / sum(n) OVER (PARTITION BY prev_type), 6) AS p
FROM agg
"""


@register("event_transition_matrix", _TRANSITION_ORACLE)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    lag each user's (ts, event_id)-ordered stream by one, count
    (prev, next) pairs, normalize rows to probabilities. The sequencing
    window partitions by user_id (bounded per-user state, scale-safe);
    the probability window runs on the |types|^2-row aggregate, not the
    stream."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    agg = pairs.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    wp = W.partitionBy("prev_type")
    return agg.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# Length-bucketed inference batches
# ---------------------------------------------------------------------------

_LB_WIDTH = 64  # tokens per length bucket (integer arithmetic, no log2 float)
_LB_SHARDS = 8
_LB_BATCH = 16  # docs per batch

_LB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         len(string_split_regex(rtrim(text), '\\s+')) AS n_tokens,
         {_sql_hash_bucket('doc_id')} % {_LB_SHARDS} AS shard
  FROM documents
), b AS (
  SELECT doc_id, n_tokens, shard, n_tokens // {_LB_WIDTH} AS bucket,
         row_number() OVER (PARTITION BY n_tokens // {_LB_WIDTH}, shard
                            ORDER BY n_tokens DESC, doc_id) AS rn
  FROM toks
), batched AS (
  SELECT bucket, shard, (rn - 1) // {_LB_BATCH} AS batch_id, n_tokens
  FROM b
)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(shard AS BIGINT) AS shard,
       CAST(batch_id AS BIGINT) AS batch_id,
       count(*) AS n_docs,
       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS padding_tokens
FROM batched GROUP BY 1, 2, 3
"""


@register("length_bucketed_batches", _LB_ORACLE)
def q_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment for padded batch inference: bucket
    documents by token count (64-token integer buckets — no float log2,
    so bucketing is engine-exact), order within bucket by length desc,
    cut batches of 16, and report each batch's padding waste
    (batch_size * max_len - sum_len — the tokens a padded forward pass
    burns for nothing).

    Like sequence packing, the ordering window is sharded: partitionBy
    (bucket, shard) with a hash-derived shard, so no single partition
    ever holds a whole bucket at corpus scale; batches are keyed
    (bucket, shard, batch_id) and stay deterministic because shard and
    intra-shard order are both content-derived.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.rtrim("text"), r"\s+")).alias("n_tokens"),
        (_hash_bucket(F.col("doc_id")) % _LB_SHARDS).alias("shard"),
    ).withColumn("bucket", F.floor(F.col("n_tokens") / _LB_WIDTH))
    w = W.partitionBy("bucket", "shard").orderBy(F.desc("n_tokens"), "doc_id")
    batched = toks.withColumn(
        "batch_id", F.floor((F.row_number().over(w) - 1) / _LB_BATCH)
    )
    return batched.groupBy(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("shard").cast("long").alias("shard"),
        F.col("batch_id").cast("long").alias("batch_id"),
    ).agg(
        F.count("*").alias("n_docs"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.count("*") * F.max("n_tokens") - F.sum("n_tokens"))
        .cast("long")
        .alias("padding_tokens"),
    )


# ---------------------------------------------------------------------------
# Ordered event-sequence pattern detection (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------

_SEQ_PATTERN_ORACLE = """
WITH seqs AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(length(seq) AS BIGINT) AS seq_len,
       regexp_matches(seq, 's.*p') AS signup_then_purchase,
       CAST((length(seq) - length(replace(seq, 'vc', ''))) // 2 AS BIGINT)
         AS n_view_click
FROM seqs
"""


@register("event_sequence_pattern", _SEQ_PATTERN_ORACLE)
def q_event_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence pattern detection per user (the MATCH_RECOGNIZE
    use case expressed with core operators): each user's event stream is
    collapsed to a compact symbol string IN (ts, event_id) ORDER —
    ``array_sort(collect_list(struct(...)))`` keeps the ordering inside
    the aggregate, no window pass — then patterns run as plain string/
    regex expressions: an eventually-follows funnel (signup ... purchase)
    and an immediate-adjacency count (view->click) via non-overlapping
    replace arithmetic. Per-user state is bounded by user history (the
    same contract as sessionization); the shuffle is one hash agg."""
    events = load_table(spark, sf_dir, "events")
    seqs = (
        events.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("ini")
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("e")), lambda x: x["ini"]), ""
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        F.col("seq").rlike("s.*p").alias("signup_then_purchase"),
        F.expr("(length(seq) - length(replace(seq, 'vc', ''))) div 2")
        .cast("long")
        .alias("n_view_click"),
    )


# ---------------------------------------------------------------------------
# Top 3-step event paths
# ---------------------------------------------------------------------------

_TOP_PATHS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type, 1) OVER w AS p1,
         lag(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), paths AS (
  SELECT p2 || '>' || p1 || '>' || event_type AS path
  FROM seq WHERE p2 IS NOT NULL
), agg AS (
  SELECT path, count(*) AS n FROM paths GROUP BY path
), r AS (
  SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rnk FROM agg
)
SELECT path, n, rnk FROM r WHERE rnk <= 10
"""


@register("top_event_paths", _TOP_PATHS_ORACLE)
def q_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step event paths (the classic clickstream path
    report): two lags over the per-user ordered stream make each sliding
    window of 3 a path string, one hash agg counts them, and the top-10
    is a rank window that Spark plans as TakeOrderedAndProject below the
    window (k rows to one partition, never a global sort). Sequencing
    state bounded per user; path-space bounded by |types|^3."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type"),
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    agg = seq.select(
        F.concat_ws(">", "p2", "p1", "event_type").alias("path")
    ).groupBy("path").agg(F.count("*").alias("n"))
    ranked = agg.withColumn(
        "rnk", F.row_number().over(W.orderBy(F.desc("n"), "path"))
    )
    return ranked.filter(F.col("rnk") <= 10).select(
        "path", "n", F.col("rnk").cast("long").alias("rnk")
    )


# ---------------------------------------------------------------------------
# MAD-based robust outlier flags
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
  SELECT round(quantile_cont(value, 0.5), 6) AS m FROM events
), mad AS (
  SELECT m, round(quantile_cont(abs(value - m), 0.5), 6) AS d
  FROM events CROSS JOIN med GROUP BY m
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN abs(e.value - mad.m) > 3 * mad.d THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       mad.m AS median_value,
       mad.d AS mad
FROM events e CROSS JOIN mad
GROUP BY e.event_type, mad.m, mad.d
"""


@register("mad_outlier_events", _MAD_ORACLE)
def q_mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    z-score's heavy-tail-safe sibling (`zscore_outlier_events` is the
    parametric one): global median, then median of absolute deviations,
    then a 3-MAD flag per event, rolled up per type. Median and MAD are
    ROUNDED (6dp) before the flag comparison on both engines — the
    registry determinism convention (percentile interpolation can differ
    by an ulp between engines, which would flip boundary flags). Two
    exact-percentile scalar passes broadcast back over the scan + one
    hash agg; at 100 TB both medians swap to approx_percentile with no
    other change (the same swap documented on winsorize_event_values)."""
    e = load_table(spark, sf_dir, "events")
    med = e.agg(F.round(F.percentile("value", F.lit(0.5)), 6).alias("m"))
    mad = (
        e.crossJoin(F.broadcast(med))
        .agg(
            F.first("m").alias("m"),
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("m")), F.lit(0.5)), 6
            ).alias("d"),
        )
    )
    return (
        e.crossJoin(F.broadcast(mad))
        .groupBy("event_type", "m", "d")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("m")) > 3 * F.col("d"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "n_outliers",
            F.col("m").alias("median_value"),
            F.col("d").alias("mad"),
        )
    )


# ---------------------------------------------------------------------------
# Per-group OLS trend (regression as aggregation)
# ---------------------------------------------------------------------------

_OLS_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
  FROM events GROUP BY 1, 2
), xy AS (
  SELECT event_type,
         CAST(day - min(day) OVER (PARTITION BY event_type) AS BIGINT) AS x,
         y
  FROM daily
), s AS (
  SELECT event_type, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM xy GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * sx)
             / n, 6) AS intercept,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) * 1.0
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
"""


@register("daily_trend_ols", _OLS_ORACLE)
def q_daily_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend over daily event volumes — closed-form OLS
    as PURE AGGREGATION: the slope/intercept/r^2 of y~x need only the
    five sufficient statistics (Sx, Sy, Sxy, Sxx, Syy), all integer-exact
    sums here (x = day offset from the type's first day, y = daily
    count), so the fit is one two-phase hash agg over the tiny daily
    rollup and the result is engine-bit-deterministic before the final
    rounding. The distributed-regression pattern: sufficient statistics
    aggregate; only the O(1) solve happens per group."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("y"))
    w = W.partitionBy("event_type")
    xy = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.min("day").over(w)).cast("long").alias("x"),
        "y",
    )
    s = xy.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)
    return s.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy)) * 1.0
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Composed end-to-end curation pipeline: scrub -> dedup -> gate/split -> pack
# ---------------------------------------------------------------------------

_E2E_BUDGET = 2048
_E2E_SHARDS = 16
_E2E_MIN_TOKENS = 5
_E2E_MAX_TOKENS = 4096


def _e2e_oracle() -> str:
    from vectordbfaiss_spark.operators import scrub as S
    from vectordbfaiss_spark.queries.curation import (
        _sql_split_case,
    )
    from vectordbfaiss_spark.queries.scrub import _DIRTY_SQL

    redacted = (
        f"regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"dirty, '{S.EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{S.SSN_RE}', '<SSN>', 'g'), "
        f"'{S.IPV4_RE}', '<IP>', 'g'), "
        f"'{S.PHONE_RE}', '<PHONE>', 'g')"
    )
    return f"""
WITH d AS (
  SELECT doc_id, {_DIRTY_SQL} AS dirty FROM documents
), clean AS (
  SELECT doc_id, {redacted} AS clean_text FROM d
), norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(clean_text),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
  FROM clean
), uniq AS (
  SELECT doc_id, norm_text,
         row_number() OVER (PARTITION BY md5(norm_text) ORDER BY doc_id) AS rn
  FROM norm
), gated AS (
  SELECT doc_id, len(string_split(norm_text, ' ')) AS n_tokens,
         {_sql_hash_bucket('doc_id')} AS hkey
  FROM uniq
  WHERE rn = 1 AND len(string_split(norm_text, ' '))
        BETWEEN {_E2E_MIN_TOKENS} AND {_E2E_MAX_TOKENS}
), assigned AS (
  SELECT doc_id, n_tokens, hkey,
         {_sql_split_case('hkey')} AS split,
         hkey % {_E2E_SHARDS} AS shard
  FROM gated
), binned AS (
  SELECT split, shard, n_tokens,
         (sum(n_tokens) OVER (PARTITION BY split, shard ORDER BY hkey, doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tokens)
           // {_E2E_BUDGET} AS bin_id
  FROM assigned
)
SELECT split, CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
       CAST(count(DISTINCT bin_id) AS BIGINT) AS n_bins,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM binned GROUP BY split, shard
"""


@register("pipeline_scrub_dedup_pack", _e2e_oracle())
def q_pipeline_scrub_dedup_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED training-data pipeline, one logical plan end to end:
    PII scrub (regex redaction, ``operators/scrub.py``) -> text
    normalization -> exact dedup keep-first-by-id over the normalized
    digest -> token-count quality gate -> deterministic 80/10/10 split
    assignment -> shard-parallel sequence packing -> per-(split, shard)
    bin report. Every stage exists as its own verified registry query
    (`pii_redact_docs`, `text_normalize_docs`, `dedup_exact_stats`,
    `train_test_split_assign`, `sequence_packing_bins`); this entry is
    the integration witness that the stages compose into ONE Catalyst
    plan with the expected shuffle structure: a single window exchange
    on the dedup digest, then one on (split, shard) for the packing
    cumsum — no driver round-trips between stages, no materialization.

    Scale shape: scrub/normalize/gate are codegen'd maps fused into the
    scan; dedup is a key-partitioned window (rank filter on the RAW
    rank, the InferWindowGroupLimit-safe shape); packing windows are
    bounded at 1/(3*16) of the survivors each. At 100 TB each stage
    stays a map or a key-partitioned exchange — the composition adds
    zero driver synchronization over running the stages separately.
    """
    from pyspark.sql import Window as W

    from vectordbfaiss_spark.operators import scrub as S
    from vectordbfaiss_spark.queries.curation import _hash_bucket, _split_expr
    from vectordbfaiss_spark.queries.scrub import _dirty_col

    docs = load_table(spark, sf_dir, "documents")
    clean = docs.select(
        "doc_id", S.redact(_dirty_col()).alias("clean_text")
    )
    norm = clean.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("clean_text"), "[^a-z0-9 ]", " "),
                " +",
                " ",
            )
        ).alias("norm_text"),
    )
    dw = W.partitionBy(F.md5("norm_text")).orderBy("doc_id")
    uniq = (
        norm.withColumn("rn", F.row_number().over(dw))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    gated = uniq.select(
        "doc_id",
        F.size(F.split("norm_text", " ")).alias("n_tokens"),
        _hash_bucket(F.col("doc_id")).alias("hkey"),
    ).filter(
        F.col("n_tokens").between(_E2E_MIN_TOKENS, _E2E_MAX_TOKENS)
    )
    assigned = gated.select(
        "doc_id",
        "n_tokens",
        "hkey",
        _split_expr(F.col("hkey")).alias("split"),
        (F.col("hkey") % _E2E_SHARDS).alias("shard"),
    )
    pw = (
        W.partitionBy("split", "shard")
        .orderBy("hkey", "doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    binned = assigned.select(
        "split",
        "shard",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(pw) - F.col("n_tokens")) / _E2E_BUDGET
        ).alias("bin_id"),
    )
    return binned.groupBy("split", F.col("shard").cast("long").alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("bin_id").alias("n_bins"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
