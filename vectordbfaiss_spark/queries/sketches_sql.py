"""Mergeable-sketch aggregation (HLL) and the SQL-string API surface.

HLL sketches are the 100 TB answer to distinct counting: partials built
per partition merge associatively, so re-aggregation across days/shards
never re-touches raw ids (the same reason the reference's COUNT(*) at
server.js:67,149 scales and its in-memory index does not). Sketch bytes
are engine-private, so the registry entry is rows-only; the error bound
against exact countDistinct is pinned in tests/test_approx.py.

The SQL query demonstrates the other half of the API surface: the entire
engine is reachable through ``spark.sql`` strings over registered views —
LATERAL VIEW posexplode here, since array explode positions are the one
construct the DataFrame queries express only via ``F.posexplode``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import load_table

# ---------------------------------------------------------------------------
# HLL sketch build -> merge -> estimate (rows-only: sketch internals are
# engine-private; tests pin the error bound vs exact)
# ---------------------------------------------------------------------------


_HLL_MERGE_ORACLE = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS merge_within_bound
FROM events GROUP BY event_type
"""


@register("hll_distinct_users_daily_merge", _HLL_MERGE_ORACLE)
def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via two-level HLL merge: sketch per
    (event_type, day) partial, then union-merge across days — the
    re-aggregatable rollup pattern. The merged estimate is engine-specific
    (Datasketches HLL), so the oracle checks the exact count plus the
    materialized error-bound claim: the two-level MERGED estimate must
    land within 15% of exact (default lgConfigK=12 sketches are ~2-3%
    rsd; the margin covers merge inflation).

    Scale plan: raw user_ids leave the mappers already sketched (fixed
    ~KB per group instead of a distinct shuffle of every id); day-level
    partials can be persisted and merged incrementally — recomputing a
    30-day distinct count touches 30 sketches, zero raw rows.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
    )
    merged = (
        daily.groupBy("event_type")
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            "event_type",
            F.hll_sketch_estimate("merged").alias("est_users"),
        )
    )
    return (
        merged.join(
            e.groupBy("event_type").agg(
                F.countDistinct("user_id").alias("exact_users")
            ),
            "event_type",
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= 0.15 * F.col("exact_users")
            ).alias("merge_within_bound"),
        )
    )


# ---------------------------------------------------------------------------
# SQL-string API surface: LATERAL VIEW posexplode over a registered view
# ---------------------------------------------------------------------------

_LATERAL_ORACLE = r"""
WITH toks AS (
  SELECT unnest(l) AS tok, generate_subscripts(l, 1) - 1 AS pos
  FROM (SELECT string_split_regex(trim(text), '\s+') AS l FROM documents)
)
SELECT tok,
       count(*) AS n_occurrences,
       CAST(sum(pos) AS BIGINT) AS pos_sum
FROM toks
WHERE tok <> ''
GROUP BY tok
HAVING count(*) >= 200
"""


@register("sql_lateral_view_tokens", _LATERAL_ORACLE)
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequencies with positional sums, written as a pure SQL string
    (LATERAL VIEW posexplode) over a registered temp view — proving the
    spark.sql surface reaches the same engine as the DataFrame API (the
    two compile to identical plans; SURVEY §7 design stance).
    """
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__sql_docs_v"
    )
    return spark.sql(r"""
        SELECT tok,
               count(*) AS n_occurrences,
               CAST(sum(pos) AS BIGINT) AS pos_sum
        FROM __sql_docs_v
        LATERAL VIEW posexplode(split(trim(text), '\\s+')) t AS pos, tok
        WHERE tok != ''
        GROUP BY tok
        HAVING count(*) >= 200
    """)


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters — unlike HLL, the CMS is fully
# deterministic given the hash family, and md5 is shared with DuckDB, so
# the WHOLE sketch (build -> merge -> point query) is oracle-checkable.
# ---------------------------------------------------------------------------

_CMS_W = 64  # deliberately small so collisions actually happen at test SF
_CMS_D = 4


def _cms_sql_bucket(tok_expr: str, d_expr: str) -> str:
    """DuckDB replica of the (tok, depth) -> bucket hash: md5 6-hex-prefix
    of 'tok#d', mod width (same digit-arithmetic trick as curation.py)."""
    from vectordbfaiss_spark.queries.curation import _sql_hash_bucket

    return f"({_sql_hash_bucket(f'({tok_expr} || {chr(39)}#{chr(39)} || CAST({d_expr} AS VARCHAR))')} % {_CMS_W})"


_CMS_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(rtrim(text), '\\s+')) AS tok FROM documents
), depths AS (
  SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(d)
), cms AS (
  SELECT d, {_cms_sql_bucket('tok', 'd')} AS bucket, count(*) AS cnt
  FROM toks CROSS JOIN depths
  GROUP BY d, {_cms_sql_bucket('tok', 'd')}
), vocab AS (
  SELECT DISTINCT tok FROM toks
), probes AS (
  SELECT v.tok, dd.d, {_cms_sql_bucket('v.tok', 'dd.d')} AS bucket
  FROM vocab v CROSS JOIN depths dd
), est AS (
  SELECT p.tok, CAST(min(c.cnt) AS BIGINT) AS est
  FROM probes p JOIN cms c ON p.d = c.d AND p.bucket = c.bucket
  GROUP BY p.tok
), ranked AS (
  SELECT tok, est, row_number() OVER (ORDER BY est DESC, tok) AS rnk
  FROM est
)
SELECT tok, est, CAST(rnk AS BIGINT) AS rnk FROM ranked WHERE rnk <= 20
"""


@register("cms_heavy_hitters", _CMS_ORACLE)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over document tokens: build a d=4,
    w=64 CMS (rows (d, bucket, cnt) — merge across shards is a plain
    groupBy-sum, associative like the HLL merge), then answer top-20 by
    the sketch's min-over-rows point estimate. The sketch table is d*w
    rows regardless of corpus size — THAT is the scale story: 100 TB of
    tokens reduce to 256 mergeable counters, and the ranking never
    touches exact counts. Estimates are CMS-biased (>= truth, pinned in
    tests/test_approx.py); determinism comes from the md5 hash family."""
    from vectordbfaiss_spark.queries.curation import _hash_bucket
    from vectordbfaiss_spark.session import fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        F.explode(F.split(F.rtrim("text"), r"\s+")).alias("tok")
    )
    depths = spark.range(_CMS_D).select(F.col("id").cast("int").alias("d"))

    def bucket(tok_col, d_col):
        return (
            _hash_bucket(F.concat(tok_col, F.lit("#"), d_col.cast("string")))
            % _CMS_W
        )

    # aggregate term frequencies FIRST (the only token-volume shuffle),
    # then expand the vocab-sized tf table by d — not the raw token stream
    tf = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    cms = (
        tf.crossJoin(F.broadcast(depths))
        .groupBy("d", bucket(F.col("tok"), F.col("d")).alias("bucket"))
        .agg(F.sum("tf").alias("cnt"))
    )
    vocab = tf.select("tok")
    probes = vocab.crossJoin(F.broadcast(depths)).select(
        "tok", "d", bucket(F.col("tok"), F.col("d")).alias("bucket")
    )
    est = (
        probes.join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("tok")
        .agg(F.min("cnt").cast("long").alias("est"))
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("est"), F.asc("tok"))
    # rank filter before the long cast so InferWindowGroupLimit bounds
    # the single-partition window (the cast-inside-the-window form
    # defeated the rule; see queries/ranking.py bm25)
    return (
        est.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("tok", "est", F.col("rnk").cast("long").alias("rnk"))
    )


# ---------------------------------------------------------------------------
# Python UDTF surface (Spark 4): lateral table function. The chunk-span
# arithmetic mirrors the reference chunker's stride semantics
# (embed.js:183-195 — window `size`, advance `step`, stop once a chunk
# reaches the end), so the oracle is closed-form over generate_series.
# ---------------------------------------------------------------------------

_CHUNK_SIZE, _CHUNK_STEP = 40, 30

_UDTF_ORACLE = f"""
WITH spans AS (
  SELECT doc_id,
         unnest(generate_series(
           0,
           CAST(greatest(ceil((n_chars - {_CHUNK_SIZE}.0) / {_CHUNK_STEP}.0), 0) AS BIGINT)
         )) AS i,
         n_chars
  FROM documents
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {_CHUNK_STEP} AS BIGINT) AS start_char,
       CAST(least(i * {_CHUNK_STEP} + {_CHUNK_SIZE}, n_chars) AS BIGINT) AS end_char
FROM spans
"""


@register("udtf_chunk_spans", _UDTF_ORACLE)
def q_udtf_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function) in a LATERAL
    join: one input row -> variable output rows, the API surface for
    row-expanding custom logic that doesn't fit a scalar UDF or a single
    explode. The UDTF emits the reference chunker's span arithmetic
    (embed.js:183-195 stride semantics: last chunk emitted once the
    window reaches the end); the oracle reproduces it in closed form
    with generate_series, so the lateral plumbing is hash-verified.
    Arrow-batched like any pandas path; each row's expansion is local,
    so the operator is a pure flatMap at scale — no shuffle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: long, start_char: long, end_char: long")
    class ChunkSpans:
        def eval(self, n_chars: int, size: int, step: int):
            if n_chars is None or n_chars <= 0:
                return
            start, idx = 0, 0
            while start < n_chars:
                yield idx, start, min(start + size, n_chars)
                if start + size >= n_chars:
                    break
                start += step
                idx += 1

    spark.udtf.register("vdbf_chunk_spans", ChunkSpans)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    docs.createOrReplaceTempView("vdbf_udtf_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, s.chunk_idx, s.start_char, s.end_char
        FROM vdbf_udtf_docs d,
             LATERAL vdbf_chunk_spans(CAST(d.n_chars AS INT),
                                      {_CHUNK_SIZE}, {_CHUNK_STEP}) s
        """
    )
