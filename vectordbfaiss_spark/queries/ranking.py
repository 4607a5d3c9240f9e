"""Keyword / hybrid retrieval ranking — the search-engine half of a vector
store. The reference ranks purely by cosine (server.js:45-61); a production
retrieval stack pairs that with lexical ranking (BM25) and fuses the two
rankings (reciprocal rank fusion), plus metadata-filtered ANN and weighted
corpus sampling. All four are shuffle-light DataFrame plans:

- BM25 is one explode + two hash aggregates + a broadcast join of the
  vocabulary-sized statistics table (same shape as tfidf_top_terms).
- RRF is a full-outer join of two independently-computed top-20 lists —
  each list is tiny (Q*20 rows), so the fusion join is broadcastable.
- Filtered search prunes the corpus BEFORE scoring (filter pushdown to the
  parquet scan, then a semi-join) — at 100 TB the filter is the difference
  between scoring 100% and 40% of the corpus.
- Weighted sampling (Efraimidis-Spirakis A-ES) is a pure map-side key
  computation + one global top-k: no shuffle beyond TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import Window as W

from vectordbfaiss_spark.operators.topk import score_topk_vectorized
from vectordbfaiss_spark.queries.curation import _HEX_SPAN, _hash_bucket, _sql_hash_bucket
from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import fan_out, load_table

_K1 = 1.2
_B = 0.75
_BM25_TERMS = ("vector", "hash", "join")

# BM25 with the Lucene/ATIRE idf form ln(1 + (N - df + 0.5)/(df + 0.5))
# (always positive). The tf-norm and idf are written with IDENTICAL
# association in Spark and SQL so double math agrees to ~1e-12; round(6)
# before ranking removes the ulp noise.
_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(rtrim(text), '\\s+')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl
), df AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM toks
  WHERE tok IN {_BM25_TERMS!r}
  GROUP BY tok
), scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * {_K1 + 1.0}) / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
         ) AS raw
  FROM tf
  JOIN df ON tf.tok = df.tok
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
), ranked AS (
  SELECT doc_id, round(raw, 6) AS bm25,
         row_number() OVER (ORDER BY round(raw, 6) DESC, doc_id) AS rnk
  FROM scored
)
SELECT doc_id, bm25, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 10
"""


@register("bm25_doc_ranking", _BM25_ORACLE)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for the query {vector, hash, join}
    (k1=1.2, b=0.75, Lucene idf). Plan: one explode feeds three hash
    aggregates (tf, dl, df); df (restricted to the QUERY terms before
    aggregation — |terms| rows) and the scalar (avgdl, N) row are
    bounded and broadcast. The per-doc length table dl is CORPUS-grain,
    so its join is explicitly SHUFFLE_HASH — Catalyst's post-aggregate
    estimate otherwise plans it as a broadcast build, which OOMs at
    corpus scale (measured at the 100x step, SCALE.md). The final top-10
    is a TakeOrderedAndProject, not a full sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id", F.explode(F.split(F.rtrim("text"), r"\s+")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.avg("dl").alias("avgdl"), F.count("*").alias("n_docs"))
    df = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("tok")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    per_term = (
        tf.join(F.broadcast(df), "tok")
        .join(dl.hint("SHUFFLE_HASH"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (_K1 + 1.0))
                / (
                    F.col("tf")
                    + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("contrib"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(
        F.round(F.sum("contrib"), 6).alias("bm25")
    )
    w = W.orderBy(F.desc("bm25"), F.asc("doc_id"))
    # rank filter BEFORE the long cast: InferWindowGroupLimit only fires
    # on Filter(rank_attr <= k) directly over the Window — casting inside
    # the window projection hid the rank attribute and the global window
    # funneled the whole scored corpus through one task (found by the
    # plan-inventory test; the cast moves to the output projection).
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("doc_id", "bm25", F.col("rnk").cast("long").alias("rnk"))
    )


_RRF_K = 60
_RRF_QUERIES = ((0, "vector"), (1, "join"), (2, "stream"))
_RRF_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _RRF_QUERIES)

_RRF_ORACLE = f"""
WITH qm AS (
  SELECT * FROM (VALUES {_RRF_VALUES}) AS t(query_id, term)
), q AS (
  SELECT qm.query_id, qm.term, e.embedding::DOUBLE[] AS qv
  FROM qm JOIN embeddings e ON qm.query_id = e.vec_id
), vs AS (
  SELECT q.query_id, e.vec_id,
         round(
           list_dot_product(q.qv, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
           6) AS score
  FROM q CROSS JOIN embeddings e
), vrank AS (
  SELECT query_id, vec_id AS doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS vrnk
  FROM vs
), toks AS (
  SELECT doc_id, unnest(string_split_regex(rtrim(text), '\\s+')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
), krank AS (
  SELECT qm.query_id, tf.doc_id,
         row_number() OVER (PARTITION BY qm.query_id ORDER BY tf.tf DESC, tf.doc_id) AS krnk
  FROM qm JOIN tf ON qm.term = tf.tok
), fused AS (
  SELECT coalesce(v.query_id, k.query_id) AS query_id,
         coalesce(v.doc_id, k.doc_id) AS doc_id,
         round(coalesce(1.0 / ({_RRF_K} + v.vrnk), 0.0)
               + coalesce(1.0 / ({_RRF_K} + k.krnk), 0.0), 6) AS rrf
  FROM (SELECT * FROM vrank WHERE vrnk <= 20) v
  FULL OUTER JOIN (SELECT * FROM krank WHERE krnk <= 20) k
    ON v.query_id = k.query_id AND v.doc_id = k.doc_id
), ranked AS (
  SELECT query_id, doc_id, rrf,
         row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk
  FROM fused
)
SELECT query_id, doc_id, rrf, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 10
"""


@register("hybrid_rrf_fusion", _RRF_ORACLE)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: cosine top-20 and keyword(term-frequency) top-20
    per query, fused with reciprocal rank fusion 1/(60+rank). The two
    rankings are computed independently (vector side reuses the
    vectorized top-k kernel; keyword side is the tf aggregate), then the
    fusion is a full-outer join of two Q*20-row lists — broadcastable at
    any corpus size since the lists are bounded by Q*k, not the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    qm = spark.createDataFrame(list(_RRF_QUERIES), "query_id LONG, term STRING")
    queries = (
        qm.join(emb, qm.query_id == emb.vec_id)
        .select("query_id", F.col("embedding").alias("query_vec"))
    )
    vrank = (
        score_topk_vectorized(queries, emb, k=20)
        .select("query_id", F.col("vec_id").alias("doc_id"), F.col("rank").alias("vrnk"))
    )
    toks = fan_out(docs).select(
        "doc_id", F.explode(F.split(F.rtrim("text"), r"\s+")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    wk = W.partitionBy("query_id").orderBy(F.desc("tf"), F.asc("doc_id"))
    krank = (
        F.broadcast(qm)
        .join(tf, qm.term == tf.tok)
        .select("query_id", "doc_id", "tf")
        .withColumn("krnk", F.row_number().over(wk))
        .filter(F.col("krnk") <= 20)
        .select("query_id", "doc_id", "krnk")
    )
    # full outer can't broadcast either side; hint SHUFFLE_HASH so the
    # bounded Q*20 lists hash-join after the shuffle instead of paying
    # SortMergeJoin's per-partition sorts
    fused = (
        vrank.hint("SHUFFLE_HASH").join(krank, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("vrnk")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("krnk")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    # rank filter before the cast: WindowGroupLimit then also runs in
    # Partial mode BEFORE the shuffle, so each map task forwards only
    # its local top-10 per query (see bm25 above for the rule's shape)
    return (
        fused.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= 10)
        .select(
            "query_id", "doc_id", "rrf",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


_FILTERED_ORACLE = """
WITH allowed AS (
  SELECT doc_id, lang FROM documents WHERE lang = 'en' AND n_chars >= 200
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 10
), corpus AS (
  SELECT e.vec_id, a.lang, e.embedding::DOUBLE[] AS v
  FROM embeddings e JOIN allowed a ON e.vec_id = a.doc_id
), s AS (
  SELECT q.query_id, c.vec_id, c.lang,
         round(
           list_dot_product(q.qv, c.v)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))),
           6) AS score
  FROM q CROSS JOIN corpus c
), r AS (
  SELECT query_id, vec_id, lang, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
  FROM s
)
SELECT query_id, vec_id, lang, score, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 5
"""


@register("filtered_topk_search", _FILTERED_ORACLE)
def q_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search: restrict the corpus to documents
    with lang='en' AND n_chars>=200 BEFORE scoring (pre-filter ANN).
    The predicate pushes down to the documents parquet scan and the
    semi-join prunes the embedding corpus before the expensive cosine
    kernel runs — at scale this skips scoring the filtered-out fraction
    entirely, instead of post-filtering a too-short result list
    (the classic filtered-ANN correctness trap)."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    allowed = docs.filter((F.col("lang") == "en") & (F.col("n_chars") >= 200)).select(
        "doc_id", "lang"
    )
    corpus = emb.join(
        allowed.select("doc_id"), emb.vec_id == F.col("doc_id"), "left_semi"
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    winners = score_topk_vectorized(queries, corpus, k=5).withColumnRenamed(
        "rank", "rnk"
    )
    return (
        # broadcast the |queries| x k WINNERS into the doc-grain `allowed`
        # frame — `allowed` scales with the corpus and must stay probe-side
        allowed.join(F.broadcast(winners), winners.vec_id == allowed.doc_id)
        .select(
            "query_id", "vec_id", "lang", "score", F.col("rnk").cast("long").alias("rnk")
        )
    )


# Efraimidis-Spirakis A-ES weighted sampling without replacement: each row
# gets key = -ln(u)/w with u ~ Uniform(0,1]; the k smallest keys are an
# exact weighted sample. u is derived from md5(doc_id) so the sample is
# reproducible across runs, engines, and partitionings.
_WSAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         round(-ln(({_sql_hash_bucket('doc_id')} + 1.0) / {_HEX_SPAN})
               / n_chars, 6) AS es_key
  FROM documents
), ranked AS (
  SELECT doc_id, lang, n_chars, es_key,
         row_number() OVER (ORDER BY es_key ASC, doc_id) AS rnk
  FROM keyed
)
SELECT doc_id, lang, n_chars, es_key, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 50
"""


@register("weighted_sample_docs", _WSAMPLE_ORACLE)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample of 50 documents, weight = n_chars (longer docs
    proportionally likelier), via deterministic Efraimidis-Spirakis keys.
    Entirely map-side (md5 + arithmetic per row) followed by one global
    top-k — Catalyst plans the rnk<=50 window over an empty partition
    spec as a single-shuffle TakeOrderedAndProject-like sort; no
    driver-side randomness, so resumable/idempotent at any scale."""
    d = load_table(spark, sf_dir, "documents")
    u = (_hash_bucket(F.col("doc_id")) + 1.0) / float(_HEX_SPAN)
    keyed = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(-F.log(u) / F.col("n_chars"), 6).alias("es_key"),
    )
    w = W.orderBy(F.asc("es_key"), F.asc("doc_id"))
    # rank filter before the cast so InferWindowGroupLimit bounds the
    # single-partition window to 50 rows per upstream partition (the
    # cast-inside-the-window form defeated the rule; see bm25 above)
    return (
        keyed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 50)
        .select(
            "doc_id", "lang", "n_chars", "es_key",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


_MMR_ORACLE = """
WITH RECURSIVE q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 5
), s AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product(q.qv, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
           6) AS rel
  FROM q CROSS JOIN embeddings e
), cand AS (
  SELECT query_id, vec_id, rel FROM (
    SELECT s.*, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rel DESC, vec_id) rn FROM s
  ) WHERE rn <= 20
), cvec AS (
  SELECT c.query_id, c.vec_id, e.embedding::DOUBLE[] AS v
  FROM cand c JOIN embeddings e USING (vec_id)
), pairsim AS (
  SELECT a.query_id, a.vec_id AS ida, b.vec_id AS idb,
         round(list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
  FROM cvec a JOIN cvec b ON a.query_id = b.query_id
), sel AS (
  (SELECT query_id, CAST(1 AS BIGINT) AS sel_rank, vec_id, rel,
          round(0.7 * rel, 6) AS mmr_score, [vec_id] AS chosen
   FROM (SELECT c.*, row_number() OVER (PARTITION BY query_id
                                        ORDER BY round(0.7 * rel, 6) DESC,
                                                 vec_id) rn
         FROM cand c)
   WHERE rn = 1)
  UNION ALL
  SELECT s.query_id, s.sel_rank + 1, p.vec_id, p.rel, p.mmr_score,
         list_append(s.chosen, p.vec_id)
  FROM sel s, LATERAL (
    SELECT c.vec_id, c.rel,
           round(0.7 * c.rel - (1.0 - 0.7) * (
             SELECT max(ps.sim) FROM pairsim ps
             WHERE ps.query_id = s.query_id AND ps.ida = c.vec_id
               AND list_contains(s.chosen, ps.idb)), 6) AS mmr_score
    FROM cand c
    WHERE c.query_id = s.query_id AND NOT list_contains(s.chosen, c.vec_id)
    ORDER BY mmr_score DESC, c.vec_id
    LIMIT 1) p
  WHERE s.sel_rank < 5
)
SELECT query_id, vec_id, rel, mmr_score, sel_rank FROM sel
"""


@register("mmr_rerank_topk", _MMR_ORACLE)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 from each query's cosine top-20 (lam=0.7).
    Greedy selection is sequential per query but bounded (20 candidates),
    so it runs as applyInPandas per query_id — the candidate generation
    is the same vectorized brute-force kernel as topk_search. The oracle
    replays the greedy argmax-with-state recursion as a DuckDB recursive
    CTE (seed = best lam*rel pick; each step a LATERAL argmax over the
    remaining candidates with max-similarity-to-chosen), with the same
    6dp rounding discipline at every step, so the full selection sequence
    is hash-checked; tests/test_mmr.py additionally pins the kernel
    against an independent numpy reference."""
    from vectordbfaiss_spark.operators.rerank import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cand = (
        score_topk_vectorized(queries, emb, k=20)
        .withColumnRenamed("score", "rel")
        .drop("rank")
        .join(emb.select("vec_id", "embedding"), "vec_id")
    )
    return mmr_rerank(cand, k=5, lam=0.7)
