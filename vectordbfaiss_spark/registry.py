"""Query registry: every implemented operator as a named (PySpark, oracle
SQL) pair — the driver contract surface (see ``__spark_entry__.py``).

Conventions that make the DuckDB hash-compare deterministic:
- every computed column is aliased IDENTICALLY in Spark and SQL;
- float outputs are ``round(x, 6)`` (money ``round(x, 4)``) on BOTH sides —
  double math agrees to ~1e-12 across engines, rounding removes ulp noise;
- rankings round scores BEFORE ranking and tie-break on an id so order is
  engine-independent;
- timestamps in outputs are formatted to strings (UTC) — avoids tz/epoch
  representation drift between Spark and DuckDB.

Each entry documents the SURVEY.md §2 operator ids it covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from vectordbfaiss_spark.operators.topk import topk_search
from vectordbfaiss_spark.session import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Vector search (reference core: server.js:45-61, 217-265)
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
    FROM embeddings WHERE vec_id < 10
), s AS (
    SELECT q.query_id, e.vec_id,
           round(
             list_dot_product(q.qv, e.embedding::DOUBLE[])
             / (sqrt(list_dot_product(q.qv, q.qv))
                * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
             6) AS score
    FROM q CROSS JOIN embeddings e
), r AS (
    SELECT query_id, vec_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
    FROM s
)
SELECT r.query_id, r.vec_id, r.score, r.rnk, d.text
FROM r LEFT JOIN documents d ON r.vec_id = d.doc_id
WHERE r.rnk <= 5
"""


@register("topk_search", _TOPK_ORACLE)
def q_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: exact cosine top-k + text hydration (W1+J1+J3+A2-A4+K1).

    Reference: the /search read path server.js:217-265; scoring kernel
    server.js:45-61. First 10 embeddings double as the query batch, k=5.
    Scores rounded to 6dp BEFORE ranking for cross-engine determinism.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    from vectordbfaiss_spark.operators.topk import score_pairs, topk

    scored = score_pairs(queries, emb).withColumn("score", F.round("score", 6))
    winners = topk(scored, k=5).withColumnRenamed("rank", "rnk")
    # two-step broadcast hydration (see operators.topk.topk_search): semi-join
    # pulls the Q*k matching doc rows, then a broadcast left-outer preserves
    # winners with missing docs (server.js:231-248 semantics).
    winner_ids = winners.select("vec_id").distinct()
    hits = docs.select("doc_id", "text").join(
        F.broadcast(winner_ids), F.col("doc_id") == winner_ids.vec_id, "left_semi"
    )
    return winners.join(
        F.broadcast(hits), winners.vec_id == hits.doc_id, "left"
    ).select("query_id", "vec_id", "score", "rnk", "text")


# ---------------------------------------------------------------------------
# Relational aggregation (SURVEY §2.4 — scaled engine surface)
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                        AS sum_qty,
       round(sum(l_extendedprice), 4)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
       round(avg(l_quantity), 6)                                        AS avg_qty,
       round(avg(l_extendedprice), 6)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE)
def q_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: hash aggregate with map-side
    partial aggregation (free in Spark; the reference's only aggregate is
    COUNT(*), server.js:67).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
