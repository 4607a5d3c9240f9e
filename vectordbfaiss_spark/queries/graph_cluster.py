"""Duplicate-group clustering: blocking keys -> candidate edges ->
connected components -> per-group stats.

This is the step between pairwise near-dup detection (queries/dedup.py)
and canonical-document selection in a training-data pipeline: pairs only
say "a~b"; choosing one survivor per GROUP needs the transitive closure.
The oracle is a DuckDB recursive CTE computing the same closure, so the
iterative Spark algorithm is hash-checked end-to-end — not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from vectordbfaiss_spark.operators.graph import connected_components
from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import load_table

_CC_ORACLE = r"""
WITH RECURSIVE
d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
keys AS (
  SELECT doc_id,
         array_to_string(list_slice(w, 1, 5), ' ') AS k1,
         array_to_string(list_slice(list_reverse(w), 1, 5), ' ') AS k2
  FROM d
),
b1 AS (
  SELECT k1 AS key, doc_id,
         row_number() OVER (PARTITION BY k1 ORDER BY doc_id) AS rn
  FROM keys
),
b2 AS (
  SELECT k2 AS key, doc_id,
         row_number() OVER (PARTITION BY k2 ORDER BY doc_id) AS rn
  FROM keys
),
edges AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM b1 a JOIN b1 b ON a.key = b.key AND b.rn = a.rn + 1
  UNION
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM b2 a JOIN b2 b ON a.key = b.key AND b.rn = a.rn + 1
),
sym AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.id
),
comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)
SELECT component, count(*) AS n_docs, max(id) AS max_doc
FROM comp GROUP BY component
"""


def _chain_edges(keyed: DataFrame, key_col: str) -> DataFrame:
    """Linear-chain candidate edges inside each blocking bucket:
    consecutive doc_ids per key. A bucket of k docs yields k-1 edges — the
    transitive closure reconstructs the group, so the quadratic
    all-pairs-in-bucket blowup never materializes (critical when a
    boilerplate prefix puts 10^6 docs in one bucket)."""
    w = W.partitionBy(key_col).orderBy("doc_id")
    rn = keyed.select(
        key_col, "doc_id", F.row_number().over(w).alias("rn")
    )
    nxt = rn.select(
        F.col(key_col).alias("__nk"),
        F.col("doc_id").alias("dst"),
        (F.col("rn") - 1).alias("rn2"),
    )
    return rn.join(
        nxt, (F.col(key_col) == F.col("__nk")) & (F.col("rn") == F.col("rn2"))
    ).select(F.col("doc_id").alias("src"), "dst")


@register("dedup_cluster_components", _CC_ORACLE)
def q_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group discovery: two blocking keys (first-5 / last-5
    words), chain edges per bucket, connected components, per-component
    rollup. A doc sharing its prefix with one doc and its suffix with
    another fuses all three into one group — that transitivity is exactly
    what pair-level dedup cannot express.

    Scale plan: blocking + chaining keeps the edge set LINEAR in corpus
    size; the component step is O(log diameter) shuffles (pointer jumping,
    operators/graph.py); the recursive-CTE oracle checks the closure
    exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    keyed = docs.select(
        "doc_id",
        F.array_join(F.slice(words, 1, 5), " ").alias("k1"),
        F.array_join(F.slice(F.reverse(words), 1, 5), " ").alias("k2"),
    )
    edges = (
        _chain_edges(keyed.select("doc_id", "k1"), "k1")
        .union(_chain_edges(keyed.select("doc_id", "k2"), "k2"))
        .distinct()
    )
    comp = connected_components(edges)
    return comp.groupBy("component").agg(
        F.count("*").alias("n_docs"),
        F.max("id").alias("max_doc"),
    )
