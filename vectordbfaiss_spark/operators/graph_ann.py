"""Graph-based approximate nearest neighbor search (the HNSW/NSG family,
single-layer form): best-first BEAM SEARCH over a published kNN edge
artifact.

Completes the engine's ANN taxonomy — flat exact scan (operators/topk.py),
IVF partition pruning (plans/ivf.py), PQ/IVFPQ compression (plans/pq.py),
LSH bucketing (operators/lsh.py) — with the graph-traversal family every
modern vector store ships. The reference serves the flat scan only
(server.js:53-60); graph ANN is the standard scale path when the index
must live on disk and queries need sub-linear probes without training a
quantizer.

Spark-first shape: the traversal is bulk-synchronous — each round expands
the current per-query beam through ONE equi-join against the src-
partitioned edge artifact, scores only the newly-discovered candidates
against the (Q-bounded, broadcast) query block, and keeps the top-`beam`
per query with a rank-filter window (WindowGroupLimit-eligible). All
frontier/visited state is O(Q * visited) rows — query-bounded, never
corpus-bounded; the corpus-sized tables (edges, embeddings) are only ever
the build side of candidate-lookup equi-joins. Rounds are FIXED (no
convergence action), so the plan is a static 10-stage DAG with one eager
checkpoint per round to keep lineage flat — the pagerank/BPE loop
discipline.

Entry points are a hash-spread sample scaled with the corpus
(max(16, N/32) here, so the recall floor holds from sf0.001 through
sf0.1 without retuning). At production scale the entry set comes from a
coarse quantizer instead — enter at the members of the nprobe closest IVF
cells (plans/ivf.py supplies both the centroids and the assignment) — or
from the upper layers of a hierarchical graph; corpus-proportional random
entries are the honest single-layer form at fixture scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from vectordbfaiss_spark.functions.vector import cosine_similarity


def _score_against_queries(
    nodes: DataFrame, queries: DataFrame, emb: DataFrame
) -> DataFrame:
    """(query_id, vec_id) -> + score: one lookup join into the embedding
    store (candidates are the small probe side) then a broadcast join of
    the Q-bounded query block for the cosine."""
    with_vec = nodes.join(emb.select("vec_id", "embedding"), "vec_id")
    return with_vec.join(F.broadcast(queries), "query_id").select(
        "query_id",
        "vec_id",
        F.round(cosine_similarity("embedding", "query_vec"), 6).alias("score"),
    )


def graph_beam_search(
    queries: DataFrame,
    edges: DataFrame,
    emb: DataFrame,
    beam: int = 24,
    rounds: int = 10,
    n_entries: int | None = None,
) -> DataFrame:
    """All visited-and-scored nodes per query after ``rounds`` of beam
    expansion: (query_id, vec_id, score). Callers take their top-k and/or
    check self-reachability from this one frame.

    ``queries`` is (query_id, query_vec) and must be query-bounded (the
    broadcast contract of operators/topk.py). ``edges`` is the directed
    kNN artifact (src, dst). ``n_entries`` defaults to max(16, N/32) —
    see the module docstring for the production entry-point story.
    """
    if n_entries is None:
        # only pay the corpus scan when the caller didn't size the entry
        # set explicitly
        n_entries = max(16, emb.count() // 32)
    entries = (
        emb.select("vec_id")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(n_entries)
    )
    visited = _score_against_queries(
        entries.crossJoin(F.broadcast(queries.select("query_id"))),
        queries,
        emb,
    ).localCheckpoint(eager=True)

    rank_w = W.partitionBy("query_id").orderBy(F.desc("score"), "vec_id")
    for _ in range(rounds):
        # top-`beam` of everything seen so far; filter on the RAW rank so
        # InferWindowGroupLimit bounds the window to beam rows per query
        frontier = (
            visited.withColumn("rnk", F.row_number().over(rank_w))
            .filter(F.col("rnk") <= beam)
            .select("query_id", "vec_id")
        )
        cand = (
            frontier.join(edges.select(F.col("src").alias("vec_id"), "dst"), "vec_id")
            .select("query_id", F.col("dst").alias("vec_id"))
            .distinct()
            .join(visited.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_anti")
        )
        scored = _score_against_queries(cand, queries, emb)
        visited = visited.unionByName(scored).localCheckpoint(eager=True)
    return visited
