"""IVF-style batch similarity index — the north-star "DataFrame batch index
build" (BASELINE.json; SURVEY §4.3).

The reference's index is an in-memory array scanned exactly per query
(/root/reference/server.js:37-62) — O(N*d) per query, bounded by one
process heap. At 100 TB the pruning must come from STORAGE LAYOUT, not a
runtime structure: we k-means the corpus (Spark ML KMeans, seed-fixed),
attach each vector's ``cluster_id``, and write the index table
``partitionBy("cluster_id")``. A query then:

1. scores only against the (tiny, broadcast) centroid table to pick its
   ``nprobe`` nearest clusters;
2. reads the index with ``cluster_id IN (...)`` — Catalyst's built-in
   partition pruning skips every other partition's files on disk;
3. runs the exact top-k kernel (operators.topk) inside the probed slice.

So the "index" is data layout + built-in pruning — no custom Catalyst rule,
no serving process, and the scan cost per query drops from O(N) to
O(N * nprobe / n_clusters). Exact brute force (operators.topk) remains the
recall oracle — ANN results are validated by recall measurement, never
hash-equality (SURVEY §7 risks).

Vectors are L2-normalized at build time (normalize-once: cosine == dot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vectordbfaiss_spark.functions.vector import dot, l2_normalize
from vectordbfaiss_spark.operators.topk import topk


def _fit_centroids(
    index: DataFrame, vec_col: str, n_clusters: int, seed: int
):
    """KMeans over the (normalized) vectors; returns list[list[float]]."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = index.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(train)
    return [c.tolist() for c in model.clusterCenters()]


def _nearest_centroids(df: DataFrame, vec_col: str, centroids, n: int) -> DataFrame:
    """Attach ``cluster_ids``: the ids of the n nearest centroids (by dot on
    normalized vectors), as an array column. Centroids travel as a literal
    array expression — they are the broadcast-small routing table.
    """
    cent = F.array(
        *[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(float(x)) for x in c]).alias("cvec"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    scored = F.transform(
        cent,
        lambda s: F.struct(
            (-dot(F.col(vec_col), s["cvec"])).alias("neg"), s["cid"].alias("cid")
        ),
    )
    ordered = F.array_sort(scored)  # struct sort: by neg asc = dot desc
    return df.withColumn(
        "cluster_ids", F.transform(F.slice(ordered, 1, n), lambda s: s["cid"])
    )


def assign_clusters(
    index: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, list]:
    """Normalize vectors, fit KMeans, attach ``cluster_id`` (nearest
    centroid). Returns (assigned_df, centroids)."""
    norm = index.withColumn(vec_col, l2_normalize(F.col(vec_col)).cast("array<float>"))
    centroids = _fit_centroids(norm, vec_col, n_clusters, seed)
    assigned = _nearest_centroids(norm, vec_col, centroids, 1).select(
        "*", F.element_at("cluster_ids", 1).alias("cluster_id")
    ).drop("cluster_ids")
    return assigned, centroids


def build_ivf_index(
    index: DataFrame,
    out_path: str,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
) -> list:
    """Build and persist the IVF index: cluster-partitioned Parquet.

    ``partitionBy("cluster_id")`` encodes the inverted lists as directories —
    query-side ``cluster_id`` predicates become file skipping. Returns the
    centroids (callers persist them next to the index or re-derive).
    """
    assigned, centroids = assign_clusters(index, vec_col, n_clusters, seed)
    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(out_path)
    return centroids


def ivf_search(
    index: DataFrame,
    queries: DataFrame,
    centroids,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    index_id: str = "vec_id",
    index_vec: str = "embedding",
) -> DataFrame:
    """ANN top-k: route each query to its ``nprobe`` nearest centroids and
    score only vectors in those clusters.

    ``index`` must carry ``cluster_id`` (from :func:`assign_clusters` or a
    read of a :func:`build_ivf_index` table — in the latter case the join
    predicate on ``cluster_id`` prunes partitions at the file level).
    Vectors and queries are assumed L2-normalized (score = dot).
    """
    routed = _nearest_centroids(
        queries.withColumn(query_vec, l2_normalize(F.col(query_vec)).cast("array<float>")),
        query_vec,
        centroids,
        nprobe,
    ).select(
        query_id, query_vec, F.explode("cluster_ids").alias("cluster_id")
    )
    pairs = index.join(F.broadcast(routed), "cluster_id").select(
        query_id,
        index_id,
        F.round(dot(F.col(query_vec), F.col(index_vec)), 6).alias("score"),
    )
    return topk(pairs, k, query_id, index_id)
