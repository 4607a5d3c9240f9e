"""SemDeDup — semantic deduplication via k-means blocking + within-cluster
cosine pruning (Abbas et al. 2023, arXiv:2303.09540).

The reference engine's only dedup is exact content identity
(``server.js:29,198``); SemDeDup is the embedding-space analogue a
training-data pipeline runs after exact/MinHash dedup: vectors that are
semantically near-identical (cosine above a threshold) are collapsed to
one representative, using k-means clusters as blocking so the quadratic
pair scan is confined to each cluster.

Scale shape (the paper's own design point): cluster with k chosen so the
expected cluster size N/k stays bounded (they use 50k clusters for 134M
embeddings), shuffle once on ``cluster_id``, and the per-cluster
self-join is O((N/k)^2) *per cluster* — embarrassingly parallel across
clusters, no global all-pairs stage. Skewed clusters are AQE-splittable
since the join key is the cluster id.

Keep rule (deterministic): a vector is REMOVED iff some same-cluster
vector with a smaller id scores above the threshold against it —
keep-first by id, the same convention as the MinHash/SimHash ladder, so
the survivor set is stable across runs and partitionings. (The paper
keeps the member with lowest centroid similarity; any single-survivor
rule gives the same dedup ratio, and id-order is engine-reproducible.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vectordbfaiss_spark.functions.vector import dot


def semdedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    threshold: float = 0.3,
    seed: int = 42,
    corpus_key: str | None = None,
) -> DataFrame:
    """Per-vector SemDeDup verdicts.

    Returns (id, cluster_id, n_dup_smaller, max_sim_smaller, witness_id,
    keep): ``n_dup_smaller`` = count of smaller-id same-cluster vectors
    above ``threshold``; ``max_sim_smaller`` / ``witness_id`` = the best
    such score and which vector scored it (NULL if none); ``keep`` = no
    such neighbor exists. The witness makes every removal independently
    re-checkable from raw embeddings without re-running the clustering
    (see the ``semdedup_witness_bound`` registry query).
    """
    from vectordbfaiss_spark.plans.ivf import assign_clusters

    assigned, _ = assign_clusters(
        emb.select(id_col, vec_col),
        vec_col=vec_col,
        n_clusters=n_clusters,
        seed=seed,
        corpus_key=corpus_key,
    )
    a = assigned.select(
        F.col("cluster_id"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = assigned.select(
        F.col("cluster_id"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    # within-cluster ordered pairs; vectors are unit-norm after
    # assign_clusters, so dot == cosine
    pairs = (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cluster_id",
            "id_a",
            "id_b",
            dot(F.col("vec_a"), F.col("vec_b")).alias("sim"),
        )
        .filter(F.col("sim") > threshold)
    )
    # tie-break max_by on (sim, -id_a) so the witness is deterministic
    dup_stats = pairs.groupBy("id_b").agg(
        F.count("*").alias("n_dup_smaller"),
        F.round(F.max("sim"), 6).alias("max_sim_smaller"),
        F.max_by(
            "id_a", F.struct(F.col("sim"), (-F.col("id_a")).alias("neg"))
        ).alias("witness_id"),
    )
    return (
        assigned.select(F.col(id_col), "cluster_id")
        .join(dup_stats, F.col(id_col) == F.col("id_b"), "left")
        .select(
            F.col(id_col),
            "cluster_id",
            F.coalesce("n_dup_smaller", F.lit(0)).cast("long").alias(
                "n_dup_smaller"
            ),
            "max_sim_smaller",
            "witness_id",
            F.col("n_dup_smaller").isNull().alias("keep"),
        )
    )
