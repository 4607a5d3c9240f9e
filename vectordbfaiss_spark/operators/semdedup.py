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

from pyspark.sql import DataFrame


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

    The per-cluster pair scan is an ``applyInPandas`` BLAS kernel: one
    Gram matrix (m x m matmul) per cluster group instead of m^2/2
    expression-evaluated dot products — the same Arrow-batched shape as
    the exact top-k kernel, and the reason cluster size must stay
    bounded (the Gram matrix is the paper's own per-cluster cost).
    """
    import numpy as np
    from pyspark.sql import types as T

    from vectordbfaiss_spark.plans.ivf import assign_clusters

    assigned, _ = assign_clusters(
        emb.select(id_col, vec_col),
        vec_col=vec_col,
        n_clusters=n_clusters,
        seed=seed,
        corpus_key=corpus_key,
    )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("cluster_id", T.IntegerType()),
            T.StructField("n_dup_smaller", T.LongType()),
            T.StructField("max_sim_smaller", T.DoubleType()),
            T.StructField("witness_id", T.LongType()),
            T.StructField("keep", T.BooleanType()),
        ]
    )

    def kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        V = np.array(list(pdf[vec_col]), dtype=np.float64)
        # unit-norm after assign_clusters: Gram matrix == cosine matrix
        S = V @ V.T
        m = len(ids)
        n_dup = np.zeros(m, dtype=np.int64)
        max_sim = np.full(m, np.nan)
        witness = np.full(m, -1, dtype=np.int64)
        for j in range(1, m):
            above = S[:j, j] > threshold
            n = int(above.sum())
            if n:
                n_dup[j] = n
                # max sim, tie -> smallest id (ids ascending, argmax
                # returns the first maximal index)
                i = int(np.argmax(np.where(above, S[:j, j], -np.inf)))
                max_sim[j] = round(S[i, j], 6)
                witness[j] = ids[i]
        w = pd.array(witness, dtype="Int64")
        w[n_dup == 0] = pd.NA
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster_id": pdf["cluster_id"],
                "n_dup_smaller": n_dup,
                "max_sim_smaller": max_sim,
                "witness_id": w,
                "keep": n_dup == 0,
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(kernel, schema)
