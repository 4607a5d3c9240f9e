"""Product quantization (PQ) — the FAISS-style compressed ANN path.

The reference stores every vector as raw float32 (6144 B for 1536 dims,
/root/reference/server.js:194) and scans them all per query
(server.js:53-56). At 100 TB the scan is dominated by BYTES READ; PQ
attacks exactly that: split each d-dim vector into ``m`` subspaces, learn a
tiny k-means codebook per subspace, and store each vector as ``m`` small
codes (m bytes instead of 4·d) — a 32× compression at the configs used
here. Queries score against codes with an ADC (asymmetric distance
computation) lookup table: the query stays full-precision, each candidate
costs ``m`` table lookups instead of ``d`` multiplies.

Layered like the rest of the engine:
- codebooks train on a bounded driver-side sample (same recipe as
  plans/ivf._fit_centroids — the model is a tiny persisted artifact);
- encoding is a numpy ``mapInPandas`` kernel (one argmin per subspace per
  Arrow batch);
- search broadcasts per-query lookup tables and does batch-local top-k
  pruning, so the shuffle carries O(partitions·Q·k) candidate rows — the
  same contract as operators/topk.
- PQ composes with IVF (store codes inside cluster partitions) — kept
  separate here so each index structure is independently testable.

ANN accuracy is validated by recall-vs-exact tests (tests/test_pq.py),
never hash-equality (SURVEY §7 risk (e)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vectordbfaiss_spark.functions.vector import l2_normalize


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 16,
    k_codes: int = 32,
    seed: int = 42,
    iters: int = 10,
):
    """Fit per-subspace codebooks on a bounded sample of (normalized)
    vectors. Returns a numpy array of shape (m, k_codes, d/m).

    d must divide evenly by m (standard PQ constraint; pad upstream if
    not). Deterministic: seeded init, fixed iterations, stable argmin.
    """
    import numpy as np

    from vectordbfaiss_spark.plans.sampling import collect_training_sample

    X = collect_training_sample(df, vec_col, seed).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    d = X.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k_codes, sub))
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        k = min(k_codes, len(Xs))
        centers = Xs[rng.choice(len(Xs), size=k, replace=False)]
        for _ in range(iters):
            dmat = ((Xs[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
            lab = dmat.argmin(1)
            for c in range(k):
                pts = Xs[lab == c]
                if len(pts):
                    centers[c] = pts.mean(0)
        if k < k_codes:  # degenerate tiny corpus: repeat last center
            centers = np.vstack([centers, np.repeat(centers[-1:], k_codes - k, 0)])
        books[s] = centers
    return books


def pq_encode(df: DataFrame, codebooks, vec_col: str = "embedding") -> DataFrame:
    """Attach ``codes`` (array<int>, length m): per-subspace nearest
    codeword ids. mapInPandas; one argmin matmul per subspace per batch."""
    import numpy as np
    from pyspark.sql import types as T

    books = codebooks  # (m, k, sub)
    m, _, sub = books.shape
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("codes", T.ArrayType(T.IntegerType()))]
    )
    cols = df.columns

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(V), m), dtype=np.int32)
            for s in range(m):
                Vs = V[:, s * sub : (s + 1) * sub]
                # |v-c|^2 = |v|^2 - 2 v.c + |c|^2; |v|^2 constant per row
                dmat = -2.0 * (Vs @ books[s].T) + (books[s] ** 2).sum(1)
                codes[:, s] = dmat.argmin(1)
            out = pdf[cols].copy()
            out["codes"] = [row for row in codes]
            yield out

    return df.mapInPandas(kernel, schema)


def pq_search(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ADC top-k: approximate dot(query, vec) = sum_s LUT[s, code_s] where
    LUT[s, c] = dot(query_sub_s, codeword_{s,c}).

    The per-query LUTs (Q, m, k_codes — a few KB) are computed driver-side
    from the collected query set and closure-broadcast; each partition
    scores its codes with numpy gathers and emits only its local top-k per
    query, and a final window rank keeps the global k — identical shuffle
    contract to the exact kernel (operators/topk), so swapping
    exact→PQ changes bytes scanned, not plan shape.

    Returns (query_id, vec_id, approx_score, rank) — ties broken by id;
    scores rounded 6dp for determinism.
    """
    import numpy as np
    from pyspark.sql import Window as W, types as T

    books = codebooks
    m, kc, sub = books.shape
    qrows = queries.select(query_id_col, query_vec_col).collect()
    qids = np.array([r[0] for r in qrows])
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # LUT: (n_q, m, k_codes)
    lut = np.stack(
        [Q[:, s * sub : (s + 1) * sub] @ books[s].T for s in range(m)], axis=1
    )

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("approx_score", T.DoubleType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            # id-sorted rows + ROUNDED scores + stable argsort give the
            # exact (score DESC, id ASC) order the global window uses, so
            # the batch-local k boundary is deterministic under rounded
            # ties (same recipe as topk.score_topk_vectorized)
            by_id = np.argsort(ids, kind="stable")
            ids = ids[by_id]
            codes = codes[by_id]
            # scores: (n_q, n) via gather-sum over subspaces
            scores = np.zeros((len(qids), len(codes)))
            for s in range(m):
                scores += lut[:, s, :][:, codes[:, s]]
            scores = np.round(scores, 6)
            n_local = min(k, scores.shape[1])
            top = np.argsort(-scores, axis=1, kind="stable")[:, :n_local]
            out_q, out_i, out_s = [], [], []
            for qi in range(len(qids)):
                sel = top[qi]
                out_q.extend([int(qids[qi])] * len(sel))
                out_i.extend(ids[sel].tolist())
                out_s.extend(scores[qi, sel].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, id_col: out_i, "approx_score": out_s}
            )

    local = encoded.select(id_col, "codes").mapInPandas(kernel, schema)
    w = W.partitionBy("query_id").orderBy(
        F.desc("approx_score"), F.asc(id_col)
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_search_rerank(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 10,
    refine: int = 4,
    id_col: str = "vec_id",
    index_vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ADC shortlist -> exact re-rank: the FAISS ``IndexRefineFlat`` shape.

    Stage 1 runs :func:`pq_search` for ``refine * k`` candidates per query
    (compressed-domain scan — the cheap, bytes-pruned pass). Stage 2
    hydrates ONLY the shortlist's exact vectors (a broadcast of Q·r·k ids
    into the index scan — never a corpus shuffle) and re-scores them in
    full precision, keeping the final top-k. Quantization error then only
    costs recall when a true neighbor falls outside the top r·k ADC
    candidates, so r trades a linear amount of exact work for most of the
    recall gap to the reference's flat scan (server.js:53-60).

    ``encoded`` must carry both ``codes`` (pq_encode) and the exact
    ``index_vec_col`` — pq_encode preserves input columns, so any encoded
    index qualifies. Returns (query_id, vec_id, score, rank): exact cosine
    rounded 6dp, ties by id — identical contract to operators/topk, so the
    refined path is drop-in for the exact kernel.
    """
    from pyspark.sql import Window as W

    from vectordbfaiss_spark.functions.vector import dot as vdot

    cand = pq_search(
        encoded,
        queries,
        codebooks,
        k=refine * k,
        id_col=id_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    ).select("query_id", id_col)
    exact = encoded.select(id_col, index_vec_col).join(F.broadcast(cand), id_col)
    qv = queries.select(
        F.col(query_id_col).alias("query_id"),
        l2_normalize(F.col(query_vec_col)).alias("_qv"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        exact.join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(vdot(l2_normalize(F.col(index_vec_col)), F.col("_qv")), 6).alias(
                "score"
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivfpq_search(
    encoded_index: DataFrame,
    queries: DataFrame,
    centroids,
    codebooks,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF + PQ composed — the FAISS IVFPQ shape, Spark-first.

    ``encoded_index`` carries BOTH ``cluster_id`` (plans.ivf.assign_clusters
    or a partitioned-table read, where the cluster predicate prunes files)
    AND ``codes`` (pq_encode). Each query routes to its ``nprobe`` nearest
    centroids (broadcast of the routed query set), then ADC-scores ONLY the
    codes inside the probed clusters.

    Cost model per query: routing O(k_clusters·d), candidate scan
    O(N·nprobe/k_clusters · m) table lookups over m-byte codes — both the
    row count AND the bytes per row shrink, multiplying the two pruning
    strategies. Accuracy is recall-tested (tests/test_pq.py), never
    hash-equality.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window as W, types as T

    from vectordbfaiss_spark.plans.ivf import _nearest_centroids

    books = codebooks
    m, kc, sub = books.shape
    routed = _nearest_centroids(
        queries.withColumn(
            query_vec_col, l2_normalize(F.col(query_vec_col)).cast("array<float>")
        ),
        query_vec_col,
        centroids,
        nprobe,
    ).select(query_id_col, query_vec_col, F.explode("cluster_ids").alias("cluster_id"))
    qrows = routed.select(query_id_col, query_vec_col).distinct().collect()
    qids = np.array([r[0] for r in qrows])
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    lut = np.stack(
        [Q[:, s * sub : (s + 1) * sub] @ books[s].T for s in range(m)], axis=1
    )
    qpos = {int(q): i for i, q in enumerate(qids)}

    # restrict the index to probed (query, cluster) pairs, keep the pairing
    cand = encoded_index.join(
        F.broadcast(routed.select(query_id_col, "cluster_id")), "cluster_id"
    ).select(query_id_col, id_col, "codes")

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("approx_score", T.DoubleType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(list(pdf["codes"]), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            qs = pdf[query_id_col].map(qpos).to_numpy()
            # per-row gather: row i scored against ITS paired query
            scores = np.zeros(len(codes))
            for s in range(m):
                scores += lut[qs, s, codes[:, s]]
            yield pd.DataFrame(
                {
                    "query_id": pdf[query_id_col].astype("int64"),
                    id_col: ids,
                    "approx_score": np.round(scores, 6),
                }
            )

    scored = cand.mapInPandas(kernel, schema)
    w = W.partitionBy("query_id").orderBy(F.desc("approx_score"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
