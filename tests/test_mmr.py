"""MMR re-ranking: exact semantics pinned against an independent
straight-loop reference, plus the analytic lam=1 reduction and a
constructed diversity case (the rows-only contract for mmr_rerank_topk)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vectordbfaiss_spark.operators.rerank import mmr_rerank, mmr_select
from vectordbfaiss_spark.operators.topk import score_topk_vectorized

SF_DIR = "/root/testdata/sf0.001"


def _reference_mmr(vec_ids, rel, vecs, k, lam):
    """Deliberately different implementation style: python loops, explicit
    pairwise cosines, no matrix ops."""

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        na, nb = na or 1.0, nb or 1.0
        return round(float(np.dot(a, b) / (na * nb)), 6)

    items = sorted(range(len(vec_ids)), key=lambda i: vec_ids[i])
    selected, out = [], []
    for step in range(min(k, len(items))):
        best, best_score = None, None
        for i in items:
            if i in selected:
                continue
            if selected:
                pen = max(cos(vecs[i], vecs[j]) for j in selected)
                s = round(lam * rel[i] - (1 - lam) * pen, 6)
            else:
                s = round(lam * rel[i], 6)
            # strict > keeps the first (smallest vec_id) on ties
            if best is None or s > best_score:
                best, best_score = i, s
        selected.append(best)
        out.append((int(vec_ids[best]), float(best_score), step + 1))
    return out


def _candidates(spark, n_queries=5, k_cand=20):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return (
        score_topk_vectorized(q, emb, k=k_cand)
        .withColumnRenamed("score", "rel")
        .drop("rank")
        .join(emb.select("vec_id", "embedding"), "vec_id")
    )


def test_mmr_matches_straight_loop_reference(spark):
    cand = _candidates(spark).cache()
    got = {
        (r.query_id, r.sel_rank): (r.vec_id, r.mmr_score)
        for r in mmr_rerank(cand, k=5, lam=0.7).collect()
    }
    pdf = cand.toPandas()
    want = {}
    for qid, g in pdf.groupby("query_id"):
        vecs = [np.asarray(v, dtype=np.float64) for v in g["embedding"]]
        for vid, score, rank in _reference_mmr(
            g["vec_id"].to_numpy(), g["rel"].to_numpy(), vecs, 5, 0.7
        ):
            want[(qid, rank)] = (vid, score)
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], key
        assert abs(got[key][1] - want[key][1]) < 1e-9, key
    cand.unpersist()


def test_mmr_lambda_one_is_plain_topk(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = mmr_rerank(_candidates(spark), k=5, lam=1.0).collect()
    plain = {
        (r.query_id, r.rank): r.vec_id
        for r in score_topk_vectorized(q, emb, k=5).collect()
    }
    for r in got:
        assert plain[(r.query_id, r.sel_rank)] == r.vec_id


def test_mmr_penalizes_duplicates():
    # A and B identical (rel .98/.99), C orthogonal (rel .5); lam=.5:
    # plain top-2 = {A, B}, MMR top-2 = {A, C}.
    vec_ids = np.array([1, 2, 3])
    rel = np.array([0.99, 0.98, 0.5])
    vecs = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    picks = [v for v, _, _, _ in mmr_select(vec_ids, rel, vecs, k=2, lam=0.5)]
    assert picks == [1, 3]


def test_mmr_tie_breaks_on_smaller_id():
    # identical rel and identical vectors: every step ties -> ids ascending
    vec_ids = np.array([30, 10, 20])
    rel = np.array([0.9, 0.9, 0.9])
    vecs = np.array([[1.0, 0.0]] * 3)
    picks = [v for v, _, _, _ in mmr_select(vec_ids, rel, vecs, k=3, lam=0.7)]
    assert picks == [10, 20, 30]


def test_registry_query_deterministic(spark):
    from vectordbfaiss_spark.registry import queries

    fn = queries()["mmr_rerank_topk"]
    a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert a == b and len(a) == 25  # 5 queries x 5 picks


def test_filtered_topk_with_unsatisfiable_filter_is_empty(spark):
    """Pre-filter ANN contract: an empty corpus yields an empty result,
    not an error (the reference's empty-index guard, server.js:46-48)."""
    from pyspark.sql import functions as F2

    from vectordbfaiss_spark.operators.topk import score_topk_vectorized

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.filter(F2.col("vec_id") < 0)  # nothing survives
    queries = emb.filter(F2.col("vec_id") < 3).select(
        F2.col("vec_id").alias("query_id"), F2.col("embedding").alias("query_vec")
    )
    assert score_topk_vectorized(queries, corpus, k=5).count() == 0
