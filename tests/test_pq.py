"""Product quantization: code validity, determinism, and recall-vs-exact
(ANN is never hash-checked; recall is the correctness metric — SURVEY §7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordbfaiss_spark.operators.topk import topk_search
from vectordbfaiss_spark.plans.pq import pq_encode, pq_search, train_pq_codebooks
from vectordbfaiss_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"
M, KC = 16, 32


def _setup(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    books = train_pq_codebooks(emb, m=M, k_codes=KC, seed=42)
    return emb, books


def test_codes_shape_and_range(spark):
    emb, books = _setup(spark)
    assert books.shape == (M, KC, 64 // M)
    rows = pq_encode(emb, books).select("vec_id", "codes").collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        assert len(r["codes"]) == M
        assert all(0 <= c < KC for c in r["codes"])


def test_encoding_deterministic(spark):
    emb, books = _setup(spark)
    a = sorted(map(tuple, pq_encode(emb, books).select("vec_id", "codes").collect()))
    b = sorted(map(tuple, pq_encode(emb, books).select("vec_id", "codes").collect()))
    assert [(i, list(c)) for i, c in a] == [(i, list(c)) for i, c in b]


def test_recall_vs_exact(spark):
    emb, books = _setup(spark)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    k = 10
    exact = topk_search(queries, emb, k=k)
    approx = pq_search(pq_encode(emb, books), queries, books, k=k)
    ex = {}
    for r in exact.select("query_id", "vec_id").collect():
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    ap = {}
    for r in approx.select("query_id", "vec_id").collect():
        ap.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    mean_recall = sum(recalls) / len(recalls)
    # 16 subspaces x 32 codes on 64-dim: coarse but must beat random by far
    assert mean_recall >= 0.5, (mean_recall, recalls)
    # the query vector itself (vec_id == query_id) must rank in its own
    # top-k: self-similarity survives quantization
    for q, ids in ap.items():
        assert q in ids, (q, ids)


def test_ivfpq_recall_and_pruning(spark):
    """IVF routing + PQ codes composed: recall within tolerance of flat PQ,
    and the candidate set actually shrinks (pruning does something)."""
    from vectordbfaiss_spark.plans.ivf import assign_clusters
    from vectordbfaiss_spark.plans.pq import ivfpq_search

    emb = load_table(spark, SF_DIR, "embeddings")
    books = train_pq_codebooks(emb, m=M, k_codes=KC, seed=42)
    assigned, centroids = assign_clusters(emb, n_clusters=8, seed=42)
    encoded = pq_encode(assigned, books)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    k = 10
    exact = topk_search(queries, emb, k=k)
    approx = ivfpq_search(encoded, queries, centroids, books, k=k, nprobe=4)
    ex, ap = {}, {}
    for r in exact.select("query_id", "vec_id").collect():
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx.select("query_id", "vec_id").collect():
        ap.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.4, recalls
    # every query produced k results even with pruned candidates
    assert all(len(v) == k for v in ap.values())


def test_rerank_recall_improves_over_plain_pq(spark):
    """Exact re-rank of the ADC shortlist (IndexRefineFlat shape): recall
    must improve on plain PQ and approach the exact scan. With refine=8 the
    only recall loss left is a true neighbor missing the top-80 ADC list
    (measured here: plain ~0.57, refined ~0.99 at sf0.001)."""
    from vectordbfaiss_spark.plans.pq import pq_search_rerank

    emb, books = _setup(spark)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    k = 10
    exact = topk_search(queries, emb, k=k)
    encoded = pq_encode(emb, books)
    plain = pq_search(encoded, queries, books, k=k)
    refined = pq_search_rerank(encoded, queries, books, k=k, refine=8)

    def recall(df):
        ex, ap = {}, {}
        for r in exact.select("query_id", "vec_id").collect():
            ex.setdefault(r["query_id"], set()).add(r["vec_id"])
        for r in df.select("query_id", "vec_id").collect():
            ap.setdefault(r["query_id"], set()).add(r["vec_id"])
        assert all(len(v) == k for v in ap.values())
        return sum(len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex) / len(ex)

    r_plain, r_refined = recall(plain), recall(refined)
    assert r_refined >= r_plain, (r_plain, r_refined)
    assert r_refined >= 0.9, (r_plain, r_refined)
    # exact re-scoring restores true scores: the refined top-1 for a query
    # vector drawn from the corpus is the vector itself at score 1.0
    top1 = {
        r["query_id"]: (r["vec_id"], r["score"])
        for r in refined.filter(F.col("rank") == 1).collect()
    }
    for q, (vid, score) in top1.items():
        assert vid == q and abs(score - 1.0) < 1e-6, (q, vid, score)
