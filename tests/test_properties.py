"""Property-based checks (SURVEY §5.4): chunker vs a direct transcription of
the reference loop, vector identities, top-k monotonicity."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from vectordbfaiss_spark.functions.text import chunk_text
from vectordbfaiss_spark.functions.vector import cosine_similarity, l2_norm
from vectordbfaiss_spark.operators.topk import score_pairs, topk

SF_DIR = "/root/testdata/sf0.001"

_spark = None


def _get_spark(spark):
    global _spark
    _spark = spark
    return spark


def _chunks_reference(text: str, n: int, m: int) -> list[str]:
    words = re.split(r"\s+", text.rstrip())
    out, i = [], 0
    while i < len(words):
        out.append(" ".join(words[i : i + n]))
        if i + n >= len(words):
            break
        i += n - m
    return out


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_words=st.integers(min_value=1, max_value=120),
    n=st.integers(min_value=2, max_value=30),
    m=st.integers(min_value=0, max_value=29),
)
def test_chunker_equals_reference_loop(spark, n_words, n, m):
    if m >= n:
        return
    text = " ".join(f"w{i}" for i in range(n_words))
    df = _get_spark(spark).createDataFrame([(text,)], ["t"])
    got = df.select(chunk_text("t", n, m).alias("c")).collect()[0]["c"]
    assert got == _chunks_reference(text, n, m)


def test_cosine_self_similarity_is_one(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50)
    res = emb.select(
        F.round(cosine_similarity("embedding", "embedding"), 9).alias("c")
    ).collect()
    assert all(abs(r["c"] - 1.0) < 1e-9 for r in res)


def test_norm_positive_homogeneous(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(20)
    doubled = F.transform(F.col("embedding"), lambda x: x * 2.0)
    res = emb.select(
        (l2_norm(doubled) / l2_norm("embedding")).alias("ratio")
    ).collect()
    assert all(abs(r["ratio"] - 2.0) < 1e-9 for r in res)


def test_topk_is_prefix_of_topk_plus_one(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    scored = score_pairs(q, emb).withColumn("score", F.round("score", 6))
    k5 = {(r["query_id"], r["vec_id"]) for r in topk(scored, 5).collect()}
    k6 = {(r["query_id"], r["vec_id"]) for r in topk(scored, 6).collect()}
    assert k5 <= k6 and len(k6 - k5) == 5


# ---------------------------------------------------------------------------
# Dedup candidate-generation properties (round-2 additions)
# ---------------------------------------------------------------------------


def _gram_reference(text: str, n: int) -> list[str]:
    words = re.split(r"\s+", text.rstrip(" "))  # rtrim = spaces only
    k = max(1, len(words) - n + 1)
    return [" ".join(words[i : i + n]) for i in range(k)]


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_words=st.integers(min_value=0, max_value=40),
    n=st.integers(min_value=1, max_value=9),
)
def test_gram_array_equals_reference_loop(spark, n_words, n):
    from vectordbfaiss_spark.operators.dedup import gram_array

    text = " ".join(f"w{i % 7}" for i in range(n_words))
    got = (
        spark.createDataFrame([(text,)], "text STRING")
        .select(gram_array(F.col("text"), n).alias("g"))
        .collect()[0]["g"]
    )
    assert got == _gram_reference(text, n)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    max_hamming=st.integers(min_value=0, max_value=8),
)
def test_simhash_blocked_equals_allpairs_random(spark, seed, max_hamming):
    """Pigeonhole blocking must be lossless for ANY corpus/threshold."""
    import random

    from vectordbfaiss_spark.operators import dedup as D

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 15))))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    blocked = sorted(
        tuple(r)
        for r in D.simhash_pairs(df, "doc_id", "text", max_hamming=max_hamming).collect()
    )
    exact = sorted(
        tuple(r)
        for r in D.simhash_pairs_allpairs(
            df, "doc_id", "text", max_hamming=max_hamming
        ).collect()
    )
    assert blocked == exact


def test_sequence_packing_sharded_vs_global_invariants(spark):
    """Cross-check the sharded streaming-pack against the global form:
    both must partition the corpus exactly (every doc in exactly one bin,
    token totals preserved) and every non-final bin in a stream must have
    crossed the budget boundary (bin total + next doc > budget)."""
    from pyspark.sql import functions as F

    from vectordbfaiss_spark.queries.curation import (
        _PACK_BUDGET,
        packing_binned,
    )
    from vectordbfaiss_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    n_docs = docs.count()
    total_tokens = None
    for shards in (None, 16):
        b = packing_binned(docs, shards=shards).cache()
        try:
            assert b.count() == n_docs  # exact partition of the corpus
            assert b.select("doc_id").distinct().count() == n_docs
            tt = b.agg(F.sum("n_tokens")).collect()[0][0]
            if total_tokens is None:
                total_tokens = tt
            else:
                assert tt == total_tokens  # same per-doc tokenization
            # a bin is closed exactly when the stream's running total
            # crosses its upper boundary (docs may straddle boundaries, so
            # per-bin totals can be under OR over budget — the boundary
            # condition is on the cumulative sum)
            bins = (
                b.groupBy("shard", "bin_id")
                .agg(F.sum("n_tokens").alias("tot"))
                .toPandas()
                .sort_values(["shard", "bin_id"])
            )
            bins["cum"] = bins.groupby("shard")["tot"].cumsum()
            non_final = bins.groupby("shard", group_keys=False)[
                bins.columns.tolist()
            ].apply(lambda g: g.iloc[:-1])
            bad = non_final[non_final["cum"] < _PACK_BUDGET * (non_final["bin_id"] + 1)]
            assert bad.empty, bad.head()
        finally:
            b.unpersist()
