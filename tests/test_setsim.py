"""Prefix-filter set-similarity join: losslessness vs a brute-force
reference and candidate-pruning effectiveness. Oracle equivalence at the
registry level is covered by the sweep."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_ORACLE
from vectordbfaiss_spark.operators.dedup import exploded_shingles
from vectordbfaiss_spark.operators.setsim import (
    _T_DEN,
    _T_NUM,
    prefix_filter_jaccard_pairs,
)
from vectordbfaiss_spark.session import load_table


def _brute_pairs(spark, toks):
    """Brute-force reference: all-pairs shingle join, same integer filter."""
    a = toks.select(F.col("doc_id").alias("id_a"), F.col("shingle"))
    b = toks.select(F.col("doc_id").alias("id_b"), F.col("shingle"))
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
        .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sa"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sb"), "id_b")
    )
    u = F.col("sa") + F.col("sb") - F.col("c")
    return inter.filter(_T_DEN * F.col("c") >= _T_NUM * u).select(
        "id_a", "id_b", F.round(F.col("c") / u, 6).alias("jaccard")
    )


def test_prefix_filter_is_lossless(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    toks = exploded_shingles(docs, "doc_id", "text", n=3)
    fast = prefix_filter_jaccard_pairs(toks, "doc_id", "shingle")
    brute = _brute_pairs(spark, toks)
    f = {(r["id_a"], r["id_b"]): r["jaccard"] for r in fast.collect()}
    b = {(r["id_a"], r["id_b"]): r["jaccard"] for r in brute.collect()}
    assert f == b
    assert len(f) > 0  # fixture produces real near-dup pairs


def test_prefix_pruning_is_effective(spark):
    """The candidate prefix join must touch far fewer (doc, token) rows
    than the full token set — that reduction IS the operator's point."""
    docs = load_table(spark, SF_ORACLE, "documents")
    toks = exploded_shingles(docs, "doc_id", "text", n=3).localCheckpoint()
    n_all = toks.count()

    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    dfreq = toks.groupBy("shingle").agg(F.count("*").alias("tok_df"))
    from pyspark.sql import Window as W

    ranked = (
        toks.join(dfreq, "shingle")
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("doc_id").orderBy("tok_df", "shingle")),
        )
        .join(sizes, "doc_id")
    )
    n_prefix = ranked.filter(
        F.col("rn")
        <= F.col("sz") - F.expr(f"({_T_NUM} * sz + {_T_DEN - 1}) div {_T_DEN}") + 1
    ).count()
    # prefix keeps |s| - ceil(0.6|s|) + 1 of |s| tokens: ~40% + 1
    assert n_prefix < 0.55 * n_all


def test_integer_ceil_formula():
    import math

    for sz in range(1, 500):
        assert (3 * sz + 4) // 5 == math.ceil(0.6 * sz) or (
            # float 0.6*sz can round up across an integer boundary;
            # the rational form is the correct ceil(3sz/5)
            (3 * sz) % 5 == 0 and (3 * sz + 4) // 5 == (3 * sz) // 5
        )
        assert (3 * sz + 4) // 5 == -((-3 * sz) // 5)  # true ceil(3sz/5)
