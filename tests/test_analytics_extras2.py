"""Semantics tests for the second analytics batch: Theil-Sen robustness to
outliers, weekday-seasonality dow arithmetic, semantic decontamination
top-1 selection, and the k-anonymity grouping. Registry oracle parity is
covered by tests/test_registry_oracle.py."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_theilsen_is_robust_where_ols_is_not(spark):
    # flat series with one corrupted day: Theil-Sen slope stays ~0 while
    # an OLS fit would tilt. Recompute with the query's own pipeline shape
    # on a synthetic frame.
    rows = [(datetime.date(2024, 1, 1) + datetime.timedelta(days=i), 100) for i in range(20)]
    rows[10] = (rows[10][0], 100_000)  # ingest explosion on one day
    df = spark.createDataFrame(rows, "day date, n long")
    series = df.select(
        F.datediff("day", F.lit("2024-01-01").cast("date")).cast("long").alias("x"),
        F.col("n").alias("y"),
    )
    a = series.alias("a")
    b = series.select(F.col("x").alias("bx"), F.col("y").alias("by"))
    slopes = a.join(b, F.col("bx") > F.col("x")).select(
        ((F.col("by") - F.col("y")) / (F.col("bx") - F.col("x"))).alias("slope")
    )
    med = slopes.agg(F.percentile("slope", F.lit(0.5)).alias("s")).collect()[0].s
    assert abs(med) < 1e-9  # the single outlier does not move the median


def test_theilsen_registry_shape(spark):
    from vectordbfaiss_spark.queries.analytics_extras import q_theilsen_daily_trend

    row = q_theilsen_daily_trend(spark, SF_SMOKE).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    assert r.slope is not None and r.intercept is not None


def test_weekday_dow_is_engine_neutral(spark):
    # 1970-01-05 was a Monday: dow(Monday)=0 regardless of either engine's
    # dayofweek() convention
    df = spark.createDataFrame(
        [(datetime.date(2024, 1, 1),), (datetime.date(2024, 1, 7),)], "day date"
    )  # 2024-01-01 = Monday, 2024-01-07 = Sunday
    got = [
        r.dow
        for r in df.select(
            F.pmod(F.datediff("day", F.lit("1970-01-05").cast("date")), F.lit(7))
            .cast("int")
            .alias("dow")
        ).collect()
    ]
    assert got == [0, 6]


def test_weekday_anomaly_flags_are_consistent_with_z(spark):
    from vectordbfaiss_spark.queries.analytics_extras import (
        _SEASONAL_Z,
        q_weekday_seasonality_anomalies,
    )

    rows = q_weekday_seasonality_anomalies(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # flag iff |z| beyond the threshold (z is rounded in the output, so
        # allow the knife-edge case)
        assert r.anomaly == (abs(r.z) > _SEASONAL_Z) or abs(abs(r.z) - _SEASONAL_Z) < 1e-6
        assert 0 <= r.dow <= 6


def test_semantic_decontamination_covers_every_corpus_vector(spark):
    from vectordbfaiss_spark.queries.vector_search import q_semantic_decontamination
    from vectordbfaiss_spark.session import load_table

    out = q_semantic_decontamination(spark, SF_SMOKE)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n_corpus = emb.filter(F.col("vec_id") % 20 != 0).count()
    rows = out.collect()
    assert len(rows) == n_corpus  # exactly one best-match row per corpus vec
    assert all(r.bench_id % 20 == 0 for r in rows)  # matches come from the benchmark
    assert all(r.contaminated == (r.max_cos >= 0.35) for r in rows)


def test_k_anonymity_flags_match_user_counts(spark):
    from vectordbfaiss_spark.queries.ops_diagnostics import _K_ANON, q_k_anonymity_audit

    rows = q_k_anonymity_audit(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.anonymous == (r.n_users >= _K_ANON)
        assert r.n_records >= r.n_users
        assert 0 <= r.k_bucket <= 9


def test_neyman_allocation_tracks_budget_and_weights(spark):
    from vectordbfaiss_spark.queries.analytics_extras import (
        _NEYMAN_TOTAL,
        q_neyman_allocation_plan,
    )

    rows = q_neyman_allocation_plan(spark, SF_SMOKE).collect()
    assert rows
    # proportions form a distribution; integer allocations land within
    # rounding slack of the budget and respect the weight ordering
    assert abs(sum(r.alloc_prop for r in rows) - 1.0) < 1e-4
    total = sum(r.n_alloc for r in rows)
    assert abs(total - _NEYMAN_TOTAL) <= len(rows)
    by_weight = sorted(rows, key=lambda r: r.alloc_prop)
    allocs = [r.n_alloc for r in by_weight]
    assert allocs == sorted(allocs)


def test_stratified_sample_executes_the_plan_exactly(spark):
    from vectordbfaiss_spark.queries.analytics_extras import (
        q_neyman_allocation_plan,
        q_stratified_sample_neyman,
    )

    plan = {r.source: r.n_alloc for r in q_neyman_allocation_plan(spark, SF_SMOKE).collect()}
    got = q_stratified_sample_neyman(spark, SF_SMOKE).collect()
    from collections import Counter

    sizes = Counter(r.source for r in got)
    assert dict(sizes) == {s: min(n, sizes[s]) for s, n in plan.items()} == {
        s: n for s, n in plan.items() if s in sizes
    }
    # re-running yields the identical sample (deterministic, seedless)
    again = {(r.doc_id, r.source) for r in q_stratified_sample_neyman(spark, SF_SMOKE).collect()}
    assert again == {(r.doc_id, r.source) for r in got}


def test_sampled_ci_brackets_exact_total(spark):
    from vectordbfaiss_spark.queries.analytics_extras import q_sampled_token_count_ci

    r = q_sampled_token_count_ci(spark, SF_SMOKE).collect()[0]
    assert r.lower <= r.estimate <= r.upper
    assert r.within_ci == (r.lower <= r.exact_total <= r.upper)
    assert 0 < r.n_sampled < r.n_total
