"""Hierarchical (two-level) k-means fit — the production path for K
past the flat driver-fit ceiling (plans/ivf.py `_DRIVER_FIT_MAX_K`).

The flat fit's Lloyd's matrix is (sample_n x K); at the K-proportional-
to-N grain (K = N/250) a 100 TB corpus crosses the driver's memory
budget, so `_fit_centroids` routes K > 1024 through a coarse driver fit
+ per-cell DISTRIBUTED sub-fits (`applyInPandas`). These tests pin the
contract: exact center count, determinism across runs/partitionings,
and clustering quality comparable to the flat fit."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import spark  # noqa: F401  (fixture)


def _sample(n=6000, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return X


def _inertia(X, centers):
    C = np.asarray(centers)
    d = (
        (X * X).sum(1, keepdims=True)
        - 2.0 * (X @ C.T)
        + (C * C).sum(1)
    )
    return float(d.min(1).sum())


def test_exact_center_count_and_dim(spark):  # noqa: F811
    from vectordbfaiss_spark.plans.ivf import _fit_centroids_hierarchical

    X = _sample()
    cents = _fit_centroids_hierarchical(spark, X, 1100, seed=42, iters=4)
    assert len(cents) == 1100
    assert len(cents[0]) == X.shape[1]


def test_deterministic_across_runs_and_partitionings(spark):  # noqa: F811
    from vectordbfaiss_spark.plans.ivf import _fit_centroids_hierarchical

    X = _sample(n=4000)
    a = _fit_centroids_hierarchical(spark, X, 1100, seed=3, iters=3)
    # different shuffle width exercises a different groupBy delivery
    # order — the in-cell lexsort must make the result identical
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = _fit_centroids_hierarchical(spark, X, 1100, seed=3, iters=3)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_quality_comparable_to_flat_fit(spark):  # noqa: F811
    from vectordbfaiss_spark.plans.ivf import (
        _fit_centroids_hierarchical,
        _lloyd_vectorized,
    )

    X = _sample(n=6000)
    k = 1100
    hier = _fit_centroids_hierarchical(spark, X, k, seed=42, iters=5)
    flat = _lloyd_vectorized(X, k, seed=42, iters=5)
    ratio = _inertia(X, hier) / max(_inertia(X, flat), 1e-12)
    # two-level fits trade a little inertia for bounded memory; a broken
    # allocation or sub-fit shows up as a multiple, not a few percent
    assert ratio < 1.5, ratio


def test_fit_centroids_routes_large_k(spark):  # noqa: F811
    from vectordbfaiss_spark.plans.ivf import _DRIVER_FIT_MAX_K, _fit_centroids

    rows = [(v.tolist(),) for v in _sample(n=3000, dim=4)]
    df = spark.createDataFrame(rows, "embedding array<float>")
    k = _DRIVER_FIT_MAX_K + 76
    cents = _fit_centroids(df, "embedding", k, seed=42, iters=2)
    assert len(cents) == k


@pytest.mark.parametrize("k", [1100])
def test_no_cell_starves(spark, k):  # noqa: F811
    """Every returned center is finite and unit-scale (no NaN from an
    empty sub-cluster)."""
    from vectordbfaiss_spark.plans.ivf import _fit_centroids_hierarchical

    X = _sample(n=5000)
    cents = np.asarray(_fit_centroids_hierarchical(spark, X, k, seed=1, iters=3))
    assert np.isfinite(cents).all()
