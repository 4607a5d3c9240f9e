"""Random-hyperplane (SimHash-for-vectors) LSH over embedding columns.

The scale path for embedding-space near-duplicate *blocking*: bucket =
sign-bit pattern of dot products against ``n_planes`` fixed random
hyperplanes; two vectors land in one bucket with probability
``(1 - theta/pi)^n_planes`` — candidates come from bucket equality, never
an all-pairs join. Complements plans/ivf.py (data-dependent k-means
routing) with a data-INdependent scheme: no training pass, stable across
corpus growth, trivially composable into multi-table joins.

The projection matrix is derived from a fixed seed, so the whole operator
is deterministic and — because the projections can be inlined as literals
into SQL — fully oracle-checkable (queries/vector_search.py).

Signature computation is a numpy mapInPandas kernel: one matmul per Arrow
batch; inlining n_planes*dim literals as column expressions instead would
pay seconds of codegen compilation (same lesson as IVF routing).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, types as T


def hyperplanes(n_planes: int = 4, dim: int = 64, seed: int = 7) -> np.ndarray:
    """The fixed projection matrix (n_planes x dim), standard normal."""
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def signature_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Attach ``bucket`` (int, 0..2^n_planes-1): bit i set iff
    dot(vec, plane_i) >= 0. One matmul per Arrow batch; no shuffle."""
    import pandas as pd

    P = hyperplanes(n_planes, dim, seed).T  # (dim, n_planes)
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("bucket", T.IntegerType())]
    )
    cols = df.columns

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            bits = (V @ P) >= 0.0
            out = pdf[cols].copy()
            out["bucket"] = (bits @ weights).astype("int32")
            yield out

    return df.mapInPandas(kernel, schema)
