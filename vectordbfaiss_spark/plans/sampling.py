"""Bounded driver-side training-sample collection for the IVF/PQ fits.

Training coarse quantizers on a bounded sample is the standard recipe
(FAISS trains on <=~1M vectors regardless of corpus size); what must NOT
scale with the corpus — or with dimensionality — is the driver-side
footprint of that sample. A fixed 200k-row cap at 1536-dim float64 is
~2.4 GB on the driver; scaling the row cap by dimension and collecting as
float32 (the storage type of ``ARRAY<FLOAT>`` — the cast is lossless)
bounds the array at ``TRAIN_SAMPLE_BYTES`` for any dimension.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

TRAIN_SAMPLE_CAP = 200_000  # row cap (low-dimension regime)
TRAIN_SAMPLE_BYTES = 256 << 20  # float32 byte budget on the driver


def collect_training_sample(df: DataFrame, vec_col: str, seed: int) -> np.ndarray:
    """Collect at most ``min(CAP, BYTES / 4*dim)`` vectors as an (n, dim)
    float32 array, via an Arrow ``toPandas`` transfer (no per-row Python
    objects)."""
    first = df.select(vec_col).first()
    if first is None:
        return np.zeros((0, 0), dtype=np.float32)
    dim = len(first[0])
    cap = min(TRAIN_SAMPLE_CAP, max(4096, TRAIN_SAMPLE_BYTES // (4 * dim)))
    n_rows = df.count()
    frac = min(1.0, cap / max(n_rows, 1))
    sample = (
        df.select(vec_col)
        if frac >= 1.0
        else df.select(vec_col).sample(fraction=frac, seed=seed)
    )
    pdf = sample.toPandas()
    if not len(pdf):
        return np.zeros((0, dim), dtype=np.float32)
    return np.stack([np.asarray(v, dtype=np.float32) for v in pdf[vec_col]])
