"""MMR (maximal marginal relevance) diversified re-ranking.

The reference returns the raw cosine top-k (server.js:45-61); production
retrieval re-ranks that candidate list so results aren't near-duplicates
of each other. MMR greedily picks

    argmax_d  lam * rel(q, d) - (1 - lam) * max_{s in selected} sim(d, s)

which is inherently sequential — but only WITHIN one query's candidate
list (bounded: k_cand rows, e.g. 20). So the distributed shape is
``applyInPandas`` grouped by query_id: each group is a tiny dense
matrix problem (k_cand x dim GEMM for the pairwise sims + a k-step
greedy loop), and millions of queries parallelize embarrassingly across
executors. No shuffle beyond the single groupBy(query_id).

Determinism: relevance and MMR scores are rounded to 6dp before every
argmax and ties break on the smaller vec_id, so output is independent of
partitioning and float noise — same convention as the SQL-oracled
rankings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_OUT_SCHEMA = (
    "query_id LONG, vec_id LONG, rel DOUBLE, mmr_score DOUBLE, sel_rank LONG"
)


def mmr_select(
    vec_ids: np.ndarray, rel: np.ndarray, vecs: np.ndarray, k: int, lam: float
) -> list[tuple[int, float, float, int]]:
    """Greedy MMR over one candidate list (plain numpy — also used by the
    tests as the independently-callable kernel). ``rel`` must already be
    rounded 6dp. Returns (vec_id, rel, mmr_score, sel_rank) rows."""
    n = len(vec_ids)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0.0] = 1.0
    unit = vecs / norms[:, None]
    sim = np.round(unit @ unit.T, 6)  # candidate-candidate cosine

    # stable order: by vec_id ascending so np.argmax's first-wins rule
    # implements the smaller-id tie-break.
    order = np.argsort(vec_ids, kind="mergesort")
    vec_ids, rel, sim = vec_ids[order], rel[order], sim[np.ix_(order, order)]

    selected: list[int] = []
    out: list[tuple[int, float, float, int]] = []
    remaining = np.ones(n, dtype=bool)
    for step in range(min(k, n)):
        if selected:
            max_sim = sim[:, selected].max(axis=1)
            mmr = np.round(lam * rel - (1.0 - lam) * max_sim, 6)
        else:
            mmr = np.round(lam * rel, 6)
        masked = np.where(remaining, mmr, -np.inf)
        pick = int(np.argmax(masked))
        remaining[pick] = False
        selected.append(pick)
        out.append((int(vec_ids[pick]), float(rel[pick]), float(mmr[pick]), step + 1))
    return out


def mmr_rerank(candidates: DataFrame, k: int = 5, lam: float = 0.7) -> DataFrame:
    """Diversify each query's candidate list down to ``k`` results.

    ``candidates`` columns: query_id, vec_id, rel (cosine relevance,
    pre-rounded 6dp), embedding (array<float>).
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        vecs = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
        )
        rows = mmr_select(
            pdf["vec_id"].to_numpy(),
            pdf["rel"].to_numpy(dtype=np.float64),
            vecs,
            k,
            lam,
        )
        return pd.DataFrame(
            [(qid, v, r, m, s) for v, r, m, s in rows],
            columns=["query_id", "vec_id", "rel", "mmr_score", "sel_rank"],
        )

    return candidates.groupBy("query_id").applyInPandas(kernel, _OUT_SCHEMA)
