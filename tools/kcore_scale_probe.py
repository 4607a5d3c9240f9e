#!/usr/bin/env python
"""Operator-grain scale probe for k_core (operators/graph.py): wall time on
synthetic candidate-pair graphs at 1x/10x/100x edges with the component
SIZE DISTRIBUTION held fixed (only the component COUNT grows — the shape
the engine's dedup/mutual-kNN graphs take as the corpus grows, since
banding caps and mutual-kNN sparsification bound per-component size).

Each scale step generates C components; each component is a seeded
random graph of ~40 nodes / ~80 undirected edges plus a 12-node tail
(so the peel does real multi-round work in every task). Expectation:
wall time ~linear in component count — components is O(log^2 n) rounds
on the whole edge set, the peel is one applyInPandas pass, and no stage
is quadratic in the graph.

Run ALONE on an idle box (timing probe — bench.py contamination rule).
Usage: python tools/kcore_scale_probe.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _component_edges(base_id: int, rng: np.random.Generator) -> list[tuple[int, int]]:
    n, m = 40, 80
    edges = {(base_id + i, base_id + i + 1) for i in range(n - 1)}  # connected spine
    while len(edges) < m:
        a, b = rng.integers(0, n, size=2)
        if a != b:
            u, v = sorted((int(a), int(b)))
            edges.add((base_id + u, base_id + v))
    # a 12-node tail that must peel away over ~6 rounds
    tail_root = base_id + n
    edges.add((base_id, tail_root))
    for i in range(11):
        edges.add((tail_root + i, tail_root + i + 1))
    return sorted(edges)


def main() -> None:
    from vectordbfaiss_spark.operators.graph import k_core
    from vectordbfaiss_spark.session import get_spark

    out_json = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "kcore_scale_probe.json",
    )
    spark = get_spark(app_name="kcore-probe")
    results = {}
    for mult, n_comp in [("1x", 60), ("10x", 600), ("100x", 6000)]:
        rng = np.random.default_rng(11)
        rows = []
        for c in range(n_comp):
            rows.extend(_component_edges(c * 1000, rng))
        df = spark.createDataFrame(rows, "src long, dst long").localCheckpoint(
            eager=True
        )
        n_edges = len(rows)
        # warm run is the comparison number (bench.py methodology)
        for attempt in range(2):
            t0 = time.time()
            n_core = k_core(df, k=2).count()
            wall = time.time() - t0
        results[mult] = {
            "n_components": n_comp,
            "n_edges": n_edges,
            "core_nodes": n_core,
            "warm_wall_s": round(wall, 2),
        }
        print(mult, results[mult], flush=True)
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out_json)
    spark.stop()


if __name__ == "__main__":
    main()
