#!/usr/bin/env python
"""Executed scaled-grain contract for the blocked families: run the
ACTUAL registry queries `knn_graph_blocked_scaled` and
`semdedup_prune_scaled` — witness legs and all, not the kernel-only
build of tools/blocked_grain_probe.py — over the honest-density
synthetic corpora with K derived from N (cell_target=250, the probe
grain; the registry default of 64 targets the small driver fixtures).

This is the artifact the round-5 verdict asked for: SCALE.md rows
showing ~linear wall with CONSTANT per-cell population, plus the
witness booleans green at every scale — i.e. the production "scale
n_clusters with the corpus" knob exercised through the same code path
the driver verifies, not a side calculation.

Usage:
  python tools/scaled_registry_probe.py [dir ...]   (default syn1 syn10 syn100)

Run ALONE on an idle box (same rule as bench.py / scale_spotcheck.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CELL_TARGET = 250


def main() -> None:
    from vectordbfaiss_spark.queries.embedding_analysis import (
        q_knn_graph_blocked_scaled,
    )
    from vectordbfaiss_spark.queries.vector_search import q_semdedup_prune_scaled
    from vectordbfaiss_spark.session import get_spark

    dirs = sys.argv[1:] or [".scratch/syn1", ".scratch/syn10", ".scratch/syn100"]
    spark = get_spark(
        app_name="scaled-registry-probe",
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    )
    load0 = os.getloadavg()[0]
    print(f"load_avg_start={load0:.2f} contaminated={load0 > 1.0}")

    for name, fn in (
        ("knn_graph_blocked_scaled", q_knn_graph_blocked_scaled),
        ("semdedup_prune_scaled", q_semdedup_prune_scaled),
    ):
        for d in dirs:
            times, row = [], None
            for _ in range(2):  # cold builds models, warm is the number
                t0 = time.perf_counter()
                row = fn(spark, d, cell_target=CELL_TARGET).collect()[0]
                times.append(round(time.perf_counter() - t0, 2))
            r = row.asDict()
            n = r.get("n_nodes", r.get("n_vecs"))
            k = r["n_clusters"]
            flags = {
                kk: v
                for kk, v in r.items()
                if kk not in ("n_nodes", "n_vecs", "n_clusters")
            }
            print(
                f"{name:26s} {d:18s} N={n:>7} K={k:>5} per_cell~{n // k:>5} "
                f"cold={times[0]:8.2f}s warm={times[1]:8.2f}s {flags}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
