#!/usr/bin/env python
"""Wall-clock probe for the LINEAR graph-ANN build at the synthetic
scale ladder (.scratch/syn{1,10,100}: 2k / 20k / 200k embeddings,
original density — see tools/gen_synth_corpus.py).

Round-6's verdict marked the graph-ANN family `weak` because the
published artifact came from the exact O(N^2) tiled build (measured
281-299 s COLD at syn10). This probe times the replacement
(`graph_ann_edges_published`: blocked init + NN-Descent rounds +
symmetrize, all corpus-linear) cold at each rung and spot-checks
serving recall@10 for 50 corpus-drawn queries against the exact
in-plan scan, writing one JSON to .scratch/graph_build_probe.json.

Usage: python tools/graph_build_probe.py [syn1 syn10 syn100]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import Window as W, functions as F

    from vectordbfaiss_spark.operators.graph_ann import graph_beam_search
    from vectordbfaiss_spark.operators.topk import score_topk_vectorized
    from vectordbfaiss_spark.queries.embedding_analysis import (
        graph_ann_edges_published,
    )
    from vectordbfaiss_spark.session import get_spark, load_table

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rungs = sys.argv[1:] or ["syn1", "syn10", "syn100"]
    spark = get_spark(
        app_name="graph_build_probe",
        master="local[32]",
        shuffle_partitions=32,
        # local mode: one heap for driver + all 32 task threads; the
        # NN-Descent candidate shuffles at syn100 OOM the 1g default
        driver_memory="16g",
    )
    out: dict[str, dict] = {}
    for rung in rungs:
        sf_dir = os.path.join(repo, ".scratch", rung)
        art = os.path.join(repo, ".scratch", f"nnd_probe_{rung}")
        shutil.rmtree(art, ignore_errors=True)
        t0 = time.time()
        edges = graph_ann_edges_published(spark, sf_dir, out_path=art)
        n_edges = edges.count()  # forces the full cold build + read-back
        t_build = time.time() - t0

        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        queries = emb.filter(F.col("vec_id") < 50).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        t0 = time.time()
        visited = graph_beam_search(
            queries, edges.select("src", "dst"), emb, beam=24, rounds=10
        )
        w = W.partitionBy("query_id").orderBy(F.desc("score"), "vec_id")
        approx = (
            visited.filter(F.col("query_id") != F.col("vec_id"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 10)
            .select("query_id", "vec_id")
        ).localCheckpoint(eager=True)
        t_serve = time.time() - t0
        exact = score_topk_vectorized(
            queries, emb, k=10, exclude_self=True
        ).select("query_id", "vec_id")
        hits = exact.join(
            F.broadcast(approx), ["query_id", "vec_id"], "left_semi"
        ).count()
        out[rung] = {
            "n": n,
            "n_edges": n_edges,
            "build_cold_s": round(t_build, 1),
            "serve_beam24_s": round(t_serve, 1),
            "recall_at_10": round(hits / 500.0, 3),
        }
        print(rung, out[rung], flush=True)
        shutil.rmtree(art, ignore_errors=True)
    path = os.path.join(repo, ".scratch", "graph_build_probe.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
