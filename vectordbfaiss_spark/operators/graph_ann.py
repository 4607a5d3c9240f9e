"""Graph-based approximate nearest neighbor search (the HNSW/NSG family,
single-layer form): best-first BEAM SEARCH over a published kNN edge
artifact.

Completes the engine's ANN taxonomy — flat exact scan (operators/topk.py),
IVF partition pruning (plans/ivf.py), PQ/IVFPQ compression (plans/pq.py),
LSH bucketing (operators/lsh.py) — with the graph-traversal family every
modern vector store ships. The reference serves the flat scan only
(server.js:53-60); graph ANN is the standard scale path when the index
must live on disk and queries need sub-linear probes without training a
quantizer.

Spark-first shape: the traversal is bulk-synchronous — each round expands
the current per-query beam through ONE equi-join against the src-
partitioned edge artifact, scores only the newly-discovered candidates
against the (Q-bounded, broadcast) query block, and keeps the top-`beam`
per query with a rank-filter window (WindowGroupLimit-eligible). All
frontier/visited state is O(Q * visited) rows — query-bounded, never
corpus-bounded; the corpus-sized tables (edges, embeddings) are only ever
the build side of candidate-lookup equi-joins. `rounds` is an upper
bound with a FIXED-POINT exit: a round that adds no rows makes every
later round a provable no-op, so the loop stops (bit-identical results,
none of the saturated rounds' stage latency). One eager checkpoint per
executed round keeps lineage flat — the pagerank/BPE loop discipline.

Entry points come in two forms: a hash-spread sample scaled with the
corpus (max(16, N/32) — the honest single-layer default at fixture
scale, but entry scoring grows with N), or the production form —
:func:`ivf_entry_pairs` seeds each query at the members of its nprobe
closest IVF cells (plans/ivf.py supplies centroids and assignment), so
at the scaled cell grain entry cost is corpus-INDEPENDENT. The
`graph_ann_ivf_entries` registry query runs the IVF-seeded form
end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from vectordbfaiss_spark.functions.vector import cosine_similarity


def _score_against_queries(
    nodes: DataFrame, queries: DataFrame, emb: DataFrame
) -> DataFrame:
    """(query_id, vec_id) -> + score: one lookup join into the embedding
    store (candidates are the small probe side) then a broadcast join of
    the Q-bounded query block for the cosine."""
    with_vec = nodes.join(emb.select("vec_id", "embedding"), "vec_id")
    return with_vec.join(F.broadcast(queries), "query_id").select(
        "query_id",
        "vec_id",
        F.round(cosine_similarity("embedding", "query_vec"), 6).alias("score"),
    )


def ivf_entry_pairs(
    queries: DataFrame,
    assigned: DataFrame,
    centroids,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """Beam-search entry seeds from the coarse quantizer: (query_id,
    vec_id) pairs covering the members of each query's ``nprobe``
    nearest k-means cells — the production entry-point form the module
    docstring promises. At the scaled cell grain (population ~constant,
    see ``knn_graph_blocked_scaled``) entry-scoring cost per query is
    nprobe * cell_population — CORPUS-INDEPENDENT, unlike the global
    hash sample whose cost grows as N/32.

    ``assigned`` is the (id, cluster_id) assignment frame and
    ``centroids`` the trained centroid list (``plans/ivf.py``
    ``assign_clusters`` supplies both). Centroid routing ranks cells by
    dot product; per-query ranking is invariant to the query's norm, so
    raw query vectors route identically to normalized ones. The Q-bounded
    cell list broadcasts into one equi-join against the corpus-grain
    assignment — never the reverse."""
    from vectordbfaiss_spark.plans.ivf import _nearest_centroids

    qcells = _nearest_centroids(
        queries.select("query_id", "query_vec"), "query_vec", centroids, nprobe
    ).select("query_id", F.explode("cluster_ids").alias("cluster_id"))
    return (
        assigned.select(F.col(id_col).alias("vec_id"), "cluster_id")
        .join(F.broadcast(qcells), "cluster_id")
        .select("query_id", "vec_id")
    )


def graph_serve_knobs(n: int, base_beam: int = 24, base_rounds: int = 6):
    """Corpus-derived serving knobs (beam, rounds): the K-proportional-
    to-N move applied to the search side. Round-7 SCALE.md measured
    recall@10 at FIXED beam=24/rounds=10 decaying 0.88 -> 0.63 -> 0.22
    over 2k -> 200k vectors — constants silently rot as the corpus
    grows, exactly like a fixed IVF cell count. The schedule grows the
    beam as (N/20k)^0.85 past the 20k fixture scale and adds rounds
    logarithmically (frontier depth, not width; diameter of a degree-24
    graph grows as log N). Calibrated on the round-8 syn100 beam sweep
    (SCALE.md: recall@10 at 200k random vectors = 0.218 @ beam 24 /
    0.378 @ 76 / 0.536 @ 160 / 0.658 @ 280, rounds 12): the 0.85
    exponent lands beam 170 at 200k — above the measured 0.5 crossing —
    while fixture scales keep the measured beam-24 default, so registry
    floors are untouched. Per-query serve cost is ~beam * degree *
    rounds: sublinear in N under this schedule, vs the linear
    entry-scoring term the IVF-seeded form already eliminated.

    The rounds schedule interpolates between two MEASURED anchors:
    6 at the 20k fixture (round-9 sweep — top-10 recall identical from
    rounds=4 on, fixed point at 8; 6 keeps a buffer without paying the
    saturated tail) and 12 at syn100's 200k (the operating point the
    round-8 beam sweep calibrated recall 0.55 at), i.e. +6 rounds per
    corpus decade. Steeper than the old +2/decade guess, but both of
    its anchors are measured; the syn300+ ladder rungs refine it."""
    import math

    beam = max(base_beam, math.ceil(base_beam * (n / 20000.0) ** 0.85))
    rounds = base_rounds + max(0, math.ceil(6 * math.log10(max(n, 1) / 20000.0)))
    return beam, rounds


def hash_entry_pairs(
    store: DataFrame, queries: DataFrame, n_entries: int
) -> DataFrame:
    """The hash-spread entry sample as an EXPLICIT (query_id, vec_id)
    seed frame, drawn from ``store`` — for callers whose seedable node
    set is narrower than the scoring corpus. The incremental-insert
    witness needs this: seeding from the FULL corpus can seed an
    inserted id directly, letting ``self_found`` pass without the delta
    reverse links it claims to prove (round-7 advisor finding); drawing
    the sample from the BASE store only makes reachability of inserts
    depend on the delta edges alone."""
    entries = (
        store.select("vec_id")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(n_entries)
    )
    return entries.crossJoin(F.broadcast(queries.select("query_id")))


def graph_beam_search(
    queries: DataFrame,
    edges: DataFrame,
    emb: DataFrame,
    beam: int = 24,
    rounds: int = 10,
    n_entries: int | None = None,
    entry_pairs: DataFrame | None = None,
    exclude_entry_ids: DataFrame | None = None,
) -> DataFrame:
    """All visited-and-scored nodes per query after ``rounds`` of beam
    expansion: (query_id, vec_id, score). Callers take their top-k and/or
    check self-reachability from this one frame.

    ``queries`` is (query_id, query_vec) and must be query-bounded (the
    broadcast contract of operators/topk.py). ``edges`` is the published
    kNN artifact (src, dst). Entry points, in precedence order:
    ``entry_pairs`` — an explicit (query_id, vec_id) seed frame (the
    production form: IVF-seeded entries from the nprobe nearest cells,
    see :func:`ivf_entry_pairs` — entry cost is per-cell, corpus-
    INDEPENDENT at the scaled cell grain); else a hash-spread global
    sample of ``n_entries`` nodes (default max(16, N/32) — honest at
    fixture scale, but entry scoring grows with the corpus).

    ``exclude_entry_ids``: ids that must NOT be seeded as entry points —
    the tombstone half of the serve-time DELETE contract. Dropping a
    deleted id's edges (``apply_tombstones``) keeps it out of every
    expansion round, but the SEED sample comes from the embedding store,
    which still contains tombstoned vectors until compaction (deletes
    are logical); without this anti-join a deleted id could be seeded,
    scored, and returned despite having zero edges (round-7 advisor
    finding). Applied to both entry forms.
    """
    if entry_pairs is not None:
        seed_pairs = entry_pairs.select("query_id", "vec_id")
        if exclude_entry_ids is not None:
            seed_pairs = seed_pairs.join(
                F.broadcast(exclude_entry_ids.select("vec_id")),
                "vec_id",
                "left_anti",
            )
    else:
        pool = emb.select("vec_id")
        if exclude_entry_ids is not None:
            # anti-join BEFORE the sample limit so the seed budget is
            # met from survivors — excluding after limit(n_entries)
            # would shrink the effective entry count by however many
            # tombstones land in the sample (round-8 advisor finding)
            pool = pool.join(
                F.broadcast(exclude_entry_ids.select("vec_id")),
                "vec_id",
                "left_anti",
            )
        if n_entries is None:
            # only pay the corpus scan when the caller didn't size the
            # entry set explicitly
            n_entries = max(16, emb.count() // 32)
        entries = pool.orderBy(F.xxhash64("vec_id"), "vec_id").limit(n_entries)
        seed_pairs = entries.crossJoin(F.broadcast(queries.select("query_id")))
    visited = (
        _score_against_queries(seed_pairs, queries, emb)
        .withColumn("expanded", F.lit(False))
        .localCheckpoint(eager=True)
    )

    rank_w = W.partitionBy("query_id").orderBy(F.desc("score"), "vec_id")
    # `rounds` is an UPPER BOUND: the loop exits at the fixed point. If a
    # round adds zero rows, the next round's frontier is the same top-beam
    # of the same visited set, so its candidate set is identical and
    # empty again — every remaining round is provably a no-op. Results
    # are bit-identical to running all `rounds`; what the exit saves is
    # the ~6 scheduler stages a saturated round still costs (at fixture
    # scale the beam saturates its reachable neighborhood in 3-5 rounds,
    # and round 8 measured the full fixed loop at 7-22 s of pure stage
    # latency). The per-round count is one job over the just-checkpointed
    # Q-bounded frame — trivial by the same contract that bounds the
    # frame itself.
    #
    # The `expanded` flag cuts what each round actually JOINS: a node's
    # score never changes and `visited` only grows, so a node's rank can
    # only degrade — beam entrants are always last round's additions,
    # and a frontier node expanded in an earlier round has all its
    # neighbors in `visited` already (N(f) ⊆ visited by the round after
    # f was expanded). Hence N(frontier) \ visited ==
    # N(frontier \ expanded) \ visited: expanding ONLY the unexpanded
    # beam slice produces the identical candidate set while the
    # edges-join input shrinks from beam*Q rows every round to just the
    # new entrants (round 9 measured the full-frontier form re-joining
    # the same ~1,200 rows for 8 rounds at sf0.1; the saturated tail
    # rounds now join near-empty frames).
    prev_n = visited.count()
    for _ in range(rounds):
        # top-`beam` of everything seen so far; filter on the RAW rank so
        # InferWindowGroupLimit bounds the window to beam rows per query
        ranked = visited.withColumn("rnk", F.row_number().over(rank_w))
        frontier_new = ranked.filter(
            (F.col("rnk") <= beam) & ~F.col("expanded")
        ).select("query_id", "vec_id")
        cand = (
            frontier_new.join(
                edges.select(F.col("src").alias("vec_id"), "dst"), "vec_id"
            )
            .select("query_id", F.col("dst").alias("vec_id"))
            .distinct()
            .join(
                visited.select("query_id", "vec_id"),
                ["query_id", "vec_id"],
                "left_anti",
            )
        )
        scored = _score_against_queries(cand, queries, emb).withColumn(
            "expanded", F.lit(False)
        )
        visited = (
            ranked.withColumn(
                "expanded", F.col("expanded") | (F.col("rnk") <= beam)
            )
            .drop("rnk")
            .unionByName(scored)
            .localCheckpoint(eager=True)
        )
        cur_n = visited.count()
        if cur_n == prev_n:
            break
        prev_n = cur_n
    return visited.select("query_id", "vec_id", "score")


def graph_beam_search_interactive(
    queries: DataFrame,
    edges: DataFrame,
    emb: DataFrame,
    beam: int = 24,
    rounds: int = 6,
    n_entries: int | None = None,
) -> DataFrame:
    """Request-path twin of :func:`graph_beam_search`: the SAME
    algorithm (hash-sample entries, top-`beam` best-first expansion,
    fixed-point exit) producing a BIT-IDENTICAL visited frame (pinned by
    tests/test_graph_ann.py), but with the per-round bookkeeping on the
    DRIVER and exactly one Spark job per round.

    Why two forms exist: the BSP operator keeps ALL state distributed —
    right for audit/batch workloads where Q can be huge — but each round
    costs a window + distinct + anti-join + checkpoint, ~5-7 exchanges
    of scheduler latency that dwarf the actual work at request-path
    batch sizes (the reference's ``/search`` is Q=1, server.js:217-230).
    Here the frontier/visited/expanded sets live in plain dicts, and a
    round is ONE action: broadcast the (Q*beam)-bounded frontier into an
    equi-join against the edge artifact, lookup-join candidate
    embeddings, score JVM-side with the SAME rounded-cosine expression
    the BSP path uses (bit-identical doubles — no numpy re-derivation),
    and collect the candidate rows back. Everything collected is
    visited-set bounded (~Q * beam * degree rows per round); the
    corpus-sized tables are only ever streamed scan sides.

    Scale contract: driver state is O(Q * visited-per-query) — the
    request-path assumption is Q small (interactive k-NN serving), NOT
    the corpus. For corpus-sized query sets (recall audits, self-join
    analytics) use :func:`graph_beam_search`, whose state stays in
    executors. Corpus size only enters through the streamed join sides,
    so the per-round job shape is the 100-TB shape already.
    """
    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    # pin the two stream sides ONCE per request: every round's job joins
    # the frontier against edges and the candidates against emb, and
    # without the checkpoint each of the ~`rounds` jobs re-scans and
    # re-decodes both parquet relations (measured as the round job's
    # dominant input cost at fixture scale). One narrow materialization
    # each turns those into executor block reads; both frames are the
    # columns the traversal needs, nothing more (guide §4.1 projection).
    emb = emb.select("vec_id", "embedding").localCheckpoint(eager=True)
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    if n_entries is None:
        n_entries = max(16, emb.count() // 32)
    entry_ids = [
        r[0]
        for r in emb.select("vec_id")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(n_entries)
        .collect()
    ]
    # materialize the Q-bounded query block ONCE as a local relation —
    # broadcasting the original `queries` subtree would re-run its scan
    # (typically a filtered corpus read) every round
    q_rows = queries.select("query_id", "query_vec").collect()
    qids = [r[0] for r in q_rows]
    q_local = spark.createDataFrame(
        [(r[0], list(r[1])) for r in q_rows],
        queries.select("query_id", "query_vec").schema,
    )

    def _score(pairs_pdf: "pd.DataFrame") -> "pd.DataFrame":
        pairs = spark.createDataFrame(pairs_pdf)
        return (
            F.broadcast(pairs)
            .join(emb.select("vec_id", "embedding"), "vec_id")
            .join(F.broadcast(q_local), "query_id")
            .select(
                "query_id",
                "vec_id",
                F.round(
                    cosine_similarity("embedding", "query_vec"), 6
                ).alias("score"),
            )
        ).toPandas()

    seed = pd.DataFrame(
        {
            "query_id": np.repeat(
                np.array(qids, dtype=np.int64), len(entry_ids)
            ),
            "vec_id": np.tile(np.array(entry_ids, dtype=np.int64), len(qids)),
        }
    )
    visited: dict[int, dict[int, float]] = {q: {} for q in qids}
    for q, v, s in _score(seed).itertuples(index=False):
        visited[q][v] = s
    expanded: dict[int, set] = {q: set() for q in qids}

    for _ in range(rounds):
        fr_q: list[int] = []
        fr_v: list[int] = []
        for q in qids:
            # same total order as the BSP window: score DESC, vec_id ASC
            top = sorted(visited[q].items(), key=lambda kv: (-kv[1], kv[0]))[
                :beam
            ]
            for v, _s in top:
                if v not in expanded[q]:
                    fr_q.append(q)
                    fr_v.append(v)
                    expanded[q].add(v)
        if not fr_q:
            break
        frontier = spark.createDataFrame(
            pd.DataFrame(
                {
                    "query_id": np.array(fr_q, dtype=np.int64),
                    "vec_id": np.array(fr_v, dtype=np.int64),
                }
            )
        )
        # one fused job: frontier -> out-edges -> embedding lookup ->
        # JVM-scored candidates collected back (duplicate (q, dst) pairs
        # are scored redundantly rather than paying a distinct shuffle —
        # dedup is a dict insert on the driver)
        cand = (
            F.broadcast(frontier)
            .join(edges.select(F.col("src").alias("vec_id"), "dst"), "vec_id")
            .select("query_id", F.col("dst").alias("vec_id"))
        )
        scored = (
            F.broadcast(cand)
            .join(emb.select("vec_id", "embedding"), "vec_id")
            .join(F.broadcast(q_local), "query_id")
            .select(
                "query_id",
                "vec_id",
                F.round(
                    cosine_similarity("embedding", "query_vec"), 6
                ).alias("score"),
            )
        ).toPandas()
        added = 0
        for q, v, s in scored.itertuples(index=False):
            if v not in visited[q]:
                visited[q][v] = s
                added += 1
        if added == 0:
            break
    out = pd.DataFrame(
        [(q, v, s) for q in qids for v, s in visited[q].items()],
        columns=["query_id", "vec_id", "score"],
    )
    return spark.createDataFrame(
        out, "query_id long, vec_id long, score double"
    )
