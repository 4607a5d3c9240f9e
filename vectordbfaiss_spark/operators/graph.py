"""Connected components over an edge DataFrame — the clustering step that
turns near-duplicate PAIRS into duplicate GROUPS.

Every pairwise dedup operator in this engine (exact, n-gram Jaccard,
MinHash-LSH, SimHash, embedding cosine — operators/dedup.py, lsh.py) emits
(id_a, id_b) pairs; choosing ONE canonical document per duplicate *group*
requires the transitive closure of those pairs. The reference never needs
this (its dedup is exact-match UNIQUE, server.js:29,198 — groups are
implicit), but any near-dup pipeline at scale does.

Algorithm: iterative min-label propagation with pointer jumping
(label <- min(label, neighbors' labels, label's label)). The pointer-
jumping step halves path lengths each round, so convergence is
O(log(diameter)) DataFrame iterations, each one shuffle on the edge key —
the standard Spark formulation of the large-star/small-star family
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14).
Each iteration is localCheckpoint-ed: iterative lineage otherwise grows a
plan Catalyst re-optimizes from scratch every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, component) with component = min node id reachable.

    ``edges`` is undirected input (each pair listed once in either
    direction); isolated nodes are absent by construction (callers union
    them back if needed — duplicate-group analytics only cares about nodes
    with at least one edge).

    Driver-side convergence check per round (a one-row count): iterative
    graph algorithms are the one place a driver loop is the *correct*
    Spark shape — the loop body stays fully distributed.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # neighbor minimum: min label over adjacent nodes. The pre-update
        # label rides along as old_label so convergence is ONE cheap
        # filter-count over the round's eagerly checkpointed result —
        # no old-vs-new join (round count dominates wall-time on sparse
        # graphs since every job is overhead-bound).
        neigh = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        stepped = labels.join(neigh, labels.id == neigh.u, "left").select(
            "id",
            F.col("label").alias("old_label"),
            F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping: label <- label(label); halves chain depth.
        # ONE jump per round — chaining a second self-join onto the first
        # without a checkpoint between triggers a pathological stall in
        # AQE (rounds 9+ ran 12 s -> 87 s mostly IDLE on a 2k-edge graph;
        # single-jump rounds stay ~0.5 s flat), and a checkpoint between
        # jumps costs the job the second jump was meant to save.
        l2 = stepped.select(
            F.col("id").alias("p_id"), F.col("label").alias("p_label")
        )
        stepped = stepped.join(l2, stepped.label == l2.p_id, "left").select(
            "id",
            "old_label",
            F.least(
                F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
            ).alias("label"),
        )
        # EAGER checkpoint: a lazy one (eager=False) does not reliably cut
        # lineage for plans derived before materialization — measured
        # exponential re-execution across rounds (92 s by round 10 on a
        # 2k-edge graph). The convergence count then runs on the
        # materialized partitions, so it costs one cheap job, not a join.
        jumped = stepped.localCheckpoint(eager=True)
        changed = jumped.filter(F.col("label") != F.col("old_label")).count()
        labels = jumped.select("id", "label")
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("component"))


def pagerank_int(
    sym_edges: DataFrame,
    iterations: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank in INTEGER arithmetic: (id, pagerank_scaled).

    Ranks are maintained as BIGINTs scaled by ``scale`` and every update is
    integer-exact — ``contrib = rank div degree``, ``rank' = (100 -
    damping_pct)% of scale + (damping_pct * sum(contribs)) div 100`` — so
    the result is bit-identical across engines and partitionings (floating
    -point PageRank is NOT: cross-partition sum order perturbs ulps, which
    a hash-compare oracle cannot tolerate; rounding per iteration would
    compound). Precision loss vs float is bounded by iterations/scale —
    irrelevant at scale=1e12.

    ``sym_edges`` must be symmetric (both directions present), the same
    contract as :func:`connected_components` — every node then has
    out-degree >= 1, so there is no dangling mass to redistribute.

    Scale shape: degree is computed once; each round is one shuffle join
    (ranks x edges on the source key) plus one hash aggregate on dst —
    the Pregel step as DataFrames — checkpointed per round like the
    components loop so lineage stays flat.
    """
    sym = sym_edges.select("src", "dst").localCheckpoint(eager=True)
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    base = F.lit((100 - damping_pct) * scale // 100).cast("long")
    ranks = deg.select(
        F.col("src").alias("id"), F.lit(scale).cast("long").alias("r")
    )
    for _ in range(iterations):
        contribs = (
            sym.join(ranks, sym.src == ranks.id)
            .join(deg, "src")
            .select(F.col("dst"), F.expr("r div deg").alias("contrib"))
        )
        ranks = (
            contribs.groupBy(F.col("dst").alias("id"))
            .agg(F.sum("contrib").alias("s"))
            .select(
                "id",
                (base + F.expr(f"({damping_pct} * s) div 100"))
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", F.col("r").alias("pagerank_scaled"))
