"""Query registry: every implemented operator as a named (PySpark, oracle
SQL) pair — the driver contract surface (see ``__spark_entry__.py``).

Conventions that make the DuckDB hash-compare deterministic:
- every computed column is aliased IDENTICALLY in Spark and SQL;
- float outputs are ``round(x, 6)`` (money ``round(x, 4)``) on BOTH sides —
  double math agrees to ~1e-12 across engines, rounding removes ulp noise;
- rankings round scores BEFORE ranking and tie-break on an id so order is
  engine-independent;
- timestamps in outputs are formatted to strings (UTC) — avoids tz/epoch
  representation drift between Spark and DuckDB.

Query definitions live in ``vectordbfaiss_spark.queries.*`` grouped by
category; importing this module populates the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# Queries that are deliberately declared WITHOUT an oracle (non-SQL-
# expressible: ML-backed, streaming-stateful, opaque-binary). The driver
# records a weaker rows-only check for these.
ROWS_ONLY: set[str] = set()


def register(name: str, oracle: str | None = None, rows_only: bool = False):
    """Decorator: add a query (and its DuckDB oracle SQL, or an explicit
    rows-only opt-out)."""
    if oracle is None and not rows_only:
        raise ValueError(f"{name}: provide oracle SQL or set rows_only=True")

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        else:
            ROWS_ONLY.add(name)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(ORACLES)


_loaded = False

# Registry iteration order. The driver's correctness gate samples the FIRST
# ~50 of ``queries()`` in dict-insertion order, so the order is ROTATED each
# round to extend cumulative driver-verified coverage rather than re-proving
# the same window:
#   round 1 verified the first 50 of the natural module order;
#   round 2 front-loaded the per-operator primaries (50/50 green);
#   round 3 rotated to the round-3 additions + the never-verified backlog
#   (cumulative driver-sampled after r3: 120/224);
#   round 4: growth frozen (+2 PQ bound twins), window = sentinels + the
#   45 next never-verified rows (cumulative driver-sampled after r4:
#   167/230);
#   round 5 verified 48 more (cumulative 215/230);
#   round 6 verified the last 15 never-sampled + all 19 additions,
#   closing cumulative coverage at 255/255;
#   round 7 rotated to: sentinels + round-7 additions + the stalest
#   round-1/round-2 evidence (cumulative coverage stayed closed);
#   round 8 (this order): sentinels + every query whose CODE changed
#   this round (the whole graph-ANN audit family — shared published
#   traversals + hardened delete/insert witnesses — plus the
#   re-aggregated quality_prune_tradeoff and the memoized-embedder
#   checksum), then the stalest evidence: the 18 queries whose latest
#   driver sample is round 2, then the oldest round-3 block, in their
#   historical sample order.
_PRIORITY: tuple[str, ...] = (
    # sentinels: flagship operators re-proven every round
    "topk_search",
    "ingest_index_build",
    # ---- round-9 changed queries (need fresh driver rows) ----
    "sql_routed_search_hydrated",  # NEW: embed() + hydration front door
    "recursive_cte_knn_bfs",       # frontier broadcast hint
    "graph_ann_topk_search",       # interactive kernel, rounds 6
    "sql_routed_graph_topk",       # interactive kernel via router
    "sql_routed_topk",             # router code touched (grammar ext)
    "sql_routed_topk_multi",
    "graph_ann_recall_bound",      # artifacts rebuilt: rounds 10->6,
    "graph_ann_build_bound",       # seed anti-join order
    "graph_ann_ivf_entries",
    "graph_ann_incremental",
    "graph_ann_delete_serve",
    "graph_ann_compact_serve",
    "graph_ann_beam_curve",
    "dedup_minhash_capped",        # syn300 ladder families re-proven
    "dedup_simhash_capped",
    "knn_graph_blocked",
    # refresh block: stalest evidence (latest sample round 3)
    "schema_evolution_read",
    "entity_resolution_golden",
    "entity_resolution_incremental",
    "join_size_estimate",
    "ivf_nprobe_curve",
    "maxsim_late_interaction",
    "snapshot_vacuum_audit",
    "corpus_health_report",
    "mixture_sampling_plan",
    "dedup_minhash_incremental",
    "dedup_survivors",
    "leakage_safe_split_assign",
    "q13_customer_distribution",
    "q16_supplier_relationship",
    "q6_forecast_revenue",
    "q12_shipping_priority_split",
    "q4_order_priority_checking",
    "q10_returned_item_revenue",
    "q14_promo_revenue_pct",
    "q18_large_volume_orders",
    "range_join_orders_events",
    "approx_percentiles_order_value",
    "sessionize_events_batch",
    "interval_join_click_purchase",
    "session_window_builtin",
    "skew_salted_event_totals",
    "window_nth_value_events",
    # refresh block: next-oldest (latest sample round 4)
    "ivf_tombstone_search",
    "pq_recall_bound",
    "ivfpq_recall_bound",
    "bpe_fertility_by_lang",
    "dp_noised_event_counts",
    "scd2_event_intervals",
)


def _load() -> None:
    global _loaded
    if _loaded:
        return
    _loaded = True
    # import for side effect: each module registers its queries
    from vectordbfaiss_spark.queries import (  # noqa: F401
        analytics_extras,
        bpe,
        curation,
        dedup,
        embedding_analysis,
        graph_cluster,
        ingest_e2e,
        ops_diagnostics,
        pipeline_extras,
        ranking,
        reference_parity,
        relational,
        relational_ext,
        relational_more,
        scrub,
        search_index,
        sketches_sql,
        sources_io,
        text_analysis,
        tpch_extra,
        vector_search,
    )

    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    for n, fn in QUERIES.items():
        ordered.setdefault(n, fn)
    QUERIES.clear()
    QUERIES.update(ordered)
