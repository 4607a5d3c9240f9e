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
#   round 5 (this order): registry growth frozen again; window = the two
#   sentinels + 48 of the 63 queries with no driver row in rounds 1-4
#   (TPC-H tail, the kNN-graph family, BPE train/encode, the reference's
#   own sqlite storage format, the capped-dedup twins, and the
#   embedding-analysis tail — `ridge_probe_auc` enters AFTER its
#   cumulative window was rewritten scale-safe this round). The 15
#   still-unsampled queries at positions 50-64 are round 6's head.
_PRIORITY: tuple[str, ...] = (
    # sentinels: flagship operators re-proven every round
    "topk_search",
    "ingest_index_build",
    # never-driver-verified (rounds 1-4), natural registration order
    "ivfpq_topk_search",
    "sqlite_roundtrip_docs",
    "snapshot_pinned_read_docs",
    "text_repetition_filter",
    "crossdoc_span_dedup",
    "winnowing_fingerprints",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_suppliers",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_heavy_shippers",
    "q21_lone_fault_supplier",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "nn_classify",
    "cosine_pairs_threshold",
    "lsh_bucket_histogram",
    "embedding_int8_quantization",
    "label_centroids",
    "embedding_drift_report",
    "sql_routed_topk_multi",
    "bpe_train_merges",
    "bpe_encode_corpus",
    "sequence_packing_payload",
    "bigram_logprob_quality",
    "setsim_prefix_join",
    "minhash_quality_audit",
    "knn_graph_edges",
    "mutual_knn_components",
    "knn_graph_blocked",
    "embedding_standardize",
    "embedding_pca_project",
    "knn_graph_incremental",
    "kcenter_coreset_select",
    "label_propagation_knn",
    "ridge_probe_auc",
    "pagerank_neardup_graph",
    "dedup_minhash_capped",
    "dedup_simhash_capped",
    "recursive_cte_knn_bfs",
    "pmi_collocations",
    "ngram_novelty_scoring",
    "fingerprint_attribution",
    "quality_calibration_deciles",
    "expectations_quarantine",
    # ---- driver's 50-row sample boundary lands here ----
    # (head of round 6's rotation: the last 15 never-verified queries,
    # natural registration order)
    "join_skew_report",
    "bloom_prefilter_join",
    "source_temperature_weights",
    "event_transition_matrix",
    "length_bucketed_batches",
    "event_sequence_pattern",
    "top_event_paths",
    "mad_outlier_events",
    "daily_trend_ols",
    "selfrep_span_scrub",
    "phrase_search_postings",
    "rag_context_budget_pack",
    "inverted_index_incremental",
    "snapshot_diff_report",
    "ranking_eval_metrics",
)


def _load() -> None:
    global _loaded
    if _loaded:
        return
    _loaded = True
    # import for side effect: each module registers its queries
    from vectordbfaiss_spark.queries import (  # noqa: F401
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
