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
#   round 3 (this order): two sentinels that must stay green every round,
#   then every query with NO driver-verified row in rounds 1-2, in their
#   natural registration order (per CORRECTNESS_r01/r02: 73 unique queries
#   verified, 83 never sampled). Rows-only entries are NOT curated out of
#   the window — the gate sees the registry as it is; new round-3 queries
#   join their natural position in the never-verified block. The ~35
#   never-verified queries that still fall past position 50 are the head of
#   round 4's rotation.
_PRIORITY: tuple[str, ...] = (
    # sentinels: flagship operators re-proven every round
    "topk_search",
    "ingest_index_build",
    # NEW round-3 operators: highest-risk code, driver-proven first
    "pii_redact_docs",
    "url_normalize_filter",
    "crossdoc_span_scrub",
    "semdedup_prune",
    "semdedup_witness_bound",
    "merge_upsert_docs",
    "zorder_layout_audit",
    "dsir_importance_weights",
    "hard_negative_mining",
    # session-2 round-3 operators (same highest-risk-first rationale):
    # the search-index / diagnostics / binary-quantization families
    "inverted_index_build",
    "kmv_overlap_sketch",
    "binary_hamming_rerank_topk",
    "webdataset_tar_roundtrip",
    "matryoshka_truncation_audit",
    "search_snippet_extraction",
    # session-3 round-3 operators: vector-store lifecycle (FAISS
    # remove_ids/add parity) + schema-evolution source read
    "vector_store_crud_search",
    "ivf_tombstone_search",
    "ivf_append_search",
    "ivf_compact_search",
    "schema_evolution_read",
    "entity_resolution_golden",
    "entity_resolution_incremental",
    "join_size_estimate",
    "quality_prune_tradeoff",
    "ivf_nprobe_curve",
    "maxsim_late_interaction",
    "snapshot_vacuum_audit",
    # never-driver-verified queries, natural registration order
    "corpus_health_report",
    "mixture_sampling_plan",
    "dedup_minhash_incremental",
    "dedup_survivors",
    "leakage_safe_split_assign",
    "sequence_packing_bins",  # re-verify: rewritten shard-parallel in r3
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
    "skew_salted_event_totals",  # streaming-twin family: all 4 in-window
    "window_nth_value_events",
    # ---- driver's 50-row sample boundary lands here ----
    # (head of round 4's rotation: the session-3 queries that no longer
    # fit the packed window, then the demoted relational basics)
    "bpe_fertility_by_lang",
    "dp_noised_event_counts",
    "scd2_event_intervals",
    "funnel_view_click_purchase",
    "retention_cohorts_weekly",
    "daily_gapfill_event_counts",
    "latest_event_per_user",
    "null_safe_join_status",
    "embedding_norm_health",
    "exists_not_exists_customers",
    "ntile_percent_rank_orders",
    "grouping_sets_lineitem",
    # (the relational basics below were demoted from the window to make
    # room for the session-2/3 families: lowest-risk entries, heavily
    # covered by the local oracle harness; head of round 4's rotation)
    "stats_summary_lineitem",
    "regexp_extract_all_docs",
    "median_mode_orders",
    "min_max_by_orders",
    "datetime_functions_orders",
    "null_handling_suppliers",
    "array_set_functions",
    "higher_order_array_funcs",
    "unpivot_lineitem_measures",
    "bitwise_agg_lineitem",
    "trending_types_daily_top2",
    "map_functions_events",
    "decimal_exact_revenue",
    "fuzzy_name_match",
    "explode_outer_long_words",
    "zscore_outlier_events",
    "incremental_daily_agg",
    "histogram_order_values",
    "profile_orders_table",
    "variant_json_extract_events",
    "ewma_daily_counts",
    "bool_aggregates_orders",
    "fk_integrity_audit",
    "hll_distinct_users_daily_merge",
    "sql_lateral_view_tokens",
    "cms_heavy_hitters",
    "orc_roundtrip_supplier",
    "ivf_topk_search",
    "ivf_disk_search",
    "ivf_recall_report",
    "ivf_recall_bound",
    "pq_topk_search",
    "pq_rerank_topk",
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
