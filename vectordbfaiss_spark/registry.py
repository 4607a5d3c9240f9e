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
#   round 7 (this order): with the ledger closed, the window = the two
#   sentinels + the round-7 additions (new queries, each needing a
#   first driver row) + a refresh block of the STALEST evidence: the
#   14 queries whose only driver sample is round 1, then the oldest
#   round-2-only block, in natural registration order.
_PRIORITY: tuple[str, ...] = (
    # sentinels: flagship operators re-proven every round
    "topk_search",
    "ingest_index_build",
    # ---- round-7 additions (new this round; first driver rows) ----
    "graph_ann_build_bound",
    "graph_ann_ivf_entries",
    "graph_ann_incremental",
    "graph_ann_delete_serve",
    # refresh block: oldest driver evidence (sampled only in round 1)
    "case_when_buckets",
    "q3_shipping_priority",
    "star_join_rollup",
    "anti_join_no_orders",
    "left_outer_with_condition",
    "window_first_events_per_user",
    "window_lag_rolling",
    "pivot_event_counts",
    "q5_local_supplier_volume",
    "cube_lineitem",
    "range_window_last_hour",
    "asof_join_click_purchase",
    "percentiles_order_value",
    "correlated_subquery_orders",
    # refresh block: next-oldest evidence (latest sample round 2),
    # natural registration order
    "text_normalize_docs",
    "benchmark_decontamination",
    "dedup_exact_stats",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "neardup_triangle_count",
    "dedup_cluster_components",
    "bm25_doc_ranking",
    "hybrid_rrf_fusion",
    "filtered_topk_search",
    "weighted_sample_docs",
    "mmr_rerank_topk",
    "text_pipeline_tokenize",
    "hash_embedder_checksum",
    "charcode_mock_embed",
    "documents_dump",
    "in_list_lookup",
    "q1_pricing_summary",
    "semi_join_big_spenders",
    "topn_orders",
    "set_operations",
    "string_functions_part",
    "json_extract_events",
    "tumbling_window_daily",
    "approx_distinct_sketch",
    "sliding_window_2h_1h",
    "text_chunk_documents",
    "rag_answer_extractive",
    "binary_roundtrip_vectors",
    "csv_roundtrip_part",
    "json_roundtrip_events",
    "relevant_tokens_report",
    "udtf_chunk_spans",
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
