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
    # ---- round-8 changed queries (need fresh driver rows) ----
    "quality_prune_tradeoff",
    "hash_embedder_checksum",
    "graph_ann_topk_search",
    "graph_ann_build_bound",
    "graph_ann_recall_bound",
    "graph_ann_ivf_entries",
    "graph_ann_incremental",
    "graph_ann_delete_serve",
    "graph_ann_compact_serve",
    "graph_ann_beam_curve",
    "sql_routed_graph_topk",
    # refresh block: stalest evidence (latest sample round 2)
    "csv_roundtrip_part",
    "json_roundtrip_events",
    "relevant_tokens_report",
    "udtf_chunk_spans",
    "text_term_freq_top20",
    "embedding_near_dup_lsh",
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_audio_windows",
    "text_token_stats",
    "text_quality_score",
    "text_language_id",
    "text_fingerprint",
    "text_bpe_token_count",
    "tfidf_top_terms",
    "curation_pipeline",
    "sql_routed_topk",
    # refresh block: next-oldest evidence (latest sample round 3)
    "sequence_packing_bins",
    "pii_redact_docs",
    "url_normalize_filter",
    "crossdoc_span_scrub",
    "semdedup_prune",
    "semdedup_witness_bound",
    "merge_upsert_docs",
    "zorder_layout_audit",
    "dsir_importance_weights",
    "hard_negative_mining",
    "inverted_index_build",
    "kmv_overlap_sketch",
    "binary_hamming_rerank_topk",
    "webdataset_tar_roundtrip",
    "matryoshka_truncation_audit",
    "search_snippet_extraction",
    "vector_store_crud_search",
    "ivf_append_search",
    "ivf_compact_search",
    "schema_evolution_read",
    "entity_resolution_golden",
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
