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


def _load() -> None:
    global _loaded
    if _loaded:
        return
    _loaded = True
    # import for side effect: each module registers its queries
    from vectordbfaiss_spark.queries import (  # noqa: F401
        curation,
        dedup,
        graph_cluster,
        ranking,
        reference_parity,
        relational,
        relational_ext,
        relational_more,
        sketches_sql,
        sources_io,
        text_analysis,
        tpch_extra,
        vector_search,
    )
