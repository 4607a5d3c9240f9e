"""Mergeable-sketch aggregation (HLL) and the SQL-string API surface.

HLL sketches are the 100 TB answer to distinct counting: partials built
per partition merge associatively, so re-aggregation across days/shards
never re-touches raw ids (the same reason the reference's COUNT(*) at
server.js:67,149 scales and its in-memory index does not). Sketch bytes
are engine-private, so the registry entry is rows-only; the error bound
against exact countDistinct is pinned in tests/test_approx.py.

The SQL query demonstrates the other half of the API surface: the entire
engine is reachable through ``spark.sql`` strings over registered views —
LATERAL VIEW posexplode here, since array explode positions are the one
construct the DataFrame queries express only via ``F.posexplode``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import load_table

# ---------------------------------------------------------------------------
# HLL sketch build -> merge -> estimate (rows-only: sketch internals are
# engine-private; tests pin the error bound vs exact)
# ---------------------------------------------------------------------------


@register("hll_distinct_users_daily_merge", rows_only=True)
def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via two-level HLL merge: sketch per
    (event_type, day) partial, then union-merge across days — the
    re-aggregatable rollup pattern. `exact` is computed alongside so the
    result itself documents the estimate quality.

    Scale plan: raw user_ids leave the mappers already sketched (fixed
    ~KB per group instead of a distinct shuffle of every id); day-level
    partials can be persisted and merged incrementally — recomputing a
    30-day distinct count touches 30 sketches, zero raw rows.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").alias("daily_exact"),
    )
    return (
        daily.groupBy("event_type")
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            "event_type",
            F.hll_sketch_estimate("merged").alias("est_users"),
        )
        .join(
            e.groupBy("event_type").agg(
                F.countDistinct("user_id").alias("exact_users")
            ),
            "event_type",
        )
    )


# ---------------------------------------------------------------------------
# SQL-string API surface: LATERAL VIEW posexplode over a registered view
# ---------------------------------------------------------------------------

_LATERAL_ORACLE = r"""
WITH toks AS (
  SELECT unnest(l) AS tok, generate_subscripts(l, 1) - 1 AS pos
  FROM (SELECT string_split_regex(trim(text), '\s+') AS l FROM documents)
)
SELECT tok,
       count(*) AS n_occurrences,
       CAST(sum(pos) AS BIGINT) AS pos_sum
FROM toks
WHERE tok <> ''
GROUP BY tok
HAVING count(*) >= 200
"""


@register("sql_lateral_view_tokens", _LATERAL_ORACLE)
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequencies with positional sums, written as a pure SQL string
    (LATERAL VIEW posexplode) over a registered temp view — proving the
    spark.sql surface reaches the same engine as the DataFrame API (the
    two compile to identical plans; SURVEY §7 design stance).
    """
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__sql_docs_v"
    )
    return spark.sql(r"""
        SELECT tok,
               count(*) AS n_occurrences,
               CAST(sum(pos) AS BIGINT) AS pos_sum
        FROM __sql_docs_v
        LATERAL VIEW posexplode(split(trim(text), '\\s+')) t AS pos, tok
        WHERE tok != ''
        GROUP BY tok
        HAVING count(*) >= 200
    """)
