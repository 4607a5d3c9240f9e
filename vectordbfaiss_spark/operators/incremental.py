"""Incremental materialized-view maintenance: algebraic aggregate state.

A 100 TB pipeline never recomputes a daily rollup from scratch — it keeps
the aggregate's PARTIAL state (the algebraic accumulators: count, sum,
min, max) per key and folds each new batch in. This module models that:

- ``partial_daily_state(events)``: batch -> per-(event_type, day) state
  rows (n, sum_value, min_value, max_value).
- ``merge_states(a, b)``: fold two state tables — union + one hash
  aggregate keyed on the view key. Associative and commutative, so it
  works per-microbatch, per-backfill-chunk, or tree-wise across 1000
  executors; the shuffle is keyed on the VIEW key (types x days), which
  is orders of magnitude smaller than the event volume.
- ``finalize(state)``: derive the presentable measures (avg = sum/n) at
  read time; derived measures are never stored, so merges stay exact.

The correctness contract (oracled in the registry as
``incremental_daily_agg``): state built from any partition of the input
and merged in any order equals the from-scratch aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

KEYS = ["event_type", "day"]


def partial_daily_state(events: DataFrame) -> DataFrame:
    """events(ts, event_type, value) -> one state row per (type, day)."""
    return (
        events.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "value",
        )
        .groupBy(*KEYS)
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def merge_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two partial-state tables into one (associative merge)."""
    return (
        a.unionByName(b)
        .groupBy(*KEYS)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def finalize(state: DataFrame) -> DataFrame:
    """State -> presentable view row (derived measures computed here)."""
    return state.select(
        *KEYS,
        F.col("n").cast("long").alias("n"),
        F.round("sum_value", 6).alias("sum_value"),
        F.round(F.col("sum_value") / F.col("n"), 6).alias("avg_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )
