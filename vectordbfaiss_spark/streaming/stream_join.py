"""Stream-stream interval join — clicks enriched with same-user purchases
in a trailing time window, both sides unbounded.

The streaming planner needs (a) watermarks on both sides to bound join
state and (b) a time-range predicate so old state can be evicted; with
those, each side buffers only the watermark horizon. The same declarative
condition runs as a plain batch join (the test's twin), one more instance
of this engine's two-modes-one-semantics pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def click_purchase_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window_minutes: int = 60,
    watermark: str = "45 days",
) -> DataFrame:
    """Pairs (click, purchase) for the same user with the purchase in the
    ``window_minutes`` before the click (inclusive).

    Streaming: state on each side is bounded by the watermark; the range
    predicate lets the join evict rows older than the horizon. The wide
    test watermark keeps every match (determinism for the batch-twin
    comparison); production would use minutes-hours.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (c.user_id == p.p_user_id)
        & (p.purchase_ts <= c.click_ts)
        & (p.purchase_ts >= c.click_ts - F.expr(f"INTERVAL {window_minutes} MINUTES"))
    )
    return c.join(p, cond).select(
        "click_id",
        "user_id",
        "click_ts",
        "purchase_ts",
        F.round("purchase_value", 6).alias("purchase_value"),
    )
