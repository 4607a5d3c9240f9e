"""As-of (nearest-preceding) join — the time-series lookup Spark lacks as a
built-in, expressed as a composition of existing operators (SURVEY custom-
operator rule (a): composition before UDFs).

``asof_join_backward(left, right, ...)``: for each left row, attach the
right row with the greatest ``time_col`` <= the left row's time, per ``by``
group (the classic trades->quotes / events->checkpoint lookup).

Implementation: tag both sides, union, and take ``last(value, ignorenulls)``
over a (by, time) window — right rows sort before left rows at equal
timestamps, so "at or before" includes exact matches. ONE shuffle on the
``by`` key + an in-partition sort; no range-explode, no per-row probing.
At 100 TB this is the merge-join formulation: both sides co-partition by
key and the window is a linear scan — the same shape a native ASOF operator
(e.g. DuckDB's, which the oracle uses) executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    time_col: str,
    right_values: dict[str, str],
) -> DataFrame:
    """Left rows + nearest-preceding right values.

    ``right_values``: {right_col: output_alias} — the right-side columns to
    carry (aliased, so the right's own time can be exported too). Left rows
    with no preceding right row keep NULLs (left-outer semantics).
    """
    r_vals = [F.col(c).alias(a) for c, a in right_values.items()]
    l_tagged = left.withColumn("_is_left", F.lit(1))
    r_tagged = right.select(
        *by, F.col(time_col), *r_vals
    ).withColumn("_is_left", F.lit(0))
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(time_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(a, ignorenulls=True).over(w).alias(f"_m_{a}")
            for a in right_values.values()
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_m_{a}").alias(a) for a in right_values.values()
    ]
    return filled.filter(F.col("_is_left") == 1).select(*out_cols)
