"""Single-pass table profiling: per-column null count, distinct count,
min/max — the stats report a curation pipeline runs before deciding
filters, and the cheap sibling of ANALYZE TABLE.

Shape: ONE aggregate over the scan computes every column's stats as a
single wide row (Catalyst evaluates all the aggregates in one pass), then
a ``stack`` unpivot turns it into one row per column. No per-column scan,
no shuffle beyond the scalar aggregate's single-row exchange. Numeric
mins/maxes are emitted as rounded doubles and string-ish columns as
strings — never numerics cast to strings, whose formatting is
engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile(df: DataFrame, num_cols: list[str], str_cols: list[str]) -> DataFrame:
    aggs = [F.count("*").alias("__n")]
    for c in num_cols + str_cols:
        aggs += [
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
            ).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__dist"),
        ]
    for c in num_cols:
        aggs += [
            F.round(F.min(c).cast("double"), 6).alias(f"{c}__min"),
            F.round(F.max(c).cast("double"), 6).alias(f"{c}__max"),
        ]
    for c in str_cols:
        aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")]
    wide = df.agg(*aggs)

    def block(c: str, numeric: bool) -> list[str]:
        min_num = f"`{c}__min`" if numeric else "CAST(NULL AS DOUBLE)"
        max_num = f"`{c}__max`" if numeric else "CAST(NULL AS DOUBLE)"
        min_str = "CAST(NULL AS STRING)" if numeric else f"`{c}__min`"
        max_str = "CAST(NULL AS STRING)" if numeric else f"`{c}__max`"
        return [
            f"'{c}'",
            f"CAST(`{c}__nulls` AS BIGINT)",
            f"CAST(`{c}__dist` AS BIGINT)",
            min_num,
            max_num,
            min_str,
            max_str,
        ]

    parts = [cell for c in num_cols for cell in block(c, True)]
    parts += [cell for c in str_cols for cell in block(c, False)]
    n = len(num_cols) + len(str_cols)
    stacked = wide.select(
        F.col("__n").cast("long").alias("n_rows"),
        F.expr(
            f"stack({n}, {', '.join(parts)}) AS "
            "(col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
        ),
    )
    return stacked.select(
        "col_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )
