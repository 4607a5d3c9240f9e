"""Local replica of the driver's DuckDB-oracle correctness gate.

The driver runs each ``queries()[name]`` against ``oracle_sql()[name]`` and
compares row count + schema + order-insensitive value hash. This harness
does the same comparison locally (with a tiny float tolerance so we can
distinguish "semantic bug" from "last-ulp noise") so every registry entry
is validated at sf0.001 before the driver sees it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from vectordbfaiss_spark.session import TABLE_NAMES

FLOAT_ATOL = 1e-9
FLOAT_RTOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # Decimal / bytes normalization
            df[c] = df[c].map(lambda v: float(v) if hasattr(v, "as_tuple") else v)
    sort_cols = list(df.columns)
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def compare_frames(mine: pd.DataFrame, oracle: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    if len(mine) != len(oracle):
        problems.append(f"{name}: row count {len(mine)} vs oracle {len(oracle)}")
        return problems
    if sorted(mine.columns) != sorted(oracle.columns):
        problems.append(
            f"{name}: columns {sorted(mine.columns)} vs oracle {sorted(oracle.columns)}"
        )
        return problems
    a, b = _normalize(mine), _normalize(oracle)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            for i, (x, y) in enumerate(zip(av.astype(float), bv.astype(float))):
                both_nan = (isinstance(x, float) and math.isnan(x)) and (
                    isinstance(y, float) and math.isnan(y)
                )
                xn = None if x is None or (isinstance(x, float) and math.isnan(x)) else x
                yn = None if y is None or (isinstance(y, float) and math.isnan(y)) else y
                if both_nan or (xn is None and yn is None):
                    continue
                if xn is None or yn is None or not math.isclose(
                    x, y, rel_tol=FLOAT_RTOL, abs_tol=FLOAT_ATOL
                ):
                    problems.append(
                        f"{name}.{c}[{i}]: {x!r} vs oracle {y!r}"
                    )
                    if len(problems) > 5:
                        return problems
        else:
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"{name}.{c}: {int(neq.sum())} mismatches, first at [{i}]: "
                    f"{av[i]!r} vs oracle {bv[i]!r}"
                )
    return problems


def run_pair(spark, name: str, sf_dir: str) -> list[str]:
    """Execute one registry entry on Spark + DuckDB and compare."""
    from vectordbfaiss_spark import registry

    fn = registry.queries()[name]
    sql = registry.oracle_sql().get(name)
    mine = fn(spark, sf_dir).toPandas()
    if sql is None:
        # rows-only entries still must produce rows — an empty result would
        # silently pass the driver's weaker check while meaning "broken"
        return [] if len(mine) > 0 else [f"{name}: rows-only query returned 0 rows"]
    con = duckdb_connection(sf_dir)
    oracle = con.sql(sql).df()
    con.close()
    return compare_frames(mine, oracle, name)
