"""SQL front door: route ``ORDER BY cosine_similarity(...) DESC LIMIT k``
onto an IVF-partitioned table (SURVEY §4.3 "stretch" — the one plan shape
the layout-encoded index could not serve through SQL until now).

PySpark cannot inject a Catalyst strategy, so the router works at the SQL
string level with a deliberately tight, documented grammar:

    SELECT * | <id_col>
    FROM <table>
    [WHERE <meta_col> = <literal>]
    ORDER BY cosine_similarity(<vec_col>, array(<float literals>)) DESC
    LIMIT <k>

The optional WHERE is the filtered-ANN form: the equality pre-filter
restricts the corpus BEFORE scoring (the excluded fraction is never
scored; parquet pushdown applies). Like every routed query, results are
exact only at ``nprobe >= n_clusters`` — at smaller nprobe the routing is
approximate (standard IVF recall trade-off), including under a WHERE
filter; callers needing exact filtered answers pass full probe or run the
statement verbatim through ``spark.sql``.

- ``cosine_similarity`` is registered as a real Spark SQL function
  (:func:`ensure_sql_functions`), so the SAME statement executes exactly
  via ``spark.sql`` on any table — routing is a transparent optimization,
  not a dialect.
- For a table registered in the :data:`IVF_TABLES` catalog the router
  instead plans: normalize the literal query vector -> nearest ``nprobe``
  centroids (tiny broadcast) -> equi-join on ``cluster_id`` over the
  partition-pruned parquet read -> windowed top-k — the plans.ivf search
  shape where the layout does the pruning.
- With ``nprobe >= n_clusters`` the routed result is EXACT (every
  partition probed), which is what makes the router oracle-checkable;
  smaller nprobe trades recall for pruning exactly like any IVF index.

Ties: SQL ``ORDER BY score DESC LIMIT k`` leaves equal-score order
unspecified; the routed plan pins (score DESC, id ASC) — deterministic,
and a legal instantiation of the SQL semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from vectordbfaiss_spark.plans.ivf import ivf_search


@dataclass
class IvfTable:
    path: str
    centroids: list
    id_col: str = "vec_id"
    vec_col: str = "embedding"


#: name -> IvfTable; registered by the pipeline that built the index
IVF_TABLES: dict[str, IvfTable] = {}


def register_ivf_table(
    name: str,
    path: str,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    IVF_TABLES[name] = IvfTable(path, centroids, id_col, vec_col)


def ensure_sql_functions(spark: SparkSession) -> None:
    """Register ``cosine_similarity(a, b)`` for plain-SQL execution
    (idempotent). Arrow-batched pandas_udf — the exact-fallback path only;
    the routed plan never calls it."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(a, b):
        out = np.empty(len(a))
        for i, (x, y) in enumerate(zip(a, b)):
            xv = np.asarray(x, dtype=np.float64)
            yv = np.asarray(y, dtype=np.float64)
            nx = np.linalg.norm(xv) or 1.0
            ny = np.linalg.norm(yv) or 1.0
            out[i] = float(xv @ yv) / (nx * ny)
        return pd.Series(np.round(out, 6))

    spark.udf.register("cosine_similarity", pandas_udf(_cos, "double"))


_PATTERN = re.compile(
    r"""^\s*SELECT\s+(?P<proj>\*|[A-Za-z_]\w*)\s+
        FROM\s+(?P<tbl>[A-Za-z_]\w*)\s+
        (?:WHERE\s+(?P<fcol>[A-Za-z_]\w*)\s*=\s*
            (?P<fval>'[^']*'|[-+]?\d+(?:\.\d+)?)\s+)?
        ORDER\s+BY\s+cosine_similarity\(\s*(?P<col>[A-Za-z_]\w*)\s*,\s*
            array\((?P<vec>[-+0-9eE.,\s]*)\)\s*\)\s+DESC\s+
        LIMIT\s+(?P<k>\d+)\s*;?\s*$""",
    re.IGNORECASE | re.VERBOSE,
)


def route_topk_sql(spark: SparkSession, sql: str, nprobe: int = 4) -> DataFrame:
    """Execute ``sql``; if it matches the supported top-k grammar over a
    registered IVF table, serve it from the partition-pruned layout,
    otherwise run it verbatim through ``spark.sql``.

    Routed output column contract: ``(<id_col>, score)`` for both ``*``
    and single-id projections — score is always surfaced because ranked
    retrieval without the score is useless downstream (the exact-fallback
    SQL can add the same expression to its projection).
    """
    m = _PATTERN.match(sql)
    if not m:
        ensure_sql_functions(spark)
        return spark.sql(sql)
    tbl = IVF_TABLES.get(m.group("tbl"))
    proj = m.group("proj")
    if (
        tbl is None
        or m.group("col") != tbl.vec_col
        # only projections whose routed shape is well-defined are served
        # from the layout; anything else (some other column name) must run
        # verbatim so it returns exactly what the SQL says
        or proj not in ("*", tbl.id_col)
    ):
        ensure_sql_functions(spark)
        return spark.sql(sql)
    qvec = [float(x) for x in m.group("vec").split(",") if x.strip()]
    k = int(m.group("k"))
    queries = spark.createDataFrame(
        [(0, qvec)], "query_id LONG, query_vec ARRAY<FLOAT>"
    )
    index = spark.read.parquet(tbl.path)
    if m.group("fcol") is not None:
        # metadata equality pre-filter (filtered ANN: restrict BEFORE
        # scoring — the excluded fraction is never scored, and parquet
        # pushdown applies). An unknown column raises the genuine
        # UNRESOLVED_COLUMN analysis error here — no fallback, since the
        # routed table need not exist as a Spark view.
        fv = m.group("fval")
        lit = fv[1:-1] if fv.startswith("'") else (
            float(fv) if "." in fv else int(fv)
        )
        index = index.filter(F.col(m.group("fcol")) == F.lit(lit))
    hits = ivf_search(
        index,
        queries,
        tbl.centroids,
        k=k,
        nprobe=nprobe,
        index_id=tbl.id_col,
        index_vec=tbl.vec_col,
    )
    return hits.orderBy(F.desc("score"), F.asc(tbl.id_col)).select(
        tbl.id_col, "score"
    )
