"""SQL front door: route ``ORDER BY cosine_similarity(...) DESC LIMIT k``
onto an IVF-partitioned table (SURVEY §4.3 "stretch" — the one plan shape
the layout-encoded index could not serve through SQL until now).

PySpark cannot inject a Catalyst strategy, so the router works at the SQL
string level with a deliberately tight, documented grammar:

    SELECT * | <id_col>
         [, cosine_similarity(<vec_col>, array(<floats>)) AS <alias>]
    FROM <table>
    [WHERE <pred> [AND <pred>]*]          -- pred: <col> {=,!=,<>,<,<=,>,>=} <literal>
                                          --     | <col> IN (<literal>, ...)
    ORDER BY cosine_similarity(<vec_col>, array(<float literals>)) DESC
    LIMIT <k>

The optional score projection is routable only when the projected
expression is LITERALLY the ranking expression (same column, same vector
literals, whitespace-insensitive) and the first projected item is the id
column; the routed output then carries the score under the requested
alias. Any other projection pair runs verbatim.

The optional WHERE is the filtered-ANN form — the conjunctive predicate
shapes real metadata filters take (equality, comparisons, IN-lists, ANDed
together). The pre-filter restricts the corpus BEFORE scoring (the
excluded fraction is never scored; parquet pushdown applies). Any WHERE
that doesn't parse into supported conjuncts (OR, functions, subqueries,
NULL tests, ...) falls back verbatim to ``spark.sql`` — never a silently
wrong routed answer. Like every routed query, results are
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


@dataclass
class IvfPqTable:
    """An IVFPQ-encoded artifact served through the same SQL grammar.

    ``vec_col`` is the LOGICAL vector column the statement names — the
    physical artifact stores PQ ``codes`` (+ ``cluster_id``) instead of
    the raw vectors; the router serves the ORDER BY from the ADC kernel.
    Routed answers are APPROXIMATE (PQ quantization error) even at full
    probe, which is the documented IVFPQ contract — callers needing
    exact scores use an IvfTable or run the statement verbatim against
    the raw table."""

    path: str
    centroids: list
    codebooks: object  # np.ndarray (m, k_codes, sub)
    id_col: str = "vec_id"
    vec_col: str = "embedding"


@dataclass
class GraphTable:
    """A published graph-ANN edge artifact served through the same SQL
    grammar — the third member of the ANN taxonomy behind the front
    door (flat/IVF exact, IVFPQ compressed, graph traversal).

    ``path`` is the RAW vector table (the scoring store — graph serving
    scores candidates against real vectors, so returned scores are
    exact cosines even though the top-k SET is approximate, the
    standard HNSW contract); ``edges_path`` the symmetrized edge
    artifact; ``n`` the corpus size captured at registration — it sizes
    the hash entry sample AND derives the serving knobs
    (``graph_serve_knobs``), so a router over a 100x larger corpus
    automatically serves at the wider beam the recall ladder requires
    instead of a silently rotting constant."""

    path: str
    edges_path: str
    n: int
    id_col: str = "vec_id"
    vec_col: str = "embedding"


#: name -> IvfTable; registered by the pipeline that built the index
IVF_TABLES: dict[str, IvfTable] = {}
#: name -> IvfPqTable; same catalog idea for PQ-encoded artifacts
IVFPQ_TABLES: dict[str, IvfPqTable] = {}
#: name -> GraphTable; graph-ANN artifacts behind the same grammar
GRAPH_TABLES: dict[str, GraphTable] = {}


def register_ivf_table(
    name: str,
    path: str,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    IVF_TABLES[name] = IvfTable(path, centroids, id_col, vec_col)


def register_ivfpq_table(
    name: str,
    path: str,
    centroids: list,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    IVFPQ_TABLES[name] = IvfPqTable(path, centroids, codebooks, id_col, vec_col)


def register_graph_table(
    name: str,
    path: str,
    edges_path: str,
    n: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    GRAPH_TABLES[name] = GraphTable(path, edges_path, n, id_col, vec_col)


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
    r"""^\s*SELECT\s+(?P<proj>\*|[A-Za-z_]\w*)
        (?:\s*,\s*cosine_similarity\(\s*(?P<pcol>[A-Za-z_]\w*)\s*,\s*
            array\((?P<pvec>[-+0-9eE.,\s]*)\)\s*\)\s+AS\s+(?P<alias>[A-Za-z_]\w*))?\s+
        FROM\s+(?P<tbl>[A-Za-z_]\w*)\s+
        (?:WHERE\s+(?P<where>.+?)\s+)?
        ORDER\s+BY\s+cosine_similarity\(\s*(?P<col>[A-Za-z_]\w*)\s*,\s*
            array\((?P<vec>[-+0-9eE.,\s]*)\)\s*\)\s+DESC\s+
        LIMIT\s+(?P<k>\d+)\s*;?\s*$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)


def _vec_key(lits: str) -> str:
    """Whitespace-insensitive identity of an array literal list, so the
    projected expression can be compared against the ORDER BY one."""
    return ",".join(tok.strip() for tok in lits.split(",") if tok.strip())

_LITERAL = r"'[^']*'|[-+]?\d+(?:\.\d+)?"
_PRED_IN = re.compile(
    rf"(?P<col>[A-Za-z_]\w*)\s+IN\s*\(\s*(?P<vals>(?:{_LITERAL})"
    rf"(?:\s*,\s*(?:{_LITERAL}))*)\s*\)\s*",
    re.IGNORECASE,
)
_PRED_CMP = re.compile(
    rf"(?P<col>[A-Za-z_]\w*)\s*(?P<op><=|>=|<>|!=|=|<|>)\s*(?P<val>{_LITERAL})\s*",
    re.IGNORECASE,
)
_AND = re.compile(r"AND\s+", re.IGNORECASE)
_LIT_SPLIT = re.compile(_LITERAL)


def _literal(tok: str):
    if tok.startswith("'"):
        return tok[1:-1]
    return float(tok) if "." in tok else int(tok)


def _parse_where(clause: str) -> list | None:
    """Parse a conjunction of simple predicates into Column filters; None
    when ANY part is outside the grammar (the caller then runs the whole
    statement verbatim). Sequential tokenization, not a split on "AND" —
    string literals may contain the word AND."""
    filters = []
    pos, n = 0, len(clause)
    while pos < n:
        if m := _PRED_IN.match(clause, pos):
            vals = [_literal(t.group(0)) for t in _LIT_SPLIT.finditer(m.group("vals"))]
            filters.append(F.col(m.group("col")).isin(vals))
        elif m := _PRED_CMP.match(clause, pos):
            c, lit = F.col(m.group("col")), F.lit(_literal(m.group("val")))
            op = m.group("op")
            filters.append(
                {
                    "=": c == lit,
                    "!=": c != lit,
                    "<>": c != lit,
                    "<": c < lit,
                    "<=": c <= lit,
                    ">": c > lit,
                    ">=": c >= lit,
                }[op]
            )
        else:
            return None
        pos = m.end()
        if pos >= n:
            break
        ma = _AND.match(clause, pos)
        if not ma:
            return None
        pos = ma.end()
    return filters or None


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
    where = m.group("where")
    filters = _parse_where(where) if where is not None else []
    name = m.group("tbl")
    tbl = IVF_TABLES.get(name)
    pq_tbl = IVFPQ_TABLES.get(name) if tbl is None else None
    g_tbl = (
        GRAPH_TABLES.get(name) if tbl is None and pq_tbl is None else None
    )
    any_tbl = tbl or pq_tbl or g_tbl
    proj = m.group("proj")
    alias = m.group("alias")
    if (
        any_tbl is None
        or m.group("col") != any_tbl.vec_col
        # only projections whose routed shape is well-defined are served
        # from the layout; anything else (some other column name) must run
        # verbatim so it returns exactly what the SQL says
        or proj not in ("*", any_tbl.id_col)
        # score projection (SELECT <id>, cosine_similarity(...) AS s) is
        # routable only when the projected expression IS the ranking
        # expression — same column, same literal vector — AND the artifact
        # serves exact scores. On IVFPQ the served score is the ADC
        # quantized approximation: fine as a router-added extra column in
        # the bare grammar (ranking contract), but an explicitly projected
        # expression is something the SQL defines exactly, so routing it
        # would silently return approximate values — verbatim instead.
        or (
            alias is not None
            and (
                pq_tbl is not None
                # graph tables serve an approximate candidate set with
                # scores rounded to 6dp — fine for the bare ranking
                # grammar, but an explicitly projected score expression
                # must return exactly what verbatim SQL would, so it
                # falls back (same reasoning as the WHERE guard below)
                or g_tbl is not None
                or proj != any_tbl.id_col
                or m.group("pcol") != m.group("col")
                or _vec_key(m.group("pvec")) != _vec_key(m.group("vec"))
            )
        )
        # a WHERE outside the conjunctive =/!=/range/IN grammar must run
        # verbatim too — routing may only ever be a transparent speedup
        or filters is None
        # graph traversal cannot pre-filter (a metadata filter would have
        # to run POST-traversal, silently shrinking the answer below k) —
        # any WHERE on a graph table runs verbatim-exact instead
        or (g_tbl is not None and filters)
    ):
        ensure_sql_functions(spark)
        return spark.sql(sql)
    qvec = [float(x) for x in m.group("vec").split(",") if x.strip()]
    k = int(m.group("k"))
    queries = spark.createDataFrame(
        [(0, qvec)], "query_id LONG, query_vec ARRAY<FLOAT>"
    )
    if g_tbl is not None:
        # graph-ANN route: beam search over the published edge artifact,
        # knobs derived from the registered corpus size (the schedule the
        # syn ladder calibrated — see operators/graph_ann.py)
        from pyspark.sql import Window as W

        from vectordbfaiss_spark.operators.graph_ann import (
            graph_beam_search_interactive,
            graph_serve_knobs,
        )

        emb = spark.read.parquet(g_tbl.path).select(
            F.col(g_tbl.id_col).alias("vec_id"),
            F.col(g_tbl.vec_col).alias("embedding"),
        )
        edges = spark.read.parquet(g_tbl.edges_path).select("src", "dst")
        beam, rounds = graph_serve_knobs(g_tbl.n)
        # the request-path kernel (one job per round, driver bookkeeping,
        # bit-identical to the BSP operator): a routed SQL statement is a
        # single interactive request, exactly its contract
        visited = graph_beam_search_interactive(
            queries,
            edges,
            emb,
            beam=beam,
            rounds=rounds,
            n_entries=max(16, g_tbl.n // 32),
        )
        w = W.partitionBy("query_id").orderBy(F.desc("score"), "vec_id")
        return (
            visited.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= k)
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .select(
                F.col("vec_id").alias(g_tbl.id_col),
                F.col("score").alias(alias or "score"),
            )
        )
    index = spark.read.parquet(any_tbl.path)
    for flt in filters:
        # metadata pre-filters (filtered ANN: restrict BEFORE scoring —
        # the excluded fraction is never scored, and parquet pushdown
        # applies). An unknown column raises the genuine UNRESOLVED_COLUMN
        # analysis error here — no fallback, since the routed table need
        # not exist as a Spark view.
        index = index.filter(flt)
    if pq_tbl is not None:
        # PQ-encoded artifact: centroid routing prunes rows, the ADC
        # kernel scores codes — scores are approximate by contract.
        from vectordbfaiss_spark.plans.pq import ivfpq_search

        hits = ivfpq_search(
            index,
            queries,
            pq_tbl.centroids,
            pq_tbl.codebooks,
            k=k,
            nprobe=nprobe,
            id_col=pq_tbl.id_col,
        )
        return hits.orderBy(F.desc("approx_score"), F.asc(pq_tbl.id_col)).select(
            pq_tbl.id_col, F.col("approx_score").alias(alias or "score")
        )
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
        tbl.id_col, F.col("score").alias(alias or "score")
    )
