"""Duplicate-group clustering: blocking keys -> candidate edges ->
connected components -> per-group stats.

This is the step between pairwise near-dup detection (queries/dedup.py)
and canonical-document selection in a training-data pipeline: pairs only
say "a~b"; choosing one survivor per GROUP needs the transitive closure.
The oracle is a DuckDB recursive CTE computing the same closure, so the
iterative Spark algorithm is hash-checked end-to-end — not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from vectordbfaiss_spark.operators.graph import connected_components
from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import load_table

_CC_ORACLE = r"""
WITH RECURSIVE
d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
keys AS (
  SELECT doc_id,
         array_to_string(list_slice(w, 1, 5), ' ') AS k1,
         array_to_string(list_slice(list_reverse(w), 1, 5), ' ') AS k2
  FROM d
),
b1 AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY k1) AS hub FROM keys
),
b2 AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY k2) AS hub FROM keys
),
edges AS (
  SELECT hub AS src, doc_id AS dst FROM b1 WHERE doc_id <> hub
  UNION
  SELECT hub AS src, doc_id AS dst FROM b2 WHERE doc_id <> hub
),
sym AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.id
),
comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)
SELECT component, count(*) AS n_docs, max(id) AS max_doc
FROM comp GROUP BY component
"""


def _star_edges(keyed: DataFrame, key_col: str) -> DataFrame:
    """Star candidate edges inside each blocking bucket: every member links
    to the bucket's MIN doc_id (the hub). A bucket of n docs yields n-1
    edges — linear like a chain, so the quadratic all-pairs blowup never
    materializes even when a boilerplate prefix puts 10^6 docs in one
    bucket — but with DIAMETER 2 instead of n, so the connected-components
    loop converges in O(1) rounds instead of O(log n). Same connectivity
    (hence identical components) as any spanning structure of the bucket."""
    w = W.partitionBy(key_col)
    return (
        keyed.select("doc_id", F.min("doc_id").over(w).alias("hub"))
        .filter(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("src"), F.col("doc_id").alias("dst"))
    )


def _neardup_edges(docs: DataFrame) -> DataFrame:
    """Shared blocking-key candidate edges: (first-5 / last-5 word) keys
    -> star edges per bucket, distinct. ONE definition — the components
    queries, survivors, and PageRank all derive their graph from it, so a
    change to the blocking scheme can never desynchronize them from each
    other or their oracles."""
    words = F.split(F.trim(F.col("text")), r"\s+")
    keyed = docs.select(
        "doc_id",
        F.array_join(F.slice(words, 1, 5), " ").alias("k1"),
        F.array_join(F.slice(F.reverse(words), 1, 5), " ").alias("k2"),
    )
    return (
        _star_edges(keyed.select("doc_id", "k1"), "k1")
        .union(_star_edges(keyed.select("doc_id", "k2"), "k2"))
        .distinct()
    )


def _dedup_components(docs: DataFrame) -> DataFrame:
    """Shared blocking + closure: star edges -> connected components.
    Returns (id, component) with component = min id of the group."""
    return connected_components(_neardup_edges(docs))


@register("dedup_cluster_components", _CC_ORACLE)
def q_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group discovery: two blocking keys (first-5 / last-5
    words), star edges per bucket, connected components, per-component
    rollup. A doc sharing its prefix with one doc and its suffix with
    another fuses all three into one group — that transitivity is exactly
    what pair-level dedup cannot express.

    Scale plan: blocking + star edges keep the edge set LINEAR in corpus
    size AND bucket diameter at 2, so the component loop (large/small-star,
    operators/graph.py) converges in a couple of shuffle rounds regardless
    of bucket size; the recursive-CTE oracle checks the closure exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    comp = _dedup_components(docs)
    return comp.groupBy("component").agg(
        F.count("*").alias("n_docs"),
        F.max("id").alias("max_doc"),
    )


_SURVIVOR_ORACLE = _CC_ORACLE.replace(
    """comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)
SELECT component, count(*) AS n_docs, max(id) AS max_doc
FROM comp GROUP BY component""",
    """comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
dropped AS (SELECT id FROM comp WHERE id <> component)
SELECT d.doc_id,
       dr.id IS NULL AS kept
FROM (SELECT doc_id FROM documents) d
LEFT JOIN dropped dr ON d.doc_id = dr.id""",
)


@register("dedup_survivors", _SURVIVOR_ORACLE)
def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection — the dedup pipeline's END PRODUCT:
    every document flagged kept/dropped, where each duplicate group
    (transitive closure over the blocking-key near-dup graph) keeps
    exactly its min-doc_id representative and singletons keep themselves.
    Plan: the component labels ARE the representatives (components are
    min-labeled), so survivors = docs left-joined against members whose id
    differs from their component label. The dropped set grows with the
    corpus' duplicate fraction (NOT bounded), so it is a plain shuffled
    equi-join on doc_id — never a broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    comp = _dedup_components(docs)
    dropped = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("_d")
    )
    return docs.select("doc_id").join(dropped, "doc_id", "left").select(
        "doc_id", F.col("_d").isNull().alias("kept")
    )


def _leakage_safe_oracle() -> str:
    from vectordbfaiss_spark.queries.curation import (
        _sql_hash_bucket,
        _sql_split_case,
    )

    bucket = _sql_hash_bucket("rep")
    closure = _CC_ORACLE[: _CC_ORACLE.index(
        "SELECT component, count(*) AS n_docs, max(id) AS max_doc"
    )].rstrip().rstrip(",")  # reuse the CTE chain up to (and incl.) comp
    return f"""{closure},
rep AS (
  SELECT d.doc_id, d.lang, coalesce(c.component, d.doc_id) AS rep
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
),
assigned AS (
  SELECT lang,
         {_sql_split_case(bucket)} AS split
  FROM rep
)
SELECT lang, split, count(*) AS n_docs
FROM assigned GROUP BY lang, split
"""


@register("leakage_safe_split_assign", _leakage_safe_oracle())
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test assignment: a document's split is
    hashed from its duplicate-GROUP representative (the component label;
    singletons represent themselves), so near-duplicate documents can
    never straddle train and test — the leakage hole a per-document hash
    split (train_test_split_assign) leaves open. Plan: the closure's
    (id, component) table left-joins onto docs (dup members only —
    typically a small fraction), then the same md5-bucket arithmetic as
    every other deterministic sampler."""
    from vectordbfaiss_spark.queries.curation import _hash_bucket, _split_expr

    docs = load_table(spark, sf_dir, "documents")
    comp = _dedup_components(docs)
    rep = docs.select("doc_id", "lang").join(
        comp.select(F.col("id").alias("doc_id"), "component"), "doc_id", "left"
    ).select(
        "lang", F.coalesce("component", "doc_id").alias("rep")
    )
    split = _split_expr(_hash_bucket(F.col("rep")))
    return (
        rep.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Integer-exact PageRank over the near-dup candidate graph
# ---------------------------------------------------------------------------

def _pagerank_oracle(iterations: int = 3) -> str:
    head = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
keys AS (
  SELECT doc_id,
         array_to_string(list_slice(w, 1, 5), ' ') AS k1,
         array_to_string(list_slice(list_reverse(w), 1, 5), ' ') AS k2
  FROM d
),
b1 AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY k1) AS hub FROM keys
),
b2 AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY k2) AS hub FROM keys
),
edges AS (
  SELECT hub AS src, doc_id AS dst FROM b1 WHERE doc_id <> hub
  UNION
  SELECT hub AS src, doc_id AS dst FROM b2 WHERE doc_id <> hub
),
sym AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY 1),
r0 AS (SELECT src AS id, CAST(1000000000000 AS BIGINT) AS r FROM deg)"""
    steps = []
    for i in range(1, iterations + 1):
        steps.append(
            f""",
r{i} AS (
  SELECT s.dst AS id,
         CAST(150000000000 + (85 * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
  FROM sym s JOIN r{i - 1} r ON s.src = r.id JOIN deg d ON d.src = s.src
  GROUP BY s.dst
)"""
        )
    return head + "".join(steps) + f"\nSELECT id, r AS pagerank_scaled FROM r{iterations}"


@register("pagerank_neardup_graph", _pagerank_oracle(3))
def q_pagerank_neardup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 rounds, damping 0.85) over the symmetric near-dup
    candidate graph — which documents sit at the CENTER of duplicate
    neighborhoods (hub boilerplate) vs the periphery. Ranks are scaled
    BIGINTs and every update is integer division, so the iterative
    result is bit-identical across engines and partition orders — the
    trick that makes an ITERATIVE numeric algorithm hash-checkable
    (float PageRank never is: partial-sum order perturbs ulps). Each
    round is one source-key join + one dst hash-agg, checkpointed like
    the components loop (operators/graph.py::pagerank_int); at web-graph
    in-degrees pick scale so max_in_degree * scale * 0.85 < 2^63."""
    from vectordbfaiss_spark.operators.graph import pagerank_int

    docs = load_table(spark, sf_dir, "documents")
    edges = _neardup_edges(docs)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    return pagerank_int(sym, iterations=3)


# ---------------------------------------------------------------------------
# Entity resolution end-to-end: block -> fuzzy verify -> closure -> golden
# ---------------------------------------------------------------------------

_ER_ORACLE = r"""
WITH RECURSIVE
recs AS (
  SELECT c_custkey AS rec_id, c_name AS name, c_nationkey AS nation,
         'crm' AS src
  FROM customer
  UNION ALL
  SELECT c_custkey + 1000000000, replace(c_name, 'Customer#', 'Cstmer#'),
         c_nationkey, 'web'
  FROM customer WHERE c_custkey % 9 = 4
  UNION ALL
  SELECT c_custkey + 2000000000, replace(c_name, 'Customer#', 'Customers#'),
         c_nationkey, 'import'
  FROM customer WHERE c_custkey % 3 = 1
),
keyed AS (SELECT *, right(name, 6) AS bk FROM recs),
pairs AS (
  SELECT a.rec_id AS s_id, b.rec_id AS d_id
  FROM keyed a JOIN keyed b
    ON a.bk = b.bk AND a.nation = b.nation AND a.rec_id < b.rec_id
  WHERE levenshtein(a.name, b.name) <= 2
),
sym AS (
  SELECT s_id AS s, d_id AS d FROM pairs
  UNION SELECT d_id, s_id FROM pairs
),
nodes AS (SELECT DISTINCT s AS id FROM sym),
reach(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT sy.d, r.label FROM reach r JOIN sym sy ON sy.s = r.id
),
comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
golden AS (
  -- singletons matter: a record with no fuzzy match is its own entity
  -- (coalesce keeps it), not a dropped row — the golden table must hold
  -- ONE row per entity for the whole population
  SELECT coalesce(c.component, k.rec_id) AS component,
         k.rec_id, k.name, k.src
  FROM keyed k LEFT JOIN comp c ON c.id = k.rec_id
)
SELECT component AS entity_id,
       count(*) AS n_records,
       min_by(name, rec_id) AS canonical_name,
       array_to_string(list_sort(list(DISTINCT src)), ',') AS sources
FROM golden GROUP BY component
"""


@register("entity_resolution_golden", _ER_ORACLE)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution END-TO-END: three dirty sources -> blocking ->
    fuzzy verify -> transitive closure -> one golden record per entity.

    Sources are the customer table plus two deterministically-perturbed
    feeds ('web' drops two letters from the name, dist 2; 'import' adds
    one, dist 1 — 'web' vs 'import' is dist 3, so those two only unify
    THROUGH the clean record: the closure is genuinely transitive, not a
    pairwise shortcut). The pipeline is the canonical scalable ER shape:

    * blocking on (name tail, nation) — an equi-join key, so candidate
      generation is a hash join; the O(len^2) levenshtein verify runs only
      inside blocks (never all-pairs);
    * verified pairs feed the same star-contraction
      ``connected_components`` used by the dedup family (O(log^2 n)
      rounds, checkpointed);
    * golden record per component: min rec_id survivor's name + the
      merged source list — covering the WHOLE population: records with
      no fuzzy match anywhere are singleton entities (left-join +
      coalesce back in), not dropped rows.

    The DuckDB oracle replays blocking, edit-distance verify, and the
    closure as a recursive CTE — the whole pipeline is hash-checked.

    Scale bounds (both replayed identically by the oracle, so the hash
    stays green regardless — these bound the SEMANTICS): source rec_id
    offsets are +1e9/+2e9/+3e9, so perturbed-feed ids stay disjoint from
    crm custkeys up to c_custkey < 10^9 (sf ~6500); and the 6-char name
    tail used as the blocking key is only discriminating while custkey
    digits fit it — above ~10^6 customers distinct entities start sharing
    tails, inflating candidate blocks (cost) and letting levenshtein<=2
    merge near-numbered customers (quality). A production deployment
    re-keys blocking on a stronger signature (e.g. name-trigram minhash)
    at that point.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orig = c.select(
        F.col("c_custkey").alias("rec_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.lit("crm").alias("src"),
    )
    dup_web = c.filter(F.col("c_custkey") % 9 == 4).select(
        (F.col("c_custkey") + 1000000000).alias("rec_id"),
        F.regexp_replace("c_name", "Customer#", "Cstmer#").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.lit("web").alias("src"),
    )
    dup_imp = c.filter(F.col("c_custkey") % 3 == 1).select(
        (F.col("c_custkey") + 2000000000).alias("rec_id"),
        F.regexp_replace("c_name", "Customer#", "Customers#").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.lit("import").alias("src"),
    )
    recs = orig.unionByName(dup_web).unionByName(dup_imp)
    keyed = recs.withColumn("bk", F.substring(F.col("name"), -6, 6))
    a = keyed.alias("a")
    b = keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.nation") == F.col("b.nation"))
            & (F.col("a.rec_id") < F.col("b.rec_id")),
        )
        .filter(F.levenshtein(F.col("a.name"), F.col("b.name")) <= 2)
        .select(F.col("a.rec_id").alias("src"), F.col("b.rec_id").alias("dst"))
    )
    comp = connected_components(pairs)
    # union singletons back: connected_components only emits nodes with an
    # edge, but an unmatched record is still an entity — left-join +
    # coalesce makes the golden table cover the whole population
    golden = keyed.join(comp, keyed.rec_id == comp.id, "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col("rec_id"))
    )
    return golden.groupBy(F.col("component").alias("entity_id")).agg(
        F.count("*").alias("n_records"),
        F.min_by("name", "rec_id").alias("canonical_name"),
        F.array_join(F.sort_array(F.collect_set("src")), ",").alias("sources"),
    )


# ---------------------------------------------------------------------------
# Incremental entity resolution: new batch vs the resolved store
# ---------------------------------------------------------------------------

_ER_INCR_ORACLE = """
WITH store AS (
  SELECT c_custkey AS entity_id, c_name AS name, c_nationkey AS nation,
         right(c_name, 6) AS bk
  FROM customer
),
batch AS (
  SELECT c_custkey + 1000000000 AS rec_id,
         replace(c_name, 'Customer#', 'Cstmer#') AS name,
         c_nationkey AS nation, 'web' AS src
  FROM customer WHERE c_custkey % 9 = 4
  UNION ALL
  SELECT c_custkey + 2000000000, replace(c_name, 'Customer#', 'Customers#'),
         c_nationkey, 'import'
  FROM customer WHERE c_custkey % 3 = 1
  UNION ALL
  SELECT c_custkey + 3000000000,
         'NewCo#' || right(c_name, 9), c_nationkey, 'feed'
  FROM customer WHERE c_custkey % 11 = 3
),
kb AS (SELECT *, right(name, 6) AS bk FROM batch),
m AS (
  SELECT kb.rec_id, kb.src,
         min(s.entity_id) AS hit
  FROM kb LEFT JOIN store s
    ON kb.bk = s.bk AND kb.nation = s.nation
   AND levenshtein(kb.name, s.name) <= 2
  GROUP BY 1, 2
)
SELECT rec_id, src,
       coalesce(hit, rec_id) AS entity_id,
       (hit IS NULL) AS is_new_entity
FROM m
"""


@register("entity_resolution_incremental", _ER_INCR_ORACLE)
def q_entity_resolution_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL entity resolution — the production ingest shape the
    batch query (`entity_resolution_golden`) compacts into: each new feed
    record is matched against the RESOLVED STORE only (blocking equi-join
    on (name tail, nation), in-block levenshtein verify), never against
    other new records and never store-vs-store. Matched records adopt the
    store's entity_id; unmatched ones (the 'feed' source here — names no
    store record resembles) mint their own. Work is |batch|-proportional:
    the store side enters only through the hash equi-join on the block
    key, so a billion-entity store costs one shuffled/broadcast lookup,
    not a re-resolution — the same contract as
    `dedup_minhash_incremental`. min() over in-block matches keeps the
    assignment deterministic if blocking ever over-generates.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    store = c.select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("s_name"),
        F.col("c_nationkey").alias("nation"),
        F.substring("c_name", -6, 6).alias("bk"),
    )
    batch = (
        c.filter(F.col("c_custkey") % 9 == 4)
        .select(
            (F.col("c_custkey") + 1000000000).alias("rec_id"),
            F.regexp_replace("c_name", "Customer#", "Cstmer#").alias("name"),
            F.col("c_nationkey").alias("nation"),
            F.lit("web").alias("src"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 3 == 1).select(
                (F.col("c_custkey") + 2000000000).alias("rec_id"),
                F.regexp_replace("c_name", "Customer#", "Customers#").alias(
                    "name"
                ),
                F.col("c_nationkey").alias("nation"),
                F.lit("import").alias("src"),
            )
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 11 == 3).select(
                (F.col("c_custkey") + 3000000000).alias("rec_id"),
                F.concat(
                    F.lit("NewCo#"), F.substring("c_name", -9, 9)
                ).alias("name"),
                F.col("c_nationkey").alias("nation"),
                F.lit("feed").alias("src"),
            )
        )
    )
    kb = batch.withColumn("bk", F.substring(F.col("name"), -6, 6))
    matched = (
        kb.join(
            store,
            (kb.bk == store.bk)
            & (kb.nation == store.nation)
            & (F.levenshtein(kb.name, store.s_name) <= 2),
            "left",
        )
        .groupBy("rec_id", "src")
        .agg(F.min("entity_id").alias("hit"))
    )
    return matched.select(
        "rec_id",
        "src",
        F.coalesce(F.col("hit"), F.col("rec_id")).alias("entity_id"),
        F.col("hit").isNull().alias("is_new_entity"),
    )


_CC_HIST_ORACLE = r"""
WITH RECURSIVE
d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
keys AS (
  SELECT doc_id,
         array_to_string(list_slice(w, 1, 5), ' ') AS k1,
         array_to_string(list_slice(list_reverse(w), 1, 5), ' ') AS k2
  FROM d
),
b1 AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY k1) AS hub FROM keys
),
b2 AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY k2) AS hub FROM keys
),
edges AS (
  SELECT hub AS src, doc_id AS dst FROM b1 WHERE doc_id <> hub
  UNION
  SELECT hub AS src, doc_id AS dst FROM b2 WHERE doc_id <> hub
),
sym AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.id
),
comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
grp AS (SELECT component, count(*) AS sz FROM comp GROUP BY component),
tot AS (SELECT count(*) AS n_total FROM documents),
indeg AS (SELECT count(*) AS n_grouped FROM comp),
hist AS (
  SELECT sz AS group_size, count(*) AS n_groups, sum(sz) AS n_docs
  FROM grp GROUP BY sz
  UNION ALL
  SELECT 1, n_total - n_grouped, n_total - n_grouped
  FROM tot CROSS JOIN indeg WHERE n_total > n_grouped
)
SELECT CAST(group_size AS BIGINT) AS group_size,
       CAST(n_groups AS BIGINT) AS n_groups,
       CAST(n_docs AS BIGINT) AS n_docs,
       round(n_docs * 1.0 / n_total, 6) AS pct_docs
FROM hist CROSS JOIN tot
"""


@register("dedup_cluster_size_histogram", _CC_HIST_ORACLE)
def q_dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group SIZE DISTRIBUTION — the dedup health report read
    before choosing a survivor policy: a long tail of giant groups means
    boilerplate contamination (scrub first), mass 2-3 groups mean true
    near-dups (keep one), and the singleton share is the corpus that
    dedup never touches. Singletons (docs in no candidate pair) are
    counted into the size-1 bucket from two scalar aggregates — never by
    materializing a singleton edge list. Reuses the one shared blocking +
    star-contraction closure (`_dedup_components`), so the histogram can
    never desynchronize from the components/survivors queries."""
    docs = load_table(spark, sf_dir, "documents")
    comp = _dedup_components(docs)
    grp = comp.groupBy("component").agg(F.count("*").alias("sz"))
    hist = grp.groupBy(F.col("sz").alias("group_size")).agg(
        F.count("*").alias("n_groups"), F.sum("sz").alias("n_docs")
    )
    tot = docs.agg(F.count("*").alias("n_total"))
    indeg = comp.agg(F.count("*").alias("n_grouped"))
    singles = (
        tot.crossJoin(F.broadcast(indeg))
        .filter(F.col("n_total") > F.col("n_grouped"))
        .select(
            F.lit(1).cast("long").alias("group_size"),
            (F.col("n_total") - F.col("n_grouped")).alias("n_groups"),
            (F.col("n_total") - F.col("n_grouped")).alias("n_docs"),
        )
    )
    return (
        hist.unionByName(singles)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("group_size").cast("long").alias("group_size"),
            F.col("n_groups").cast("long").alias("n_groups"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.col("n_docs") / F.col("n_total"), 6).alias("pct_docs"),
        )
    )
