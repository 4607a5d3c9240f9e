"""Corpus / pipeline diagnostics: join-key skew reporting, KMV
distinct-overlap sketches, and n-gram novelty scoring.

These are the reports a 100 TB pipeline runs BEFORE committing to a plan:
skew diagnosis decides whether a join needs salting (and how much), a
KMV sketch estimates cross-corpus vocabulary overlap without a
corpus x corpus distinct-join, and novelty scoring measures how much of
each document is first-seen content (the repetition/staleness signal
curation thresholds on).

Everything is hash-deterministic (the engine-shared md5-bucket rule from
``queries/curation.py``) so the DuckDB oracles replay each computation
digit for digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from vectordbfaiss_spark.operators.dedup import exploded_shingles, word_shingles
from vectordbfaiss_spark.queries.curation import _hash_bucket, _sql_hash_bucket
from vectordbfaiss_spark.queries.dedup import _shingle_cte
from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import fan_out, load_table

# ---------------------------------------------------------------------------
# Join-key skew report
# ---------------------------------------------------------------------------

_TOP_KEYS = 5
_SALT_TARGET = 4.0  # salt so no key exceeds ~4x the mean per-key load

_SKEW_ORACLE = f"""
WITH per_key AS (SELECT user_id, count(*) AS key_rows FROM events GROUP BY 1),
stats AS (SELECT CAST(sum(key_rows) AS BIGINT) AS total_rows,
                 count(*) AS n_keys,
                 max(key_rows) AS max_rows,
                 round(quantile_cont(key_rows, 0.5), 4) AS p50_rows,
                 round(quantile_cont(key_rows, 0.99), 4) AS p99_rows
          FROM per_key),
top AS (SELECT user_id, key_rows FROM per_key
        ORDER BY key_rows DESC, user_id LIMIT {_TOP_KEYS})
SELECT t.user_id, t.key_rows,
       round(t.key_rows * 1.0 / s.total_rows, 6) AS pct_of_total,
       s.total_rows, s.n_keys, s.p50_rows, s.p99_rows,
       round(s.max_rows * 1.0 * s.n_keys / s.total_rows, 4) AS skew_ratio,
       greatest(1, CAST(ceil(s.max_rows * s.n_keys
                             / ({_SALT_TARGET} * s.total_rows)) AS BIGINT))
         AS recommended_salt
FROM top t CROSS JOIN stats s
ORDER BY t.key_rows DESC, t.user_id
"""


@register("join_skew_report", _SKEW_ORACLE)
def q_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter report for a join key, with a salting recommendation.

    The pre-flight a skewed shuffle needs: per-key counts (one map-side
    combinable aggregation), a one-row global summary (p50/p99/max over
    the per-key counts), the top heavy hitters (orderBy+limit =
    TakeOrderedAndProject, no global sort), and
    ``recommended_salt = ceil(max_key / (target x mean_key))`` — the
    factor ``skew_salted_event_totals`` (this registry) applies by hand.
    The key-count frame is corpus-sized/|keys|; everything after it is
    O(keys) -> O(1) aggregation plus a broadcast of one stats row.

    Scale caveat, stated honestly: ``percentile`` is EXACT and buffers
    all |keys| count values in one aggregation — fine up to ~10^7 keys
    (they're one long each), but at 10^9+ keys swap p50/p99 to
    ``approx_percentile`` (same column, sketch-bounded memory); exact is
    kept here because the oracle hash-compare needs cross-engine-exact
    interpolation and |keys| is the SMALL side of any skew problem worth
    diagnosing.
    """
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("key_rows"))
    stats = per_key.agg(
        F.sum("key_rows").alias("total_rows"),
        F.count("*").alias("n_keys"),
        F.max("key_rows").alias("max_rows"),
        F.round(F.expr("percentile(key_rows, 0.5)"), 4).alias("p50_rows"),
        F.round(F.expr("percentile(key_rows, 0.99)"), 4).alias("p99_rows"),
    )
    top = per_key.orderBy(F.desc("key_rows"), "user_id").limit(_TOP_KEYS)
    salt = F.greatest(
        F.lit(1),
        F.ceil(
            F.col("max_rows") * F.col("n_keys") / (_SALT_TARGET * F.col("total_rows"))
        ),
    )
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            "user_id",
            "key_rows",
            F.round(F.col("key_rows") / F.col("total_rows"), 6).alias(
                "pct_of_total"
            ),
            "total_rows",
            "n_keys",
            "p50_rows",
            "p99_rows",
            F.round(
                F.col("max_rows") * F.col("n_keys") / F.col("total_rows"), 4
            ).alias("skew_ratio"),
            salt.alias("recommended_salt"),
        )
        .orderBy(F.desc("key_rows"), "user_id")
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-overlap sketch
# ---------------------------------------------------------------------------

_KMV_K = 256
_KMV_M = 16**6  # hash space of the shared md5-bucket rule
_KMV_SRC_A, _KMV_SRC_B = "src0", "src1"
_KMV_BOUND = 0.25  # generous vs the ~2/sqrt(k) ~ 0.125 expected error


def _sql_kmv_est(set_cte: str, sketch_cte: str) -> str:
    """Estimate |set| from its k-min sketch: exact when the set is smaller
    than k, else (k-1) * M / h_k."""
    return f"""CASE WHEN (SELECT count(*) FROM {set_cte}) < {_KMV_K}
       THEN (SELECT count(*) FROM {set_cte}) * 1.0
       ELSE ({_KMV_K} - 1) * {_KMV_M}.0 / (SELECT max(h) FROM {sketch_cte}) END"""


_KMV_ORACLE = f"""
WITH {_shingle_cte(3)},
src AS (SELECT d.source, s.shingle FROM sh s
        JOIN documents d USING (doc_id)
        WHERE d.source IN ('{_KMV_SRC_A}', '{_KMV_SRC_B}')),
hs AS (SELECT DISTINCT source, {_sql_hash_bucket('shingle')} AS h FROM src),
a AS (SELECT DISTINCT h FROM hs WHERE source = '{_KMV_SRC_A}'),
b AS (SELECT DISTINCT h FROM hs WHERE source = '{_KMV_SRC_B}'),
ka AS (SELECT h FROM a ORDER BY h LIMIT {_KMV_K}),
kb AS (SELECT h FROM b ORDER BY h LIMIT {_KMV_K}),
u AS (SELECT h FROM a UNION SELECT h FROM b),
ku AS (SELECT h FROM u ORDER BY h LIMIT {_KMV_K}),
sizes AS (SELECT (SELECT count(*) FROM a) AS n_a,
                 (SELECT count(*) FROM b) AS n_b,
                 (SELECT count(*) FROM u) AS n_union,
                 (SELECT count(*) FROM a WHERE h IN (SELECT h FROM b))
                   AS n_inter,
                 (SELECT count(*) FROM ku) AS m_u,
                 (SELECT count(*) FROM ku
                  WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b))
                   AS rho_num),
est AS (SELECT {_sql_kmv_est('a', 'ka')} AS est_a,
               {_sql_kmv_est('b', 'kb')} AS est_b,
               {_sql_kmv_est('u', 'ku')} AS est_union)
SELECT {_KMV_K} AS k, s.n_a, s.n_b, s.n_union, s.n_inter,
       round(e.est_a, 4) AS est_a,
       round(e.est_b, 4) AS est_b,
       round(e.est_union, 4) AS est_union,
       round(s.rho_num * 1.0 / s.m_u * e.est_union, 4) AS est_inter,
       round(abs(e.est_union - s.n_union) / s.n_union, 4) AS rel_err_union,
       (abs(e.est_a - s.n_a) / s.n_a <= {_KMV_BOUND}
        AND abs(e.est_b - s.n_b) / s.n_b <= {_KMV_BOUND}
        AND abs(e.est_union - s.n_union) / s.n_union <= {_KMV_BOUND})
         AS within_bound
FROM sizes s CROSS JOIN est e
"""


@register("kmv_overlap_sketch", _KMV_ORACLE)
def q_kmv_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap from k-minimum-values sketches.

    Estimates |A|, |B|, |A u B| and |A n B| for two sources' distinct
    3-shingle HASH sets (the engine-shared md5 bucket, M=16^6 — at that
    hash width, collisions shave ~|A|/2M from the truth; both the
    estimates AND the exact twins live in hash space so the comparison
    is apples-to-apples, and a production run at 10^9 shingles widens to
    a 64-bit hash, same plan) from k=256-value sketches (Bar-Yossef et al.'s KMV:
    the k-th smallest of n uniform hashes sits near k/n of the hash
    space, so (k-1)*M/h_k estimates n; the intersection is estimated
    from the fraction rho of the union sketch present in both sets).
    The exact values are computed alongside and the relative error is
    bounded as an output boolean — the sketch is hash-deterministic, so
    even the estimates hash-match the oracle.

    At scale only the distinct-hash aggregation touches corpus-sized
    data (one shuffle per source, map-side combinable); every sketch is
    k rows taken via orderBy+limit (TakeOrderedAndProject — per-partition
    k-min, no global sort), and the membership checks are broadcast
    semi/anti joins between k-row and |distinct|-row frames. The exact
    intersection here is the verification twin; a production run keeps
    only the sketch path (state = k values per corpus, mergeable).
    """
    docs = load_table(spark, sf_dir, "documents")
    pair = docs.filter(F.col("source").isin(_KMV_SRC_A, _KMV_SRC_B))
    sh = fan_out(pair).select(
        "source", F.explode(word_shingles("text", 3)).alias("shingle")
    )
    hs = sh.select(
        "source", _hash_bucket(F.col("shingle")).alias("h")
    ).distinct()
    a = hs.filter(F.col("source") == _KMV_SRC_A).select("h")
    b = hs.filter(F.col("source") == _KMV_SRC_B).select("h")
    a = a.localCheckpoint(eager=True)  # each set feeds sketch + 3 memberships
    b = b.localCheckpoint(eager=True)
    ka = a.orderBy("h").limit(_KMV_K)
    kb = b.orderBy("h").limit(_KMV_K)
    u = a.union(b).distinct().localCheckpoint(eager=True)
    ku = u.orderBy("h").limit(_KMV_K).localCheckpoint(eager=True)

    def est(set_df: DataFrame, sketch_df: DataFrame):
        n = set_df.agg(F.count("*").alias("n"))
        hk = sketch_df.agg(F.max("h").alias("hk"))
        return n.crossJoin(hk).select(
            F.when(
                F.col("n") < _KMV_K, F.col("n").cast("double")
            ).otherwise((_KMV_K - 1) * float(_KMV_M) / F.col("hk")).alias("est"),
            F.col("n"),
        )

    est_a = est(a, ka).select(
        F.col("est").alias("est_a"), F.col("n").alias("n_a")
    )
    est_b = est(b, kb).select(
        F.col("est").alias("est_b"), F.col("n").alias("n_b")
    )
    est_u = est(u, ku).select(
        F.col("est").alias("est_union"), F.col("n").alias("n_union")
    )
    n_inter = (
        a.join(b, "h", "left_semi").agg(F.count("*").alias("n_inter"))
    )
    # rho membership is decided against the k-row sketches, not the full
    # sets: ku holds the union's k smallest, and the k-th smallest of a
    # SUBSET (A) is >= the union's, so any ku value belonging to A is
    # necessarily inside ka. Equal to full-set membership (what the
    # oracle writes), but bounded at k rows regardless of corpus size.
    rho = (
        ku.join(F.broadcast(ka), "h", "left_semi")
        .join(F.broadcast(kb), "h", "left_semi")
        .agg(F.count("*").alias("rho_num"))
        .crossJoin(ku.agg(F.count("*").alias("m_u")))
    )
    row = (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .crossJoin(n_inter)
        .crossJoin(rho)
    )
    rel = lambda e, n: F.abs(F.col(e) - F.col(n)) / F.col(n)  # noqa: E731
    return row.select(
        F.lit(_KMV_K).alias("k"),
        "n_a",
        "n_b",
        "n_union",
        "n_inter",
        F.round("est_a", 4).alias("est_a"),
        F.round("est_b", 4).alias("est_b"),
        F.round("est_union", 4).alias("est_union"),
        F.round(
            F.col("rho_num") / F.col("m_u") * F.col("est_union"), 4
        ).alias("est_inter"),
        F.round(rel("est_union", "n_union"), 4).alias("rel_err_union"),
        (
            (rel("est_a", "n_a") <= _KMV_BOUND)
            & (rel("est_b", "n_b") <= _KMV_BOUND)
            & (rel("est_union", "n_union") <= _KMV_BOUND)
        ).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# N-gram novelty scoring
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = f"""
WITH {_shingle_cte(3)},
first AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1)
SELECT s.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS novelty
FROM sh s JOIN first f USING (shingle)
GROUP BY 1
ORDER BY doc_id
"""


@register("ngram_novelty_scoring", _NOVELTY_ORACLE)
def q_ngram_novelty_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of its distinct 3-shingles first
    seen in this document (arrival order = doc_id).

    The memorization/staleness signal: a crawl whose late documents score
    near zero is re-crawling what it already has. Three shuffles, all
    keyed and map-side combinable: shingle explode -> min(doc_id) per
    shingle, join first-occurrence back on shingle, per-doc rollup. The
    first-occurrence frame is |vocabulary|-sized (not corpus-sized), and
    nothing is windowed or collected — the same shape at 10^9 docs.

    The shingle join carries an explicit SHUFFLE_HASH hint: the shingle
    vocabulary grows with the corpus (heavy-tailed — most 3-shingles are
    near-unique), but Catalyst's post-aggregate estimate shrinks it
    under the broadcast threshold; at the 100x local scale step the
    unhinted plan tried to broadcast the multi-GiB first-occurrence
    table (same failure mode as crossdoc_span_scrub — see SCALE.md).
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = exploded_shingles(docs, "doc_id", "text", 3)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        sh.join(first.hint("SHUFFLE_HASH"), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            novel.alias("n_novel"),
            F.round(novel / F.count("*"), 6).alias("novelty"),
        )
        # no terminal orderBy: output is corpus-grain and the oracle
        # hash-compare is order-insensitive — a display sort here would be
        # a full range-shuffle paid for nothing at scale
    )


# ---------------------------------------------------------------------------
# Per-source quality-score calibration
# ---------------------------------------------------------------------------

_PCTS = [i / 10 for i in range(1, 10)]
_PCTS_SQL = "[" + ", ".join(str(p) for p in _PCTS) + "]"
_PCTS_SPARK = "array(" + ", ".join(str(p) for p in _PCTS) + ")"


def _calibration_oracle() -> str:
    from vectordbfaiss_spark.queries.text_analysis import _STOPLIST_SQL

    return f"""
WITH w AS (SELECT doc_id, string_split_regex(rtrim(text), '\\s+') AS words
           FROM documents),
m AS (SELECT doc_id, len(words) AS n_tokens,
             len(list_filter(words, t -> list_contains({_STOPLIST_SQL}, t)))
               AS n_stop,
             len(list_distinct(words)) / len(words) AS ttr
      FROM w),
s AS (SELECT d.source,
             round(0.4 * least(m.n_tokens / 64.0, 1.0)
                 + 0.3 * least(m.n_stop / m.n_tokens * 3, 1.0)
                 + 0.3 * least(m.ttr * 2, 1.0), 6) AS quality
      FROM m JOIN documents d USING (doc_id)),
ps AS (SELECT source, quantile_cont(quality, {_PCTS_SQL}) AS qs
       FROM s GROUP BY 1),
g AS (SELECT quantile_cont(quality, {_PCTS_SQL}) AS qs FROM s)
SELECT ps.source, CAST(i * 10 AS BIGINT) AS pctile,
       round(ps.qs[i], 6) AS src_q,
       round(g.qs[i], 6) AS global_q,
       round(ps.qs[i] - g.qs[i], 6) AS shift
FROM ps CROSS JOIN g, unnest(generate_series(1, 9)) t(i)
ORDER BY source, pctile
"""


@register("quality_calibration_deciles", _calibration_oracle())
def q_quality_calibration_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-score deciles vs the global distribution.

    Quality classifiers drift across sources: a 0.6 from a clean source
    and a 0.6 from a boilerplate-heavy crawl are not the same document.
    Before thresholding ("keep quality > X") a curation run reads this
    table — per-source deciles next to the global ones, plus the shift —
    and either picks per-source cutoffs or quantile-normalizes. Exact
    interpolated percentiles over the 6dp-rounded score (both engines
    interpolate linearly over identical inputs); one per-source aggregate
    + a broadcast 9-row global frame — corpus touched once.
    """
    from vectordbfaiss_spark.operators import textstats as TS

    docs = load_table(spark, sf_dir, "documents")
    scored = TS.quality_score(docs, "doc_id", "text").select("doc_id", "quality")
    s = scored.join(docs.select("doc_id", "source"), "doc_id")
    # two consumers (per-source + global percentiles): materialize the
    # 2-column scored frame once, or the stopword-scan expression tree
    # runs twice over the corpus
    s = s.localCheckpoint(eager=True)
    ps = s.groupBy("source").agg(
        F.expr(f"percentile(quality, {_PCTS_SPARK})").alias("qs")
    )
    g = s.agg(F.expr(f"percentile(quality, {_PCTS_SPARK})").alias("qs"))
    ps2 = ps.select("source", F.posexplode("qs").alias("i", "src_raw"))
    g2 = g.select(F.posexplode("qs").alias("i", "g_raw"))
    return (
        ps2.join(F.broadcast(g2), "i")
        .select(
            "source",
            ((F.col("i") + 1) * 10).cast("long").alias("pctile"),
            F.round("src_raw", 6).alias("src_q"),
            F.round("g_raw", 6).alias("global_q"),
            F.round(F.col("src_raw") - F.col("g_raw"), 6).alias("shift"),
        )
        .orderBy("source", "pctile")
    )


# ---------------------------------------------------------------------------
# Declarative data-quality expectations with quarantine accounting
# ---------------------------------------------------------------------------

_EXP_PRICE_CAP = 450000.0
_EXP_DATE_CAP = "2000-01-01"

_EXPECT_ORACLE = f"""
WITH flagged AS (
  SELECT CASE WHEN o.o_totalprice > {_EXP_PRICE_CAP} THEN 1 ELSE 0 END AS v_price,
         CASE WHEN o.o_orderdate >= '{_EXP_DATE_CAP}' THEN 1 ELSE 0 END AS v_date,
         CASE WHEN o.o_orderstatus NOT IN ('P', 'O', 'F') THEN 1 ELSE 0 END
           AS v_status,
         CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END AS v_fk
  FROM orders o
  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o.o_custkey = c.c_custkey),
agg AS (
  SELECT count(*) AS n,
         CAST(sum(v_price) AS BIGINT) AS price_cap,
         CAST(sum(v_date) AS BIGINT) AS date_window,
         CAST(sum(v_status) AS BIGINT) AS status_domain,
         CAST(sum(v_fk) AS BIGINT) AS fk_customer,
         CAST(sum(CASE WHEN v_price + v_date + v_status + v_fk > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS any_rule
  FROM flagged)
SELECT t.rule, t.n_violations,
       round(t.n_violations * 1.0 / a.n, 6) AS violation_rate,
       t.n_violations = 0 AS passed
FROM agg a, (
  SELECT 'price_cap' AS rule, price_cap AS n_violations FROM agg
  UNION ALL SELECT 'date_window', date_window FROM agg
  UNION ALL SELECT 'status_domain', status_domain FROM agg
  UNION ALL SELECT 'fk_customer', fk_customer FROM agg
  UNION ALL SELECT 'any_rule', any_rule FROM agg) t
ORDER BY t.rule
"""


@register("expectations_quarantine", _EXPECT_ORACLE)
def q_expectations_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations over a fact table: per-rule
    violation counts/rates plus the quarantine rowcount (rows failing ANY
    rule) — the DLT-style expectations report a pipeline gates a publish
    on.

    All row-local rules evaluate as codegen'd CASE flags in ONE scan; the
    referential rule rides the same pass as a broadcast left join against
    the distinct key side. The per-rule report is an unpivot (stack) of a
    single 1-row aggregate — rules can be added without new scans. At
    100 TB this is exactly one fact-table read regardless of rule count.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust_keys = (
        load_table(spark, sf_dir, "customer").select("c_custkey").distinct()
    )
    # the distinct customer-key side SCALES with the data — join strategy
    # left to file stats (broadcast at small SF, graduating to a shuffle
    # join at 100 TB; a forced hint here could not graduate)
    j = orders.join(
        cust_keys,
        orders.o_custkey == cust_keys.c_custkey,
        "left_outer",
    )
    v_price = F.when(F.col("o_totalprice") > _EXP_PRICE_CAP, 1).otherwise(0)
    v_date = F.when(
        F.col("o_orderdate") >= F.lit(_EXP_DATE_CAP).cast("timestamp"), 1
    ).otherwise(0)
    v_status = F.when(~F.col("o_orderstatus").isin("P", "O", "F"), 1).otherwise(0)
    v_fk = F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
    flagged = j.select(
        v_price.alias("v_price"),
        v_date.alias("v_date"),
        v_status.alias("v_status"),
        v_fk.alias("v_fk"),
    )
    agg = flagged.agg(
        F.count("*").alias("n"),
        F.sum("v_price").alias("price_cap"),
        F.sum("v_date").alias("date_window"),
        F.sum("v_status").alias("status_domain"),
        F.sum("v_fk").alias("fk_customer"),
        F.sum(
            F.when(
                F.col("v_price") + F.col("v_date") + F.col("v_status")
                + F.col("v_fk")
                > 0,
                1,
            ).otherwise(0)
        ).alias("any_rule"),
    )
    rules = agg.select(
        "n",
        F.expr(
            "stack(5, 'price_cap', price_cap, 'date_window', date_window, "
            "'status_domain', status_domain, 'fk_customer', fk_customer, "
            "'any_rule', any_rule) AS (rule, n_violations)"
        ),
    )
    return rules.select(
        "rule",
        "n_violations",
        F.round(F.col("n_violations") / F.col("n"), 6).alias("violation_rate"),
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("rule")


# ---------------------------------------------------------------------------
# Join-size (cardinality) estimate: the pre-join explosion guardrail
# ---------------------------------------------------------------------------

_JOIN_SIZE_ORACLE = """
WITH a AS (SELECT o_custkey AS join_key, count(*) AS n_left
           FROM orders GROUP BY 1),
b AS (SELECT user_id AS join_key, count(*) AS n_right
      FROM events GROUP BY 1),
j AS (SELECT a.join_key, a.n_left, b.n_right,
             a.n_left * b.n_right AS key_pairs
      FROM a JOIN b USING (join_key)),
tot AS (SELECT CAST(sum(key_pairs) AS BIGINT) AS est_total_pairs FROM j)
SELECT j.join_key, j.n_left, j.n_right,
       CAST(j.key_pairs AS BIGINT) AS key_pairs,
       tot.est_total_pairs,
       round(j.key_pairs / tot.est_total_pairs, 6) AS pct_of_total
FROM j, tot
ORDER BY j.key_pairs DESC, j.join_key
LIMIT 10
"""


@register("join_size_estimate", _JOIN_SIZE_ORACLE)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided join-cardinality forecast BEFORE running the join:
    |A ⋈ B| = Σ_k n_A(k)·n_B(k), plus the keys that dominate it.

    The guardrail every 100 TB join wants: two map-side-combinable
    per-key counts (each output is |keys|-sized, tiny next to the fact
    tables), one |keys|-grain equi-join of the COUNT frames (never the
    facts), and a TakeOrderedAndProject for the top offenders — total
    cost is two fact scans, compared to the potentially-catastrophic
    join it forecasts. A key carrying a large share of est_total_pairs
    is the salting/filter target (`join_skew_report` sizes the salt;
    this query says whether the join is safe to run at all).
    """
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    a = o.groupBy(F.col("o_custkey").alias("join_key")).agg(
        F.count("*").alias("n_left")
    )
    b = e.groupBy(F.col("user_id").alias("join_key")).agg(
        F.count("*").alias("n_right")
    )
    j = a.join(b, "join_key").withColumn(
        "key_pairs", F.col("n_left") * F.col("n_right")
    )
    # two consumers (global sum + top-10): materialize the |keys|-grain
    # frame once so both fact tables really are scanned exactly once —
    # the cost contract the docstring advertises
    j = j.localCheckpoint(eager=True)
    tot = j.agg(F.sum("key_pairs").cast("long").alias("est_total_pairs"))
    return (
        j.orderBy(F.desc("key_pairs"), F.asc("join_key"))
        .limit(10)
        .crossJoin(F.broadcast(tot))
        .select(
            "join_key",
            "n_left",
            "n_right",
            F.col("key_pairs").cast("long").alias("key_pairs"),
            "est_total_pairs",
            F.round(F.col("key_pairs") / F.col("est_total_pairs"), 6).alias(
                "pct_of_total"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Quality-threshold prune tradeoff: tokens retained per quality floor
# ---------------------------------------------------------------------------


def _prune_tradeoff_oracle() -> str:
    from vectordbfaiss_spark.queries.text_analysis import _STOPLIST_SQL

    return f"""
WITH w AS (SELECT doc_id, string_split_regex(rtrim(text), '\\s+') AS words
           FROM documents),
m AS (SELECT doc_id, len(words) AS n_tokens,
             len(list_filter(words, t -> list_contains({_STOPLIST_SQL}, t)))
               AS n_stop,
             len(list_distinct(words)) / len(words) AS ttr
      FROM w),
s AS (SELECT n_tokens,
             round(0.4 * least(n_tokens / 64.0, 1.0)
                 + 0.3 * least(n_stop / n_tokens * 3, 1.0)
                 + 0.3 * least(ttr * 2, 1.0), 6) AS quality
      FROM m),
t AS (SELECT i / 10.0 AS quality_floor
      FROM unnest(generate_series(1, 9)) u(i)),
agg AS (SELECT t.quality_floor,
               CAST(count(*) FILTER (WHERE s.quality >= t.quality_floor)
                    AS BIGINT) AS n_docs_kept,
               CAST(coalesce(sum(s.n_tokens)
                    FILTER (WHERE s.quality >= t.quality_floor), 0)
                    AS BIGINT) AS tokens_kept
        FROM s CROSS JOIN t GROUP BY 1),
tot AS (SELECT sum(n_tokens) AS total_tokens FROM s)
SELECT agg.quality_floor, agg.n_docs_kept, agg.tokens_kept,
       round(agg.tokens_kept / tot.total_tokens, 6) AS pct_tokens_kept
FROM agg, tot
"""


@register("quality_prune_tradeoff", _prune_tradeoff_oracle())
def q_quality_prune_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-loss curve for quality thresholding: for each candidate floor
    (0.1..0.9), how many documents and — the number that matters for a
    training corpus — how many TOKENS survive.

    `quality_calibration_deciles` says where each source's distribution
    sits; this query prices the cut itself, which is how the floor is
    actually chosen ("highest floor that keeps >= X% of tokens"). One
    stopword-scan pass computes (quality, n_tokens) per doc, then a
    broadcast nested-loop against the 9-row threshold frame feeds a
    map-side-combinable conditional aggregate: O(9N) flat rows, no
    shuffle bigger than 9 groups, no re-scan per threshold. The corpus
    total rides the SAME aggregate (every floor group sees every doc
    via the replication, so the unconditional sum per group IS the
    total) — SINGLE PASS, no checkpoint: the round-7 bench showed the
    eager localCheckpoint here regressing 0.93->5.4 s under fleet
    storage-memory pressure for a frame cheap to recompute.
    """
    from vectordbfaiss_spark.operators import textstats as TS

    docs = load_table(spark, sf_dir, "documents")
    scored = TS.quality_score(docs, "doc_id", "text").select(
        "quality", "n_tokens"
    )
    thr = spark.createDataFrame(
        [(i / 10.0,) for i in range(1, 10)], "quality_floor double"
    )
    agg = (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("quality_floor")
        .agg(
            F.count(F.when(F.col("quality") >= F.col("quality_floor"), 1)).alias(
                "n_docs_kept"
            ),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("quality") >= F.col("quality_floor"),
                        F.col("n_tokens"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tokens_kept"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    return agg.select(
        "quality_floor",
        "n_docs_kept",
        "tokens_kept",
        F.round(F.col("tokens_kept") / F.col("total_tokens"), 6).alias(
            "pct_tokens_kept"
        ),
    )


# ---------------------------------------------------------------------------
# Differentially-private-style noised release (seeded Laplace mechanism)
# ---------------------------------------------------------------------------

_DP_SCALE = 10.0  # Laplace scale b (sensitivity 1 / epsilon 0.1)
_DP_DENOM = 16 ** 6  # _hash_bucket range


def _dp_oracle() -> str:
    from vectordbfaiss_spark.queries.curation import _sql_hash_bucket

    bucket = _sql_hash_bucket("'dp-v1|' || event_type")
    return f"""
WITH c AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY 1
),
u AS (
  SELECT event_type, n,
         ({bucket} + 0.5) / {_DP_DENOM}.0 - 0.5 AS v
  FROM c
)
SELECT event_type,
       round(n + (-{_DP_SCALE} * sign(v) * ln(1.0 - 2.0 * abs(v))), 4)
         AS noised_count,
       {_DP_SCALE} AS laplace_scale
FROM u
"""


@register("dp_noised_event_counts", _dp_oracle())
def q_dp_noised_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noised release of per-type event counts — the
    shape a privacy-bounded stats endpoint uses (sensitivity-1 count +
    Laplace(b) noise; here b=10, i.e. epsilon=0.1). The noise is SEEDED:
    uniform u in (-1/2, 1/2) from the engine-shared md5 bucket of a
    versioned key ('dp-v1|' || group), mapped through the Laplace inverse
    CDF -b*sign(u)*ln(1-2|u|) — so releases are reproducible run-to-run
    (and testable: the oracle replays the mechanism digit for digit),
    while changing the seed version rotates the noise. True counts never
    appear in the output. Privacy honesty: deterministic per-key noise
    means REPEATED releases of the same key don't compound privacy loss
    like fresh randomness would, but it also means the noise is
    predictable to anyone knowing the seed — production systems keep the
    seed secret or use true randomness with a privacy accountant; the
    MECHANISM and its Spark shape (one map-side-combinable count + O(1)
    per-group expression work) are what this query pins.
    """
    from vectordbfaiss_spark.queries.curation import _hash_bucket

    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("event_type").agg(F.count("*").alias("n"))
    v = (
        (_hash_bucket(F.concat(F.lit("dp-v1|"), F.col("event_type"))) + 0.5)
        / F.lit(float(_DP_DENOM))
        - 0.5
    )
    noise = -F.lit(_DP_SCALE) * F.signum(v) * F.log(1.0 - 2.0 * F.abs(v))
    return c.select(
        "event_type",
        F.round(F.col("n") + noise, 4).alias("noised_count"),
        F.lit(_DP_SCALE).alias("laplace_scale"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over event quasi-identifiers
# ---------------------------------------------------------------------------

_K_ANON = 5

_K_ANON_ORACLE = f"""
WITH qi AS (
  SELECT event_type,
         CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT)
           AS k_bucket,
         user_id
  FROM events
)
SELECT event_type, k_bucket,
       CAST(count(*) AS BIGINT) AS n_records,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       count(DISTINCT user_id) >= {_K_ANON} AS anonymous
FROM qi GROUP BY event_type, k_bucket
"""


@register("k_anonymity_audit", _K_ANON_ORACLE)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the event stream: group sizes per
    quasi-identifier combination (event_type x bucketed payload value) and
    a flag for combos re-identifiable below k={5} distinct users — the
    release gate a privacy review runs before sharing event-level data
    (`dp_noised_event_counts` is the mitigation; this is the measurement).

    One hash aggregate with a map-side-combinable exact distinct (the
    QI grain is small so the count-distinct expansion is bounded by the
    combo count, not the corpus); JSON extraction stays in the scan
    projection so the aggregate reads two narrow columns."""
    ev = load_table(spark, sf_dir, "events")
    qi = ev.select(
        "event_type",
        # floor, not truncate-toward-zero: DuckDB's // is floor division,
        # and the two diverge for negative k
        F.floor(F.get_json_object("props", "$.k").cast("long") / 10)
        .cast("long")
        .alias("k_bucket"),
        "user_id",
    )
    return qi.groupBy("event_type", "k_bucket").agg(
        F.count("*").cast("long").alias("n_records"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        (F.countDistinct("user_id") >= _K_ANON).alias("anonymous"),
    )
