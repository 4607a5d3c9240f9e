"""Corpus analytics beyond the reference's query surface: Pareto-frontier
selection, market-basket co-occurrence, first-digit (Benford) auditing,
autocorrelation of daily activity, and k-core extraction over the
mutual-kNN graph.

Why these belong in a 100 TB training-data engine:

- a PARETO FRONTIER over (length, lexical diversity) is how curation
  picks documents that are not dominated on any quality axis — the
  multi-objective generalization of the single-score threshold in
  ``text_quality_score``;
- FREQUENT PAIRS (apriori-pruned co-occurrence with support/confidence/
  lift) is the classic basket analysis any relational engine ships, and
  the pruning discipline (item-support filter BEFORE the pair self-join)
  is exactly what keeps the pair explosion bounded at scale;
- a BENFORD first-digit audit is a cheap data-quality screen for
  fabricated or truncated numeric columns (ops run it before trusting a
  new source's amounts);
- the sample AUTOCORRELATION of daily event counts is the seasonality
  probe behind trend models (``daily_trend_ols``'s diagnostic sibling);
- K-CORE of the mutual-kNN graph isolates the densely-connected
  embedding neighborhoods (topic cores) from chain-like noise —
  the degree-robust complement of ``mutual_knn_components``.

The reference itself has none of these (its query surface is
server.js:1-357); they follow the engine's registry conventions —
identical aliases and round(x, 6) on both engines — so the DuckDB
oracles replay every number digit for digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import load_table

# ---------------------------------------------------------------------------
# Pareto frontier (skyline) over document quality axes
# ---------------------------------------------------------------------------

_SKYLINE_BUCKETS = 16

_PARETO_ORACLE = r"""
WITH m AS (
  SELECT doc_id, n_chars,
         round(len(list_distinct(string_split_regex(rtrim(text), '\s+'))) * 1.0
               / len(string_split_regex(rtrim(text), '\s+')), 6) AS ttr
  FROM documents
)
SELECT a.doc_id, a.n_chars, a.ttr
FROM m a
WHERE NOT EXISTS (
  SELECT 1 FROM m b
  WHERE b.n_chars >= a.n_chars AND b.ttr >= a.ttr
    AND (b.n_chars > a.n_chars OR b.ttr > a.ttr)
)
"""


@register("pareto_frontier_docs", _PARETO_ORACLE)
def q_pareto_frontier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of documents maximizing BOTH length (n_chars) and type-token
    ratio — the docs no other doc dominates on every axis.

    Two-phase distributed skyline (the standard partition-prune-merge
    plan): phase 1 computes a LOCAL skyline inside each of
    ``_SKYLINE_BUCKETS`` hash buckets — valid because skyline(S) is a
    subset of the union of per-partition skylines for ANY partitioning —
    using a bucket-partitioned range-frame window (max ttr over rows with
    strictly larger n_chars; O(n log n) per bucket, no pair join). Phase 2
    resolves the tiny survivor set exactly with a dominance anti-join —
    a BroadcastNestedLoopJoin bounded by (local-skyline size)^2, which is
    frontier-sized, not corpus-sized: the corpus-scale work is all in the
    partitioned phase 1. The oracle states dominance declaratively
    (NOT EXISTS) — an independent formulation of the same fixed point."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.rtrim(F.col("text")), r"\s+")
    m = docs.select(
        "doc_id",
        "n_chars",
        F.round(F.size(F.array_distinct(words)) / F.size(words), 6).alias("ttr"),
    ).withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(_SKYLINE_BUCKETS)))
    w_gt = (
        W.partitionBy("bucket")
        .orderBy("n_chars")
        .rangeBetween(1, W.unboundedFollowing)
    )
    w_eq = W.partitionBy("bucket", "n_chars")
    local = (
        m.withColumn("maxy_gt", F.max("ttr").over(w_gt))
        .withColumn("maxy_eq", F.max("ttr").over(w_eq))
        .filter(
            (F.col("maxy_gt").isNull() | (F.col("ttr") > F.col("maxy_gt")))
            & (F.col("ttr") == F.col("maxy_eq"))
        )
        .select("doc_id", "n_chars", "ttr")
    )
    a, b = local.alias("a"), local.alias("b")
    dominated = (
        (F.col("b.n_chars") >= F.col("a.n_chars"))
        & (F.col("b.ttr") >= F.col("a.ttr"))
        & ((F.col("b.n_chars") > F.col("a.n_chars")) | (F.col("b.ttr") > F.col("a.ttr")))
    )
    return a.join(b, dominated, "left_anti").select("doc_id", "n_chars", "ttr")


# ---------------------------------------------------------------------------
# Market-basket frequent pairs (apriori-pruned co-occurrence)
# ---------------------------------------------------------------------------

_PAIR_MIN_SUPPORT = 3  # baskets; also the item-level apriori prune bound
_PAIR_TOP = 50

_BASKET_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), nb AS (SELECT count(DISTINCT ok) AS n_baskets FROM items),
supp AS (
  SELECT pk, count(*) AS supp FROM items GROUP BY pk
  HAVING count(*) >= {_PAIR_MIN_SUPPORT}
), fitems AS (
  SELECT i.ok, i.pk, s.supp FROM items i JOIN supp s ON i.pk = s.pk
), pairs AS (
  SELECT a.pk AS p1, b.pk AS p2, any_value(a.supp) AS supp1,
         any_value(b.supp) AS supp2, count(*) AS pair_count
  FROM fitems a JOIN fitems b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
  HAVING count(*) >= {_PAIR_MIN_SUPPORT}
)
SELECT p1, p2, CAST(pair_count AS BIGINT) AS pair_count,
       round(pair_count * 1.0 / n_baskets, 6) AS support,
       round(pair_count * 1.0 / supp1, 6) AS conf_p1_p2,
       round(pair_count * 1.0 / supp2, 6) AS conf_p2_p1,
       round(pair_count * 1.0 * n_baskets / (supp1 * supp2), 6) AS lift
FROM pairs CROSS JOIN nb
ORDER BY pair_count DESC, lift DESC, p1, p2
LIMIT {_PAIR_TOP}
"""


@register("frequent_pairs_market_basket", _BASKET_ORACLE)
def q_frequent_pairs_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs across order baskets with support, directional
    confidence, and lift — top-{50} under a deterministic total order.

    The scale discipline is apriori pruning: an item in fewer than
    ``_PAIR_MIN_SUPPORT`` baskets cannot appear in a qualifying pair, so
    the per-item support filter runs BEFORE pair generation and the
    pair explosion is bounded by the frequent-item basket sizes (at
    100 TB you additionally cap basket cardinality, like the LSH bucket
    guards). Round-10 shape: ONE shuffle on the basket key builds the
    per-basket distinct item ARRAY (the old form planned the
    scan+distinct subtree four times — once per self-join side and once
    per support leg — plus a corpus-wide a x b equi-join); support and
    the basket count roll up from that checkpointed frame, the in-basket
    pair explosion replaces the self-join (same rows: sorted distinct
    items, i < j), and the dimension-sized support table joins AFTER the
    pair aggregation as a broadcast, so the pair shuffle carries only
    (p1, p2) — not two support columns per row (guide §2.3). A pair in
    >= {3} baskets forces both members into >= {3} baskets, so the
    post-agg support join drops nothing the HAVING filter kept. The
    1-row basket count rides the whitelisted scalar crossJoin idiom; the
    final top-k is a TakeOrderedAndProject with a full tie-break (count
    desc, lift desc, p1, p2), never a global sort of all pairs."""
    li = load_table(spark, sf_dir, "lineitem")
    # one checkpointed basket frame: consumers are the basket count, the
    # item-support rollup, and the pair explosion
    per = (
        li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .groupBy("ok")
        .agg(F.array_sort(F.collect_set("pk")).alias("pks"))
        .localCheckpoint(eager=True)
    )
    nb = per.agg(F.count("*").alias("n_baskets"))
    supp = (
        per.select(F.explode("pks").alias("pk"))
        .groupBy("pk")
        .agg(F.count("*").alias("supp"))
        .filter(F.col("supp") >= _PAIR_MIN_SUPPORT)
        .localCheckpoint(eager=True)  # three consumers: semi-join + 2 joins
    )
    # apriori prune inside the basket: keep frequent items, re-collect the
    # (ok-partitioned, exchange-free: the checkpoint preserves the groupBy
    # partitioning and explode/broadcast-join are narrow) basket arrays
    freq = (
        per.select("ok", F.explode("pks").alias("pk"))
        .join(F.broadcast(supp.select("pk")), "pk", "left_semi")
        .groupBy("ok")
        .agg(F.array_sort(F.collect_set("pk")).alias("pks"))
    )
    # in-basket pair explosion: sorted distinct items, all i < j pairs —
    # row-for-row what the old ok-equi-self-join produced
    pair_structs = F.flatten(
        F.transform(
            F.col("pks"),
            lambda x, i: F.transform(
                F.slice(F.col("pks"), i + F.lit(2), F.size(F.col("pks"))),
                lambda y: F.struct(x.alias("p1"), y.alias("p2")),
            ),
        )
    )
    pairs = (
        freq.select(F.explode(pair_structs).alias("pr"))
        .select(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= _PAIR_MIN_SUPPORT)
        .join(
            F.broadcast(supp.select(F.col("pk").alias("p1"), F.col("supp").alias("supp1"))),
            "p1",
        )
        .join(
            F.broadcast(supp.select(F.col("pk").alias("p2"), F.col("supp").alias("supp2"))),
            "p2",
        )
    )
    return (
        pairs.crossJoin(F.broadcast(nb))
        .select(
            "p1",
            "p2",
            F.col("pair_count").cast("long").alias("pair_count"),
            F.round(F.col("pair_count") / F.col("n_baskets"), 6).alias("support"),
            F.round(F.col("pair_count") / F.col("supp1"), 6).alias("conf_p1_p2"),
            F.round(F.col("pair_count") / F.col("supp2"), 6).alias("conf_p2_p1"),
            # multiply in double (like the oracle's * 1.0): a long*long
            # product can overflow at the corpus sizes the docstring targets
            F.round(
                F.col("pair_count").cast("double")
                * F.col("n_baskets")
                / (F.col("supp1") * F.col("supp2")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("pair_count"), F.desc("lift"), "p1", "p2")
        .limit(_PAIR_TOP)
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS first_digit
  FROM lineitem WHERE l_extendedprice > 0
), obs AS (
  SELECT first_digit, count(*) AS n FROM digits GROUP BY first_digit
), tot AS (SELECT sum(n) AS total FROM obs),
expected AS (
  SELECT first_digit, n, total,
         round(log10(1.0 + 1.0 / first_digit), 6) AS expected_pct
  FROM obs CROSS JOIN tot
)
SELECT first_digit, CAST(n AS BIGINT) AS n,
       round(n * 1.0 / total, 6) AS observed_pct,
       expected_pct,
       round((n - total * expected_pct) * (n - total * expected_pct)
             / (total * expected_pct), 6) AS chi2_term
FROM expected
"""


@register("benford_first_digit_audit", _BENFORD_ORACLE)
def q_benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of lineitem prices vs Benford's
    law, with per-digit chi-square contributions — the data-quality screen
    for fabricated/truncated numeric sources.

    Digit extraction goes through exact integer cents (round(price*100)
    cast to long, first character of the integer's decimal string) rather
    than floor(log10): prices carry 2 decimals so the cents value is
    within 1e-9 of an integer on both engines, whereas log10 at power-of-
    ten boundaries is one ulp from flipping floor(). One map-side-combined
    9-group aggregate plus the scalar-total crossJoin; the expected
    percentages are rounded BEFORE the chi-square terms so both engines
    feed identical inputs into the division."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    obs = (
        li.filter(F.col("l_extendedprice") > 0)
        .select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("first_digit"))
        .groupBy("first_digit")
        .agg(F.count("*").alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("total"))
    e = obs.crossJoin(F.broadcast(tot)).withColumn(
        "expected_pct", F.round(F.log10(1.0 + 1.0 / F.col("first_digit")), 6)
    )
    return e.select(
        "first_digit",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.col("total"), 6).alias("observed_pct"),
        "expected_pct",
        F.round(
            (F.col("n") - F.col("total") * F.col("expected_pct"))
            * (F.col("n") - F.col("total") * F.col("expected_pct"))
            / (F.col("total") * F.col("expected_pct")),
            6,
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation of daily event counts
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT ts::DATE AS day, count(*) AS n FROM events GROUP BY 1
), bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
spine AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds
), series AS (
  SELECT s.day, coalesce(d.n, 0) AS n FROM spine s LEFT JOIN daily d ON s.day = d.day
), st AS (SELECT avg(n) AS m FROM series),
den AS (SELECT sum((n - m) * (n - m)) AS den, any_value(m) AS m
        FROM series CROSS JOIN st),
lags AS (SELECT CAST(unnest(generate_series(1, {_ACF_MAX_LAG})) AS INTEGER) AS lag)
SELECT CAST(l.lag AS INTEGER) AS lag,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(sum((a.n - d.m) * (b.n - d.m)) / any_value(d.den), 6) AS acf
FROM series a
CROSS JOIN lags l
JOIN series b ON b.day = a.day + l.lag
CROSS JOIN den d
GROUP BY l.lag
"""


@register("acf_daily_counts", _ACF_ORACLE)
def q_acf_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the gap-filled daily event-count series at
    lags 1..{7} — the seasonality diagnostic behind trend models.

    The series is CALENDAR-sized (days between min and max event), not
    corpus-sized, so the scale-sensitive stage is only the daily
    aggregate (map-side combinable); everything after operates on the
    tiny series: the date spine comes from a 1-row bounds aggregate via
    sequence(), the mean/denominator are scalar crossJoins, and each lag
    is an equi-join of the series against itself shifted by date_add —
    no global window, no per-lag rescan of the raw events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("n"))
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    series = (
        spine.join(daily, "day", "left")
        .select("day", F.coalesce("n", F.lit(0)).alias("n"))
        .localCheckpoint(eager=True)  # calendar-sized; feeds 4 subtrees
    )
    st = series.agg(F.avg("n").alias("m"))
    den = (
        series.crossJoin(F.broadcast(st))
        .agg(
            F.sum((F.col("n") - F.col("m")) * (F.col("n") - F.col("m"))).alias("den"),
            F.first("m").alias("m"),
        )
    )
    lags = (
        ev.sparkSession.range(1, _ACF_MAX_LAG + 1)
        .select(F.col("id").cast("int").alias("lag"))
    )
    shifted = series.crossJoin(F.broadcast(lags)).select(
        F.date_add("day", F.col("lag")).alias("jday"), F.col("n").alias("x"), "lag"
    )
    pairs = shifted.join(
        series.select(F.col("day").alias("jday"), F.col("n").alias("y")), "jday"
    )
    return (
        pairs.crossJoin(F.broadcast(den))
        .groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(
                F.sum((F.col("x") - F.col("m")) * (F.col("y") - F.col("m")))
                / F.first("den"),
                6,
            ).alias("acf"),
        )
    )


# ---------------------------------------------------------------------------
# k-core of the mutual-kNN graph
# ---------------------------------------------------------------------------

_KCORE_K = 2
_KCORE_ORACLE_ROUNDS = 24  # >= max simultaneous-peel depth (measured 12 at sf0.1)


def _kcore_oracle(k: int = _KCORE_K, rounds: int = _KCORE_ORACLE_ROUNDS) -> str:
    """Unrolled simultaneous-peel SQL: round r keeps nodes whose degree in
    the round-(r-1) subgraph is >= k. The round count is a FIXED POINT
    bound, not a semantic knob — extra rounds are identity, and the Spark
    kernel raises if any component's true peel depth exceeds it
    (operators/graph.py k_core max_peel_rounds), so the two formulations
    can never silently diverge."""
    from vectordbfaiss_spark.queries.embedding_analysis import _KNN_CTES

    parts = [
        f"WITH {_KNN_CTES},",
        "mut AS MATERIALIZED (SELECT a.src, a.dst FROM knn a"
        " JOIN knn b ON a.src = b.dst AND a.dst = b.src WHERE a.src < a.dst),",
        "e0 AS MATERIALIZED (SELECT src, dst FROM mut UNION ALL SELECT dst, src FROM mut)",
    ]
    # AS MATERIALIZED is load-bearing: each round references the previous
    # CTE three times, and DuckDB's default inlining would blow the plan
    # up 3^rounds (observed as fd exhaustion re-opening the parquet).
    for r in range(1, rounds + 1):
        parts.append(
            f", n{r} AS MATERIALIZED (SELECT src AS id FROM e{r - 1}"
            f" GROUP BY src HAVING count(*) >= {k})"
        )
        parts.append(
            f", e{r} AS MATERIALIZED (SELECT s.src, s.dst FROM e{r - 1} s"
            f" JOIN n{r} a ON s.src = a.id JOIN n{r} b ON s.dst = b.id)"
        )
    parts.append(
        f" SELECT src AS vec_id, CAST(count(*) AS BIGINT) AS core_degree"
        f" FROM e{rounds} GROUP BY src"
    )
    return "\n".join(parts)


@register("kcore_mutual_knn", _kcore_oracle())
def q_kcore_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{2}-core of the mutual-kNN graph: the densely-embedded neighborhoods
    that survive when every member must keep >= 2 mutual neighbors —
    chain-like bridges and satellites peel away, which plain connected
    components (mutual_knn_components) cannot distinguish.

    Global iterative peeling is diameter-shaped (measured 12 simultaneous
    rounds at sf0.1 — the round-5 audit's convergence trap), so the Spark
    plan gets its parallelism from LOCALITY instead: star-contraction
    components first (O(log^2 n) rounds independent of diameter), then one
    exact per-component peel inside applyInPandas — linear per-task work,
    embarrassingly parallel across components, with explicit size/depth
    guards that raise rather than degrade (operators/graph.py:k_core).
    Reads the published kNN-edge artifact (build-once, O(N*k) rows)."""
    from vectordbfaiss_spark.operators.graph import k_core
    from vectordbfaiss_spark.queries.embedding_analysis import knn_edges_published

    edges = knn_edges_published(spark, sf_dir).select("src", "dst")
    edges = edges.localCheckpoint(eager=True)
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = edges.join(rev, ["src", "dst"], "left_semi").filter(
        F.col("src") < F.col("dst")
    )
    core = k_core(mutual, k=_KCORE_K, max_peel_rounds=_KCORE_ORACLE_ROUNDS)
    return core.select(F.col("id").alias("vec_id"), "core_degree")


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (the breakdown-resistant twin of daily_trend_ols)
# ---------------------------------------------------------------------------

_THEILSEN_ORACLE = """
WITH daily AS (
  SELECT ts::DATE AS day, count(*) AS n FROM events GROUP BY 1
), bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
spine AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds
), series AS (
  SELECT CAST(date_diff('day', b.d0, s.day) AS BIGINT) AS x,
         coalesce(d.n, 0) AS y
  FROM spine s CROSS JOIN bounds b LEFT JOIN daily d ON s.day = d.day
), slopes AS (
  SELECT (b.y - a.y) * 1.0 / (b.x - a.x) AS slope
  FROM series a JOIN series b ON b.x > a.x
), med AS (SELECT quantile_cont(slope, 0.5) AS slope FROM slopes)
SELECT CAST((SELECT count(*) FROM series) AS BIGINT) AS n_days,
       CAST((SELECT count(*) FROM slopes) AS BIGINT) AS n_pairs,
       round(m.slope, 6) AS slope,
       round(quantile_cont(s.y - m.slope * s.x, 0.5), 6) AS intercept
FROM series s CROSS JOIN med m
GROUP BY m.slope
"""


@register("theilsen_daily_trend", _THEILSEN_ORACLE)
def q_theilsen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily event counts: slope = median of all
    pairwise slopes, intercept = median residual — the 29%-breakdown
    estimator next to `daily_trend_ols` (one corrupted ingest day drags an
    OLS fit, not this one).

    The pairwise-slope join is CALENDAR-squared, not corpus-squared —
    the only corpus-scale stage is the daily aggregate, after which a
    year is 365 rows and the pair join is ~66k tiny rows on one
    executor. Median via interpolating percentile on both engines;
    the median slope is a 1-row broadcast for the residual pass."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("n"))
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    series = (
        bounds.select(
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"), "d0"
        )
        .join(daily, "day", "left")
        .select(
            F.datediff("day", "d0").cast("long").alias("x"),
            F.coalesce("n", F.lit(0)).alias("y"),
        )
        .localCheckpoint(eager=True)  # calendar-sized; feeds 3 subtrees
    )
    a = series.alias("a")
    b = series.select(F.col("x").alias("bx"), F.col("y").alias("by"))
    slopes = a.join(b, F.col("bx") > F.col("x")).select(
        ((F.col("by") - F.col("y")) / (F.col("bx") - F.col("x"))).alias("slope")
    )
    med = slopes.agg(F.percentile("slope", F.lit(0.5)).alias("slope"))
    counts = series.agg(F.count("*").cast("long").alias("n_days")).crossJoin(
        F.broadcast(slopes.agg(F.count("*").cast("long").alias("n_pairs")))
    )
    return (
        series.crossJoin(F.broadcast(med))
        .agg(
            F.round(F.first("slope"), 6).alias("slope"),
            F.round(
                F.percentile(F.col("y") - F.col("slope") * F.col("x"), F.lit(0.5)), 6
            ).alias("intercept"),
        )
        .crossJoin(F.broadcast(counts))
        .select("n_days", "n_pairs", "slope", "intercept")
    )


# ---------------------------------------------------------------------------
# Weekday seasonality decomposition + anomaly flags
# ---------------------------------------------------------------------------

_SEASONAL_Z = 2.0

_WEEKDAY_ORACLE = f"""
WITH daily AS (
  SELECT ts::DATE AS day, count(*) AS n FROM events GROUP BY 1
), bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
spine AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds
), series AS (
  SELECT s.day, coalesce(d.n, 0) AS n,
         date_diff('day', DATE '1970-01-05', s.day) % 7 AS dow
  FROM spine s LEFT JOIN daily d ON s.day = d.day
), dm AS (
  SELECT dow, avg(n) AS dow_mean FROM series GROUP BY dow
), dev AS (
  SELECT s.day, s.n, s.dow, m.dow_mean, s.n - m.dow_mean AS resid
  FROM series s JOIN dm m ON s.dow = m.dow
), sig AS (SELECT stddev_samp(resid) AS sigma FROM dev)
SELECT strftime(day, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n,
       CAST(dow AS INTEGER) AS dow,
       round(dow_mean, 6) AS dow_mean,
       round(resid, 6) AS resid,
       round(resid / sigma, 6) AS z,
       abs(resid / sigma) > {_SEASONAL_Z} AS anomaly
FROM dev CROSS JOIN sig
"""


@register("weekday_seasonality_anomalies", _WEEKDAY_ORACLE)
def q_weekday_seasonality_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition of daily event counts with
    z-scored residual anomaly flags — the volume-monitoring screen that
    separates "it's Sunday" from "ingest broke". dow is computed as
    days-since-a-known-Monday mod 7 (0 = Monday) because the engines'
    dayofweek() builtins disagree on week origin (Spark 1=Sunday,
    DuckDB 0=Sunday); arithmetic on the epoch is identical everywhere.

    Scale shape: one map-side-combinable daily aggregate; the seasonal
    means are a 7-row table and the residual sigma a 1-row scalar — both
    broadcast; no window over the raw events at all."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("n"))
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    series = (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.pmod(F.datediff("day", F.lit("1970-01-05").cast("date")), F.lit(7))
            .cast("int")
            .alias("dow"),
        )
        .localCheckpoint(eager=True)  # calendar-sized; feeds 3 subtrees
    )
    dm = series.groupBy("dow").agg(F.avg("n").alias("dow_mean"))
    dev = series.join(F.broadcast(dm), "dow").withColumn(
        "resid", F.col("n") - F.col("dow_mean")
    )
    sig = dev.agg(F.stddev_samp("resid").alias("sigma"))
    return dev.crossJoin(F.broadcast(sig)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
        "dow",
        F.round("dow_mean", 6).alias("dow_mean"),
        F.round("resid", 6).alias("resid"),
        F.round(F.col("resid") / F.col("sigma"), 6).alias("z"),
        (F.abs(F.col("resid") / F.col("sigma")) > _SEASONAL_Z).alias("anomaly"),
    )


# ---------------------------------------------------------------------------
# Neyman allocation: optimal stratified-sampling design + its executor
# ---------------------------------------------------------------------------

_NEYMAN_TOTAL = 100  # total sample budget across strata

_NEYMAN_CTES = """
strata AS (
  SELECT source, count(*) AS n_docs, stddev_samp(n_chars) AS sd
  FROM documents GROUP BY source
), tot AS (SELECT sum(n_docs * sd) AS wsum FROM strata),
alloc AS (
  SELECT source, n_docs,
         round(sd, 6) AS sd_chars,
         round(n_docs * sd / wsum, 6) AS alloc_prop,
         greatest(1, CAST(floor({total} * round(n_docs * sd / wsum, 6) + 0.5)
                          AS BIGINT)) AS n_alloc
  FROM strata CROSS JOIN tot
)
""".format(total=_NEYMAN_TOTAL)

_NEYMAN_ORACLE = f"WITH {_NEYMAN_CTES} SELECT source, CAST(n_docs AS BIGINT) AS n_docs, sd_chars, alloc_prop, n_alloc FROM alloc"


def _neyman_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    strata = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.stddev_samp("n_chars").alias("sd")
    )
    tot = strata.agg(F.sum(F.col("n_docs") * F.col("sd")).alias("wsum"))
    prop = F.round(F.col("n_docs") * F.col("sd") / F.col("wsum"), 6)
    return strata.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("sd", 6).alias("sd_chars"),
        prop.alias("alloc_prop"),
        # floor(x + 0.5), not round(): the engines' round() half-rules
        # differ, floor arithmetic is identical everywhere
        F.greatest(
            F.lit(1), F.floor(_NEYMAN_TOTAL * prop + 0.5).cast("long")
        ).alias("n_alloc"),
    )


@register("neyman_allocation_plan", _NEYMAN_ORACLE)
def q_neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling DESIGN: allocate a fixed label /
    inspection budget across per-source strata proportional to
    N_h * S_h (stratum size x stddev of the length signal) — the
    variance-minimizing allocation, and the sampling plan a human-audit
    or eval-labeling pipeline starts from (uniform sampling oversamples
    homogeneous strata). One 5-group aggregate + the 1-row scalar
    crossJoin; allocation integers via floor(x + 0.5) so both engines
    round identically."""
    return _neyman_alloc(spark, sf_dir)


_NEYMAN_EXEC_ORACLE = f"""
WITH {_NEYMAN_CTES},
ranked AS (
  SELECT d.doc_id, d.source,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
           AS rk
  FROM documents d
)
SELECT r.doc_id, r.source, CAST(r.rk AS BIGINT) AS rk
FROM ranked r JOIN alloc a ON r.source = a.source
WHERE r.rk <= a.n_alloc
"""


@register("stratified_sample_neyman", _NEYMAN_EXEC_ORACLE)
def q_stratified_sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE the Neyman design: per stratum, take the n_alloc docs with
    the smallest md5(doc_id) — a deterministic, seedless uniform draw
    (the engine-shared md5 ordering every sampler here uses), so the
    sample is reproducible on any engine and incremental reruns pick the
    same rows. Plan: the rank window is PARTITIONED by stratum (never
    global) and rank-filtered raw so InferWindowGroupLimit bounds it;
    the 5-row allocation table broadcasts onto the rank join."""
    docs = load_table(spark, sf_dir, "documents")
    alloc = _neyman_alloc(spark, sf_dir).select("source", "n_alloc")
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(w).alias("rk")
    )
    return (
        ranked.join(F.broadcast(alloc), "source")
        .filter(F.col("rk") <= F.col("n_alloc"))
        .select("doc_id", "source", F.col("rk").cast("long").alias("rk"))
    )


# ---------------------------------------------------------------------------
# Sampled estimator with a finite-population confidence interval
# ---------------------------------------------------------------------------

_CI_RATE_BUCKETS = 1677722  # ~10% of the 16^6 md5-bucket space

# engine-shared md5 bucket (the sampler convention from queries/curation.py)
from vectordbfaiss_spark.queries.curation import _sql_hash_bucket  # noqa: E402

_sql_hash_bucket_docs = _sql_hash_bucket("doc_id") + " AS bucket"

_CI_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(rtrim(text), '\\s+')) AS BIGINT) AS toks,
         {_sql_hash_bucket_docs}
  FROM documents
), pop AS (SELECT count(*) AS n_total, sum(toks) AS exact_total FROM t),
samp AS (
  SELECT count(*) AS n_sampled, avg(toks) AS mean_s, var_samp(toks) AS var_s
  FROM t WHERE bucket < {_CI_RATE_BUCKETS}
)
SELECT CAST(n_sampled AS BIGINT) AS n_sampled,
       CAST(n_total AS BIGINT) AS n_total,
       round(n_total * mean_s, 4) AS estimate,
       round(n_total * mean_s
             - 1.96 * n_total * sqrt(var_s / n_sampled)
                    * sqrt(1.0 - n_sampled * 1.0 / n_total), 4) AS lower,
       round(n_total * mean_s
             + 1.96 * n_total * sqrt(var_s / n_sampled)
                    * sqrt(1.0 - n_sampled * 1.0 / n_total), 4) AS upper,
       CAST(exact_total AS BIGINT) AS exact_total,
       (exact_total >= n_total * mean_s
             - 1.96 * n_total * sqrt(var_s / n_sampled)
                    * sqrt(1.0 - n_sampled * 1.0 / n_total))
       AND (exact_total <= n_total * mean_s
             + 1.96 * n_total * sqrt(var_s / n_sampled)
                    * sqrt(1.0 - n_sampled * 1.0 / n_total)) AS within_ci
FROM samp CROSS JOIN pop
"""


@register("sampled_token_count_ci", _CI_ORACLE)
def q_sampled_token_count_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate the corpus token count from a deterministic ~10% hash
    sample with a 95% CLT confidence interval (finite-population
    corrected) — the estimate-before-you-scan discipline: at 100 TB you
    size the tokenization job from a sample, and the CI says whether the
    sample was enough. The sample is the md5-bucket rule every sampler
    here shares, so the oracle replays the same rows; `within_ci` is the
    self-check (the exact total is computed in the same pass for the
    audit — in production you'd skip it and keep only the bounds)."""
    from vectordbfaiss_spark.queries.curation import _hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(F.split(F.rtrim(F.col("text")), r"\s+")).cast("long").alias("toks"),
        _hash_bucket(F.col("doc_id")).alias("bucket"),
    )
    pop = t.agg(
        F.count("*").alias("n_total"), F.sum("toks").alias("exact_total")
    )
    samp = t.filter(F.col("bucket") < _CI_RATE_BUCKETS).agg(
        F.count("*").alias("n_sampled"),
        F.avg("toks").alias("mean_s"),
        F.var_samp("toks").alias("var_s"),
    )
    est = F.col("n_total") * F.col("mean_s")
    se = (
        F.lit(1.96)
        * F.col("n_total")
        * F.sqrt(F.col("var_s") / F.col("n_sampled"))
        * F.sqrt(1.0 - F.col("n_sampled") / F.col("n_total"))
    )
    return samp.crossJoin(F.broadcast(pop)).select(
        F.col("n_sampled").cast("long").alias("n_sampled"),
        F.col("n_total").cast("long").alias("n_total"),
        F.round(est, 4).alias("estimate"),
        F.round(est - se, 4).alias("lower"),
        F.round(est + se, 4).alias("upper"),
        F.col("exact_total").cast("long").alias("exact_total"),
        ((F.col("exact_total") >= est - se) & (F.col("exact_total") <= est + se)).alias(
            "within_ci"
        ),
    )


# ---------------------------------------------------------------------------
# Equi-depth bucketing via percentile cutpoints (no global sort)
# ---------------------------------------------------------------------------

_EQUIDEPTH_BUCKETS = 10

_EQUIDEPTH_ORACLE = f"""
WITH cuts AS (
  SELECT quantile_cont(o_totalprice,
           [x * 1.0 / {_EQUIDEPTH_BUCKETS} FOR x IN range(1, {_EQUIDEPTH_BUCKETS})]) AS c
  FROM orders
), b AS (
  SELECT round(o_totalprice, 4) AS v,
         1 + len(list_filter(c, x -> o_totalprice > x)) AS bucket
  FROM orders CROSS JOIN cuts
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min(v), 4) AS lo,
       round(max(v), 4) AS hi
FROM b GROUP BY bucket
"""


@register("equi_depth_buckets_orders", _EQUIDEPTH_ORACLE)
def q_equi_depth_buckets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-population) bucketing of order values — the
    histogram form query optimizers and drift monitors actually keep,
    where every bucket holds ~1/10 of the rows regardless of skew
    (`histogram_order_values` is the equi-width sibling).

    The naive formulation is ntile() over a GLOBAL sort — the
    one-task-unbounded-window shape the plan-smell sweep exists to
    catch. This plan instead computes the 9 interior cutpoints with one
    interpolating-percentile aggregate (map-side partials, a 9-double
    result), broadcasts them, and buckets with a comparison expression —
    two scans, zero sorts, bucket assignment embarrassingly parallel.
    Both engines interpolate percentiles identically; values are rounded
    AFTER bucketing so boundary assignment sees identical doubles."""
    orders = load_table(spark, sf_dir, "orders")
    pcts = [i / _EQUIDEPTH_BUCKETS for i in range(1, _EQUIDEPTH_BUCKETS)]
    cuts = orders.agg(
        F.percentile("o_totalprice", F.array(*[F.lit(p) for p in pcts])).alias("c")
    )
    b = orders.crossJoin(F.broadcast(cuts)).select(
        F.round("o_totalprice", 4).alias("v"),
        (
            1
            + F.size(
                F.filter(F.col("c"), lambda x: F.col("o_totalprice") > x)
            )
        ).alias("bucket"),
    )
    return b.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.min("v"), 4).alias("lo"),
        F.round(F.max("v"), 4).alias("hi"),
    )


# ---------------------------------------------------------------------------
# Pearson correlation matrix over lineitem measures
# ---------------------------------------------------------------------------

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount")

_CORR_ORACLE = f"""
SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
       round(corr(l_quantity, l_extendedprice), 6) AS r FROM lineitem
UNION ALL
SELECT 'l_quantity', 'l_discount', round(corr(l_quantity, l_discount), 6) FROM lineitem
UNION ALL
SELECT 'l_extendedprice', 'l_discount', round(corr(l_extendedprice, l_discount), 6) FROM lineitem
"""


@register("corr_matrix_lineitem", _CORR_ORACLE)
def q_corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem measures — the
    feature-redundancy screen run before building models or choosing
    clustering axes. All three pairs come out of ONE aggregate over one
    scan (corr is a map-side-combinable moment aggregate); the oracle
    formulation scans per pair to state each correlation independently —
    the 3x-scan shape the single-pass plan avoids."""
    li = load_table(spark, sf_dir, "lineitem")
    a, b, c = _CORR_COLS
    wide = li.agg(
        F.round(F.corr(a, b), 6).alias("r_ab"),
        F.round(F.corr(a, c), 6).alias("r_ac"),
        F.round(F.corr(b, c), 6).alias("r_bc"),
    )
    return wide.selectExpr(
        f"stack(3, '{a}', '{b}', r_ab, '{a}', '{c}', r_ac, '{b}', '{c}', r_bc) "
        "AS (col_a, col_b, r)"
    )
