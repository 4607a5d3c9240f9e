"""Relational operator breadth (SURVEY §2.2-2.8 phase-2 declarations).

The reference's only relational surface is projections, an IN-list lookup,
COUNT(*), and a lookup join (server.js:79,131,231-248); the scaled engine
exposes the full join/aggregate/window/set-op family over the TPC-H-ish
fixtures. Every query here is pure built-in DataFrame API — Catalyst owns
pushdown, pruning, and join strategy; dimension joins are explicitly
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import load_table

# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                        AS sum_qty,
       round(sum(l_extendedprice), 4)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
       round(avg(l_quantity), 6)                                        AS avg_qty,
       round(avg(l_extendedprice), 6)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE)
def q_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: hash aggregate with map-side partial
    aggregation (the reference's only aggregate is COUNT(*), server.js:67).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*)                  AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


@register("distinct_counts", _DISTINCT_ORACLE)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase hash agg in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       count(*)                  AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_lineitem", _ROLLUP_ORACLE)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total; NULL-filled keys)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )


_HAVING_ORACLE = """
SELECT o_custkey, count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS total_spend
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 12
"""


@register("orders_per_customer_having", _HAVING_ORACLE)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


_CASE_ORACLE = """
SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
            WHEN o_totalprice < 5000 THEN 'medium'
            ELSE 'large' END AS bucket,
       o_orderstatus,
       count(*) AS n,
       round(avg(o_totalprice), 6) AS avg_price
FROM orders
GROUP BY 1, 2
"""


@register("case_when_buckets", _CASE_ORACLE)
def q_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation (constant-folded in codegen)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 1000, "small")
        .when(F.col("o_totalprice") < 5000, "medium")
        .otherwise("large")
    )
    return (
        orders.groupBy(bucket.alias("bucket"), F.col("o_orderstatus"))
        .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 6).alias("avg_price"))
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", _Q3_ORACLE)
def q_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join + agg + deterministic top-10.

    No forced broadcasts: customer and the o><c result both SCALE with the
    data (o><c is O(|orders|/segments)), so the join strategy is left to
    file statistics — at small SF the planner broadcasts them on its own;
    at 100 TB it graduates to shuffle joins (the q10 behavior observed at
    the 100x step). A forced hint here would be un-graduatable and OOM.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            o.join(c, o.o_custkey == c.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


_STAR_ORACLE = """
SELECT r.r_name, n.n_name,
       count(*) AS n_customers,
       round(sum(c.c_acctbal), 4) AS total_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


@register("star_join_rollup", _STAR_ORACLE)
def q_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dimension join: both dims broadcast (zero-shuffle join
    tree; the only exchange is the final aggregation)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_balance"),
        )
    )


_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 4000)
"""


@register("semi_join_big_spenders", _SEMI_ORACLE)
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — reference analog: the IN-list hydration
    lookup server.js:231-242 (J2)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 4000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
"""


@register("anti_join_no_orders", _ANTI_ORACLE)
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the cross-batch dedup building block
    (SURVEY §2.4 A5). Filtered right side keeps the anti-set non-empty at
    every SF (an all-rows-match anti join would prove nothing).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


_OUTER_ORACLE = """
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s LEFT JOIN nation n
  ON s.s_nationkey = n.n_nationkey AND n.n_regionkey = 0
"""


@register("left_outer_with_condition", _OUTER_ORACLE)
def q_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join with a compound condition (null-preserving J1)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return s.join(
        F.broadcast(n),
        (s.s_nationkey == n.n_nationkey) & (n.n_regionkey == 0),
        "left",
    ).select("s_suppkey", "s_name", "n_name")


# ---------------------------------------------------------------------------
# Sorts / limits / set ops
# ---------------------------------------------------------------------------

_TOPN_ORACLE = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


@register("topn_orders", _TOPN_ORACLE)
def q_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Catalyst plans TakeOrderedAndProject — per-partition
    heap + driver merge, never a full sort (K1, server.js:58-60)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("o_totalprice"))
    )


_SETOP_ORACLE = """
SELECT c_custkey, 'union' AS op FROM (
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 4500
)
UNION ALL
SELECT c_custkey, 'intersect' AS op FROM (
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 4500
)
UNION ALL
SELECT c_custkey, 'except' AS op FROM (
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 4500
)
"""


@register("set_operations", _SETOP_ORACLE)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT in one result (SURVEY §2.6)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    b = o.filter(F.col("o_totalprice") > 4500).select(
        F.col("o_custkey").alias("c_custkey")
    )
    tag = lambda df, op: df.withColumn("op", F.lit(op))  # noqa: E731
    return (
        tag(a.union(b).distinct(), "union")
        .unionAll(tag(a.intersect(b), "intersect"))
        .unionAll(tag(a.exceptAll(b).distinct(), "except"))
    )


# ---------------------------------------------------------------------------
# String / JSON scalar functions
# ---------------------------------------------------------------------------

_STRING_ORACLE = """
SELECT p_partkey,
       upper(p_name)                                   AS name_upper,
       substr(p_name, 1, 4)                            AS name_prefix,
       length(p_name)                                  AS name_len,
       CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
       (p_type LIKE '%ECO%')                           AS is_eco,
       regexp_replace(p_name, '\\s+', '_', 'g')        AS name_snake
FROM part
WHERE p_name LIKE '%e%'
"""


@register("string_functions_part", _STRING_ORACLE)
def q_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar family (F1/F3-F10 analogs): LIKE, regexp extract /
    replace, case, substring, length — all codegen'd JVM expressions."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%e%")).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("long").alias("brand_num"),
        F.col("p_type").like("%ECO%").alias("is_eco"),
        F.regexp_replace("p_name", r"\s+", "_").alias("name_snake"),
    )


_JSON_ORACLE = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
FROM events
GROUP BY event_type
"""


@register("json_extract_events", _JSON_ORACLE)
def q_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction (S10: from_json/get_json_object analog of the
    reference's express.json() request parsing, server.js:18)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
    )


# ---------------------------------------------------------------------------
# Window functions & time windows (SURVEY §2.8, §2.10 batch form)
# ---------------------------------------------------------------------------

_WINDOW_RANK_ORACLE = """
SELECT user_id, event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       rn
FROM (
    SELECT user_id, event_id, event_type, ts,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
)
WHERE rn <= 3
"""


@register("window_first_events_per_user", _WINDOW_RANK_ORACLE)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number window: first 3 events per user (W1's ranking shape on
    the time axis)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


_WINDOW_LAG_ORACLE = """
SELECT user_id, event_id,
       round(value, 6) AS value,
       round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS rolling3
FROM events
"""


@register("window_lag_rolling", _WINDOW_LAG_ORACLE)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + rolling-frame sum windows (rowsBetween)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
        F.round(F.sum("value").over(w.rowsBetween(-2, 0)), 6).alias("rolling3"),
    )


_TUMBLING_ORACLE = """
SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("tumbling_window_daily", _TUMBLING_ORACLE)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation — batch form of the Structured
    Streaming windowed agg (SURVEY §2.10); F.window == time_bucket."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_PIVOT_ORACLE = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 END) AS BIGINT) AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 END) AS BIGINT) AS view
FROM events
GROUP BY user_id
"""


@register("pivot_event_counts", _PIVOT_ORACLE)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (explicit value list -> single-pass conditional aggregation;
    missing combinations stay NULL on both engines)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
    )


_Q5_ORACLE = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@register("q5_local_supplier_volume", _Q5_ORACLE)
def q_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table join: the deep join-tree breadth case.
    nation/region are FIXED-SIZE (25/5 rows) -> forced broadcast;
    customer and supplier SCALE with the data, so their join strategy is
    left to file statistics (broadcast at small SF, graduating to shuffle
    joins at 100 TB — forced hints on scaling dims cannot graduate)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice), 4) AS sum_price,
       count(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_lineitem", _CUBE_ORACLE)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all 2^k grouping combinations in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.count("*").alias("n_rows"),
    )


_RANGE_WINDOW_ORACLE = """
SELECT event_id, user_id,
       CAST(count(*) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_last_hour,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ), 6) AS sum_last_hour
FROM events
"""


@register("range_window_last_hour", _RANGE_WINDOW_ORACLE)
def q_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (not row-count): per event, activity within
    the trailing hour — rangeBetween over epoch seconds. (Spark range
    frames need a numeric ordering column; DuckDB takes the interval
    directly — same frame, both engines.)"""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 6).alias("sum_last_hour"),
    )


_APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_rows,
       count(DISTINCT l_partkey) AS exact_parts,
       TRUE AS within_rsd
FROM lineitem GROUP BY l_returnflag
"""


@register("approx_distinct_sketch", _APPROX_DISTINCT_ORACLE)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counts — the 100 TB cardinality
    workhorse (mergeable partials, no expand+exact-distinct shuffle).
    Sketch estimates are engine-specific, so the estimate itself can't be
    hash-compared; instead the error-bound CLAIM is materialized as a
    boolean the oracle checks (|approx-exact| <= 5*rsd*exact must be TRUE,
    with exact computed on both engines), per-group. Tighter bound
    distributions are asserted in tests/test_approx.py."""
    li = load_table(spark, sf_dir, "lineitem")
    # exact distinct via two-level agg in a SEPARATE branch: mixing
    # countDistinct with non-distinct aggregates in one agg plans an
    # Expand (xN input rows); two narrow scans + a 3-row broadcast join
    # are ~3x faster here and scale linearly
    exact = (
        li.select("l_returnflag", "l_partkey")
        .filter(F.col("l_partkey").isNotNull())  # count(DISTINCT) semantics
        .groupBy("l_returnflag", "l_partkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("exact_parts"))
    )
    rest = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    )
    return rest.join(F.broadcast(exact), "l_returnflag", "left").select(
        "l_returnflag",
        "n_rows",
        F.coalesce("exact_parts", F.lit(0)).alias("exact_parts"),
        (
            F.abs(F.col("approx") - F.coalesce("exact_parts", F.lit(0)))
            <= 0.1 * F.coalesce("exact_parts", F.lit(0))
        ).alias("within_rsd"),
    )


_ASOF_ORACLE = """
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       round(p.value, 6) AS purchase_value,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts_str
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


@register("asof_join_click_purchase", _ASOF_ORACLE)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event annotated with the user's most recent
    purchase at or before it (operators/asof.py union+window merge; the
    oracle uses DuckDB's native ASOF JOIN — same semantics, two different
    physical strategies)."""
    from vectordbfaiss_spark.operators.asof import asof_join_backward

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round("value", 6).alias("pvalue")
    )
    joined = asof_join_backward(
        clicks,
        purchases,
        by=["user_id"],
        time_col="ts",
        right_values={"pvalue": "purchase_value", "ts": "purchase_ts"},
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "purchase_value",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "purchase_ts_str"
        ),
    )


_PERCENTILE_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders GROUP BY o_orderpriority
"""


@register("percentiles_order_value", _PERCENTILE_ORACLE)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``: rank p*(n-1), linear interpolation)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


_CORRELATED_ORACLE = """
SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 4) AS o_totalprice
FROM orders o
WHERE o.o_totalprice > 2 * (
    SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
"""


@register("correlated_subquery_orders", _CORRELATED_ORACLE)
def q_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL surface (spark.sql) —
    Catalyst decorrelates it into an aggregate+join; the DataFrame
    equivalent (window avg) would plan the same shape."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 4) AS o_totalprice
        FROM orders_v o
        WHERE o.o_totalprice > 2 * (
            SELECT avg(o2.o_totalprice) FROM orders_v o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


_SLIDING_ORACLE = """
WITH w AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) - i * INTERVAL '1 hour' AS ws,
         event_type, value
  FROM events, unnest(generate_series(0, 1)) AS t(i)
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
FROM w GROUP BY 1, 2
"""


@register("sliding_window_2h_1h", _SLIDING_ORACLE)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (2h duration, 1h slide): every event lands
    in exactly two overlapping windows; Spark's F.window generates the
    window set, the oracle reproduces it as an explicit generate_series
    cross join."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_STATS_ORACLE = """
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS sd_price,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(corr(l_extendedprice, l_quantity), 6) AS corr_price_qty,
       round(covar_samp(l_extendedprice, l_discount), 6) AS cov_price_disc,
       round(min(l_extendedprice), 4) AS min_price,
       round(max(l_extendedprice), 4) AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("stats_summary_lineitem", _STATS_ORACLE)
def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/correlation/covariance) —
    the EDA layer; sample definitions match across engines and the
    single-pass co-moment formulations agree to well under the 4-6dp
    rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 6).alias("cov_price_disc"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
    )


_Q13_ORACLE = """
SELECT n_orders, count(*) AS n_customers
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
GROUP BY n_orders
"""


@register("q13_customer_distribution", _Q13_ORACLE)
def q_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped double aggregation: per-customer order counts
    (zero-preserving left join with a join-side filter) -> histogram of
    counts. count(col) vs count(*) null semantics matter here."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


_MINMAXBY_ORACLE = """
SELECT o_orderpriority,
       arg_min(o_orderkey, printf('%020.4f|%012d', o_totalprice, o_orderkey)) AS cheapest_order,
       arg_max(o_orderkey, printf('%020.4f|%012d', o_totalprice, o_orderkey)) AS priciest_order,
       round(min(o_totalprice), 4) AS min_price,
       round(max(o_totalprice), 4) AS max_price
FROM orders GROUP BY o_orderpriority
"""


@register("min_max_by_orders", _MINMAXBY_ORACLE)
def q_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax) aggregates — the "which row was the
    extreme" lookup without a self-join. The ordering key is a fixed-width
    formatted (price, orderkey) string: price ties exist in the fixture, so
    the arg must be tie-broken identically on both engines (neither Spark
    min_by nor DuckDB arg_min accepts a struct key)."""
    o = load_table(spark, sf_dir, "orders")
    key = F.format_string("%020.4f|%012d", F.col("o_totalprice"), F.col("o_orderkey"))
    return o.groupBy("o_orderpriority").agg(
        F.min_by("o_orderkey", key).alias("cheapest_order"),
        F.max_by("o_orderkey", key).alias("priciest_order"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


_NTILE_ORACLE = """
SELECT o_orderkey,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@register("ntile_percent_rank_orders", _NTILE_ORACLE)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-family windows: ntile / percent_rank / cume_dist (identical
    definitions across engines; deterministic order via price + key)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


_DATETIME_ORACLE = """
SELECT o_orderkey,
       CAST(extract(year FROM o_orderdate) AS INTEGER) AS yr,
       CAST(extract(month FROM o_orderdate) AS INTEGER) AS mon,
       CAST(extract(day FROM o_orderdate) AS INTEGER) AS dom,
       CAST(extract(hour FROM o_orderdate) AS INTEGER) AS hr,
       CAST(extract(isodow FROM o_orderdate) AS INTEGER) AS iso_dow,
       CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since_2024,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
FROM orders
WHERE o_orderkey < 200
"""


@register("datetime_functions_orders", _DATETIME_ORACLE)
def q_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar family with engine-portable definitions: extract
    fields, ISO day-of-week (Spark's dayofweek is Sunday=1, DuckDB's
    dayofweek Sunday=0 — ISO Monday=1 agrees on both), day difference, and
    interval arithmetic formatted to string."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.hour("o_orderdate").alias("hr"),
        F.weekday("o_orderdate").cast("int").alias("iso_dow_0"),
        F.datediff(
            F.col("o_orderdate"), F.lit("2024-01-01 00:00:00").cast("timestamp")
        ).alias("days_since_2024"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
    ).withColumn("iso_dow", F.col("iso_dow_0") + 1).drop("iso_dow_0")


_GSETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


@register("grouping_sets_lineitem", _GSETS_ORACLE)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint single-key groupings — neither
    rollup nor cube shape) through the SQL surface."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


_NULLS_ORACLE = """
SELECT s.s_suppkey,
       coalesce(n.n_name, 'UNKNOWN') AS nation_or_unknown,
       (n.n_name IS NULL) AS is_unmatched,
       ifnull(n.n_regionkey, -1) AS region_or_neg1,
       nullif(s.s_nationkey, 0) AS natkey_nullif0
FROM supplier s LEFT JOIN nation n
  ON s.s_nationkey = n.n_nationkey AND n.n_regionkey = 0
"""


@register("null_handling_suppliers", _NULLS_ORACLE)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar family over an outer join: coalesce / ifnull /
    nullif / IS NULL — identical three-valued-logic semantics on both
    engines."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    j = s.join(
        F.broadcast(n), (s.s_nationkey == n.n_nationkey) & (n.n_regionkey == 0), "left"
    )
    return j.select(
        "s_suppkey",
        F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_or_unknown"),
        F.col("n_name").isNull().alias("is_unmatched"),
        F.ifnull(F.col("n_regionkey"), F.lit(-1)).alias("region_or_neg1"),
        F.nullif(F.col("s_nationkey"), F.lit(0)).alias("natkey_nullif0"),
    )


_FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage_view,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
FROM firsts
"""


@register("funnel_view_click_purchase", _FUNNEL_ORACLE)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view -> click -> purchase): per-user
    first-occurrence times via conditional min, stage predicates require
    strict event-time ordering. One hash aggregate over the fact table +
    one tiny global aggregate — the canonical event-analytics shape."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    reached_view = F.col("t_view").isNotNull()
    reached_click = reached_view & (F.col("t_click") > F.col("t_view"))
    reached_purchase = reached_click & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.sum(reached_view.cast("int")).cast("long").alias("stage_view"),
        F.sum(reached_click.cast("int")).cast("long").alias("stage_click"),
        F.sum(reached_purchase.cast("int")).cast("long").alias("stage_purchase"),
    )


_RETENTION_ORACLE = """
WITH user_weeks AS (
  SELECT DISTINCT user_id,
         CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) // 7 AS INTEGER) AS week
  FROM events
), cohort AS (
  SELECT user_id, min(week) AS first_week FROM user_weeks GROUP BY user_id
)
SELECT c.first_week, uw.week,
       count(DISTINCT uw.user_id) AS n_active
FROM cohort c JOIN user_weeks uw ON c.user_id = uw.user_id
GROUP BY c.first_week, uw.week
"""


@register("retention_cohorts_weekly", _RETENTION_ORACLE)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: first-active week per user
    (cohort) x weeks active. distinct -> min -> self-join on user — both
    shuffles on user_id, so AQE reuses the exchange. The self-join is
    explicitly SHUFFLE_HASH: the cohort table is USER-grain
    (population-proportional), and without the hint the static planner
    broadcasts it from a post-aggregate estimate — the 100x-step OOM
    class (SCALE.md round 4)."""
    e = load_table(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts"), F.lit("2024-01-01 00:00:00").cast("timestamp")) / 7
    ).cast("int")
    user_weeks = e.select("user_id", week.alias("week")).distinct()
    cohort = user_weeks.groupBy("user_id").agg(F.min("week").alias("first_week"))
    return (
        user_weeks.join(cohort.hint("SHUFFLE_HASH"), "user_id")
        .groupBy("first_week", "week")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
