"""Approximate-distinct error bound vs exact."""
from pyspark.sql import functions as F

from vectordbfaiss_spark import registry
from vectordbfaiss_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_approx_count_distinct_within_bound(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    )
    for r in both.collect():
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.1


def test_approx_percentile_within_bound(spark):
    """The sketch quantile must land within a tight rank neighborhood of
    the exact quantile (1e4 accuracy at this SF: near-exact)."""
    o = load_table(spark, SF_DIR, "orders")
    both = o.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", 0.5, 10_000).alias("approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
    )
    for r in both.collect():
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.02, r


def test_hll_sketch_merge_within_bound(spark):
    """Two-level HLL (daily sketch -> union merge) must estimate distinct
    users within the sketch's error envelope; merging partials must equal
    sketching the whole column directly (associativity — the property
    that makes incremental rollups sound)."""
    q = registry.queries()["hll_distinct_users_daily_merge"]
    for r in q(spark, SF_DIR).collect():
        assert r["merge_within_bound"], r

    e = load_table(spark, SF_DIR, "events")
    direct = {
        r["event_type"]: r["d"]
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("d"))
        .collect()
    }
    merged = {
        r["event_type"]: r["m"]
        for r in e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("m"))
        .collect()
    }
    assert direct == merged
    exact = {
        r["event_type"]: r["x"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    for et, est in merged.items():
        assert abs(est - exact[et]) <= 0.05 * exact[et], (et, est, exact[et])


def test_cms_estimates_overcount_never_undercount(spark):
    """CMS point estimates are >= exact counts (min over hash rows can
    only add collision mass), and with d=4/w=64 the top token's estimate
    stays within eps*N = (e/w)*N of truth."""
    import math

    from pyspark.sql import functions as F

    from vectordbfaiss_spark.queries.sketches_sql import _CMS_W
    from vectordbfaiss_spark.registry import queries
    from vectordbfaiss_spark.session import fan_out, load_table

    sf = "/root/testdata/sf0.001"
    est = {r.tok: r.est for r in queries()["cms_heavy_hitters"](spark, sf).collect()}
    toks = fan_out(load_table(spark, sf, "documents")).select(
        F.explode(F.split(F.rtrim("text"), r"\s+")).alias("tok")
    )
    exact = {r.tok: r.n for r in toks.groupBy("tok").agg(F.count("*").alias("n")).collect()}
    total = sum(exact.values())
    assert all(est[t] >= exact[t] for t in est)
    top = max(est, key=lambda t: (est[t], t))
    assert est[top] - exact[top] <= math.e / _CMS_W * total
