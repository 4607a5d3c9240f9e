"""Integer PageRank: agreement with a float reference and structural sanity
on a constructed graph. Oracle equivalence is covered by the registry sweep."""

from __future__ import annotations

from vectordbfaiss_spark.operators.graph import pagerank_int


def _sym(spark, pairs):
    und = list({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    return spark.createDataFrame(und, "src long, dst long")


def _float_pagerank(pairs, iters=3, d=0.85):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    r = {n: 1.0 for n in adj}
    for _ in range(iters):
        nxt = {}
        for n in adj:
            nxt[n] = (1 - d) + d * sum(r[m] / len(adj[m]) for m in adj if n in adj[m])
        r = nxt
    return r


def test_matches_float_reference(spark):
    # star (hub 0) + a 3-cycle + a pendant pair
    pairs = [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6), (6, 7), (7, 5), (8, 9)]
    got = {
        r["id"]: r["pagerank_scaled"] / 1e12
        for r in pagerank_int(_sym(spark, pairs), iterations=3).collect()
    }
    want = _float_pagerank(pairs)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, (n, got[n], want[n])


def test_hub_outranks_leaves(spark):
    pairs = [(0, i) for i in range(1, 6)]
    got = {
        r["id"]: r["pagerank_scaled"]
        for r in pagerank_int(_sym(spark, pairs), iterations=3).collect()
    }
    assert all(got[0] > got[i] for i in range(1, 6))


def test_mass_roughly_conserved(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    rows = pagerank_int(_sym(spark, pairs), iterations=3).collect()
    total = sum(r["pagerank_scaled"] for r in rows)
    # symmetric regular graph: mass exactly preserved up to integer floor
    assert 0.999 * 4e12 < total <= 4e12
