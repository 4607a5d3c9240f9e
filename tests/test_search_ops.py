"""Semantic + plan tests for the search-index family
(queries/search_index.py) and the ops-diagnostics family
(queries/ops_diagnostics.py). Oracle equivalence is covered by
test_registry_oracle.py; these pin the properties the oracle can't see —
plan shapes and the algorithmic claims in the docstrings."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from vectordbfaiss_spark import registry
from vectordbfaiss_spark.queries import ops_diagnostics as OD
from vectordbfaiss_spark.queries import search_index as SI
from vectordbfaiss_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _norm_tokens(text: str) -> list[str]:
    toks = [re.sub(r"[^a-z0-9]", "", w) for w in re.split(r"\s+", text.rstrip().lower())]
    return [t for t in toks if len(t) >= SI._MIN_TOKEN_LEN]


@pytest.fixture(scope="module")
def docs_local(spark):
    return {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }


# ---------------------------------------------------------------------------
# inverted_index_build
# ---------------------------------------------------------------------------

def test_inverted_index_matches_bruteforce(spark, docs_local):
    out = registry.queries()["inverted_index_build"](spark, SF_DIR).collect()
    df_all: Counter = Counter()
    tf_all: Counter = Counter()
    postings: dict[str, list[int]] = {}
    for doc_id, text in docs_local.items():
        toks = _norm_tokens(text)
        tf_all.update(toks)
        for t in set(toks):
            df_all[t] += 1
            postings.setdefault(t, []).append(doc_id)
    # sf0.001's synthetic vocab is smaller than the dictionary page size
    assert len(out) == min(SI._TOP_TOKENS, len(df_all))
    # dictionary page ordered by (df desc, token)
    keys = [(-r["df"], r["token"]) for r in out]
    assert keys == sorted(keys)
    for r in out[:10]:
        t = r["token"]
        assert r["df"] == df_all[t] and r["tf_total"] == tf_all[t]
        expect = sorted(postings[t])[: SI._POSTINGS_CAP]
        assert r["postings"] == ",".join(str(d) for d in expect)


def test_inverted_index_plan_caps_postings_before_collect(spark):
    plan = _plan(registry.queries()["inverted_index_build"](spark, SF_DIR))
    # rank filter pushes into the window: per-token top-cap, no unbounded
    # postings materialization for stopwords
    assert "WindowGroupLimit" in plan
    # dictionary page is per-partition top-k, not a global sort
    assert "TakeOrderedAndProject" in plan
    # df/tf via two-level agg, never count+countDistinct's Expand
    assert "Expand" not in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# phrase_search_postings
# ---------------------------------------------------------------------------

def test_phrase_search_matches_bruteforce(spark, docs_local):
    out = {
        r["doc_id"]: r["n_matches"]
        for r in registry.queries()["phrase_search_postings"](spark, SF_DIR).collect()
    }
    expect: dict[int, int] = {}
    for doc_id, text in docs_local.items():
        # positions over the RAW split (same as the posexplode), tokens
        # normalized after — adjacency is word-position adjacency
        raw = [re.sub(r"[^a-z0-9]", "", w) for w in re.split(r"\s+", text.rstrip().lower())]
        n = sum(
            1
            for i in range(len(raw) - 1)
            if raw[i] == SI._PHRASE_A and raw[i + 1] == SI._PHRASE_B
        )
        if n:
            expect[doc_id] = n
    assert out == expect and len(out) > 0


def test_phrase_search_is_hash_join_on_position_keys(spark):
    plan = _plan(registry.queries()["phrase_search_postings"](spark, SF_DIR))
    # (doc_id, pos+1) extracts as equi keys: hash join, never a cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# rag_context_budget_pack
# ---------------------------------------------------------------------------

def test_rag_pack_budget_and_greedy_maximality(spark, docs_local):
    rows = registry.queries()["rag_context_budget_pack"](spark, SF_DIR).collect()
    lens = {
        d: len(re.split(r"\s+", t.rstrip().lower())) for d, t in docs_local.items()
    }
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    assert set(by_term) <= set(SI._RAG_TERMS)
    for term, trs in by_term.items():
        trs.sort(key=lambda r: r["rank"])
        # ranks contiguous from 1, running sum correct and under budget
        assert [r["rank"] for r in trs] == list(range(1, len(trs) + 1))
        cum = 0
        for r in trs:
            assert r["n_tokens"] == lens[r["doc_id"]]
            cum += r["n_tokens"]
            assert r["cum_tokens"] == cum
        assert cum <= SI._RAG_BUDGET
        # greedy maximality: the next-ranked candidate (if any) would
        # overflow the budget
        tf: Counter = Counter()
        for d, t in docs_local.items():
            c = Counter(_norm_tokens(t))
            if c[term]:
                tf[d] = c[term]
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
        ranked = ranked[: SI._RAG_CANDIDATES]
        if len(ranked) > len(trs):
            nxt = ranked[len(trs)][0]
            assert cum + lens[nxt] > SI._RAG_BUDGET


def test_rag_pack_plan_bounds_candidates_before_cumsum(spark):
    plan = _plan(registry.queries()["rag_context_budget_pack"](spark, SF_DIR))
    assert "WindowGroupLimit" in plan  # retrieval depth capped in the window
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# join_skew_report
# ---------------------------------------------------------------------------

def test_join_skew_report_matches_pandas(spark):
    out = registry.queries()["join_skew_report"](spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select("user_id").toPandas()
    counts = ev["user_id"].value_counts()
    assert len(out) == OD._TOP_KEYS
    top = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[: OD._TOP_KEYS]
    assert [(r["user_id"], r["key_rows"]) for r in out] == [
        (int(k), int(v)) for k, v in top
    ]
    r0 = out[0]
    assert r0["total_rows"] == len(ev) and r0["n_keys"] == counts.size
    mean = len(ev) / counts.size
    assert r0["skew_ratio"] == pytest.approx(counts.max() / mean, abs=1e-4)
    assert r0["recommended_salt"] >= 1


# ---------------------------------------------------------------------------
# kmv_overlap_sketch
# ---------------------------------------------------------------------------

def test_kmv_estimates_within_bound_and_sketch_membership_lossless(spark):
    row = registry.queries()["kmv_overlap_sketch"](spark, SF_DIR).collect()[0]
    assert row["within_bound"] is True
    assert row["rel_err_union"] <= OD._KMV_BOUND
    assert row["n_inter"] <= min(row["n_a"], row["n_b"])
    assert row["est_inter"] >= 0.0
    # the docstring's containment claim: deciding rho membership against
    # the k-row sketches equals deciding it against the full sets
    docs = load_table(spark, SF_DIR, "documents")
    from pyspark.sql import functions as F

    from vectordbfaiss_spark.operators.dedup import word_shingles
    from vectordbfaiss_spark.queries.curation import _hash_bucket

    pair = docs.filter(F.col("source").isin(OD._KMV_SRC_A, OD._KMV_SRC_B))
    hs = (
        pair.select("source", F.explode(word_shingles("text", 3)).alias("s"))
        .select("source", _hash_bucket(F.col("s")).alias("h"))
        .distinct()
        .collect()
    )
    a = sorted(r["h"] for r in hs if r["source"] == OD._KMV_SRC_A)
    b = sorted(r["h"] for r in hs if r["source"] == OD._KMV_SRC_B)
    ka, kb = set(a[: OD._KMV_K]), set(b[: OD._KMV_K])
    ku = sorted(set(a) | set(b))[: OD._KMV_K]
    rho_full = sum(1 for h in ku if h in set(a) and h in set(b))
    rho_sketch = sum(1 for h in ku if h in ka and h in kb)
    assert rho_full == rho_sketch


def test_kmv_sketches_use_take_ordered_not_global_sort(spark):
    plan = _plan(registry.queries()["kmv_overlap_sketch"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# ngram_novelty_scoring
# ---------------------------------------------------------------------------

def test_novelty_first_doc_is_fully_novel_and_totals_conserve(spark):
    rows = registry.queries()["ngram_novelty_scoring"](spark, SF_DIR).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    first = min(by_doc)
    assert by_doc[first]["novelty"] == 1.0  # earliest doc: everything is new
    # each distinct shingle is novel in exactly one document
    total_novel = sum(r["n_novel"] for r in rows)
    from vectordbfaiss_spark.operators.dedup import exploded_shingles

    docs = load_table(spark, SF_DIR, "documents")
    vocab = exploded_shingles(docs, "doc_id", "text", 3).select("shingle").distinct().count()
    assert total_novel == vocab
    for r in rows:
        assert 0 < r["n_novel"] <= r["n_shingles"] or r["n_novel"] == 0


def test_novelty_plan_is_pure_agg_join_agg(spark):
    plan = _plan(registry.queries()["ngram_novelty_scoring"](spark, SF_DIR))
    assert "Expand" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final for both aggs


# ---------------------------------------------------------------------------
# binary_hamming_rerank_topk
# ---------------------------------------------------------------------------

def test_binary_hamming_rerank_semantics_and_recall(spark):
    import numpy as np

    from vectordbfaiss_spark.queries import vector_search as VS

    rows = registry.queries()["binary_hamming_rerank_topk"](spark, SF_DIR).collect()
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }

    def signbits(v):
        return int(sum(1 << j for j in range(64) if v[j] > 0))

    by_q: dict[int, list] = {}
    for r in rows:
        assert r["cand_id"] >= VS._BQ_NQ  # queries never retrieve themselves
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == set(range(VS._BQ_NQ))
    recalls = []
    for q_id, qr in by_q.items():
        qr.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in qr] == list(range(1, VS._BQ_K + 1))
        # hamming recomputed from raw sign bits
        qb = signbits(emb[q_id])
        for r in qr:
            expect_h = bin(qb ^ signbits(emb[r["cand_id"]])).count("1")
            assert r["hamming"] == expect_h
        # scores non-increasing with rank
        sims = [r["cos_sim"] for r in qr]
        assert sims == sorted(sims, reverse=True)
        # recall vs exact cosine top-k over all candidates
        qv = emb[q_id]
        exact = sorted(
            (
                (float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), -cid)
                for cid, v in emb.items()
                if cid >= VS._BQ_NQ
            ),
            reverse=True,
        )[: VS._BQ_K]
        exact_ids = {-t[1] for t in exact}
        got_ids = {r["cand_id"] for r in qr}
        recalls.append(len(exact_ids & got_ids) / VS._BQ_K)
    # 1-bit prefilter at 4x oversampling: recall well above chance
    assert sum(recalls) / len(recalls) >= 0.5


def test_binary_hamming_plan_is_codegen_prefilter_no_sort(spark):
    plan = _plan(registry.queries()["binary_hamming_rerank_topk"](spark, SF_DIR))
    assert "WindowGroupLimit" in plan  # top-R per query inside the window
    assert "SortMergeJoin" not in plan
    # packing is a projection: no explode/aggregation before the prefilter
    assert "Generate" not in plan


# ---------------------------------------------------------------------------
# matryoshka_truncation_audit
# ---------------------------------------------------------------------------

def test_matryoshka_audit_matches_bruteforce(spark):
    import numpy as np

    from vectordbfaiss_spark.queries import vector_search as VS

    rows = registry.queries()["matryoshka_truncation_audit"](spark, SF_DIR).collect()
    assert [r["q_id"] for r in rows] == list(range(VS._MRL_NQ))
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }

    def topk_ids(qv, dims):
        q = qv[:dims]
        scored = []
        for cid, v in emb.items():
            if cid < VS._MRL_NQ:
                continue
            c = v[:dims]
            s = round(float(q @ c / (np.linalg.norm(q) * np.linalg.norm(c))), 6)
            scored.append((-s, cid))
        return {cid for _, cid in sorted(scored)[: VS._MRL_K]}

    for r in rows:
        full = topk_ids(emb[r["q_id"]], 64)
        trunc = topk_ids(emb[r["q_id"]], VS._MRL_DIMS)
        assert r["overlap_at_k"] == len(full & trunc)
        assert r["overlap_frac"] == round(r["overlap_at_k"] / VS._MRL_K, 4)


# ---------------------------------------------------------------------------
# inverted_index_incremental
# ---------------------------------------------------------------------------

def test_incremental_index_merge_equals_rebuild(spark, docs_local):
    rows = registry.queries()["inverted_index_incremental"](spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r["matches_rebuild"] for r in rows)
    # spot-check the top token's df/tf against brute force
    df_all: Counter = Counter()
    tf_all: Counter = Counter()
    for doc_id, text in docs_local.items():
        toks = _norm_tokens(text)
        tf_all.update(toks)
        for t in set(toks):
            df_all[t] += 1
    top = rows[0]
    assert top["df"] == df_all[top["token"]]
    assert top["tf_total"] == tf_all[top["token"]]


# ---------------------------------------------------------------------------
# search_snippet_extraction
# ---------------------------------------------------------------------------

def test_snippet_extraction_picks_densest_window(spark, docs_local):
    from vectordbfaiss_spark.queries import search_index as SIX

    rows = {
        r["doc_id"]: r
        for r in registry.queries()["search_snippet_extraction"](spark, SF_DIR).collect()
    }
    n_checked = 0
    for doc_id, text in docs_local.items():
        raw = [
            re.sub(r"[^a-z0-9]", "", w)
            for w in re.split(r"\s+", text.rstrip().lower())
        ]
        occ = [i for i, t in enumerate(raw) if t == SIX._SNIP_TERM]
        if not occ:
            assert doc_id not in rows
            continue
        best = max(
            ((sum(1 for p in occ if a <= p < a + SIX._SNIP_WIN), -a), a)
            for a in occ
        )
        (cnt, _), a = best
        r = rows[doc_id]
        assert (r["n_in_window"], r["offset"]) == (cnt, a)
        # snippet is the raw (pre-normalization) token window
        words = re.split(r"\s+", text.rstrip().lower())
        assert r["snippet"] == " ".join(words[a : a + SIX._SNIP_WIN])
        n_checked += 1
    assert n_checked > 0


def test_snippet_plan_no_cartesian(spark):
    plan = _plan(registry.queries()["search_snippet_extraction"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# expectations_quarantine
# ---------------------------------------------------------------------------

def test_expectations_match_pandas_and_quarantine_dominates(spark):
    from vectordbfaiss_spark.queries import ops_diagnostics as ODX

    rows = {
        r["rule"]: r
        for r in registry.queries()["expectations_quarantine"](spark, SF_DIR).collect()
    }
    o = load_table(spark, SF_DIR, "orders").toPandas()
    ckeys = set(
        r["c_custkey"]
        for r in load_table(spark, SF_DIR, "customer").select("c_custkey").collect()
    )
    v_price = (o["o_totalprice"] > ODX._EXP_PRICE_CAP)
    v_date = (o["o_orderdate"] >= ODX._EXP_DATE_CAP)
    v_status = ~o["o_orderstatus"].isin(["P", "O", "F"])
    v_fk = ~o["o_custkey"].isin(list(ckeys))
    assert rows["price_cap"]["n_violations"] == int(v_price.sum())
    assert rows["date_window"]["n_violations"] == int(v_date.sum())
    assert rows["status_domain"]["n_violations"] == int(v_status.sum())
    assert rows["fk_customer"]["n_violations"] == int(v_fk.sum())
    assert rows["any_rule"]["n_violations"] == int(
        (v_price | v_date | v_status | v_fk).sum()
    )
    any_n = rows["any_rule"]["n_violations"]
    for name in ("price_cap", "date_window", "status_domain", "fk_customer"):
        assert rows[name]["n_violations"] <= any_n
        assert rows[name]["passed"] == (rows[name]["n_violations"] == 0)


def test_expectations_plan_is_single_scan_broadcast(spark):
    plan = _plan(registry.queries()["expectations_quarantine"](spark, SF_DIR))
    assert plan.count("Scan parquet") <= 2  # orders once + customer keys once
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# ranking_eval_metrics
# ---------------------------------------------------------------------------

def test_ranking_eval_matches_bruteforce(spark):
    import math

    import numpy as np

    from vectordbfaiss_spark.queries import vector_search as VS

    rows = {r["q_id"]: r for r in registry.queries()["ranking_eval_metrics"](spark, SF_DIR).collect()}
    assert set(rows) == set(range(VS._MRL_NQ))
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }

    def ranked(qv, dims):
        q = qv[:dims]
        scored = sorted(
            (
                -round(
                    float(
                        q @ v[:dims]
                        / (np.linalg.norm(q) * np.linalg.norm(v[:dims]))
                    ),
                    6,
                ),
                cid,
            )
            for cid, v in emb.items()
            if cid >= VS._MRL_NQ
        )
        return [cid for _, cid in scored[: VS._MRL_K]]

    k = VS._MRL_K
    idcg = sum((k + 1 - i) / math.log2(i + 1) for i in range(1, k + 1))
    for q_id, r in rows.items():
        truth = ranked(emb[q_id], 64)
        sysr = ranked(emb[q_id], VS._MRL_DIMS)
        t_rank = {cid: i + 1 for i, cid in enumerate(truth)}
        hits = [(t_rank[c], i + 1) for i, c in enumerate(sysr) if c in t_rank]
        assert r["recall_at_k"] == round(len(hits) / k, 6)
        mrr = round(1.0 / min(rs for _, rs in hits), 6) if hits else 0.0
        assert r["mrr"] == mrr
        dcg = sum((k + 1 - rt) / math.log2(rs + 1) for rt, rs in hits)
        assert abs(r["ndcg_at_k"] - dcg / idcg) < 1e-6
        assert 0.0 <= r["ndcg_at_k"] <= 1.0 + 1e-9


def test_session_family_plans_have_no_sort_merge_join(spark):
    """Kernel/window outputs carry no stats, so AQE can't save these joins
    itself — the explicit hints must hold (audited at sf0.01, pinned here)."""
    for name in (
        "matryoshka_truncation_audit",
        "ranking_eval_metrics",
        "inverted_index_incremental",
    ):
        plan = _plan(registry.queries()[name](spark, SF_DIR))
        assert "SortMergeJoin" not in plan, name


# ---------------------------------------------------------------------------
# Edge cases: empty inputs through the new family's operators
# ---------------------------------------------------------------------------

def test_token_stats_and_merge_handle_empty_sides(spark):
    from vectordbfaiss_spark.queries.search_index import (
        merge_token_stats,
        token_stats,
    )

    docs = load_table(spark, SF_DIR, "documents")
    empty = docs.filter("doc_id < 0")
    assert token_stats(empty).count() == 0
    full = token_stats(docs)
    merged = merge_token_stats(full, token_stats(empty))
    a = {r["token"]: (r["df"], r["tf_total"]) for r in full.collect()}
    b = {r["token"]: (r["df"], r["tf_total"]) for r in merged.collect()}
    assert a == b  # empty side is the identity


def test_phrase_and_snippet_absent_term_yield_empty(spark):
    from vectordbfaiss_spark.queries import search_index as SIX

    docs = load_table(spark, SF_DIR, "documents")
    # a token that cannot survive normalization (too short after strip)
    from pyspark.sql import functions as F

    words = F.split(F.rtrim(F.lower(F.col("text"))), r"\s+")
    pos = docs.select("doc_id", F.posexplode(words).alias("pos", "raw")).select(
        "doc_id",
        "pos",
        F.regexp_replace("raw", "[^a-z0-9]", "").alias("token"),
    )
    assert pos.filter(F.col("token") == "zzzznotaword").count() == 0
    # empty posting streams flow through the joins without error
    a = pos.filter(F.col("token") == "zzzznotaword").select("doc_id", "pos")
    b = a.select(F.col("doc_id").alias("b_doc"), F.col("pos").alias("b_pos"))
    out = a.join(b, (a.doc_id == b.b_doc) & (b.b_pos == a.pos + 1)).count()
    assert out == 0


# ---------------------------------------------------------------------------
# fingerprint_attribution
# ---------------------------------------------------------------------------

def test_fingerprint_attribution_recovers_the_source(spark):
    from vectordbfaiss_spark.queries import text_analysis as TA

    rows = registry.queries()["fingerprint_attribution"](spark, SF_DIR).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert set(by_probe) == set(range(TA._ATTR_NPROBES))
    for probe_id, prs in by_probe.items():
        prs.sort(key=lambda r: r["rank"])
        # winnowing theorem: the true source must top the attribution list
        assert prs[0]["doc_id"] == probe_id and prs[0]["self_match"]
        counts = [r["n_shared"] for r in prs]
        assert counts == sorted(counts, reverse=True)


def test_contrastive_triplets_label_semantics(spark):
    """Per anchor: the positive must share the anchor's label, the
    negative must not, both must differ from the anchor itself, and the
    margin equals pos_sim - neg_sim at 6dp."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_SMOKE
    from vectordbfaiss_spark.queries.vector_search import (
        q_contrastive_triplet_mining,
    )
    from vectordbfaiss_spark.session import load_table

    out = q_contrastive_triplet_mining(spark, SF_SMOKE)
    lab = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "label")
    a = lab.withColumnRenamed("vec_id", "anchor_id").withColumnRenamed(
        "label", "al"
    )
    p = lab.withColumnRenamed("vec_id", "positive_id").withColumnRenamed(
        "label", "pl"
    )
    n = lab.withColumnRenamed("vec_id", "negative_id").withColumnRenamed(
        "label", "nl"
    )
    j = out.join(a, "anchor_id").join(p, "positive_id").join(n, "negative_id")
    rows = j.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.pl == r.al and r.nl != r.al
        assert r.positive_id != r.anchor_id and r.negative_id != r.anchor_id
        assert abs(r.margin - round(r.pos_sim - r.neg_sim, 6)) < 1e-9
