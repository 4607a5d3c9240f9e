"""Exact set-similarity self-join via prefix filtering (PPJoin-style,
Chaudhuri et al. "A Primitive Operator for Similarity Joins", Xiao et al.
PPJoin) — the EXACT counterpart of the MinHash/SimHash approximations in
``operators/dedup.py``.

Why this exists at 100 TB: a naive exact Jaccard join is the all-pairs
token self-join (every shared token makes a candidate — quadratic in the
df of every common word). Prefix filtering is lossless pruning: order
each document's tokens by ascending global document frequency and keep
only the first ``|s| - ceil(t*|s|) + 1`` (the "prefix"); two sets with
Jaccard >= t MUST share at least one prefix token, so the candidate join
runs over prefixes only — dominated by RARE tokens (frequency-ascending
order puts them first), which is exactly what bounds the join's bucket
sizes. Verification then counts full intersections restricted to the
candidate pairs, never all pairs.

All threshold arithmetic is integer-exact (t = 3/5): prefix length uses
``(3*sz + 4) div 5`` for ``ceil(0.6*sz)`` and the final test is the
cross-multiplied ``5*c >= 3*(sa + sb - c)`` — no float compares anywhere,
so the DuckDB oracle (a brute-force all-pairs join) agrees bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

# Jaccard threshold as a rational: t = _T_NUM / _T_DEN
_T_NUM = 3
_T_DEN = 5


def prefix_filter_jaccard_pairs(
    toks_in: DataFrame, id_col: str = "doc_id", tok_col: str = "tok"
) -> DataFrame:
    """All pairs with set Jaccard >= 0.6 over pre-exploded (id, token)
    rows (tokens distinct per id — e.g. ``operators.dedup.
    exploded_shingles``): returns (id_a, id_b, jaccard).

    Stages (each shape annotated with its scale bound):
    1. token df: one hash agg over (doc, tok) — O(tokens).
    2. per-doc frequency-ascending ranking: window partitioned BY DOCUMENT
       (bounded by document length, never corpus-sized).
    3. prefix candidate join on tok: buckets are df-ordered prefixes, so
       common boilerplate tokens rarely reach a prefix; AQE splits any
       residual skewed bucket. Length pruning (cross-multiplied
       3*sz_a <= 5*sz_b etc.) and PPJoin's POSITIONAL filter (the
       matching token's rank bounds the best-possible overlap:
       c <= 1 + min(sz_a - rn_a, sz_b - rn_b) at the pair's first shared
       prefix token, so pairs whose bound cannot reach the threshold are
       dropped losslessly — if the true overlap qualifies, the FIRST
       shared prefix token, where min(remaining) is largest, always
       passes) cut candidates before the distinct.
    4. verification restricted to candidates: candidate pairs are joined
       to A's tokens then equi-joined to B's (id, tok) — candidate-
       bounded, never the quadratic token self-join the oracle runs.
    """
    toks = toks_in.select(F.col(id_col), F.col(tok_col).alias("tok"))
    # five consumers below (sizes/dfreq/ranking/both verify legs): left
    # lazy the token explode would run five times — materialize once and
    # cut lineage (repo convention: localCheckpoint, freed on GC)
    toks = toks.localCheckpoint(eager=True)
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("tok_df"))

    # ONE document-partitioned window pass computes both the frequency-
    # ascending rank and the set size (count over the same partition spec
    # — no second shuffle, no sizes join on this path)
    wdoc = W.partitionBy(id_col)
    ranked = toks.join(dfreq, "tok").select(
        F.col(id_col),
        F.col("tok"),
        F.row_number().over(wdoc.orderBy("tok_df", "tok")).alias("rn"),
        F.count("*").over(wdoc).alias("sz"),
    )
    # prefix length: sz - ceil(t*sz) + 1, integer-exact for t = 3/5.
    # Checkpointed eagerly: the self-join consumes it twice, and without
    # the pin each side re-runs the dfreq join + per-doc window over the
    # full token set (round 10 — the plan showed the whole subtree
    # duplicated); the prefix frame itself is the SMALL projection
    # (prefix tokens only, ~2/5 of tokens at t=3/5).
    prefix = (
        ranked.filter(
            F.col("rn")
            <= F.col("sz")
            - F.expr(f"({_T_NUM} * sz + {_T_DEN - 1}) div {_T_DEN}")
            + 1
        )
        .select(F.col(id_col), F.col("tok"), F.col("sz"), F.col("rn"))
        .localCheckpoint(eager=True)
    )

    a = prefix.select(
        F.col(id_col).alias("id_a"),
        F.col("tok"),
        F.col("sz").alias("sz_a"),
        F.col("rn").alias("rn_a"),
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"),
        F.col("tok"),
        F.col("sz").alias("sz_b"),
        F.col("rn").alias("rn_b"),
    )
    # positional upper bound: c >= ceil(t/(1+t) * (sz_a + sz_b)) is the
    # qualifying overlap (integer-exact: (den+num)*c >= num*(sa+sb)), and
    # 1 + min(remaining tokens after the match) bounds the reachable c
    pos_ok = (_T_DEN + _T_NUM) * (
        F.lit(1) + F.least(F.col("sz_a") - F.col("rn_a"), F.col("sz_b") - F.col("rn_b"))
    ) >= _T_NUM * (F.col("sz_a") + F.col("sz_b"))
    cand = (
        a.join(b, "tok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # Jaccard >= t forces t*|A| <= |B| and t*|B| <= |A|
            & (_T_NUM * F.col("sz_a") <= _T_DEN * F.col("sz_b"))
            & (_T_NUM * F.col("sz_b") <= _T_DEN * F.col("sz_a"))
            & pos_ok
        )
        .select("id_a", "id_b", "sz_a", "sz_b")
        .distinct()
    )

    ta = toks.select(F.col(id_col).alias("id_a"), "tok")
    tb = toks.select(F.col(id_col).alias("id_b"), "tok")
    inter = (
        cand.join(ta, "id_a")  # tokens of A, candidate-bounded fan-out
        .join(tb, ["id_b", "tok"])  # equi-join: shared tokens only
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("c"))
    )
    union_sz = F.col("sz_a") + F.col("sz_b") - F.col("c")
    return (
        inter.filter(_T_DEN * F.col("c") >= _T_NUM * union_sz)
        .select(
            "id_a",
            "id_b",
            F.round(F.col("c") / union_sz, 6).alias("jaccard"),
        )
    )
