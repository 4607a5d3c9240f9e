"""BPE trainer vs an independent pure-Python reference implementation
(straight-loop Sennrich-style), plus merge-application semantics."""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_ORACLE
from vectordbfaiss_spark.operators.bpe import (
    apply_bpe_merges,
    train_bpe_merges,
    word_freq_dict,
)
from vectordbfaiss_spark.session import load_table


def _python_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference: dict of word->freq, returns [(pa, pb, cnt)] per round."""
    vocab = {tuple(w): f for w, f in word_freqs.items() if w}
    vocab.update({("",): f for w, f in word_freqs.items() if not w})
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        # max count, tie -> lexicographically smallest (pa, pb)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (pa, pb), cnt = best
        merges.append((pa, pb, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pa and syms[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_trainer_matches_python_reference(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    spark_merges = [
        (r["pa"], r["pb"], r["cnt"])
        for r in train_bpe_merges(docs, 5).orderBy("iteration").collect()
    ]
    import re

    # mirror the engine exactly: split(rtrim(text), '\s+') keeps a LEADING
    # empty token for leading-whitespace text and yields [''] for
    # all-whitespace text (str.split() would drop both)
    wf: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in re.split(r"\s+", r["text"].rstrip()):
            wf[w] = wf.get(w, 0) + 1
    assert spark_merges == _python_bpe(wf, 5)


def test_apply_merges_roundtrip(spark):
    """Applying the learned merges with literal rules reproduces the
    trainer's final sequences."""
    docs = load_table(spark, SF_ORACLE, "documents")
    merges = [
        (r["pa"], r["pb"])
        for r in train_bpe_merges(docs, 3).orderBy("iteration").collect()
    ]
    base = word_freq_dict(docs)
    applied = apply_bpe_merges(base, merges)
    # every merged token must now appear as a single symbol somewhere,
    # and no sequence may still contain a mergeable adjacent pair
    seqs = [r["seq"] for r in applied.select("seq").collect()]
    for pa, pb in merges:
        joined = pa + pb
        assert any(joined in s.split(" ") for s in seqs)
    final_pairs = set()
    for s in seqs:
        syms = s.split(" ")
        final_pairs.update(zip(syms, syms[1:]))
    for pa, pb in merges:
        assert (pa, pb) not in final_pairs


def test_encode_corpus_consistent_with_trained_merges(spark):
    """bpe_encode_corpus: every output word's encoding replays the learned
    merge list left-to-right by hand."""
    from vectordbfaiss_spark import registry
    from vectordbfaiss_spark.queries.bpe import _N_MERGES

    sf = "/root/testdata/sf0.001"
    merges = [
        (r["pa"], r["pb"])
        for r in registry.queries()["bpe_train_merges"](spark, sf)
        .orderBy("iteration")
        .collect()
    ]
    assert len(merges) == _N_MERGES

    def encode(word: str) -> list[str]:
        syms = list(word)
        for pa, pb in merges:
            out: list[str] = []
            for s in syms:
                if out and s == pb and out[-1] == pa:
                    out[-1] = pa + pb
                else:
                    out.append(s)
            syms = out
        return syms

    rows = registry.queries()["bpe_encode_corpus"](spark, sf).collect()
    assert rows, "no encoded rows"
    for r in rows:
        expect = encode(r["word"])
        assert r["encoded"].split(" ") == expect
        assert r["n_tokens"] == len(expect) <= len(r["word"])


def test_bpe_pack_token_totals_conserved(spark):
    """The packed bins' token total must equal the corpus BPE token count
    computed independently from the encoded dictionary (freq * per-word
    tokens) — the conservation law across the explode-join-pack chain."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_ORACLE
    from vectordbfaiss_spark.operators.bpe import (
        apply_bpe_merges,
        train_bpe_merges,
        word_freq_dict,
    )
    from vectordbfaiss_spark.queries.bpe import _N_MERGES, q_pipeline_bpe_pack
    from vectordbfaiss_spark.session import load_table

    out = q_pipeline_bpe_pack(spark, SF_ORACLE)
    packed_total = out.agg(F.sum("total_bpe_tokens")).collect()[0][0]

    docs = load_table(spark, SF_ORACLE, "documents")
    merges = [
        (r["pa"], r["pb"])
        for r in train_bpe_merges(docs, _N_MERGES).orderBy("iteration").collect()
    ]
    dict_total = (
        apply_bpe_merges(word_freq_dict(docs), merges)
        .select(
            (F.col("freq") * F.size(F.split(F.col("seq"), " "))).alias("t")
        )
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    assert packed_total == dict_total
    # BPE merges strictly reduce token counts vs character spelling, and
    # bins exist for every shard
    assert out.filter(F.col("n_docs") < 1).count() == 0
