"""Edge-case behavior of the repetition filter and cross-doc span dedup."""

from __future__ import annotations

from vectordbfaiss_spark import registry


def test_repetition_filter_handles_short_docs(spark, tmp_path):
    """Docs with fewer than 3 words must not crash the gram expression
    (negative-length sequence -> slice(start=0) runtime error) and must
    score as non-repetitive single-gram docs."""
    import os

    rows = [(1, "only two"), (2, "one"), (3, "a full length document here now")]
    p = os.path.join(str(tmp_path), "documents.parquet")
    spark.createDataFrame(rows, "doc_id LONG, text STRING").write.parquet(p)
    out = {
        r.doc_id: r
        for r in registry.queries()["text_repetition_filter"](
            spark, str(tmp_path)
        ).collect()
    }
    # no crash, sane metrics; ultra-short docs naturally fail the
    # top-word-fraction rule (1/2 and 1/1 > 0.2), which is fine — they are
    # not training data either way
    assert out[1].n_words == 2 and out[1].dup_3gram_frac == 0.0
    assert not out[1].keep and not out[2].keep
    assert out[3].n_words == 6 and out[3].keep
