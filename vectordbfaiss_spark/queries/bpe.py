"""BPE tokenizer-training registry query: the merge table of a 5-round
training run over the documents corpus, hash-checked end-to-end against a
DuckDB oracle that replays every round (pair counts -> argmax pair ->
left-to-right fold rewrite) with the identical string fold.

Operator + scale rationale: ``operators/bpe.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vectordbfaiss_spark.registry import register
from vectordbfaiss_spark.session import load_table

_N_MERGES = 5


def _bpe_oracle(n_merges: int) -> str:
    ctes = [
        r"""w0 AS (
  SELECT word, freq, rtrim(regexp_replace(word, '(.)', '\1 ', 'g')) AS seq
  FROM (
    SELECT word, count(*) AS freq
    FROM (SELECT unnest(string_split_regex(rtrim(text), '\s+')) AS word
          FROM documents)
    GROUP BY word
  )
)"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        ctes.append(
            f"""p{i} AS (
  SELECT s.syms[t.i] AS pa, s.syms[t.i + 1] AS pb, CAST(sum(s.freq) AS BIGINT) AS cnt
  FROM (SELECT freq, string_split(seq, ' ') AS syms FROM {prev}) s,
       unnest(generate_series(1, len(s.syms) - 1)) AS t(i)
  GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"b{i} AS (SELECT pa, pb, cnt FROM p{i} ORDER BY cnt DESC, pa, pb LIMIT 1)"
        )
        if i < n_merges:
            ctes.append(
                f"""w{i} AS (
  SELECT s.word, s.freq,
         list_reduce(s.syms, (acc, x) -> CASE
             WHEN x = b.pb AND (acc = b.pa OR ends_with(acc, ' ' || b.pa))
             THEN substr(acc, 1, length(acc) - length(b.pa)) || b.pa || b.pb
             ELSE acc || ' ' || x END) AS seq
  FROM (SELECT word, freq, string_split(seq, ' ') AS syms FROM {prev}) s, b{i} b
)"""
            )
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS iteration, pa, pb, cnt FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


@register("bpe_train_merges", _bpe_oracle(_N_MERGES))
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 5 BPE merge rules on the documents corpus and emit the merge
    table (iteration, pa, pb, cnt). Training state is the word-frequency
    dictionary (corpus collapses to |vocab| rows in one agg); every round
    is a hash aggregate + k=1 TakeOrdered + broadcast + codegen'd fold —
    no driver-side data movement, so the identical plan chain runs at
    cluster scale. The oracle replays all 5 rounds with the same fold."""
    from vectordbfaiss_spark.operators.bpe import train_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    return train_bpe_merges(docs, _N_MERGES)


_ENC_TOP = 30


def _bpe_encode_oracle(n_merges: int) -> str:
    """Trainer oracle extended one step: apply the n-th merge too, then
    read the ENCODED dictionary (the inference artifact) instead of the
    merge table."""
    base = _bpe_oracle(n_merges)
    final_rewrite = f""",
w{n_merges} AS (
  SELECT s.word, s.freq,
         list_reduce(s.syms, (acc, x) -> CASE
             WHEN x = b.pb AND (acc = b.pa OR ends_with(acc, ' ' || b.pa))
             THEN substr(acc, 1, length(acc) - length(b.pa)) || b.pa || b.pb
             ELSE acc || ' ' || x END) AS seq
  FROM (SELECT word, freq, string_split(seq, ' ') AS syms FROM w{n_merges - 1}) s,
       b{n_merges} b
)"""
    head = base.split("\nSELECT CAST(1")[0]  # CTEs only, minus the UNION tail
    return (
        head
        + final_rewrite
        + f"""
SELECT word, freq, seq AS encoded,
       CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_tokens
FROM w{n_merges}
ORDER BY freq DESC, word
LIMIT {_ENC_TOP}
"""
    )


@register("bpe_encode_corpus", _bpe_encode_oracle(_N_MERGES))
def q_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer INFERENCE with the learned artifact: train the 5-rule
    merge table, then encode the corpus dictionary with it (one codegen'd
    fold per rule, merges shipped as literals) and emit the top-30 words
    with their encoded sequences and token counts.

    This is the apply-side every training pipeline runs at far greater
    volume than training: the merge table is collected once (n_merges
    rows — the tokenizer artifact, driver-side by design, like any model
    checkpoint), and encoding is |vocab|-parallel expression work with NO
    joins or shuffles per rule. The oracle replays training AND the final
    application round with the identical string fold.
    """
    from vectordbfaiss_spark.operators.bpe import (
        apply_bpe_merges,
        train_bpe_merges,
        word_freq_dict,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["pa"], r["pb"])
        for r in train_bpe_merges(docs, _N_MERGES).orderBy("iteration").collect()
    ]
    encoded = apply_bpe_merges(word_freq_dict(docs), merges)
    return (
        encoded.select(
            "word",
            "freq",
            F.col("seq").alias("encoded"),
            F.size(F.split(F.col("seq"), " ")).cast("long").alias("n_tokens"),
        )
        .orderBy(F.desc("freq"), "word")
        .limit(_ENC_TOP)
    )


def _bpe_fertility_oracle(n_merges: int) -> str:
    """Encode oracle extended with a per-language weighted rollup: join the
    encoded dictionary back onto per-(lang, word) frequencies."""
    enc = _bpe_encode_oracle(n_merges)
    head = enc.split("\nSELECT word, freq, seq AS encoded")[0]
    return (
        head
        + f""",
lw AS (
  SELECT lang, word, count(*) AS freq
  FROM (SELECT lang, unnest(string_split_regex(rtrim(text), '\\s+')) AS word
        FROM documents)
  GROUP BY 1, 2
)
SELECT lw.lang,
       CAST(sum(lw.freq) AS BIGINT) AS n_words,
       CAST(sum(lw.freq * len(string_split(w.seq, ' '))) AS BIGINT)
         AS n_bpe_tokens,
       round(sum(lw.freq * len(string_split(w.seq, ' ')))
             / CAST(sum(lw.freq) AS DOUBLE), 6) AS fertility
FROM lw JOIN w{n_merges} w ON lw.word = w.word
GROUP BY 1
"""
    )


@register("bpe_fertility_by_lang", _bpe_fertility_oracle(_N_MERGES))
def q_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY (BPE tokens per word) per language — the
    number a multilingual pipeline watches before committing to a
    tokenizer: a language whose fertility is far above the corpus mean
    pays proportionally more sequence length (and training compute) per
    word, the classic under-represented-language tokenizer penalty.

    Composition, all |vocab|-grain after the first agg: train the merge
    table (5 rules), encode the DISTINCT-word dictionary once (never the
    running text), join encoded lengths back onto per-(lang, word)
    frequencies — an equi-join on word between two dictionary-sized
    frames — and roll up occurrence-weighted token counts per language.
    The oracle replays training, encoding, and the weighted rollup.
    """
    from pyspark.sql import functions as F

    from vectordbfaiss_spark.operators.bpe import (
        apply_bpe_merges,
        train_bpe_merges,
        word_freq_dict,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["pa"], r["pb"])
        for r in train_bpe_merges(docs, _N_MERGES).orderBy("iteration").collect()
    ]
    encoded = apply_bpe_merges(word_freq_dict(docs), merges).select(
        "word", F.size(F.split(F.col("seq"), " ")).alias("n_tok")
    )
    lw = (
        docs.select(
            "lang",
            F.explode(F.split(F.rtrim(F.col("text")), r"\s+")).alias("word"),
        )
        .groupBy("lang", "word")
        .agg(F.count("*").alias("freq"))
    )
    # both sides are open-vocabulary word-grain dictionaries: shuffle-hash,
    # never a static broadcast off a post-aggregate estimate (the
    # 100x-step OOM class, SCALE.md round 4)
    j = lw.join(encoded.hint("SHUFFLE_HASH"), "word")
    return j.groupBy("lang").agg(
        F.sum("freq").cast("long").alias("n_words"),
        F.sum(F.col("freq") * F.col("n_tok")).cast("long").alias("n_bpe_tokens"),
        F.round(
            F.sum(F.col("freq") * F.col("n_tok"))
            / F.sum("freq").cast("double"),
            6,
        ).alias("fertility"),
    )


_PACK_BUDGET = 2048
_PACK_SHARDS = 16


def _bpe_pack_oracle(n_merges: int) -> str:
    """Encode oracle's CTE chain extended with per-document token totals
    and the shard-parallel packing window — the token-EXACT form of
    `sequence_packing_bins` (which packs on whitespace counts)."""
    from vectordbfaiss_spark.queries.curation import _sql_hash_bucket

    enc = _bpe_encode_oracle(n_merges)
    head = enc.split("\nSELECT word, freq, seq AS encoded")[0]
    return (
        head
        + f""",
docw AS (
  SELECT doc_id, unnest(string_split_regex(rtrim(text), '\\s+')) AS word
  FROM documents
),
dtok AS (
  SELECT d.doc_id,
         CAST(sum(len(string_split(w.seq, ' '))) AS BIGINT) AS n_tokens
  FROM docw d JOIN w{n_merges} w ON d.word = w.word
  GROUP BY 1
),
keyed AS (
  SELECT doc_id, n_tokens, {_sql_hash_bucket('doc_id')} AS hkey FROM dtok
),
ordered AS (
  SELECT doc_id, n_tokens, hkey % {_PACK_SHARDS} AS shard,
         sum(n_tokens) OVER (PARTITION BY hkey % {_PACK_SHARDS}
                             ORDER BY hkey, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM keyed
),
binned AS (
  SELECT doc_id, n_tokens, shard, (cum - n_tokens) // {_PACK_BUDGET} AS bin_id
  FROM ordered
)
SELECT CAST(shard AS BIGINT) AS shard, CAST(bin_id AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_bpe_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM binned GROUP BY shard, bin_id
"""
    )


@register("pipeline_bpe_pack", _bpe_pack_oracle(_N_MERGES))
def q_pipeline_bpe_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-exact sequence packing, composed end to end: train the
    5-rule BPE merge table -> encode the word dictionary with it -> join
    each document's words against the encoded dictionary for its TRUE
    token count -> shard-parallel budget packing on those counts.
    `sequence_packing_bins` packs on whitespace counts (the cheap proxy);
    a real pre-training pipeline packs on tokenizer output, because bin
    overflow is measured in model tokens — this query is that form, with
    the DuckDB oracle replaying training, encoding, the per-doc totals
    AND the packing cumsum.

    Scale shape: training state is |vocab|-grain (one agg collapses the
    corpus); the merge table is the collected tokenizer artifact (bounded
    by merge count, like any model checkpoint); the doc-token join is
    word-keyed (vocab-grain dictionary side, shuffle-hash — an open
    vocabulary is NOT broadcastable at 100 TB); packing windows hold
    1/16 of the corpus each. No stage is corpus-quadratic and the only
    corpus-grain shuffles are the explode-agg and the packing exchange.
    """
    from pyspark.sql import Window as W, functions as F

    from vectordbfaiss_spark.operators.bpe import (
        apply_bpe_merges,
        train_bpe_merges,
        word_freq_dict,
    )
    from vectordbfaiss_spark.queries.curation import _hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["pa"], r["pb"])
        for r in train_bpe_merges(docs, _N_MERGES).orderBy("iteration").collect()
    ]
    dict_tok = apply_bpe_merges(word_freq_dict(docs), merges).select(
        "word", F.size(F.split(F.col("seq"), " ")).cast("long").alias("wtok")
    )
    docw = docs.select(
        "doc_id", F.explode(F.split(F.rtrim("text"), r"\s+")).alias("word")
    )
    dtok = (
        docw.join(dict_tok.hint("SHUFFLE_HASH"), "word")
        .groupBy("doc_id")
        .agg(F.sum("wtok").alias("n_tokens"))
    )
    keyed = dtok.select(
        "doc_id", "n_tokens", _hash_bucket(F.col("doc_id")).alias("hkey")
    ).withColumn("shard", F.col("hkey") % _PACK_SHARDS)
    pw = (
        W.partitionBy("shard")
        .orderBy("hkey", "doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    binned = keyed.select(
        "doc_id",
        "n_tokens",
        "shard",
        F.floor(
            (F.sum("n_tokens").over(pw) - F.col("n_tokens")) / _PACK_BUDGET
        ).alias("bin_id"),
    )
    return binned.groupBy(
        F.col("shard").cast("long").alias("shard"), "bin_id"
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_bpe_tokens"),
        F.min("doc_id").alias("first_doc"),
    )
