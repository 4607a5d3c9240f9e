"""BPE tokenizer training as a declarative Spark plan (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

The reference engine tokenizes by whitespace only (``server.js:45-52``);
training a subword vocabulary is the step an LLM data pipeline runs ON
the corpus itself, and it is the canonical "iterative algorithm on an
aggregate" test: each round counts adjacent symbol pairs over the word-
frequency dictionary, picks the argmax pair, and rewrites every word's
symbol sequence with the merged token.

Scale shape — the important part:
- Training runs on the WORD-FREQUENCY DICTIONARY, not the corpus: one
  explode+count collapses N tokens to |vocab| rows (Zipf: millions, not
  billions), and every merge round after that touches only the dict.
- Each round is fully declarative: pair counts are a hash aggregate,
  the best pair is ``orderBy(...).limit(1)`` (TakeOrderedAndProject — a
  k=1 reduction, never a global sort) CROSS-JOIN-broadcast back onto the
  dict, and the rewrite is a codegen'd ``aggregate`` (fold) expression.
  No driver-side collect anywhere in the loop; the driver only CHAINS
  plans, so the same code runs on a 1000-executor cluster unchanged.
- The fold rewrites left-to-right non-overlapping — canonical BPE merge
  semantics — operating on the space-joined symbol string, so the DuckDB
  oracle can replay it with the very same fold (``list_reduce``) and the
  registry hash-check covers every round end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# the left-to-right non-overlapping merge fold, shared (textually) with the
# DuckDB oracle: acc is the rebuilt space-joined string, x the next symbol
_MERGE_FOLD = """
aggregate(
  slice(syms, 2, size(syms) - 1),
  element_at(syms, 1),
  (acc, x) -> CASE
      WHEN x = pb AND (acc = pa OR endswith(acc, concat(' ', pa)))
      THEN concat(substr(acc, 1, length(acc) - length(pa)), pa, pb)
      ELSE concat(acc, ' ', x) END
)
"""


def word_freq_dict(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, seq): the word-frequency dictionary with each word
    spelled as a space-joined character sequence — the training state."""
    words = docs.select(
        F.explode(F.split(F.rtrim(F.col(text_col)), r"\s+")).alias("word")
    )
    freqs = words.groupBy("word").agg(F.count("*").alias("freq"))
    return freqs.withColumn(
        "seq", F.rtrim(F.regexp_replace(F.col("word"), "(.)", "$1 "))
    )


def _pair_counts(dict_df: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency (overlapping pairs
    all count — canonical BPE count semantics)."""
    pairs = dict_df.select(
        "freq",
        F.explode(
            F.expr(
                # sequence(1, 0) counts DOWN in Spark — guard 1-symbol words
                "CASE WHEN size(syms) < 2 THEN array() ELSE "
                "transform(sequence(1, size(syms) - 1),"
                " i -> named_struct('pa', element_at(syms, i),"
                "                   'pb', element_at(syms, i + 1))) END"
            )
        ).alias("p"),
    ).select("freq", F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
    return pairs.groupBy("pa", "pb").agg(F.sum("freq").alias("cnt"))


def train_bpe_merges(docs: DataFrame, n_merges: int, text_col: str = "text") -> DataFrame:
    """Run ``n_merges`` BPE rounds; return the merge table
    (iteration, pa, pb, cnt) — the learned tokenizer's merge rules."""
    state = word_freq_dict(docs, text_col).withColumn(
        "syms", F.split(F.col("seq"), " ")
    )
    merge_rows = None
    for it in range(1, n_merges + 1):
        # keep each round's plan flat: the dict is |vocab|-sized, cheap to
        # materialize, and un-checkpointed the chained fold/agg/limit plans
        # re-execute every prior round per action
        state = state.localCheckpoint(eager=True)
        # materialize the 1-row argmax: it has THREE consumers (the merge
        # table row, the broadcast rewrite below, and — for encode-side
        # callers — a driver collect of the merge table), and left lazy
        # each consumer re-runs this round's full pair-count aggregate +
        # TakeOrdered over the dict (measured as 2-3x the round's agg
        # work per bench pass). One row, trivially cheap to pin.
        best = (
            _pair_counts(state)
            .orderBy(F.desc("cnt"), "pa", "pb")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        row = best.select(
            F.lit(it).cast("long").alias("iteration"), "pa", "pb", "cnt"
        )
        merge_rows = row if merge_rows is None else merge_rows.unionByName(row)
        state = (
            state.crossJoin(F.broadcast(best))
            .withColumn("seq", F.expr(_MERGE_FOLD))
            .drop("pa", "pb", "cnt")
            .withColumn("syms", F.split(F.col("seq"), " "))
        )
    return merge_rows


def apply_bpe_merges(dict_df: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Re-tokenize a (word, freq, seq) dict with an already-learned merge
    list (inference side: merges are plain literals, one fold per rule)."""
    out = dict_df
    for pa, pb in merges:
        out = (
            out.withColumn("syms", F.split(F.col("seq"), " "))
            .withColumn("pa", F.lit(pa))
            .withColumn("pb", F.lit(pb))
            .withColumn("seq", F.expr(_MERGE_FOLD))
            .drop("pa", "pb", "syms")
        )
    return out
