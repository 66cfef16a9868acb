"""Tokenizer-training support: the first BPE merge iteration as a
corpus query — adjacent symbol-pair frequencies weighted by word count
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units": merge candidates are ranked by total pair count over
the word-frequency table, not the raw corpus).

Shape at 100 TB:

- the only corpus-sized stage is explode(tokens) → groupBy(word) —
  one map-side-combined shuffle whose output is the VOCABULARY
  (distinct words ≪ corpus; Heaps' law keeps it sub-linear);
- char-pair enumeration runs per DISTINCT word (an interpreted HOF
  over vocab-sized data, never the corpus), weighted by the word
  count carried alongside;
- the pair table is ≤ |alphabet|² rows; top-k is TakeOrdered, not a
  global sort.

The reference's TokenizationBolt stops at words
(``TokenizationBolt.java``, SURVEY §2.10); subword induction is part
of the training-data tier this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize, tokenize_sql

TOP_K = 50
# BPE trainers cap the word length they merge over (HF tokenizers'
# max_token_length): a single pathological unbroken token (minified
# JS, base64 blobs) must not allocate a len-sized position array per
# row here — or a max(len)-sized generate_series in the oracle.
MAX_WORD_LEN = 1024


def word_counts(documents: DataFrame) -> DataFrame:
    """(w, c) — the corpus word-frequency table: the only corpus-sized
    stage of merge counting (one map-side-combined shuffle). Split out
    so the streaming vocabulary store (streaming/vocab.py) can append
    per-batch partials of exactly this frame — counts are additive."""
    return (
        documents.select(
            F.explode(tokenize(F.coalesce(F.col("text"), F.lit("")))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def merge_candidates_from_counts(
    word_freq: DataFrame, top_k: int = TOP_K
) -> DataFrame:
    """Pair ranking over an already-built (w, c) table — vocabulary-
    sized work, shared by the batch operator and the streamed store."""
    words = (
        word_freq
        # single-symbol words carry no pair; over-cap "words" are noise
        .filter(F.length("w").between(2, MAX_WORD_LEN))
    )

    def _pair(w):
        # closure factory keeps the HOF lambda unary (CLAUDE.md arity)
        def at(i):
            return F.struct(
                w.substr(i, F.lit(1)).alias("a"),
                w.substr(i + 1, F.lit(1)).alias("b"),
            )

        return at

    # length(w) >= 2 above guarantees sequence(1, len-1) is ascending
    # (the F.sequence(0,-1) descending-range trap — CLAUDE.md)
    pairs = words.select(
        "c",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1), _pair(F.col("w"))
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(
            F.col("p.a").alias("pair_a"), F.col("p.b").alias("pair_b")
        )
        .agg(F.sum("c").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair_a", "pair_b")
        .limit(top_k)
    )


def bpe_merge_candidates(documents: DataFrame, top_k: int = TOP_K) -> DataFrame:
    """(pair_a, pair_b, pair_count) — the ``top_k`` most frequent
    adjacent character pairs over the corpus word-frequency table,
    ties broken by (pair_a, pair_b) so the cut is deterministic."""
    return merge_candidates_from_counts(word_counts(documents), top_k)


def bpe_merge_candidates_sql(top_k: int = TOP_K) -> str:
    """DuckDB twin. No LATERAL-with-index: positions come from one
    generate_series up to the longest word, filtered per row
    (CLAUDE.md convention). sum(BIGINT) is HUGEINT in DuckDB — cast
    back so the column hash-compares against Spark's long."""
    toks = tokenize_sql("coalesce(text, '')")
    return f"""
        WITH toks AS (
            SELECT unnest({toks}) AS w FROM documents
        ), wc AS (
            SELECT w, count(*) AS c FROM toks GROUP BY w
            HAVING length(w) BETWEEN 2 AND {MAX_WORD_LEN}
        ), pos AS (
            SELECT w, c, i FROM wc
            CROSS JOIN (SELECT unnest(generate_series(
                1, (SELECT max(length(w)) FROM wc) - 1)) AS i)
            WHERE i <= length(w) - 1
        )
        SELECT substring(w, i, 1) AS pair_a,
               substring(w, i + 1, 1) AS pair_b,
               CAST(sum(c) AS BIGINT) AS pair_count
        FROM pos GROUP BY 1, 2
        ORDER BY pair_count DESC, pair_a, pair_b LIMIT {top_k}
    """
