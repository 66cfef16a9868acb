"""Exact substring dedup: remove duplicated token spans, keep the
first occurrence (Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better" — the ExactSubstr step; published method). The
doc-level family (exact/MinHash/SimHash/semantic) keeps or drops whole
documents; this is the SUB-document tier that strips boilerplate and
quoted passages while keeping the surrounding novel text — it runs
after doc-level dedup and before quality gating in the published
pipelines.

Semantics (order-free, replay-idempotent):

- A token ``GRAM_N``-gram occurrence is *duplicated* iff its gram
  occurs ≥ 2 times in the corpus (across or within documents).
- The *first* occurrence of each duplicated gram — minimum
  ``(doc_id, position)`` in one packed int64 — is kept; every other
  occurrence is a *removing span*.
- A token is removed iff some removing span of its own document covers
  it; ``clean_text`` is the kept token stream re-joined with spaces
  (the operator is defined over the repo-standard token stream, like
  every dedup operator here — not over raw bytes).

The keep-first rule makes the output a well-defined function of the
corpus (no scan order anywhere), so the operator distributes and
replays trivially — unlike the paper's sequential suffix-array scan,
whose "remove all but one" choice depends on traversal order.

Shape at 100 TB (mirrors ``decontam.py``'s explode + narrow-join
pattern): one explode to (doc_id, pos, gram-hash) — grams hashed
portably AFTER the explode so md5 runs once per occurrence (projection-
collapse convention) — then a map-side-combined groupBy on the 8-byte
hash, an inner join of the occurrence stream against the (much smaller,
cnt ≥ 2) duplicated-gram frame with the BIG side streaming, a per-doc
groupBy collecting removing-span starts (rows ∝ duplicated spans, not
corpus), and one broadcast-friendly left join back onto the corpus.
The corpus text itself crosses a shuffle zero times; per-row kept-token
reconstruction is a whole-stage-codegen HOF (no Python).

The occurrence stream is deliberately evaluated twice (once under the
duplicated-gram groupBy, once as the join probe — visible as two
Generate subtrees in the plan): materializing it would checkpoint a
corpus-token-sized intermediate (~32 B/gram at 10^13 grams) to save a
narrow re-scan of a column-pruned parquet source, a bad trade at every
scale; collapsing via collect_list-per-gram instead would turn a
boilerplate gram shared by millions of docs into one straggler row.

Reference analog: extends the content dedup the reference does at
document granularity (exists-then-insert in
``WebPagesUpdaterBolt.java``) to span granularity; the reference has no
sub-document dedup — this is part of the LLM-pipeline tier.

Oracle twin: identical rule in DuckDB via zipped unnest (position +
token), a range join for coverage, and ``string_agg(... ORDER BY p)``
for reconstruction — O(n·m) forms that only run at comparison scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..functions.text import ngrams, ngrams_sql, tokenize, tokenize_sql
from .dedup import augment_corpus_sql

# Span window: 13 word-tokens — the GPT-3 Appendix C overlap width,
# shared with decontam.GRAM_N (Lee et al. use 50 BPE tokens; 13 word
# tokens is the same order of text span).
GRAM_N = 13
# position packing: doc_id * 2^20 + pos. Corpus doc_ids < 2^42 and the
# tokenizer never emits 2^20 tokens/doc (a 100 TB deployment with
# longer docs raises this constant corpus-wide); the product stays
# exact int64 in both engines.
POS_PACK = 1 << 20


def substring_dedup(corpus: DataFrame, n: int = GRAM_N) -> DataFrame:
    """(doc_id, n_tokens, n_dup_spans, n_removed, removed_frac,
    clean_text) — one row per corpus document."""
    # the augmented dedup corpus never carries null text, but the
    # operator itself follows the text_analysis convention: null ≡ ''
    docs = corpus.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokenize(F.coalesce(F.col("text"), F.lit(""))).alias("toks"),
    )
    occ = docs.select(
        "doc_id",
        F.posexplode(ngrams(F.col("toks"), n)).alias("pos", "gram"),
    ).select(
        "doc_id",
        "pos",
        hash64(F.col("gram")).alias("gh"),
        (F.col("doc_id") * POS_PACK + F.col("pos")).alias("pack"),
    )
    dup = (
        occ.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("pack").alias("first_pack"))
        .filter(F.col("cnt") >= 2)
        .select("gh", "first_pack")
    )
    # big occurrence stream on the left, filtered dup frame on the
    # right: inner join, AQE broadcasts the small side at fixture scale
    # and shuffle-hashes on the 8-byte key at 100 TB
    removing = (
        occ.join(dup, "gh")
        .filter(F.col("pack") != F.col("first_pack"))
        .select("doc_id", "pos")
    )
    spans = removing.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("starts"),
        F.count(F.lit(1)).cast("int").alias("n_dup_spans"),
    )
    nlit = F.lit(n)
    joined = docs.join(spans, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce(F.col("starts"), F.array().cast("array<int>")).alias(
            "starts"
        ),
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).alias("n_dup_spans"),
    )
    kept = F.filter(
        F.col("toks"),
        lambda t, i: ~F.exists(
            F.col("starts"), lambda s: (s <= i) & (i < s + nlit)
        ),
    )
    n_tokens = F.size("toks")
    n_removed = n_tokens - F.size(kept)
    return joined.select(
        "doc_id",
        n_tokens.cast("int").alias("n_tokens"),
        "n_dup_spans",
        n_removed.cast("int").alias("n_removed"),
        F.round(
            F.when(
                n_tokens > 0,
                n_removed.cast("double") / n_tokens.cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("removed_frac"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def substring_dedup_sql(n: int = GRAM_N, corpus_src: str | None = None) -> str:
    """DuckDB twin over the same augmented corpus. Zipped unnests keep
    position and value aligned; coverage is a range join; kept text
    rebuilds with string_agg ORDER BY. All integer arithmetic; the one
    division is IEEE double of exact ints (cross-engine stable).
    ``corpus_src`` re-points the corpus at another FROM-able source."""
    toks = tokenize_sql("text")
    return f"""
        WITH corpus AS (SELECT * FROM {corpus_src or augment_corpus_sql()}),
        d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {toks} AS toks
            FROM corpus
        ),
        occ AS (
            SELECT doc_id,
                   unnest(range(0, len(grams))) AS pos,
                   unnest(list_transform(grams, g -> {hash64_sql("g")})) AS gh
            FROM (SELECT doc_id, {ngrams_sql("toks", n)} AS grams FROM d)
        ),
        packed AS (
            SELECT doc_id, pos, gh, doc_id * {POS_PACK} + pos AS pack
            FROM occ
        ),
        dup AS (
            SELECT gh, min(pack) AS first_pack
            FROM packed GROUP BY gh HAVING count(*) >= 2
        ),
        removing AS (
            SELECT p.doc_id, p.pos
            FROM packed p JOIN dup u USING (gh)
            WHERE p.pack <> u.first_pack
        ),
        tok_rows AS (
            SELECT doc_id,
                   unnest(range(0, len(toks))) AS p,
                   unnest(toks) AS tok
            FROM d
        ),
        covered AS (
            SELECT DISTINCT t.doc_id, t.p
            FROM tok_rows t JOIN removing r
              ON t.doc_id = r.doc_id AND t.p >= r.pos AND t.p < r.pos + {n}
        ),
        kept AS (
            SELECT t.doc_id, t.p, t.tok
            FROM tok_rows t LEFT JOIN covered c
              ON t.doc_id = c.doc_id AND t.p = c.p
            WHERE c.p IS NULL
        ),
        recon AS (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        ),
        span_counts AS (
            SELECT doc_id, count(*) AS n_dup_spans
            FROM removing GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(len(d.toks) AS INT) AS n_tokens,
               CAST(coalesce(s.n_dup_spans, 0) AS INT) AS n_dup_spans,
               CAST(len(d.toks) - coalesce(r.n_kept, 0) AS INT) AS n_removed,
               round(CASE WHEN len(d.toks) > 0
                     THEN CAST(len(d.toks) - coalesce(r.n_kept, 0) AS DOUBLE)
                          / CAST(len(d.toks) AS DOUBLE)
                     ELSE 0.0 END, 6) AS removed_frac,
               coalesce(r.clean_text, '') AS clean_text
        FROM d LEFT JOIN recon r USING (doc_id)
               LEFT JOIN span_counts s USING (doc_id)
        ORDER BY doc_id
    """
