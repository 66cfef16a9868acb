"""CCNet-style perplexity bucketing: score every document with a
smoothed unigram language model trained on a deterministic reference
slice of the corpus, and bucket into head / middle / tail by average
per-token negative log-probability (Wenzek et al. 2020, "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data").

Per the public recipe: CCNet trains a small LM on a trusted reference
corpus (Wikipedia) and splits each language's crawl into perplexity
terciles — *head* (most reference-like) feeds training directly,
*middle* is kept, *tail* is dropped or down-weighted. Here the
reference corpus is the deterministic hash slice
``hash64(doc_id) % LM_MOD == 0`` (the decontam/DSIR convention) so the
operator is self-contained for the oracle harness; production passes
the real reference frame via ``reference_docs``.

The LM is add-one-smoothed unigram:

    p(w) = (c_w + 1) / (T + V)        # T = token count, V = vocab size
    nlp(doc) = Σ_w∈doc −log10 p(w)    # OOV w scores −log10(1/(T+V))

Cross-engine determinism (the hard part — see CLAUDE.md):

- ``−log10 p(w) = det_log10_ratio(T + V, c_w + 1)`` — the fixed Horner
  polynomial, bit-identical in Spark / DuckDB / Python; its n ≥ d ≥ 1
  contract holds because c_w + 1 ≤ T + 1 ≤ T + V whenever the vocab is
  non-empty, and the empty-LM edge is clamped with ``greatest(·, 1)``
  (then every token is OOV and scores log10(1/1) = 0).
- The per-word score is **quantized to integer micro-units**
  (``floor(nlp · 1e6)``) before any aggregation, so the per-document
  sum is an INTEGER sum — float summation order across partitions could
  differ between engines; integer sums cannot (the DSIR convention,
  operators/dsir.py).
- Buckets compare **integer cross-products** (``nlp_micro ≤ n ·
  threshold_micro``), never a division — avg-nlp as a double would
  reintroduce engine-ordered float math.

Shape at 100 TB:

- The corpus explodes to tokens ONCE per side and immediately
  aggregates: per-(doc, word) counts (map-side combined, rows ∝
  distinct words per doc, never raw tokens) and the vocabulary counts
  (map-side combined, rows ∝ |V|).
- The vocabulary joins onto the per-(doc, word) frame by word — a
  co-partitioned shuffle join; AQE broadcasts it while |V| is small
  (every fixture) and falls back to shuffle when a web-scale vocab
  outgrows the broadcast threshold. The corpus-sized side streams.
- T and V enter via a 1-row broadcast cross join, not an eager
  ``count()`` action (the jaccard_topk convention).
- The only corpus-sized exchanges are the two word-keyed groupBys and
  the final ``groupBy(doc_id)`` — all partially aggregated map-side.

Bucket thresholds are fixed constants (log10-ppl micro-units), not
corpus quantiles: CCNet's published cutoffs are also frozen per
language after one calibration pass — a runtime tercile would need a
global sort of the score column every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..functions.scoring import det_log10_ratio, det_log10_ratio_sql
from ..functions.text import tokenize, tokenize_sql
from .vocab import word_counts

LM_MOD = 5  # reference slice: hash64(doc_id) % LM_MOD == 0
MICRO = 1_000_000
# log10-perplexity cutoffs (micro-units): avg nlp ≤ 1.477 → head,
# ≤ 1.480 → middle, else tail. Calibrated once against the synthetic
# fixture family (avg-nlp median ≈ 1.478 at sf0.001 / sf0.01 / sf0.1,
# p5..p95 ≈ 1.470..1.494) so all three buckets are populated at every
# test scale (CCNet freezes its cutoffs the same way — one calibration
# pass per language, then constants).
HEAD_MICRO = 1_477_000
MID_MICRO = 1_480_000


def score_with_vocab(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """The scoring core: bucket every (doc_id, text) row against an
    already-built unigram count table ``vocab`` = (w, c_w). Shared by
    the batch operator (vocab from the reference hash slice) and the
    streaming twin (vocab read from the incremental word-frequency
    store, streaming/lm.py) — one kernel, so the two paths cannot
    drift."""
    totals = vocab.agg(
        F.coalesce(F.sum("c_w"), F.lit(0)).alias("t_tot"),
        F.count(F.lit(1)).alias("v_size"),
    )

    doc_words = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    denom = F.greatest(F.col("t_tot") + F.col("v_size"), F.lit(1).cast("long"))
    lp = det_log10_ratio(denom, F.coalesce(F.col("c_w"), F.lit(0)) + 1)
    scored = (
        doc_words.join(vocab, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "c",
            F.floor(lp * F.lit(float(MICRO))).cast("long").alias("lp_micro"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("int").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lp_micro")).cast("long").alias("nlp_micro"),
        )
    )

    n = F.col("n_tokens").cast("long")
    bucket = (
        F.when(F.col("n_tokens") == 0, F.lit("empty"))
        .when(F.col("nlp_micro") <= n * F.lit(HEAD_MICRO), F.lit("head"))
        .when(F.col("nlp_micro") <= n * F.lit(MID_MICRO), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("int").alias("n_tokens"),
            F.coalesce(F.col("nlp_micro"), F.lit(0)).cast("long").alias("nlp_micro"),
        )
        .withColumn("ppl_bucket", bucket)
    )


def ppl_buckets(
    documents: DataFrame,
    reference_docs: DataFrame | None = None,
    lm_mod: int = LM_MOD,
) -> DataFrame:
    """(doc_id, n_tokens, nlp_micro, ppl_bucket) for every document:
    token count, total negative log10-probability in integer
    micro-units, and the CCNet head/middle/tail bucket (token-less
    documents land in 'empty')."""
    docs = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    if reference_docs is None:
        ref = docs.filter(
            F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(lm_mod))
            == F.lit(0)
        )
    else:
        ref = reference_docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
        )

    # the LM count table IS vocab.word_counts — the same frame the
    # streaming vocabulary store accumulates per batch, which is what
    # makes streaming/lm.py's exact-convergence contract hold by
    # construction rather than by parallel implementations agreeing
    vocab = word_counts(ref).withColumnRenamed("c", "c_w")
    return score_with_vocab(docs, vocab)


def ppl_buckets_sql(lm_mod: int = LM_MOD) -> str:
    toks = tokenize_sql("text")
    lp = det_log10_ratio_sql(
        "greatest(t_tot + v_size, 1)", "COALESCE(c_w, 0) + 1"
    )
    return f"""
        WITH docs AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   COALESCE(text, '') AS text
            FROM documents
        ),
        ref_tokens AS (
            SELECT unnest({toks}) AS w FROM docs
            WHERE ({hash64_sql("CAST(doc_id AS VARCHAR)")}) % {lm_mod} = 0
        ),
        vocab AS (
            SELECT w, count(*) AS c_w FROM ref_tokens GROUP BY w
        ),
        totals AS (
            SELECT COALESCE(sum(c_w), 0) AS t_tot, count(*) AS v_size
            FROM vocab
        ),
        doc_words AS (
            SELECT doc_id, w, count(*) AS c
            FROM (SELECT doc_id, unnest({toks}) AS w FROM docs)
            GROUP BY doc_id, w
        ),
        scored AS (
            SELECT doc_id,
                   CAST(sum(c) AS INT) AS n_tokens,
                   CAST(sum(c * lp_micro) AS BIGINT) AS nlp_micro
            FROM (
                SELECT dw.doc_id AS doc_id, dw.c AS c,
                       CAST(floor(({lp}) * CAST({MICRO} AS DOUBLE)) AS BIGINT)
                           AS lp_micro
                FROM doc_words dw
                LEFT JOIN vocab v ON dw.w = v.w
                CROSS JOIN totals
            )
            GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, nlp_micro,
               CASE WHEN n_tokens = 0 THEN 'empty'
                    WHEN nlp_micro <= CAST(n_tokens AS BIGINT) * {HEAD_MICRO}
                         THEN 'head'
                    WHEN nlp_micro <= CAST(n_tokens AS BIGINT) * {MID_MICRO}
                         THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM (
            SELECT d.doc_id AS doc_id,
                   COALESCE(s.n_tokens, 0) AS n_tokens,
                   COALESCE(s.nlp_micro, 0) AS nlp_micro
            FROM docs d LEFT JOIN scored s ON d.doc_id = s.doc_id
        )
        ORDER BY doc_id
    """
