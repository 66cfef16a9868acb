"""Gopher-style document quality signals for training-data curation.

Repetition and shape statistics per document (Rae et al. 2021, "Scaling
Language Models: ... Gopher", §A1.1 quality heuristics; public method):
token count, mean token length, duplicate-token fraction, most-common-
2-gram fraction, duplicate-3-gram fraction, and a combined boolean gate.
These extend the reference's document-quality gate
(ArticleExtractionBolt.java:299-322 ``SimpleEstimator.isLowQuality`` —
a block-statistics low-quality test) to the signal set a large-scale
LLM-data pipeline filters on.

Scale: every signal is a pure column expression over one row — the
whole operator is a single narrow map with ZERO shuffles at any corpus
size. The most-common-2-gram count, which naively needs a per-doc
groupBy (explode → count → max: two shuffles), is instead computed as
the longest run in the doc's SORTED 2-gram array via ``F.aggregate``
(equal grams are adjacent after sorting, so max frequency == max run
length) — per-row O(m log m), whole-stage codegen, no Python. The
DuckDB twin uses an O(m²) ``list_transform``/``list_filter`` count
instead (clearer SQL; the oracle only runs at comparison scale).

Determinism: all fractions are IEEE divisions of exact integers
(cross-engine stable per this repo's conventions), rounded to 6 places.
Null text ≡ '' (the text_analysis convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import ngrams, ngrams_sql, tokenize, tokenize_sql

# Gate thresholds (Gopher-inspired, tuned so the synthetic corpus
# splits non-trivially — see PLANS.md round 4): a doc passes when it is
# long enough, its tokens are word-shaped, and no repetition signal is
# pathological.
MIN_TOKENS = 30
MAX_TOKENS = 100_000
MIN_MEAN_TOKEN_LEN = 3.0
MAX_MEAN_TOKEN_LEN = 10.0
MAX_DUP_TOKEN_FRAC = 0.6
MAX_TOP_2GRAM_FRAC = 0.05
MAX_DUP_3GRAM_FRAC = 0.05


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED string array
    (== the max element frequency) — one F.aggregate pass, no shuffle.
    Empty arrays yield 0."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("int").alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def _frac(num: Column, den: Column) -> Column:
    """round(num/den, 6) with 0.0 on an empty denominator — integer
    inputs, so the division is cross-engine exact."""
    return F.round(
        F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
            F.lit(0.0)
        ),
        6,
    )


def doc_quality_signals(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, mean_token_len, dup_token_frac, top_2gram_frac,
    dup_3gram_frac, quality_pass) — one row per document."""
    t = F.coalesce(F.col("text"), F.lit(""))
    # Two-stage projection so `toks` is a materialized ATTRIBUTE when the
    # n-gram views consume it: building g2/g3 from the tokenize Column
    # object inlines the regex-split subtree at every reference (8 copies
    # per row measured in the optimized plan). CollapseProject keeps the
    # stages separate because the producer is a non-cheap multi-consumer
    # expression.
    base = documents.select("doc_id", tokenize(t).alias("toks"))
    d = base.select(
        "doc_id",
        "toks",
        ngrams(F.col("toks"), 2).alias("g2"),
        ngrams(F.col("toks"), 3).alias("g3"),
    )
    n = F.size("toks")
    len_sum = F.aggregate(
        F.col("toks"), F.lit(0).cast("int"), lambda acc, x: acc + F.length(x)
    )
    sig = d.select(
        "doc_id",
        n.cast("int").alias("n_tokens"),
        _frac(len_sum, n).alias("mean_token_len"),
        _frac(n - F.size(F.array_distinct("toks")), n).alias("dup_token_frac"),
        _frac(_max_run(F.array_sort("g2")), F.size("g2")).alias(
            "top_2gram_frac"
        ),
        _frac(F.size("g3") - F.size(F.array_distinct("g3")), F.size("g3")).alias(
            "dup_3gram_frac"
        ),
    )
    gate = (
        F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS)
        & F.col("mean_token_len").between(MIN_MEAN_TOKEN_LEN, MAX_MEAN_TOKEN_LEN)
        & (F.col("dup_token_frac") < MAX_DUP_TOKEN_FRAC)
        & (F.col("top_2gram_frac") < MAX_TOP_2GRAM_FRAC)
        & (F.col("dup_3gram_frac") < MAX_DUP_3GRAM_FRAC)
    )
    return sig.withColumn("quality_pass", gate)


def doc_quality_signals_sql(table: str = "documents") -> str:
    t = "coalesce(text, '')"
    toks = tokenize_sql(t)
    g2 = ngrams_sql("toks", 2)
    g3 = ngrams_sql("toks", 3)

    def frac(num: str, den: str) -> str:
        return (
            f"round(CASE WHEN {den} > 0 THEN CAST({num} AS DOUBLE) / "
            f"CAST({den} AS DOUBLE) ELSE 0.0 END, 6)"
        )

    # O(m²) per-doc top-gram count: each gram's frequency via
    # list_filter, max over the list (oracle-side only; Spark uses the
    # sorted-run O(m log m) kernel)
    top2 = "coalesce(list_max(list_transform(g2, g -> len(list_filter(g2, h -> h = g)))), 0)"
    return f"""
        WITH base AS (
            SELECT doc_id, {toks} AS toks FROM {table}
        ), arrs AS (
            SELECT doc_id, toks, {g2} AS g2, {g3} AS g3 FROM base
        ), sig AS (
            SELECT doc_id,
                   CAST(len(toks) AS INT) AS n_tokens,
                   {frac("coalesce(list_sum(list_transform(toks, x -> length(x))), 0)", "len(toks)")} AS mean_token_len,
                   {frac("len(toks) - len(list_distinct(toks))", "len(toks)")} AS dup_token_frac,
                   {frac(top2, "len(g2)")} AS top_2gram_frac,
                   {frac("len(g3) - len(list_distinct(g3))", "len(g3)")} AS dup_3gram_frac
            FROM arrs
        )
        SELECT *,
               (n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
                AND mean_token_len BETWEEN {MIN_MEAN_TOKEN_LEN} AND {MAX_MEAN_TOKEN_LEN}
                AND dup_token_frac < {MAX_DUP_TOKEN_FRAC}
                AND top_2gram_frac < {MAX_TOP_2GRAM_FRAC}
                AND dup_3gram_frac < {MAX_DUP_3GRAM_FRAC}) AS quality_pass
        FROM sig ORDER BY doc_id
    """
