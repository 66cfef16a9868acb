"""Corpus telemetry: the rollup a pipeline run reports per ingestion —
documents / tokens / characters by (source, language) with subtotals.

One pass, one aggregation: GROUPING SETS ((source, lang), (source),
()) via ``rollup`` — Catalyst expands the sets inside a single
partial-aggregated shuffle (the Expand node multiplies rows 3x AFTER
the narrow projection, so the exchange carries grouped partials, never
text). At 100 TB this is the cheapest possible shape: token counting
is a column expression (no Python), the map side pre-aggregates each
grouping set, and the reduce side sees ≤ 3 x |sources x langs| rows.

``gid`` (Spark ``grouping_id()`` == DuckDB ``GROUPING(source, lang)``:
bit 1 = source aggregated, bit 0 = lang aggregated) disambiguates a
subtotal row's NULLs from genuinely-NULL data values — both engines
emit the same bit pattern (verified empirically; pinned by the oracle
hash).

Reference analog: the reference's per-window counters
(``ItemsCounterBolt``/``MediaCounterBolt``, SURVEY §2.8) report the
same shape of per-key ingest telemetry; here it is one declarative
rollup instead of mutable per-bolt counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count, tokenize_sql


def corpus_stats(documents: DataFrame) -> DataFrame:
    """(source, lang, gid, n_docs, n_tokens, n_chars) rollup rows:
    per (source, lang), per source, and the grand total."""
    d = documents.select(
        "source",
        "lang",
        token_count(F.coalesce(F.col("text"), F.lit(""))).alias("n_tok"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_ch"),
    )
    return (
        d.rollup("source", "lang")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_ch").alias("n_chars"),
        )
        .select("source", "lang", "gid", "n_docs", "n_tokens", "n_chars")
    )


def corpus_stats_sql() -> str:
    # HAVING count(*) > 0: on an EMPTY table ANSI ROLLUP still emits
    # the grand-total row (n_docs=0) while Spark's rollup emits no rows
    # (Expand of zero input rows); every group of a non-empty table has
    # count ≥ 1, so the filter only reconciles the empty-corpus case —
    # contract: empty corpus → empty result in BOTH engines
    toks = tokenize_sql("COALESCE(text, '')")
    return f"""
        SELECT source, lang,
               CAST(GROUPING(source, lang) AS INT) AS gid,
               count(*) AS n_docs,
               CAST(sum(len({toks})) AS BIGINT) AS n_tokens,
               CAST(sum(length(COALESCE(text, ''))) AS BIGINT) AS n_chars
        FROM documents
        GROUP BY ROLLUP(source, lang)
        HAVING count(*) > 0
        ORDER BY gid, source, lang
    """
