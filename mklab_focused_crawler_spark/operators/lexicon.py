"""Lexicon-based document tagging: count hits against a fixed term
blocklist and flag documents over the threshold — the wordlist-filter
stage of public pretraining pipelines (C4's bad-word filter, Dolma's
taboo taggers, RefinedWeb's URL/word blocklists). The shipped lexicon
is a spam/promotional stand-in list; production swaps in its own
moderated wordlists through the same operator.

Shape at 100 TB:

- **One narrow map, zero shuffles** — tokenize (the engine-wide
  portable tokenizer) → a single HOF filter against the literal
  lexicon array → size(). No join (the lexicon is a plan literal, the
  same way the IVF codebook embeds), no aggregation, whole-stage
  codegen end to end; the scan prunes to (doc_id, text).
- **Integer-only decision math** — the hit *ratio* is reported in ppm
  computed as ``floor(hits·1e6 / n_tokens)``: one IEEE double divide
  of exactly-representable integers, cross-engine stable (CLAUDE.md:
  IEEE ops on identical doubles are portable; only libm is not), and
  the flag compares integers/booleans, never floats.

The synthetic corpus carries no lexicon terms, so the fixture path
plants doc_id-derived hits (``augment_lexicon`` — mirrored exactly in
SQL, the ``augment_pii`` convention): the operator under test is the
tagging, not the corpus.

Reference analog: none in the crawler (it filters by MIME/length
only); this operator is part of the training-data tier layered on top
(SURVEY.md §2's LLM-pipeline extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize, tokenize_sql

# Stand-in spam/promotional lexicon (lower-case, single tokens — the
# tokenizer lower-cases and splits on non-alphanumerics, so multi-word
# phrases would never match a single token).
LEXICON = (
    "casino",
    "jackpot",
    "lottery",
    "viagra",
    "bonus",
    "prize",
    "winner",
    "unsubscribe",
)
# flag when ≥ MIN_HITS matches OR the hit density exceeds RATIO_PPM
MIN_HITS = 3
RATIO_PPM = 100_000  # 10% of tokens


def lexicon_filter(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, lex_hits, lex_ppm, flagged) for every
    document. Null text coalesces to ``''`` (the text_analysis
    convention); token-less documents report 0 ppm and never flag on
    ratio."""
    toks = tokenize(F.coalesce(F.col("text"), F.lit("")))
    lex = F.lit(list(LEXICON))
    out = documents.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(lex, t)))
        .cast("int")
        .alias("lex_hits"),
    )
    ppm = F.when(
        F.col("n_tokens") > 0,
        F.floor(
            F.col("lex_hits").cast("double")
            * F.lit(1_000_000.0)
            / F.col("n_tokens").cast("double")
        ),
    ).otherwise(F.lit(0)).cast("long")
    out = out.withColumn("lex_ppm", ppm)
    return out.withColumn(
        "flagged",
        (F.col("lex_hits") >= MIN_HITS) | (F.col("lex_ppm") >= RATIO_PPM),
    )


def lexicon_filter_sql(table: str = "documents") -> str:
    toks = tokenize_sql("coalesce(text, '')")
    lex = "[" + ", ".join(f"'{w}'" for w in LEXICON) + "]"
    return f"""
        SELECT doc_id, n_tokens, lex_hits,
               CASE WHEN n_tokens > 0
                    THEN CAST(floor(CAST(lex_hits AS DOUBLE) * 1000000.0
                                    / CAST(n_tokens AS DOUBLE)) AS BIGINT)
                    ELSE 0 END AS lex_ppm,
               (lex_hits >= {MIN_HITS}
                OR CASE WHEN n_tokens > 0
                        THEN CAST(floor(CAST(lex_hits AS DOUBLE) * 1000000.0
                                        / CAST(n_tokens AS DOUBLE)) AS BIGINT)
                        ELSE 0 END >= {RATIO_PPM}) AS flagged
        FROM (
            SELECT doc_id,
                   CAST(len({toks}) AS INT) AS n_tokens,
                   CAST(len(list_filter({toks},
                        t -> list_contains({lex}, t))) AS INT) AS lex_hits
            FROM {table}
        )
        ORDER BY doc_id
    """


# --------------------------------------------------------------------------
# deterministic hit planting (fixture side — the corpus has none)
# --------------------------------------------------------------------------


def augment_lexicon(documents: DataFrame) -> DataFrame:
    """Plant doc_id-derived lexicon hits into a deterministic subset
    (mirrored bit-for-bit by ``augment_lexicon_sql``): one hit on ids
    ≡ 0 (mod 6), a 3-hit spam tail on ≡ 0 (mod 17) — ids hit by both
    rules carry 4 hits and flag on MIN_HITS."""
    d = F.col("doc_id")
    t = F.coalesce(F.col("text"), F.lit(""))
    t = F.when(
        d % 6 == 0, F.concat(t, F.lit(" bonus"))
    ).otherwise(t)
    t = F.when(
        d % 17 == 0, F.concat(t, F.lit(" casino jackpot prize"))
    ).otherwise(t)
    return documents.select("doc_id", t.alias("text"))


def augment_lexicon_sql(table: str = "documents") -> str:
    """DuckDB twin of ``augment_lexicon`` — a FROM-able derived table."""
    t = "coalesce(text, '')"
    t = f"(CASE WHEN doc_id % 6 = 0 THEN {t} || ' bonus' ELSE {t} END)"
    t = (
        f"(CASE WHEN doc_id % 17 = 0 THEN {t} || ' casino jackpot prize'"
        f" ELSE {t} END)"
    )
    return f"(SELECT doc_id, {t} AS text FROM {table})"
