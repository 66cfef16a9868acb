"""PII redaction: detect and mask emails, phone numbers, IPv4
addresses, and SSN-shaped identifiers — the pre-training scrubbing
step of public LM data pipelines (cf. BigScience ROOTS' PII pipeline
and Dolma's email/phone/IP masking rules).

Shape at 100 TB:

- **One narrow map, zero shuffles** — every column is a pure
  ``regexp_extract_all`` / ``regexp_replace`` expression over the text
  column; no join, no aggregation, whole-stage-codegen end to end. The
  scan is pruned to (doc_id, text).
- **Portable regex subset** — Java (Spark) and RE2 (DuckDB) disagree on
  exotic constructs (backrefs, lookaround — RE2 has neither), so the
  patterns below use only the common core: literal classes, bounded
  repetition, non-capturing groups, ASCII ``\\d`` and ``\\b``. Both
  engines treat ``\\d`` as ASCII digits by default.
- **Counts before masking** — per-category counts are extracted from
  the ORIGINAL text; the categories are disjoint by construction
  (an email never contains a bare IPv4/phone/SSN token and vice
  versa), so mask order cannot change any count.

The synthetic corpus carries no PII, so the fixture path plants
deterministic PII spans derived from ``doc_id`` (``augment_pii`` —
mirrored exactly in SQL, the ``_synth_url_col`` convention): the
operator under test is the redaction, not the corpus.

Reference analog: the reference pipeline has no PII stage (it crawls
public social posts); this operator is part of the training-data tier
layered on top (SURVEY.md §2's LLM-pipeline extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Portable Java/RE2 regexes (see module docstring). Order of masking:
# EMAIL first (it contains dots+digits that could otherwise be nibbled
# by the IP rule on numeric domains), then SSN / PHONE (disjoint digit
# groupings), then IP.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

_MASKS = [
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_ssns", SSN_RE, "<SSN>"),
    ("n_phones", PHONE_RE, "<PHONE>"),
    ("n_ips", IPV4_RE, "<IP>"),
]


def pii_redact(documents: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_ssns, n_phones, n_ips, clean_text): per-
    category match counts plus the masked text. Null text coalesces to
    ``''`` (the text_analysis convention)."""
    t = F.coalesce(F.col("text"), F.lit(""))
    cols = [F.col("doc_id")]
    clean = t
    for name, pat, token in _MASKS:
        cols.append(
            F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
            .cast("int")
            .alias(name)
        )
        clean = F.regexp_replace(clean, pat, token)
    cols.append(clean.alias("clean_text"))
    return documents.select(*cols)


def pii_redact_sql(table: str = "documents") -> str:
    t = "coalesce(text, '')"
    cols = ["doc_id"]
    clean = t
    for name, pat, token in _MASKS:
        # DuckDB regexp_replace masks only the FIRST match without the
        # 'g' option (Spark always masks all)
        cols.append(
            f"CAST(len(regexp_extract_all({t}, '{pat}')) AS INT) AS {name}"
        )
        clean = f"regexp_replace({clean}, '{pat}', '{token}', 'g')"
    cols.append(f"{clean} AS clean_text")
    return (
        "SELECT " + ", ".join(cols) + f" FROM {table} ORDER BY doc_id"
    )


# --------------------------------------------------------------------------
# deterministic PII planting (fixture side — the corpus has none)
# --------------------------------------------------------------------------


def plant_pii(text, did):
    """doc_id-derived PII-span planting expression (mirrored bit-for-bit
    by :func:`plant_pii_sql`): emails on ids ≡ 0 (mod 3), SSNs on ≡ 0
    (mod 5), phones on ≡ 0 (mod 7), IPs on ≡ 0 (mod 11) — ids hit by
    several rules get several spans. Exposed so the composed pipeline's
    augment plants the same spans the redaction fixtures are tested
    on."""
    d = did
    ds = d.cast("string")
    t = F.coalesce(text, F.lit(""))
    t = F.when(
        d % 3 == 0,
        F.concat(t, F.lit(" contact user"), ds, F.lit("@mail"), (d % 7).cast("string"), F.lit(".example.com")),
    ).otherwise(t)
    t = F.when(
        d % 5 == 0,
        F.concat(t, F.lit(" id 123-45-"), F.lpad((d % 10000).cast("string"), 4, "0")),
    ).otherwise(t)
    t = F.when(
        d % 7 == 0,
        F.concat(t, F.lit(" call 555-"), F.lpad((d % 1000).cast("string"), 3, "0"), F.lit("-"), F.lpad((d % 10000).cast("string"), 4, "0")),
    ).otherwise(t)
    t = F.when(
        d % 11 == 0,
        F.concat(t, F.lit(" from 10."), (d % 256).cast("string"), F.lit("."), (d % 200).cast("string"), F.lit("."), (d % 250).cast("string")),
    ).otherwise(t)
    return t


def augment_pii(documents: DataFrame) -> DataFrame:
    """Plant doc_id-derived PII spans into a deterministic subset of
    documents — see :func:`plant_pii` for the rules."""
    return documents.select(
        "doc_id", plant_pii(F.col("text"), F.col("doc_id")).alias("text")
    )


def plant_pii_sql(
    text_expr: str = "coalesce(text, '')", id_expr: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`plant_pii` — a scalar text expression."""
    t = text_expr
    t = (
        f"(CASE WHEN {id_expr} % 3 = 0 THEN {t} || ' contact user' || CAST({id_expr} AS VARCHAR)"
        f" || '@mail' || CAST({id_expr} % 7 AS VARCHAR) || '.example.com' ELSE {t} END)"
    )
    t = (
        f"(CASE WHEN {id_expr} % 5 = 0 THEN {t} || ' id 123-45-' ||"
        f" lpad(CAST({id_expr} % 10000 AS VARCHAR), 4, '0') ELSE {t} END)"
    )
    t = (
        f"(CASE WHEN {id_expr} % 7 = 0 THEN {t} || ' call 555-' ||"
        f" lpad(CAST({id_expr} % 1000 AS VARCHAR), 3, '0') || '-' ||"
        f" lpad(CAST({id_expr} % 10000 AS VARCHAR), 4, '0') ELSE {t} END)"
    )
    t = (
        f"(CASE WHEN {id_expr} % 11 = 0 THEN {t} || ' from 10.' ||"
        f" CAST({id_expr} % 256 AS VARCHAR) || '.' || CAST({id_expr} % 200 AS VARCHAR)"
        f" || '.' || CAST({id_expr} % 250 AS VARCHAR) ELSE {t} END)"
    )
    return t


def augment_pii_sql(table: str = "documents") -> str:
    """DuckDB twin of ``augment_pii`` — a FROM-able derived table."""
    return f"(SELECT doc_id, {plant_pii_sql()} AS text FROM {table})"
