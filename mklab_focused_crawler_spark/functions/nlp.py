"""Model-gated NLP operators: entity extraction and POS tagging.

Reference parity: ``bolts/items/EntityExtractionBolt.java:62-119`` runs
a Stanford CRF NER model over titles; ``PosTaggingBolt.java:44-71`` a
MaxentTagger. Both are *model-backed* — the models are external
artifacts the sandbox doesn't ship — so, like the multimodal codec
(operators/multimodal.py), the model step is gated: calling without
``heuristic=True`` raises ``NotImplementedError``; with it, a
deterministic regex heuristic stands in (capitalized-token runs →
entities; suffix rules → POS). The Spark-side shape — broadcast model
per executor, Arrow-batched ``pandas_udf`` over title columns, explode
to entity rows — is the real deployment shape; swapping in a real model
changes only the inner function.

SURVEY §2.9 marks these "out of minimum scope"; they are included for
API-surface parity.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import hash64, hash64_sql

ENTITY_PATTERN = r"\b([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)\b"
_ENTITY_RE = re.compile(ENTITY_PATTERN)
TOKEN_PATTERN = r"[A-Za-z0-9]+"
# Everything outside ASCII word chars + ASCII whitespace becomes a space
# BEFORE the boundary regex runs: `\b` next to a non-ASCII letter is
# engine-divergent (Java/Python treat À/ß as word chars — no boundary;
# RE2/DuckDB is ASCII-only — boundary), and RE2 has no lookarounds to
# express the boundary explicitly. Post-sanitize, the text contains only
# chars on which all three regex engines agree. Found by the
# differential fuzzer (texts=['AaÀ']: Spark 0 rows, DuckDB 1).
SANITIZE_PATTERN = r"[^A-Za-z0-9_ \t\r\n]"
_SANITIZE_RE = re.compile(SANITIZE_PATTERN)
_A_Z = "abcdefghijklmnopqrstuvwxyz"

ENTITY_SCHEMA = "doc_id string, entity string, n_mentions int"
POS_SCHEMA = "doc_id string, token string, tag string"


def _heuristic_entities(text: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for m in _ENTITY_RE.finditer(_SANITIZE_RE.sub(" ", text or "")):
        e = m.group(1)
        out[e] = out.get(e, 0) + 1
    return out


def _heuristic_pos(tok: str) -> str:
    """Suffix-rule tagger (deterministic stand-in for MaxentTagger)."""
    t = tok.lower()
    if t.endswith("ing"):
        return "VBG"
    if t.endswith("ed"):
        return "VBD"
    if t.endswith("ly"):
        return "RB"
    if t.endswith("s") and len(t) > 3:
        return "NNS"
    if t and t[0].isdigit():
        return "CD"
    return "NN"


# --------------------------------------------------------------------------
# Column-expression variants (the oracle-checked query surface). The
# heuristic is deterministic and regex-expressible, so the *query* form
# stays JVM-side (regexp_extract_all + explode + groupBy — no Python);
# the mapInPandas forms below keep the model-deployment shape for when a
# real NER/POS model is injected.
# --------------------------------------------------------------------------


CASE_MOD = 5  # restore_case capitalizes tokens with hash64(tok) % 5 == 0


def restore_case(text_col) -> F.Column:
    """Deterministic case restoration for the all-lowercase synthetic
    corpus: capitalize the ~1/CASE_MOD of tokens selected by the
    portable 60-bit hash (adjacent selected tokens form multi-word
    capitalized runs — exactly the structure the entity heuristic keys
    on). A real crawl has cased text and skips this; the fixture needs
    it or the capitalized-run extractor is vacuously empty. ASCII
    upper only (the corpus is ASCII; Unicode casing diverges across
    engines — see functions/text.py)."""
    toks = F.split(F.coalesce(text_col, F.lit("")), " ")

    def cap(tk):
        return F.when(
            (F.length(tk) > 0) & (hash64(tk) % CASE_MOD == 0),
            F.concat(
                # ASCII-only upper via translate: engine upper() is
                # Unicode (ß→SS, i→İ under some collations) and diverges
                F.translate(tk.substr(F.lit(1), F.lit(1)), _A_Z, _A_Z.upper()),
                tk.substr(F.lit(2), F.length(tk)),
            ),
        ).otherwise(tk)

    return F.array_join(F.transform(toks, cap), " ")


def restore_case_sql(expr: str) -> str:
    return (
        f"array_to_string(list_transform(string_split(coalesce({expr}, ''), ' '), "
        f"t -> CASE WHEN length(t) > 0 AND ({hash64_sql('t')}) % {CASE_MOD} = 0 "
        f"THEN translate(substr(t, 1, 1), '{_A_Z}', '{_A_Z.upper()}') || substr(t, 2) "
        f"ELSE t END), ' ')"
    )


def entity_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, entity, n_mentions) — EntityExtractionBolt.java:91-113
    dedup/count behavior over capitalized-run entities, as pure column
    expressions."""
    t = F.regexp_replace(
        F.coalesce(F.col(text_col), F.lit("")), SANITIZE_PATTERN, " "
    )
    ents = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.regexp_extract_all(t, F.lit(ENTITY_PATTERN), 1)).alias(
            "entity"
        ),
    )
    return (
        ents.groupBy("doc_id", "entity")
        .agg(F.count(F.lit(1)).cast("int").alias("n_mentions"))
    )


def entity_counts_sql(table: str = "documents") -> str:
    return f"""
        WITH e AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(
                          regexp_replace(coalesce(text, ''),
                                         '{SANITIZE_PATTERN}', ' ', 'g'),
                          '{ENTITY_PATTERN}', 1)) AS entity
            FROM {table}
        )
        SELECT doc_id, entity, CAST(count(*) AS INT) AS n_mentions
        FROM e GROUP BY doc_id, entity
        ORDER BY doc_id, entity
    """


def _pos_tag_col(tok) -> F.Column:
    t = F.lower(tok)
    first = F.substring(t, 1, 1)
    return (
        F.when(t.endswith("ing"), F.lit("VBG"))
        .when(t.endswith("ed"), F.lit("VBD"))
        .when(t.endswith("ly"), F.lit("RB"))
        .when(t.endswith("s") & (F.length(t) > 3), F.lit("NNS"))
        .when((first >= "0") & (first <= "9"), F.lit("CD"))
        .otherwise(F.lit("NN"))
    )


def pos_tag_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, tag, n_tokens) — PosTaggingBolt's word#tag stream,
    aggregated per tag (the per-token stream is unbounded output; the
    counted form is the analytics surface). Pure column expressions."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.regexp_extract_all(t, F.lit(TOKEN_PATTERN), 0)).alias("token"),
    )
    return (
        toks.select("doc_id", _pos_tag_col(F.col("token")).alias("tag"))
        .groupBy("doc_id", "tag")
        .agg(F.count(F.lit(1)).cast("int").alias("n_tokens"))
    )


def pos_tag_counts_sql(table: str = "documents") -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   lower(unnest(regexp_extract_all(coalesce(text, ''),
                         '{TOKEN_PATTERN}', 0))) AS t
            FROM {table}
        ),
        tagged AS (
            SELECT doc_id,
                   CASE WHEN t LIKE '%ing' THEN 'VBG'
                        WHEN t LIKE '%ed' THEN 'VBD'
                        WHEN t LIKE '%ly' THEN 'RB'
                        WHEN t LIKE '%s' AND len(t) > 3 THEN 'NNS'
                        WHEN substring(t, 1, 1) BETWEEN '0' AND '9' THEN 'CD'
                        ELSE 'NN' END AS tag
            FROM toks
        )
        SELECT doc_id, tag, CAST(count(*) AS INT) AS n_tokens
        FROM tagged GROUP BY doc_id, tag
        ORDER BY doc_id, tag
    """


def extract_entities(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", heuristic: bool = False
) -> DataFrame:
    """(doc_id, entity, n_mentions) rows — EntityExtractionBolt's
    dedup/count behavior (EntityExtractionBolt.java:91-113)."""
    if not heuristic:
        raise NotImplementedError(
            "NER model not available in this environment; pass "
            "heuristic=True for the deterministic regex stand-in"
        )
    src = df.selectExpr(f"cast({id_col} as string) as doc_id", f"{text_col} as text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for e, n in _heuristic_entities(text).items():
                    rows.append((doc_id, e, n))
            yield pd.DataFrame(rows, columns=["doc_id", "entity", "n_mentions"])

    return src.mapInPandas(gen, ENTITY_SCHEMA)


def pos_tag(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", heuristic: bool = False
) -> DataFrame:
    """(doc_id, token, tag) rows — PosTaggingBolt's word#tag pairs."""
    if not heuristic:
        raise NotImplementedError(
            "POS model not available in this environment; pass "
            "heuristic=True for the deterministic suffix-rule stand-in"
        )
    src = df.selectExpr(f"cast({id_col} as string) as doc_id", f"{text_col} as text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for tok in re.findall(r"[A-Za-z0-9]+", text or ""):
                    rows.append((doc_id, tok, _heuristic_pos(tok)))
            yield pd.DataFrame(rows, columns=["doc_id", "token", "tag"])

    return src.mapInPandas(gen, POS_SCHEMA)
