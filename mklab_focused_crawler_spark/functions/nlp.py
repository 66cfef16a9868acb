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

_ENTITY_RE = re.compile(r"\b([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)\b")

ENTITY_SCHEMA = "doc_id string, entity string, n_mentions int"
POS_SCHEMA = "doc_id string, token string, tag string"


def _heuristic_entities(text: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for m in _ENTITY_RE.finditer(text or ""):
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
