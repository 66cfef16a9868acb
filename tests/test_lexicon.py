"""Unit tests for operators/lexicon.py: brute-force recomputation of
hits/ppm/flag, threshold edges, and the zero-shuffle plan contract."""

from __future__ import annotations

import math
import re

from mklab_focused_crawler_spark.operators.lexicon import (
    LEXICON,
    MIN_HITS,
    RATIO_PPM,
    lexicon_filter,
)


def _brute(rows):
    out = {}
    for doc_id, text in rows:
        toks = [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]
        hits = sum(1 for t in toks if t in LEXICON)
        ppm = math.floor(hits * 1_000_000.0 / len(toks)) if toks else 0
        out[doc_id] = (
            len(toks),
            hits,
            ppm,
            hits >= MIN_HITS or ppm >= RATIO_PPM,
        )
    return out


def test_matches_brute_force(spark):
    rows = [
        (0, "win a prize at the casino jackpot lottery tonight"),
        (1, "perfectly ordinary prose about nothing in particular"),
        (2, "bonus"),  # 1 hit but 100% density -> ratio flag
        (3, "bonus words bonus words bonus"),  # 3 hits -> count flag
        (4, ""),
        (5, None),
        (6, "Unsubscribe CASINO viagra!"),  # case-folded hits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["lex_hits"], r["lex_ppm"], r["flagged"])
        for r in lexicon_filter(df).collect()
    }
    assert got == _brute(rows)
    assert got[0][3] and got[2][3] and got[3][3] and got[6][3]
    assert not got[1][3] and not got[4][3] and not got[5][3]


def test_threshold_edges(spark):
    # exactly MIN_HITS-1 hits and density just under RATIO_PPM: no flag
    filler = " ".join(["word"] * 19)
    rows = [(0, f"bonus prize {filler}")]  # 2 hits / 21 tokens ≈ 95238 ppm
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = lexicon_filter(df).collect()[0]
    assert r["lex_hits"] == MIN_HITS - 1
    assert r["lex_ppm"] < RATIO_PPM
    assert not r["flagged"]


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = lexicon_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
