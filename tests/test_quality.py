"""Unit tests for operators/quality.py (Gopher-style quality signals):
signal math vs Python brute force, edge cases, and the zero-shuffle
plan contract."""

from __future__ import annotations

import collections
import re

from pyspark.sql import functions as F

from mklab_focused_crawler_spark.operators.quality import (
    MAX_TOP_2GRAM_FRAC,
    doc_quality_signals,
)


def _brute(text: str) -> dict:
    toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
    n = len(toks)

    def frac(num, den):
        return round(num / den, 6) if den > 0 else 0.0

    g2 = [" ".join(toks[i : i + 2]) for i in range(n - 1)]
    g3 = [" ".join(toks[i : i + 3]) for i in range(n - 2)]
    top2 = max(collections.Counter(g2).values()) if g2 else 0
    return {
        "n_tokens": n,
        "mean_token_len": frac(sum(map(len, toks)), n),
        "dup_token_frac": frac(n - len(set(toks)), n),
        "top_2gram_frac": frac(top2, len(g2)),
        "dup_3gram_frac": frac(len(g3) - len(set(g3)), len(g3)),
    }


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r.asDict() for r in doc_quality_signals(df).collect()
    }


def test_signals_match_brute_force(spark):
    texts = [
        "a a a a a",  # all-dup tokens, single 2-gram repeated
        "x y x y z",  # top 2-gram 'x y' twice of four
        "the quick brown fox jumps over the lazy dog",
        "ab ab ab cd cd ef " * 10,  # heavy 3-gram repetition
        "one",  # no 2-grams at all
        "two words",  # one 2-gram, no 3-grams
        "Mixed CASE punct, punct; punct!",
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        want = _brute(t)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v)


def test_null_and_empty_text(spark):
    got = _run(spark, [None, "", "   ", "!!!"])
    for i in range(4):
        r = got[i]
        assert r["n_tokens"] == 0
        assert r["mean_token_len"] == 0.0
        assert r["dup_token_frac"] == 0.0
        assert r["top_2gram_frac"] == 0.0
        assert r["dup_3gram_frac"] == 0.0
        assert r["quality_pass"] is False


def test_gate_pins_known_examples(spark):
    clean = " ".join(f"tok{i:03d} word{i:03d}" for i in range(40))  # 80 uniq
    spammy = "buy now " * 40  # repetition on every signal
    got = _run(spark, [clean, spammy])
    assert got[0]["quality_pass"] is True
    assert got[1]["quality_pass"] is False
    assert got[1]["top_2gram_frac"] > MAX_TOP_2GRAM_FRAC


def test_plan_has_no_shuffle_and_prunes_columns(spark, tmp_path):
    """The operator is ONE narrow map: no Exchange anywhere in the plan
    (the top-2-gram count is the sorted-run aggregate, not a groupBy),
    and the parquet scan reads only doc_id + text."""
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "a b c", "x", 7)], "doc_id long, text string, source string, extra int"
    ).write.parquet(p)
    plan = (
        doc_quality_signals(spark.read.parquet(p))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "source" not in read_schema[0], plan
