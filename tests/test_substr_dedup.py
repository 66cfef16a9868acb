"""Unit tests for operators/substr_dedup.py (exact substring dedup,
keep-first): planted-span semantics, a full Python brute-force
re-derivation, edge cases, and the plan contract (no cartesian, no
Python stages)."""

from __future__ import annotations

import re

from mklab_focused_crawler_spark.operators.substr_dedup import (
    GRAM_N,
    substring_dedup,
)

# short window so fixtures stay readable; semantics are n-independent
K = 4


def _brute(rows: list[tuple[int, str]], n: int = K) -> dict[int, dict]:
    """Independent pure-Python re-derivation of the keep-first rule."""
    toks = {
        d: [t for t in re.split("[^a-z0-9]+", (t or "").lower()) if t]
        for d, t in rows
    }
    occs: dict[tuple, list[tuple[int, int]]] = {}
    for d, ts in toks.items():
        for s in range(len(ts) - n + 1):
            occs.setdefault(tuple(ts[s : s + n]), []).append((d, s))
    removing: dict[int, list[int]] = {d: [] for d in toks}
    for locs in occs.values():
        if len(locs) >= 2:
            first = min(locs)
            for d, s in locs:
                if (d, s) != first:
                    removing[d].append(s)
    out = {}
    for d, ts in toks.items():
        covered = set()
        for s in removing[d]:
            covered.update(range(s, s + n))
        kept = [t for i, t in enumerate(ts) if i not in covered]
        nt = len(ts)
        out[d] = {
            "doc_id": d,
            "n_tokens": nt,
            "n_dup_spans": len(removing[d]),
            "n_removed": nt - len(kept),
            "removed_frac": round((nt - len(kept)) / nt, 6) if nt else 0.0,
            "clean_text": " ".join(kept),
        }
    return out


def _run(spark, rows, n: int = K) -> dict[int, dict]:
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in substring_dedup(df, n=n).collect()
    }


def test_keep_first_planted_spans(spark):
    base = "w1 w2 w3 w4 w5 w6 w7 w8"  # 8 tokens
    rows = [
        (1, base),  # first occurrence of everything
        (2, base),  # exact copy: fully removed
        # shares exactly base tokens w3..w6 (one K-gram) mid-doc:
        (3, "u1 u2 w3 w4 w5 w6 u3 u4"),
        (4, "v1 v2 v3"),  # shorter than K: untouchable
    ]
    got = _run(spark, rows)
    assert got[1]["n_removed"] == 0
    assert got[1]["clean_text"] == base
    assert got[2]["n_removed"] == 8
    assert got[2]["clean_text"] == ""
    assert got[2]["removed_frac"] == 1.0
    # doc 3: the single shared K-gram covers positions 2..5
    assert got[3]["n_dup_spans"] == 1
    assert got[3]["clean_text"] == "u1 u2 u3 u4"
    assert got[4] == {
        "doc_id": 4,
        "n_tokens": 3,
        "n_dup_spans": 0,
        "n_removed": 0,
        "removed_frac": 0.0,
        "clean_text": "v1 v2 v3",
    }


def test_within_doc_repeat_keeps_first(spark):
    # the phrase "p q r s" occurs at positions 0 and 6 of the same doc
    rows = [(1, "p q r s x y p q r s z")]
    got = _run(spark, rows)
    assert got[1]["n_dup_spans"] == 1
    assert got[1]["clean_text"] == "p q r s x y z"


def test_overlapping_spans_union_coverage(spark):
    # doc 2 copies base positions 0..4 (two overlapping dup K-grams at
    # s=0 and s=1); coverage is their union 0..4, not 2*K tokens
    rows = [(1, "a b c d e f g h"), (2, "a b c d e z2 z3 z4")]
    got = _run(spark, rows)
    assert got[2]["n_dup_spans"] == 2
    assert got[2]["n_removed"] == 5
    assert got[2]["clean_text"] == "z2 z3 z4"


def test_empty_and_null_text(spark):
    rows = [(1, ""), (2, None), (3, "x y z q w e r t")]
    got = _run(spark, rows)
    for d in (1, 2):
        assert got[d]["n_tokens"] == 0
        assert got[d]["removed_frac"] == 0.0
        assert got[d]["clean_text"] == ""


def test_matches_brute_force(spark):
    # deterministic small-vocab corpus: dense collisions exercise
    # within-doc repeats, cross-doc shares, and overlap unions at once
    vocab = ["t0", "t1", "t2", "t3", "t4"]
    rows = [
        (d, " ".join(vocab[(d * 7 + i * i) % len(vocab)] for i in range(12)))
        for d in range(20)
    ]
    rows += [(100 + d, t) for d, t in rows[:5]]  # exact copies
    got = _run(spark, rows)
    want = _brute(rows)
    assert got == want


def test_default_gram_n_is_decontam_width():
    assert GRAM_N == 13


def test_plan_no_cartesian_no_python(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], "doc_id long, text string"
    )
    plan = (
        substring_dedup(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
