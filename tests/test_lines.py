"""Unit tests for operators/lines.py (line-level hygiene) and
dedup.near_dup_filter: keep-first semantics vs Python brute force,
eligibility gate, within-doc duplicates, reconstruction, plan
contracts, and filter/cluster consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from mklab_focused_crawler_spark.operators import dedup
from mklab_focused_crawler_spark.operators.lines import (
    MIN_LINE_CHARS,
    augment_lines,
    line_dedup,
    repetition_signals,
)


def _brute_line_dedup(docs: dict[int, str]) -> dict[int, dict]:
    """Independent re-derivation of the keep-first rule."""
    occ: dict[str, tuple[int, int]] = {}
    for did in sorted(docs):
        for pos, line in enumerate(docs[did].split("\n")):
            if len(line) >= MIN_LINE_CHARS and line not in occ:
                occ[line] = (did, pos)
    out = {}
    for did in sorted(docs):
        parts = docs[did].split("\n")
        kept = [
            ln
            for pos, ln in enumerate(parts)
            if len(ln) < MIN_LINE_CHARS or occ[ln] == (did, pos)
        ]
        out[did] = {
            "doc_id": did,
            "n_lines": len(parts),
            "n_dropped": len(parts) - len(kept),
            "clean_text": "\n".join(kept),
        }
    return out


def _run_line_dedup(spark, docs: dict[int, str]) -> dict[int, dict]:
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    return {r["doc_id"]: r.asDict() for r in line_dedup(df).collect()}


BOILER = "please subscribe to our mailing list today"


def test_line_dedup_matches_brute_force(spark):
    docs = {
        0: f"alpha unique body line zero\n{BOILER}\nshort",
        1: f"{BOILER}\nbeta unique body line one",
        2: f"gamma unique body line two\n{BOILER}\n{BOILER}",
        3: "delta unique body line three",
        4: f"{BOILER}",  # whole doc is one duplicated line
        5: "",  # empty text -> one empty (ineligible) line
    }
    got = _run_line_dedup(spark, docs)
    want = _brute_line_dedup(docs)
    assert got == want
    # the rule's receipts: doc 0 keeps the boilerplate (first packed
    # occurrence), later docs drop every later occurrence — including
    # the within-doc repeat in doc 2
    assert got[0]["n_dropped"] == 0
    assert got[1]["clean_text"] == "beta unique body line one"
    assert got[2]["n_dropped"] == 2
    assert got[4]["clean_text"] == ""
    assert got[5] == {"doc_id": 5, "n_lines": 1, "n_dropped": 0, "clean_text": ""}


def test_line_dedup_short_lines_never_drop(spark):
    short = "ad unit"
    assert len(short) < MIN_LINE_CHARS
    docs = {0: f"{short}\n{short}", 1: short}
    got = _run_line_dedup(spark, docs)
    assert got[0]["n_dropped"] == 0 and got[0]["clean_text"] == f"{short}\n{short}"
    assert got[1]["n_dropped"] == 0


def test_line_dedup_is_idempotent(spark):
    docs = {
        0: f"alpha body line zero\n{BOILER}",
        1: f"{BOILER}\nbeta body line one\n{BOILER}",
    }
    once = _run_line_dedup(spark, docs)
    again = _run_line_dedup(spark, {k: v["clean_text"] for k, v in once.items()})
    for k in docs:
        assert again[k]["n_dropped"] == 0
        assert again[k]["clean_text"] == once[k]["clean_text"]


def _brute_repetition(text: str) -> dict:
    parts = text.split("\n")
    n, nd = len(parts), len(set(parts))
    tc = sum(map(len, parts))
    dc = sum(map(len, set(parts)))

    def frac(a, b):
        return round(a / b, 6) if b > 0 else 0.0

    return {
        "n_lines": n,
        "dup_lines": n - nd,
        "dup_line_frac": frac(n - nd, n),
        "dup_chars": tc - dc,
        "dup_char_frac": frac(tc - dc, tc),
    }


def test_repetition_signals_match_brute_force(spark):
    texts = [
        "same line here\nsame line here\nsame line here",
        "a\nb\nc",
        "one line only",
        "",
        "x\n\n\nx",  # empty lines are lines too
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}
    for i, t in enumerate(texts):
        want = _brute_repetition(t)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v)


def test_repetition_signals_plan_has_no_exchange(spark):
    """Pure narrow map: zero shuffles in the optimized plan."""
    df = spark.createDataFrame([(1, "a\na")], "doc_id long, text string")
    plan = repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_augment_lines_plants_known_structure(spark):
    df = spark.createDataFrame(
        [(i, "body text %d" % i, "src%d" % (i % 2)) for i in range(8)],
        "doc_id long, text string, source string",
    )
    rows = {r["doc_id"]: r["text"] for r in augment_lines(df).collect()}
    parts0 = rows[0].split("\n")
    # doc 0: header, body, footer, footer again (0%4==0), ad
    assert parts0[0] == "all rights reserved by src0"
    assert parts0[2] == parts0[3] == "subscribe to the newsletter edition 0"
    assert parts0[4] == "ad 0"
    assert len(rows[1].split("\n")) == 4  # 1%4 != 0 -> single footer


def test_near_dup_filter_consistent_with_clusters(spark):
    corpus = dedup.augment_corpus(
        spark.createDataFrame(
            [(i, "word%d word%d common text here" % (i % 3, i % 3))
             for i in range(40)],
            "doc_id long, text string",
        ).select("doc_id", "text")
    )
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(spark, corpus).collect()
    }
    out = dedup.near_dup_filter(spark, corpus).collect()
    n_corpus = corpus.count()
    assert len(out) == n_corpus  # full corpus, one row per doc
    for r in out:
        if r["doc_id"] in clusters:
            assert r["cluster_id"] == clusters[r["doc_id"]]
            assert r["kept"] == (r["cluster_id"] == r["doc_id"])
        else:
            assert r["cluster_id"] is None and r["kept"]
    # exactly one survivor per cluster
    survivors = {r["cluster_id"] for r in out if r["kept"] and r["cluster_id"] is not None}
    assert survivors == {cid for cid in clusters.values()}
