"""Unit tests for operators/lm.py (CCNet-style perplexity bucketing):
independent pure-Python recomputation of every score, direction sanity
(reference-like text scores lower nlp than gibberish against the same
LM), and the empty / OOV / threshold edges."""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from mklab_focused_crawler_spark.functions.scoring import det_log10_ratio_py
from mklab_focused_crawler_spark.operators.lm import (
    HEAD_MICRO,
    MICRO,
    MID_MICRO,
    ppl_buckets,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str | None) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def _brute(rows, lm_mod=5):
    """Pure-Python twin over the same hash split — every float op in
    the same order as the engines (det_log10_ratio_py is bit-identical
    to both engine kernels)."""
    vocab: dict[str, int] = {}
    for doc_id, text in rows:
        if _h60(str(doc_id)) % lm_mod == 0:
            for w in _toks(text):
                vocab[w] = vocab.get(w, 0) + 1
    t_tot = sum(vocab.values())
    v_size = len(vocab)
    denom = max(t_tot + v_size, 1)
    out = {}
    for doc_id, text in rows:
        counts: dict[str, int] = {}
        for w in _toks(text):
            counts[w] = counts.get(w, 0) + 1
        n = sum(counts.values())
        nlp = sum(
            c
            * math.floor(
                det_log10_ratio_py(denom, vocab.get(w, 0) + 1) * float(MICRO)
            )
            for w, c in counts.items()
        )
        if n == 0:
            bucket = "empty"
        elif nlp <= n * HEAD_MICRO:
            bucket = "head"
        elif nlp <= n * MID_MICRO:
            bucket = "middle"
        else:
            bucket = "tail"
        out[doc_id] = (n, nlp, bucket)
    return out


def test_scores_match_python_recomputation(spark):
    rows = [
        (i, " ".join(f"w{(i * j) % 23}" for j in range(1 + (i * 7) % 30)))
        for i in range(150)
    ] + [(300, ""), (301, None), (302, "   "), (303, "zqxjk vvwpt")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["nlp_micro"], r["ppl_bucket"])
        for r in ppl_buckets(df).collect()
    }
    want = _brute(rows)
    assert got == want


def test_reference_like_beats_gibberish(spark):
    """Direction: a doc made of the reference slice's words must score
    strictly lower avg-nlp than OOV gibberish under the same LM."""
    common = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, common) for i in range(40)] + [
        (1000, "zzqx jjwv kkpl mmnt"),  # pure OOV
        (1001, common),  # in-vocab probe
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ppl_buckets(df).collect()}
    oov, ref = out[1000], out[1001]
    assert oov["nlp_micro"] * ref["n_tokens"] > ref["nlp_micro"] * oov["n_tokens"]


def test_empty_and_null_docs_bucket_empty(spark):
    df = spark.createDataFrame(
        [(0, "some words here"), (1, ""), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["ppl_bucket"] for r in ppl_buckets(df).collect()}
    assert out[1] == "empty" and out[2] == "empty"
    assert out[0] in {"head", "middle", "tail"}


def test_empty_reference_slice_clamps(spark):
    """No doc hashes into the LM slice → T+V = 0 → clamped denom 1,
    every token OOV at log10(1/1) = 0, everything non-empty is head."""
    rows = [(i, "alpha beta gamma") for i in range(3)]
    keep = [r for r in rows if _h60(str(r[0])) % 5 != 0][:2]
    df = spark.createDataFrame(keep, "doc_id long, text string")
    out = ppl_buckets(df).collect()
    assert all(r["nlp_micro"] == 0 and r["ppl_bucket"] == "head" for r in out)


def test_custom_reference_frame(spark):
    """Production path: an explicit reference corpus replaces the hash
    slice — the LM trains on it alone, and scoring covers ALL docs."""
    ref = spark.createDataFrame(
        [(900, "tea and biscuits with tea")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "tea tea tea"), (2, "quantum flux manifold")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ppl_buckets(docs, reference_docs=ref).collect()}
    # 'tea' has c_w=2 in a 5-token/4-word LM (denom 9):
    # nlp = 3*floor(log10(9/3)*1e6)
    lp_tea = math.floor(det_log10_ratio_py(9, 3) * float(MICRO))
    assert out[1]["nlp_micro"] == 3 * lp_tea
    # every word of doc 2 is OOV: nlp = 3*floor(log10(9/1)*1e6)
    lp_oov = math.floor(det_log10_ratio_py(9, 1) * float(MICRO))
    assert out[2]["nlp_micro"] == 3 * lp_oov
    assert out[1]["nlp_micro"] < out[2]["nlp_micro"]
