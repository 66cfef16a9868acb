"""Unit tests for operators/dsir.py (hashed-bigram importance
weights): independent numpy/python recomputation of every score,
direction sanity on a planted target domain, and plan contracts
(broadcast weight join, no corpus-sized shuffle beyond the per-doc
agg)."""

from __future__ import annotations

import hashlib
import math
import re

from mklab_focused_crawler_spark.functions.scoring import det_log10_ratio_py
from mklab_focused_crawler_spark.operators.dsir import (
    MICRO,
    N_BUCKETS,
    dsir_weights,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _bigram_buckets(text: str) -> list[int]:
    toks = [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]
    return [
        _h60(" ".join(toks[i : i + 2])) % N_BUCKETS
        for i in range(len(toks) - 1)
    ]


def _brute(rows, target_mod=10):
    """Pure-Python DSIR over the same split rule — every float op in
    the same order as the engines (det_log10_ratio_py is bit-identical
    to both engine kernels)."""
    target = [r for r in rows if _h60(str(r[0])) % target_mod == 0]
    raw = [r for r in rows if _h60(str(r[0])) % target_mod != 0]
    t_counts: dict[int, int] = {}
    for _, text in target:
        for b in _bigram_buckets(text):
            t_counts[b] = t_counts.get(b, 0) + 1
    r_counts: dict[int, int] = {}
    doc_counts: dict[int, dict[int, int]] = {}
    for doc_id, text in raw:
        dc = doc_counts.setdefault(doc_id, {})
        for b in _bigram_buckets(text):
            dc[b] = dc.get(b, 0) + 1
            r_counts[b] = r_counts.get(b, 0) + 1
    t_tot = sum(t_counts.values())
    r_tot = sum(r_counts.values())
    L = det_log10_ratio_py
    w_micro = {
        b: math.floor(
            (
                (L(t_counts.get(b, 0) + 1, 1) - L(t_tot + N_BUCKETS, 1))
                - (L(r_b + 1, 1) - L(r_tot + N_BUCKETS, 1))
            )
            * float(MICRO)
        )
        for b, r_b in r_counts.items()
    }
    out = {}
    for doc_id, _ in raw:
        dc = doc_counts[doc_id]
        out[doc_id] = (
            sum(dc.values()),
            sum(c * w_micro[b] for b, c in dc.items()),
        )
    return out


def test_scores_match_python_recomputation(spark):
    rows = [
        (i, " ".join(f"w{(i * j) % 17}" for j in range(2 + (i * 3) % 25)))
        for i in range(120)
    ] + [(200, ""), (201, None), (202, "single")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["lw_micro"])
        for r in dsir_weights(df).collect()
    }
    want = _brute([(i, t) for i, t in rows])
    # zero-gram raw docs score (0, 0)
    for doc_id in got:
        assert got[doc_id] == want.get(doc_id, (0, 0)), (
            doc_id,
            got[doc_id],
            want.get(doc_id),
        )
    assert set(got) == {
        i for i, _ in rows if _h60(str(i)) % 10 != 0
    }


def test_target_like_docs_outscore_off_domain(spark):
    """Plant a bimodal corpus: docs speaking the target dialect must
    get strictly higher weights than off-domain docs."""
    rows = []
    for i in range(300):
        if i % 2 == 0:
            text = " ".join("alpha beta gamma delta".split()[j % 4] for j in range(i % 7, i % 7 + 30))
        else:
            text = " ".join(f"noise{(i * 7 + j) % 50}" for j in range(30))
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # target = the even (dialect) docs; raw = everything
    target = df.filter("doc_id % 2 = 0")
    got = {
        r["doc_id"]: r["lw_micro"]
        for r in dsir_weights(df, target_docs=target).collect()
    }
    dialect = [v for k, v in got.items() if k % 2 == 0]
    noise = [v for k, v in got.items() if k % 2 == 1]
    assert min(dialect) > max(noise)


def test_plan_broadcasts_weights(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "a b c d e", "x", 7) for i in range(50)],
        "doc_id long, text string, source string, extra int",
    ).write.parquet(p)
    plan = (
        dsir_weights(spark.read.parquet(p))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "source" not in read_schema[0], plan
