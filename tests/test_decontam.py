"""Unit tests for operators/decontam.py (benchmark decontamination):
planted 13-gram overlap semantics, the explicit-eval-frame path, edge
cases, and the broadcast-only plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from mklab_focused_crawler_spark.operators.decontam import decontaminate

BASE = " ".join(f"w{i}" for i in range(20))  # 20 tokens → has 13-grams


def test_planted_overlap_with_explicit_eval_frame(spark):
    """A train doc embedding any eval 13-gram is contaminated; sharing
    only a 12-token window is not."""
    eval_df = spark.createDataFrame([(100, BASE)], "doc_id long, text string")
    tok = BASE.split()
    full13 = " ".join(tok[:13])
    only12 = " ".join(tok[:12])
    train = spark.createDataFrame(
        [
            (1, f"prefix {full13} suffix"),      # contains an eval 13-gram
            (2, f"prefix {only12} different"),   # 12 shared tokens only
            (3, "completely unrelated text"),
            (4, None),                            # null text → never flagged
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(train, eval_docs=eval_df).collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: False}


def test_boundary_spanning_gram_is_caught(spark):
    """Overlap detection is positional, not prefix-anchored: a 13-gram
    from the MIDDLE of an eval doc flags a train doc too."""
    eval_df = spark.createDataFrame([(100, BASE)], "doc_id long, text string")
    mid13 = " ".join(BASE.split()[5:18])
    train = spark.createDataFrame(
        [(1, f"a b {mid13} c d")], "doc_id long, text string"
    )
    assert decontaminate(train, eval_docs=eval_df).collect()[0]["contaminated"]


def test_derived_split_excludes_eval_docs_from_output(spark):
    """Default mode carves the eval set out of the corpus: eval ids are
    absent from the output, every train id present exactly once, and an
    exact duplicate of an eval doc is contaminated."""
    rows = [(i, f"doc {i} " + BASE) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = decontaminate(df, eval_mod=4).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids)) and 0 < len(ids) < 40
    # plant an exact copy of one eval doc into the train side
    eval_ids = set(range(40)) - set(ids)
    some_eval = min(eval_ids)
    df2 = df.union(
        spark.createDataFrame(
            [(1000, f"doc {some_eval} " + BASE)], "doc_id long, text string"
        )
    )
    got = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(df2, eval_mod=4).collect()
    }
    assert got[1000] is True


def test_plan_never_shuffles_the_corpus(spark):
    """Both joins must be broadcast (the eval gram set and the
    contaminated-id set are the small sides by contract) — the corpus
    itself never enters a SortMergeJoin or a join shuffle."""
    df = spark.createDataFrame(
        [(i, BASE) for i in range(10)], "doc_id long, text string"
    )
    plan = decontaminate(df)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
