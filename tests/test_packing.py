"""Unit tests for operators/packing.py (sequence packing): coverage /
fullness invariants, determinism under growth, window-partitioning
plan contract."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from mklab_focused_crawler_spark.operators.packing import sequence_pack


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _toks(text):
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def test_pieces_cover_every_token_exactly_once(spark):
    rows = [
        (i, f"s{i % 3}", " ".join(f"w{j}" for j in range((i * 7) % 23)))
        for i in range(60)
    ]
    out = sequence_pack(_docs(spark, rows), seq_len=16).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, source, text in rows:
        n = len(_toks(text))
        pieces = sorted(by_doc.get(doc_id, []), key=lambda r: r["piece_start"])
        if n == 0:
            assert pieces == [], doc_id
            continue
        # contiguous, gapless, starts at 0, ends at n
        assert pieces[0]["piece_start"] == 0
        pos = 0
        for p in pieces:
            assert p["piece_start"] == pos, (doc_id, pieces)
            assert p["piece_len"] >= 1
            pos += p["piece_len"]
        assert pos == n, (doc_id, pos, n)
        # consecutive pieces land in consecutive chunks
        chunks = [p["chunk_id"] for p in pieces]
        assert chunks == list(range(chunks[0], chunks[0] + len(chunks)))


def test_every_chunk_but_the_last_is_full(spark):
    rows = [
        (i, f"s{i % 2}", " ".join(f"w{j}" for j in range(5 + (i * 11) % 40)))
        for i in range(40)
    ]
    df = sequence_pack(_docs(spark, rows), seq_len=32)
    sums = (
        df.groupBy("source", "chunk_id")
        .agg(F.sum("piece_len").alias("filled"))
        .collect()
    )
    last = {}
    for r in sums:
        last[r["source"]] = max(last.get(r["source"], -1), r["chunk_id"])
    for r in sums:
        if r["chunk_id"] != last[r["source"]]:
            assert r["filled"] == 32, r
        else:
            assert 1 <= r["filled"] <= 32, r


def test_append_only_growth_never_repacks_existing_chunks(spark):
    """New docs with HIGHER doc_ids only ever extend the tail: every
    (doc, piece, chunk) row from the small corpus survives unchanged in
    the grown corpus (the property that makes incremental packing of an
    append-only corpus valid)."""
    rows = [
        (i, "s0", " ".join(f"w{j}" for j in range(3 + (i * 5) % 20)))
        for i in range(30)
    ]
    small = {
        tuple(r) for r in sequence_pack(_docs(spark, rows[:20]), seq_len=16).collect()
    }
    big = {
        tuple(r) for r in sequence_pack(_docs(spark, rows), seq_len=16).collect()
    }
    assert small <= big


def test_windows_are_partitioned_by_source(spark, tmp_path):
    """The only Exchange is the hash partition by source for the window
    — never a single-partition global sort (the CLAUDE.md rule)."""
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "a b c", "x", 7)],
        "doc_id long, text string, source string, extra int",
    ).write.parquet(p)
    plan = (
        sequence_pack(spark.read.parquet(p))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(source" in plan, plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "extra" not in read_schema[0], plan
