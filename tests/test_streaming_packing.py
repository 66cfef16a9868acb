"""Streaming sequence packing (streaming/packing.py): exact batch
parity over adversarial micro-batch splits (including chunks that span
batch boundaries), replay idempotence at the op level, out-of-order
rejection, and per-batch driver work bounds."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_DIR


def _corpus_pdf(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _stream_from(spark, in_dir):
    return (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )


def _batch_answer(spark, seq_len):
    from mklab_focused_crawler_spark.operators.packing import sequence_pack

    full = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return {tuple(r) for r in sequence_pack(full, seq_len=seq_len).collect()}


def test_streaming_pack_matches_batch(spark, tmp_path):
    """Three uneven doc_id-range batches (monotone per source — the
    log-ingestion contract): the accumulated pieces table must equal
    batch sequence_pack over the whole corpus EXACTLY, which forces
    chunks spanning batch boundaries to continue at the right offset."""
    from mklab_focused_crawler_spark.streaming.packing import (
        read_streaming_pack_pieces,
        run_streaming_sequence_pack,
    )
    from tests.test_streaming import _write_batches

    pdf = _corpus_pdf(spark)
    n = len(pdf)
    # uneven, adversarial cuts: a tiny first batch, a big middle, a tail
    frames = [pdf.iloc[: n // 10], pdf.iloc[n // 10 : 4 * n // 5], pdf.iloc[4 * n // 5 :]]
    in_dir = tmp_path / "in_pack"
    _write_batches(in_dir, frames)

    store = str(tmp_path / "pack_store")
    run_streaming_sequence_pack(
        _stream_from(spark, in_dir), store, str(tmp_path / "ckpt"), seq_len=64,
        compact_every=2,
    )
    got = {tuple(r) for r in read_streaming_pack_pieces(spark, store).collect()}
    want = _batch_answer(spark, seq_len=64)
    assert got == want and len(want) > 0


def test_streaming_pack_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a committed batch (op
    level) must change neither the pieces table nor the totals."""
    from mklab_focused_crawler_spark.streaming.packing import (
        _make_pack_tables,
        _pack_process_batch,
    )

    pdf = _corpus_pdf(spark)
    b0, b1 = pdf.iloc[: len(pdf) // 2], pdf.iloc[len(pdf) // 2 :]
    tables = _make_pack_tables(str(tmp_path / "store"))

    def run(frame, bid):
        _pack_process_batch(
            tables, spark.createDataFrame(frame), bid, seq_len=64
        )

    run(b0, 0)
    run(b1, 1)
    pieces = sorted(
        tuple(r) for r in tables["pieces"].read(spark).collect()
    )
    totals = sorted(tuple(r) for r in tables["totals"].read(spark).collect())
    # replay the CURRENT batch (the only one inside the checkpoint
    # horizon — older batches are committed offsets and never redeliver)
    run(b1, 1)
    run(b1, 1)
    assert sorted(tuple(r) for r in tables["pieces"].read(spark).collect()) == pieces
    assert sorted(tuple(r) for r in tables["totals"].read(spark).collect()) == totals


def test_streaming_pack_rejects_out_of_order(spark, tmp_path):
    """A batch whose per-source doc_ids fall at or below the committed
    high-water mark cannot be packed without repacking the committed
    tail — it must raise, never silently mispack."""
    from mklab_focused_crawler_spark.streaming.packing import (
        _make_pack_tables,
        _pack_process_batch,
    )

    tables = _make_pack_tables(str(tmp_path / "store"))
    rows = pd.DataFrame(
        {"doc_id": [10, 11], "source": ["s0", "s0"], "text": ["a b c", "d e"]}
    )
    _pack_process_batch(tables, spark.createDataFrame(rows), 0, seq_len=4)
    late = pd.DataFrame({"doc_id": [5], "source": ["s0"], "text": ["x y"]})
    with pytest.raises(ValueError, match="out-of-order"):
        _pack_process_batch(tables, spark.createDataFrame(late), 1, seq_len=4)
    # a different source is unaffected by s0's high-water mark
    other = pd.DataFrame({"doc_id": [5], "source": ["s1"], "text": ["x y"]})
    _pack_process_batch(tables, spark.createDataFrame(other), 2, seq_len=4)


def test_streaming_pack_crash_between_commits_replays_clean(spark, tmp_path):
    """Crash AFTER the pieces append but BEFORE the totals merge: the
    replay must skip the tagged pieces append yet still fold totals —
    and end bit-identical to the no-crash run."""
    from mklab_focused_crawler_spark.streaming.packing import (
        _make_pack_tables,
        _pack_process_batch,
    )
    from mklab_focused_crawler_spark.storage.snapshot import SnapshotTable

    pdf = _corpus_pdf(spark)
    b0, b1 = pdf.iloc[:30], pdf.iloc[30:60]
    store = str(tmp_path / "store")
    tables = _make_pack_tables(store)
    _pack_process_batch(tables, spark.createDataFrame(b0), 0, seq_len=64)

    # simulate the crash: run batch 1 against a totals table that
    # refuses the merge, leaving pieces committed but totals stale
    class _CrashingTotals(SnapshotTable):
        def merge(self, *a, **k):  # noqa: D401
            raise RuntimeError("crash before totals commit")

    crashing = dict(tables)
    crashing["totals"] = _CrashingTotals(store, "pack_totals")
    with pytest.raises(RuntimeError):
        _pack_process_batch(crashing, spark.createDataFrame(b1), 1, seq_len=64)
    assert tables["pieces"].has_tag("b1")

    # replay with the healthy tables (at-least-once redelivery)
    _pack_process_batch(tables, spark.createDataFrame(b1), 1, seq_len=64)

    # reference: a run that never crashed
    ref = _make_pack_tables(str(tmp_path / "ref_store"))
    _pack_process_batch(ref, spark.createDataFrame(b0), 0, seq_len=64)
    _pack_process_batch(ref, spark.createDataFrame(b1), 1, seq_len=64)

    got = sorted(tuple(r) for r in tables["pieces"].read(spark).collect())
    want = sorted(tuple(r) for r in ref["pieces"].read(spark).collect())
    assert got == want
    gt = sorted(tuple(r) for r in tables["totals"].read(spark).collect())
    wt = sorted(tuple(r) for r in ref["totals"].read(spark).collect())
    assert gt == wt
