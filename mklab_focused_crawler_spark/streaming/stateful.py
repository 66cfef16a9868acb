"""Custom stateful streaming: rolling-count trend detection with
``applyInPandasWithState``.

Reference parity: ``EventDetectionBolt`` + ``utils/Snapshots.java:5-23``
keep a bounded FIFO of the last N window snapshots per term and flag
terms whose counts grow monotonically and acceleratingly across all N
(EventDetectionBolt.java:103-141). In Storm that state lives in a bolt
field behind a sleep-loop thread; here it is **typed, fault-tolerant
streaming state**: keyed by term, schema-declared, checkpointed, updated
once per micro-batch with Arrow-batched pandas — the
``applyInPandasWithState`` shape SURVEY §1.4 prescribes for the
Snapshots ring buffer.

Candidate rule (count-based formulation of conditions a-c; the batch
idf formulation lives in operators/trending.detect_events): a term is a
candidate at its newest window iff its last N_WINDOWS windows are
consecutive, counts are monotone non-decreasing, and successive deltas
are non-decreasing (accelerating).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from ..operators.trending import EVENT_WINDOW_MS, N_WINDOWS

OUTPUT_SCHEMA = "term string, window_idx long, cnt long"
STATE_SCHEMA = "windows array<bigint>, counts array<bigint>"


def candidate_from_ring(ws: list[int], cs: list[int]) -> bool:
    """The pure rule — shared by the streaming op and the batch twin."""
    if len(ws) < N_WINDOWS or ws[-1] - ws[-N_WINDOWS] != N_WINDOWS - 1:
        return False
    c = cs[-N_WINDOWS:]
    mono = all(c[i] <= c[i + 1] for i in range(N_WINDOWS - 1))
    d = [c[i + 1] - c[i] for i in range(N_WINDOWS - 1)]
    accel = all(d[i] <= d[i + 1] for i in range(len(d) - 1))
    return mono and accel


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    ring: dict[int, int] = {}
    if state.exists:
        ws, cs = state.get
        ring = dict(zip(ws, cs))
    for pdf in pdfs:
        for w, n in pdf.groupby("window_idx").size().items():
            ring[int(w)] = ring.get(int(w), 0) + int(n)
    ws = sorted(ring)[-N_WINDOWS:]  # Snapshots FIFO: keep last N
    cs = [ring[w] for w in ws]
    state.update((ws, cs))
    rows: list[tuple[Any, ...]] = []
    if candidate_from_ring(ws, cs):
        rows.append((key[0], ws[-1], cs[-1]))
    yield pd.DataFrame(rows, columns=["term", "window_idx", "cnt"])


def streaming_trend_candidates(stream: DataFrame) -> DataFrame:
    """events stream (ts, event_type) → candidate rows per micro-batch.

    Keyed state by term; window index = epoch // EVENT_WINDOW_MS.

    Emission contract: **at-least-once per (term, window_idx), counts
    monotonically refined** — if a window's events span micro-batches,
    the candidate row is re-emitted with the updated (higher) count each
    time the rule holds. The intended sink is a keyed upsert by
    (term, window_idx) (the reference's Mongo writes are upserts too);
    after all events arrive, the upserted row equals the batch twin's.
    Like the reference's alert semantics (EventDetectionBolt fires when
    the condition holds at flush time), an emitted candidate is never
    retracted if late-arriving events for OLDER windows break the
    monotone condition retroactively."""
    keyed = stream.select(
        F.col("event_type").alias("term"),
        (F.unix_millis(F.col("ts").cast("timestamp")) / EVENT_WINDOW_MS)
        .cast("long")
        .alias("window_idx"),
    )
    return keyed.groupBy("term").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_trend_candidates(events: DataFrame) -> DataFrame:
    """Batch twin of the streaming rule, evaluated at each term's newest
    window over its last N_WINDOWS ring — for stream/batch parity
    tests."""
    base = events.select(
        F.col("event_type").alias("term"),
        (F.unix_millis(F.col("ts").cast("timestamp")) / EVENT_WINDOW_MS)
        .cast("long")
        .alias("window_idx"),
    )
    counts = base.groupBy("term", "window_idx").agg(F.count(F.lit(1)).alias("cnt"))
    rows = counts.collect()
    per_term: dict[str, dict[int, int]] = {}
    for r in rows:
        per_term.setdefault(r["term"], {})[r["window_idx"]] = r["cnt"]
    out = []
    for term, ring in per_term.items():
        ws = sorted(ring)[-N_WINDOWS:]
        cs = [ring[w] for w in ws]
        if candidate_from_ring(ws, cs):
            out.append((term, ws[-1], cs[-1]))
    spark = events.sparkSession
    schema = "term string, window_idx long, cnt long"
    return spark.createDataFrame(out, schema) if out else spark.createDataFrame([], schema)
