"""Streaming exact deduplication: first-seen-wins content dedup over a
document stream with ``applyInPandasWithState``.

Reference parity: StatusCheckBolt's seen-gate (StatusCheckBolt.java —
drop what was already processed) applied to CONTENT instead of URL, at
ingestion time. This is the streaming twin of
``operators/dedup.exact_dedup``: same normalization (ascii_lower +
ASCII-space trim, md5 content hash), same canonical rule (min doc_id
per content hash), evaluated incrementally per micro-batch instead of
as one batch groupBy. The LLM-pipeline use case is dedup-during-
ingestion: mark duplicates as documents arrive rather than re-scanning
the corpus.

State: keyed by ``text_hash``, one row per distinct content — the
sorted ``members`` array (every doc_id seen with this content). Total
state size is O(corpus), the same information the batch groupBy
shuffles; a production deployment bounds it with a state TTL
(``GroupStateTimeout``) at the cost of re-admitting content whose whole
group aged out — the knob is deliberately NOT defaulted here because
the batch twin has no such horizon.

Emission contract (same family as ``streaming_trend_candidates``):
**at-least-once per doc_id, monotonically refined** — whenever a
content group gains members, ALL member rows re-emit with the updated
(canonical_doc_id, dup_count). canonical_doc_id only ever decreases
(min over a growing set) and dup_count only ever grows, so a keyed
upsert sink by doc_id (min canonical, max count — or simply
last-writer-wins, emissions are totally refined) converges to exactly
the batch twin's output once all documents have arrived; re-delivered
doc_ids (at-least-once sources) change nothing and emit nothing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.text import ascii_lower

OUTPUT_SCHEMA = "doc_id long, text_hash string, canonical_doc_id long, dup_count long"
STATE_SCHEMA = "members array<bigint>"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    members: set[int] = set()
    if state.exists:
        (ms,) = state.get
        members = set(int(m) for m in ms)
    new: set[int] = set()
    for pdf in pdfs:
        new.update(int(x) for x in pdf["doc_id"])
    new -= members
    if not new:
        # pure re-delivery: state and prior emissions are already right
        yield pd.DataFrame(
            [], columns=["doc_id", "text_hash", "canonical_doc_id", "dup_count"]
        )
        return
    members |= new
    state.update((sorted(members),))
    canonical = min(members)
    n = len(members)
    # re-emit EVERY member: a new smaller doc_id retroactively changes
    # earlier members' canonical, and dup_count grows for all of them
    yield pd.DataFrame(
        [(m, key[0], canonical, n) for m in sorted(members)],
        columns=["doc_id", "text_hash", "canonical_doc_id", "dup_count"],
    )


def streaming_exact_dedup(stream: DataFrame) -> DataFrame:
    """document stream (doc_id, text) → refined dedup rows per batch.

    The content hash is computed JVM-side before keying (one md5 per
    row, Arrow never carries the text into Python), exactly as the
    batch twin: md5(ascii_lower(trim(text))). Null texts are dropped —
    the dedup corpus contract (operators/dedup.augment_corpus)."""
    hashed = stream.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(ascii_lower(F.trim(F.col("text")))).alias("text_hash"),
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
