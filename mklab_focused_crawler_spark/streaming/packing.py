"""Streaming sequence packing: extend the concat-and-chunk map
incrementally as documents arrive.

The batch operator (``operators/packing.sequence_pack``) packs a shard
(= source) by its doc_id total order; its pinned append-only-growth
property — new docs with higher ids only ever EXTEND the tail, never
repack existing chunks — is exactly what makes an incremental twin
possible: per micro-batch, pack only the batch's documents starting
from the shard's persisted running token offset, and the union of all
batches' pieces equals the batch answer over the full corpus
(asserted over adversarial splits in tests).

Contract: per-source doc_id arrival must be monotone ACROSS batches
(the natural log-ingestion order; within a batch any order is fine —
the batch is sorted). An out-of-order batch cannot be packed without
repacking the committed tail, so it raises instead of silently
mispacking (checked against the persisted per-source high-water mark).

Per-batch work ∝ batch size:

- the per-source window runs over the BATCH's rows only;
- the totals table joined in is one row per source (broadcast);
- the pieces append writes only the batch's source partitions.

Replay safety (foreachBatch is at-least-once): the pieces append
carries the batch tag; the totals upsert carries a per-source
``last_tag`` column — a replayed batch skips the tagged pieces append
and folds totals only for sources whose ``last_tag`` differs, so a
crash at ANY point between the two commits replays to the same state
(the monotonicity check also skips already-folded sources, which would
otherwise read as out-of-order on replay).

Reference parity: the reference has no packing stage; this is the
streaming face of the training-data tier (COVERAGE.md "Beyond the
reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..operators.packing import SEQ_LEN
from ..storage.snapshot import SnapshotTable

PIECES_NAME = "pack_pieces"
TOTALS_NAME = "pack_totals"


def _make_pack_tables(store_root: str) -> dict:
    return {
        "pieces": SnapshotTable(store_root, PIECES_NAME, partition_by=("source",)),
        # one row per source — tiny at any corpus size (source = shard)
        "totals": SnapshotTable(store_root, TOTALS_NAME),
    }


def _pack_process_batch(
    tables: dict, batch_df: DataFrame, batch_id: int, seq_len: int
) -> None:
    spark = batch_df.sparkSession
    btag = f"b{batch_id}"
    pieces_t: SnapshotTable = tables["pieces"]
    totals_t: SnapshotTable = tables["totals"]
    L = F.lit(int(seq_len))

    docs = (
        batch_df.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.coalesce(F.col("source"), F.lit("")).alias("source"),
            F.size(tokenize(F.coalesce(F.col("text"), F.lit(""))))
            .cast("long")
            .alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .persist()
    )
    try:
        # per-source batch stats drive BOTH the contract check and the
        # idempotent totals fold — one tiny aggregate (rows = sources)
        stats = docs.groupBy("source").agg(
            F.min("doc_id").alias("b_min"),
            F.max("doc_id").alias("b_max"),
            F.sum("n_tokens").alias("b_tokens"),
        )
        if totals_t.exists():
            totals = totals_t.read(spark)
        else:
            totals = spark.createDataFrame(
                [],
                "source string, cum_tokens long, max_doc_id long, last_tag string",
            )
        st = stats.join(totals, "source", "left").select(
            "source",
            "b_min",
            "b_max",
            "b_tokens",
            F.coalesce(F.col("cum_tokens"), F.lit(0)).alias("cum_tokens"),
            "max_doc_id",
            "last_tag",
        )
        rows = st.collect()  # one row per source touched by the batch
        if not rows:
            return
        fresh = [r for r in rows if r["last_tag"] != btag]
        stale = [
            r
            for r in fresh
            if r["max_doc_id"] is not None and r["b_min"] <= r["max_doc_id"]
        ]
        if stale:
            bad = ", ".join(
                f"{r['source']}: batch min doc_id {r['b_min']} <= committed "
                f"high-water {r['max_doc_id']}"
                for r in stale
            )
            raise ValueError(
                "out-of-order arrival — packing is defined by the per-source "
                f"doc_id total order and the tail is already committed ({bad})"
            )

        if fresh and not pieces_t.has_tag(btag):
            offsets = spark.createDataFrame(
                [(r["source"], r["cum_tokens"]) for r in fresh],
                "source string, offset long",
            )
            w = (
                Window.partitionBy("source")
                .orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            packed = (
                docs.join(F.broadcast(offsets), "source")  # drops replayed sources
                .withColumn(
                    "cum_before",
                    F.col("offset") + F.sum("n_tokens").over(w) - F.col("n_tokens"),
                )
                .select(
                    "source",
                    "doc_id",
                    "n_tokens",
                    "cum_before",
                    F.explode(
                        F.sequence(
                            F.floor(F.col("cum_before") / L),
                            F.floor(
                                (F.col("cum_before") + F.col("n_tokens") - 1) / L
                            ),
                        )
                    ).alias("chunk_id"),
                )
            )
            gstart = F.greatest(F.col("cum_before"), F.col("chunk_id") * L)
            gend = F.least(
                F.col("cum_before") + F.col("n_tokens"),
                (F.col("chunk_id") + 1) * L,
            )
            out = packed.select(
                "source",
                F.col("chunk_id").cast("long").alias("chunk_id"),
                "doc_id",
                (gstart - F.col("cum_before")).cast("int").alias("piece_start"),
                (gend - gstart).cast("int").alias("piece_len"),
            )
            # docs is non-empty and every kept doc has >=1 piece, so the
            # 0-row partitioned-append hazard cannot arise here
            pieces_t.append(out, tag=btag)

        if fresh:
            updates = spark.createDataFrame(
                [
                    (
                        r["source"],
                        r["cum_tokens"] + r["b_tokens"],
                        r["b_max"],
                        btag,
                    )
                    for r in fresh
                ],
                "source string, cum_tokens long, max_doc_id long, last_tag string",
            )
            totals_t.merge(spark, updates, "source")
    finally:
        docs.unpersist()


def run_streaming_sequence_pack(
    stream: DataFrame,
    store_root: str,
    checkpoint_dir: str,
    seq_len: int = SEQ_LEN,
    compact_every: int | None = None,
) -> SnapshotTable:
    """documents stream (doc_id, source, text) → source-partitioned
    pieces table whose union equals batch ``sequence_pack`` over all
    ingested documents."""
    tables = _make_pack_tables(store_root)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _pack_process_batch(tables, batch_df, batch_id, seq_len)
        if compact_every and (batch_id + 1) % compact_every == 0:
            pieces_t: SnapshotTable = tables["pieces"]
            frag = pieces_t.fragmented_partitions("source")
            if frag:
                pieces_t.compact_partitions(batch_df.sparkSession, "source", frag)
            # only the current batch can still replay (checkpoint horizon)
            pieces_t.prune_tags([f"b{batch_id}"])
            pieces_t.expire_snapshots(keep_last=1)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return tables["pieces"]


def read_streaming_pack_pieces(spark: SparkSession, store_root: str) -> DataFrame:
    """The accumulated packing map, batch-op column order."""
    return (
        SnapshotTable(store_root, PIECES_NAME, partition_by=("source",))
        .read(spark)
        .select("source", "chunk_id", "doc_id", "piece_start", "piece_len")
    )
