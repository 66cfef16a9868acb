"""Streaming embedding ingestion: an incremental IVF vector index.

The batch ANN path (``operators/similarity.ivf_topk``) re-assigns the
whole corpus per query; a training-data pipeline ingests embeddings
continuously. This module maintains the FAISS-shaped inverted-list
layout AS A TABLE: each micro-batch of vectors is quantized, assigned
to its nearest coarse centroid (the codebook is a plan literal —
broadcast by construction, zero shuffle for assignment), and appended
to a ``list_id``-partitioned SnapshotTable. Queries prune to the
n_probe nearest lists' partitions — the storage layout IS the index.

Assignment per row is the same pure-int64 function the batch operator
uses, so querying the streamed store is EXACTLY the batch answer on
the union of ingested batches (asserted in tests), independent of how
arrival split the corpus.

Reference parity: VisualIndexerBolt.java hands vectors to an external
index service at ingestion; here the index is Spark-native storage +
a partition-pruned join (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.similarity import (
    N_PROBE,
    PROBE_MOD,
    TOP_K,
    _cosine_display,
    _ivf_ranked_lists,
    qdot,
    qnorm2,
    quantized,
)
from ..storage.snapshot import SnapshotTable

INDEX_NAME = "ivf_lists"


def run_streaming_ivf_ingest(
    stream: DataFrame,
    store_root: str,
    checkpoint_dir: str,
    centroids: list[list[int]] | None = None,
    compact_every: int | None = None,
) -> SnapshotTable:
    """embeddings stream (vec_id, embedding) → list-partitioned index.

    Stored row: (vec_id, q, n2, list_id) — the quantized vector and its
    norm ride the index so queries never touch the raw float columns.
    Appends only write the touched list partitions."""
    index = SnapshotTable(store_root, INDEX_NAME, partition_by=("list_id",))

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        q = batch_df.filter(F.col("embedding").isNotNull()).select(
            F.col("vec_id").cast("long").alias("vec_id"),
            quantized(F.col("embedding")).alias("q"),
        ).withColumn("n2", qnorm2(F.col("q")))
        assigned = q.select(
            "vec_id",
            "q",
            "n2",
            F.get(_ivf_ranked_lists(F.col("q"), centroids), 0).alias("list_id"),
        ).persist()
        # empty guard: a 0-row write to a partitioned table creates a
        # data dir with no parquet files, and every later per-dir union
        # read would fail schema inference. Tag = replay idempotence
        # (an untagged re-append would duplicate vectors and let the
        # same neighbor occupy two top-k ranks).
        if assigned.count() > 0:
            index.append(assigned, tag=f"b{batch_id}")
        assigned.unpersist()
        if compact_every and (batch_id + 1) % compact_every == 0:
            # incremental maintenance: fold only the lists fragmented
            # since the last pass; untouched lists' files don't move
            # (see streaming/dedup.py rationale)
            frag = index.fragmented_partitions("list_id")
            if frag:
                index.compact_partitions(
                    batch_df.sparkSession, "list_id", frag
                )
            # only the current batch can still replay — older tags are
            # past the checkpoint horizon (interface.prune_tags rule)
            index.prune_tags([f"b{batch_id}"])
            index.expire_snapshots(keep_last=1)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return index


def ivf_index_topk(
    spark: SparkSession,
    store_root: str,
    k: int = TOP_K,
    n_probe: int = N_PROBE,
    centroids: list[list[int]] | None = None,
    probe_mod: int = PROBE_MOD,
) -> DataFrame:
    """Multi-probe top-k over the streamed index — same output schema
    and values as batch ``ivf_topk`` over the full ingested corpus
    (probes = stored vec_id % probe_mod == 0; their ranked lists are
    recomputed from the stored quantized vector, a pure projection).

    The candidate join is ONE equi-join on list_id against the
    partitioned store; a single-list probe prunes to one partition
    directory at scan time."""
    idx = SnapshotTable(store_root, INDEX_NAME, partition_by=("list_id",)).read(spark)
    probes = idx.filter(F.col("vec_id") % probe_mod == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("q").alias("pq"),
        F.col("n2").alias("pn2"),
        F.explode(
            F.slice(_ivf_ranked_lists(F.col("q"), centroids), 1, n_probe)
        ).alias("list_id"),
    )
    cand = probes.join(idx, "list_id").filter(F.col("vec_id") != F.col("probe_id"))
    scored = cand.select(
        "probe_id",
        "vec_id",
        "list_id",
        qdot(F.col("pq"), F.col("q")).alias("dot_q"),
        "pn2",
        "n2",
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("dot_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "vec_id",
            "list_id",
            "rank",
            "dot_q",
            _cosine_display(F.col("dot_q"), F.col("pn2"), F.col("n2")).alias(
                "cosine"
            ),
        )
    )
