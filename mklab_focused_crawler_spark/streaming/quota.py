"""Streaming domain quota: an incremental per-source survivor set.

The batch operator (``operators/sampling.domain_quota``) keeps the
``quota`` hash-smallest documents per source. That kept set is a
MONOTONE FOLD: top-k(A ∪ B) = top-k(top-k(A) ∪ B), so at ingestion the
quota is maintainable as a bounded survivor table — per micro-batch,
union the batch's (salt-capped) candidates with the stored survivors of
the touched source buckets and re-rank. Properties at 100 TB:

- **State ∝ sources, not corpus**: the store holds ≤ quota rows per
  source, however long the stream runs; text never enters the store
  (project to (doc_id, source, h) first).
- **Partition-pruned fold**: the store is bucketed by
  ``pmod(xxhash64(source), N_BUCKETS)``; a batch reads and rewrites
  ONLY the buckets its sources hash into (``read_partitions`` +
  ``replace_partitions``) — quiet buckets' files never move, the same
  incremental-index contract as the LSH band and IVF list stores.
- **Replay-idempotent by construction — no tag needed**: re-folding an
  already-folded batch re-ranks the same set (the union is deduped on
  doc_id before ranking), unlike additive counts (streaming/vocab.py)
  where a replayed append would double totals and the idempotence tag
  is load-bearing. ``replace_partitions`` commits atomically, so a
  crash leaves either the old or the new survivor set, both valid.
- **Skew-safe batch stage**: within a batch the per-source candidate
  cap uses the same salted window as the batch operator (parallelism =
  S × sources, no single-task sort of a hot domain).

Reference analog: the per-host frontier cap of the crawler's politeness
scheduler (SURVEY §2.2 MongoDbSpout poll windows) — no single host may
dominate the scheduled set; here the cap is over training-corpus
sources instead of crawl hosts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sampling import DOMAIN_QUOTA, hashed_docs, quota_candidates
from ..storage.snapshot import SnapshotTable

QUOTA_NAME = "quota_survivors"
N_BUCKETS = 64


def _src_bucket() -> F.Column:
    # engine-internal bucketing (never compared against DuckDB);
    # xxhash64(NULL) is the fixed seed value, so NULL sources land in
    # one well-defined bucket rather than a null partition dir
    return F.pmod(F.xxhash64(F.col("source")), F.lit(N_BUCKETS))


def _batch_candidates(batch_df: DataFrame, quota: int) -> DataFrame:
    """Salt-capped per-source candidates from one micro-batch — the
    SAME hash/ordering/cap stage as the batch operator (shared helpers,
    so draw or tie-break changes can't silently break parity)."""
    return quota_candidates(hashed_docs(batch_df), quota).withColumn(
        "src_bucket", _src_bucket()
    )


def fold_quota_batch(
    table: SnapshotTable, batch_df: DataFrame, quota: int = DOMAIN_QUOTA
) -> None:
    """One monotone fold: survivors' = top-quota(survivors ∪ batch) per
    source, touching only the batch's source buckets."""
    spark = batch_df.sparkSession
    cand = _batch_candidates(batch_df, quota).persist()
    try:
        touched = [r["src_bucket"] for r in cand.select("src_bucket").distinct().collect()]
        if not touched:
            return  # empty batch: never write a 0-row partition frame
        old = table.read_partitions(spark, "src_bucket", touched)
        merged = cand if old is None else cand.unionByName(old)
        # dedupe BEFORE ranking: on a crash-replay the batch's docs are
        # already in the store; a duplicate row would occupy two ranks
        # and evict a legitimate survivor
        merged = merged.dropDuplicates(["doc_id"])
        w = Window.partitionBy("source").orderBy("h", "doc_id")
        survivors = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= quota)
            .drop("rn")
        )
        table.replace_partitions(spark, survivors, {"src_bucket": touched})
    finally:
        cand.unpersist()


def run_streaming_domain_quota(
    stream: DataFrame,
    store_root: str,
    checkpoint_dir: str,
    quota: int = DOMAIN_QUOTA,
    expire_every: int | None = None,
) -> SnapshotTable:
    """documents stream (doc_id, source) → bucket-partitioned survivor
    table holding each source's quota-smallest (h, doc_id) documents.
    The final kept set equals batch ``domain_quota(...)``'s kept rows on
    the union of batches, independent of arrival order/splits."""
    table = SnapshotTable(store_root, QUOTA_NAME, partition_by=("src_bucket",))

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        fold_quota_batch(table, batch_df, quota)
        if expire_every and (batch_id + 1) % expire_every == 0:
            # each fold rewrites its touched buckets wholesale, so live
            # data never fragments — only manifest history needs pruning
            table.expire_snapshots(keep_last=1)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table


def streaming_quota_kept(spark: SparkSession, store_root: str) -> DataFrame:
    """(doc_id, source) — the kept set over everything ingested; equals
    ``domain_quota(docs).filter("kept")`` on the unioned batches."""
    t = SnapshotTable(store_root, QUOTA_NAME, partition_by=("src_bucket",))
    return t.read(spark).select("doc_id", "source")
