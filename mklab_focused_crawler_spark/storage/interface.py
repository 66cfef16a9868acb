"""The storage seam: one abstract surface for snapshot-versioned tables.

Everything in the engine that persists state (crawl loop, updater
operators, streaming sinks) programs against :class:`VersionedTable` —
eleven operations, each with a 1:1 Iceberg equivalent. Two
implementations exist:

- :class:`~.snapshot.SnapshotTable` — the parquet + manifest stand-in
  (no dependencies beyond Spark; what this sandbox runs).
- :class:`~.iceberg.IcebergTable` — the real-catalog adapter
  (environment-gated: this sandbox's pyspark 4.1.2 ships no Iceberg
  runtime jar — verified in VERDICT r2 — so the adapter raises a clear
  gate error at construction; its method bodies carry the actual
  Iceberg SQL/API mapping so wiring a catalog is a config change, not
  a rewrite).

The operation set is the closed union of what the engine actually
calls (grep-audited): exists/overwrite/append/has_tag/append_arrow/
read/read_partitions/read_appended/replace_partitions/merge/
merge_if_absent/rollback_to/drop + current_snapshot.
tests/test_storage_seam.py pins that audit — adding a call site with a
new method must extend the interface first.
"""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame, SparkSession


class VersionedTable(abc.ABC):
    """Snapshot-versioned table with atomic commits and time travel.

    Iceberg mapping (per method):

    ==================== ==============================================
    operation            Iceberg equivalent
    ==================== ==============================================
    current_snapshot     table.currentSnapshot().snapshotId()
    exists               catalog.tableExists(ident)
    overwrite            INSERT OVERWRITE (full) / CREATE OR REPLACE
    append               append snapshot (df.writeTo(t).append(),
                         tag via snapshot-property option on the same
                         commit)
    has_tag              snapshots-metadata summary lookup
    append_arrow         same append; small driver-local batch
    read                 SELECT ... [VERSION AS OF <snapshot>]
    read_partitions      read + partition-column IN filter
                         (manifest-level partition pruning)
    read_appended        incremental scan (start-snapshot-id = parent)
    replace_partitions   dynamic partition overwrite
                         (writeTo(t).overwritePartitions())
    merge                MERGE INTO t USING u ON key
                         WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT
    merge_if_absent      MERGE INTO ... WHEN NOT MATCHED INSERT (only)
    rollback_to          CALL catalog.system.rollback_to_snapshot(...)
    compact              CALL catalog.system.rewrite_data_files(...)
    compact_partitions   CALL catalog.system.rewrite_data_files(
                         ..., where => "col IN (...)")
    fragmented_partitions GROUP BY partition HAVING count(*) >= N over
                         the <table>.files metadata table
    expire_snapshots     CALL catalog.system.expire_snapshots(...)
    drop                 DROP TABLE
    ==================== ==============================================
    """

    @abc.abstractmethod
    def current_snapshot(self) -> int | None: ...

    @abc.abstractmethod
    def exists(self) -> bool: ...

    @abc.abstractmethod
    def overwrite(self, df: DataFrame) -> int: ...

    @abc.abstractmethod
    def append(self, df: DataFrame, tag: str | None = None) -> int:
        """Add rows. ``tag`` makes the append idempotent for
        at-least-once writers: a tag the table has already committed is
        a no-op. The tag must commit ATOMICALLY with the data — Iceberg:
        a snapshot summary property stamped onto the append commit
        itself (``writeTo().option("snapshot-property.vt.tag", tag)``),
        checked against committed snapshots' summaries; the stand-in
        records it on the same manifest the commit flips to. A separate
        post-append tag commit would let a crash between the two leave
        the rows in but the tag unrecorded, so the replay doubles the
        batch. Retention: a tag whose micro-batch the streaming
        checkpoint has already committed can never be replayed — ledgers
        may prune tags older than the checkpoint's offset horizon."""

    @abc.abstractmethod
    def has_tag(self, tag: str) -> bool:
        """Whether an append carrying ``tag`` has already committed —
        lets an at-least-once writer distinguish a replayed batch BEFORE
        recomputing derived state from it (e.g. not double-counting the
        batch's rows in an occupancy union)."""

    @abc.abstractmethod
    def append_arrow(self, table) -> int:
        """Append a small driver-local Arrow table without a Spark job."""

    @abc.abstractmethod
    def read(self, spark: SparkSession, snapshot: int | None = None) -> DataFrame: ...

    @abc.abstractmethod
    def read_partitions(
        self, spark: SparkSession, col: str, values: list
    ) -> DataFrame | None:
        """Partition-pruned read: only the listed values of partition
        column ``col`` are scanned — O(touched partitions), never
        O(table). Returns ``None`` when no listed partition exists yet
        (the caller supplies its own empty frame; the table can't know
        the schema without scanning). Iceberg: ``read().filter(
        col.isin(values))`` — the catalog prunes manifests natively."""

    @abc.abstractmethod
    def read_appended(self, spark: SparkSession, snapshot: int) -> DataFrame:
        """Only the rows ADDED by ``snapshot`` relative to its parent."""

    @abc.abstractmethod
    def replace_partitions(
        self, spark: SparkSession, df: DataFrame, partition_values: dict
    ) -> int: ...

    @abc.abstractmethod
    def merge(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key: str | list[str],
        update_cols: list[str] | None = None,
    ) -> int: ...

    @abc.abstractmethod
    def merge_if_absent(
        self, spark: SparkSession, rows: DataFrame, key: str | list[str]
    ) -> int: ...

    @abc.abstractmethod
    def rollback_to(self, snapshot: int) -> None: ...

    @abc.abstractmethod
    def compact(self, spark: SparkSession) -> int:
        """Rewrite the current snapshot's rows into one data segment
        (small-file compaction). Append-heavy tables — a streaming
        index commits one segment per micro-batch — otherwise pay a
        per-segment scan at every read. Contents unchanged."""

    @abc.abstractmethod
    def prune_tags(self, keep: list) -> int:
        """Retention for the idempotence-tag ledger: drop every tag not
        in ``keep``. Safe horizon: a tag whose micro-batch the streaming
        checkpoint has already committed can never be replayed — during
        batch N only N itself can still replay, so maintenance passes
        prune to the current batch's tag. Without this the ledger grows
        one entry per batch forever and is rewritten whole on every
        tagged commit. Iceberg: shrink the ``vt.tags`` property cache
        (per-snapshot summaries age out with expire_snapshots)."""

    @abc.abstractmethod
    def compact_partitions(self, spark: SparkSession, col: str, values: list) -> int:
        """Partition-scoped compaction: rewrite only the listed values
        of partition column ``col`` into fresh files — O(listed
        partitions), never O(table). The incremental maintenance
        primitive for streaming index stores: each pass folds the
        buckets fragmented since the last one, untouched buckets' files
        don't move. Iceberg: ``rewrite_data_files(where => "col IN
        (...)")``."""

    @abc.abstractmethod
    def fragmented_partitions(self, col: str, min_segments: int = 2) -> list[str]:
        """Partition values of ``col`` whose live rows span at least
        ``min_segments`` data segments (string dir-name form) — the
        read-amplified subset worth handing to
        :meth:`compact_partitions`. Iceberg: group the ``<table>.files``
        metadata table by partition and filter on the file count."""

    @abc.abstractmethod
    def expire_snapshots(self, keep_last: int = 1) -> None:
        """Garbage-collect history: drop every snapshot except the
        newest ``keep_last`` ending at the current one, and delete data
        files no kept snapshot references. Bounds storage after
        compaction (the pre-compaction segments stay on disk for time
        travel until expired, exactly like Iceberg)."""

    @abc.abstractmethod
    def drop(self) -> None: ...
