"""Iceberg-catalog implementation of :class:`VersionedTable`.

ENVIRONMENT-GATED: this sandbox's pyspark distribution ships no Iceberg
runtime jar (verified — ``pyspark/jars`` has none), so the adapter
raises :class:`IcebergUnavailable` at construction unless the session
actually has the Iceberg SQL extensions loaded. The method bodies are
the real mapping (Spark SQL `MERGE INTO`, `writeTo().append()`,
`VERSION AS OF`, snapshot-procedure calls), kept as executable code —
not pseudocode — but since this sandbox can never load the jars they
are REVIEW-ONLY: exercised for the gate (`tests/test_storage_seam.py`)
and the call-site seam audit, not end-to-end. A deployment with
``--packages org.apache.iceberg:iceberg-spark-runtime-...`` and a
catalog config drops this class in where :class:`SnapshotTable` is used
today (the engine only touches the :class:`VersionedTable` surface).

Semantics notes vs the parquet stand-in:
- Iceberg snapshot ids are opaque longs, not a 1..N sequence; callers
  already treat snapshot ids as tokens (store, compare equality, pass
  back) rather than doing arithmetic on them.
- ``read_appended`` maps to the incremental read between a snapshot and
  its parent (``start-snapshot-id``/``end-snapshot-id``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .interface import VersionedTable


class IcebergUnavailable(RuntimeError):
    """Raised when no Iceberg runtime/catalog is present in the session."""


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        ext = spark.conf.get("spark.sql.extensions", "") or ""
    except Exception:
        ext = ""
    if "IcebergSparkSessionExtensions" not in ext:
        return False
    try:  # the class must actually be on the JVM classpath
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        )
        return True
    except Exception:
        return False


class IcebergTable(VersionedTable):
    def __init__(
        self,
        spark: SparkSession,
        identifier: str,
        partition_by: tuple[str, ...] = (),
    ):
        """``identifier``: catalog-qualified table name
        (``catalog.db.table``)."""
        if not _has_iceberg(spark):
            raise IcebergUnavailable(
                "no Iceberg runtime in this Spark session; add "
                "iceberg-spark-runtime to the classpath and configure a "
                "catalog (spark.sql.catalog.<name>=org.apache.iceberg."
                "spark.SparkCatalog), or use storage.snapshot.SnapshotTable"
            )
        self.spark = spark
        self.identifier = identifier
        self.partition_by = tuple(partition_by)

    # -- helpers ----------------------------------------------------------
    def _snapshots(self) -> DataFrame:
        return self.spark.sql(
            f"SELECT snapshot_id, parent_id, committed_at "
            f"FROM {self.identifier}.snapshots ORDER BY committed_at"
        )

    def current_snapshot(self) -> int | None:
        if not self.exists():
            return None
        rows = (
            self._snapshots()
            .orderBy("committed_at", ascending=False)
            .limit(1)
            .collect()
        )
        return int(rows[0]["snapshot_id"]) if rows else None

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.identifier)

    def _create_if_absent(self, df: DataFrame) -> None:
        if not self.exists():
            w = df.writeTo(self.identifier)
            if self.partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in self.partition_by])
            w.create()

    # -- ops ---------------------------------------------------------------
    def overwrite(self, df: DataFrame) -> int:
        if self.exists():
            df.writeTo(self.identifier).replace()
        else:
            self._create_if_absent(df)
        return self.current_snapshot() or 0

    def _property_tags(self) -> set:
        props = {
            r["key"]: r["value"]
            for r in self.spark.sql(
                f"SHOW TBLPROPERTIES {self.identifier}"
            ).collect()
        }
        return set(filter(None, props.get("vt.tags", "").split(",")))

    def has_tag(self, tag: str) -> bool:
        """Source of truth is the per-commit snapshot summary property
        (``vt.tag``) — it commits ATOMICALLY with the append's data, so
        a crash can never leave rows in without their tag. The
        cumulative ``vt.tags`` table property is consulted second, as a
        cache for tags whose snapshots have been expired."""
        if not self.exists():
            return False
        n = self.spark.sql(
            f"SELECT count(*) AS n FROM {self.identifier}.snapshots "
            f"WHERE summary['vt.tag'] = '{tag}'"
        ).collect()[0]["n"]
        return bool(n) or tag in self._property_tags()

    def append(self, df: DataFrame, tag: str | None = None) -> int:
        """Tagged appends stamp the tag INTO the append commit itself
        (snapshot summary property via ``writeTo().option(
        "snapshot-property.vt.tag", tag)``) so tag and data commit
        atomically — a post-append ALTER TABLE would let a crash between
        the two commits leave the rows in but the tag unrecorded, and
        the foreachBatch replay would double the batch. The cumulative
        ``vt.tags`` table property is kept only as a post-expiry cache;
        losing it on a crash is safe (the summary already has the tag).
        Retention: that property grows one entry per micro-batch — prune
        entries older than the streaming checkpoint's committed offset
        horizon (those batches can never be replayed); the engine never
        reads tags older than that."""
        if tag is not None and self.has_tag(tag):
            return self.current_snapshot() or 0
        if not self.exists():
            w = df.writeTo(self.identifier)
            if tag is not None:
                w = w.option("snapshot-property.vt.tag", tag)
            if self.partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in self.partition_by])
            w.create()
        else:
            w = df.writeTo(self.identifier)
            if tag is not None:
                w = w.option("snapshot-property.vt.tag", tag)
            w.append()
        if tag is not None:
            tags = self._property_tags() | {tag}
            self.spark.sql(
                f"ALTER TABLE {self.identifier} SET TBLPROPERTIES "
                f"('vt.tags' = '{','.join(sorted(tags))}')"
            )
        return self.current_snapshot() or 0

    def append_arrow(self, table) -> int:
        # Iceberg commits go through the catalog; a driver-local Arrow
        # batch still needs one (tiny) Spark write — the stand-in's
        # direct-file shortcut is a parquet-layout detail.
        return self.append(self.spark.createDataFrame(table.to_pandas()))

    def read(self, spark: SparkSession, snapshot: int | None = None) -> DataFrame:
        if snapshot is None:
            return spark.read.table(self.identifier)
        return spark.read.option("snapshot-id", snapshot).table(self.identifier)

    def read_partitions(
        self, spark: SparkSession, col: str, values: list
    ) -> DataFrame | None:
        """Iceberg prunes manifests natively from a partition-column
        filter — no directory surgery needed."""
        if not self.exists():
            return None
        from pyspark.sql import functions as F

        return self.read(spark).filter(F.col(col).isin(list(values)))

    def read_appended(self, spark: SparkSession, snapshot: int) -> DataFrame:
        [row] = (
            self._snapshots()
            .where(f"snapshot_id = {int(snapshot)}")
            .select("parent_id")
            .collect()
        )
        reader = spark.read.format("iceberg").option("end-snapshot-id", snapshot)
        if row["parent_id"] is not None:
            reader = reader.option("start-snapshot-id", int(row["parent_id"]))
        return reader.load(self.identifier)

    def replace_partitions(
        self, spark: SparkSession, df: DataFrame, partition_values: dict
    ) -> int:
        # dynamic overwrite: exactly the partitions present in df
        df.writeTo(self.identifier).overwritePartitions()
        return self.current_snapshot() or 0

    def merge(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key: str | list[str],
        update_cols: list[str] | None = None,
    ) -> int:
        if not self.exists():
            return self.overwrite(updates)
        keys = [key] if isinstance(key, str) else list(key)
        upd = update_cols if update_cols is not None else [
            c for c in updates.columns if c not in keys
        ]
        updates.createOrReplaceTempView("_vt_updates")
        on = " AND ".join(f"t.{k} = u.{k}" for k in keys)
        sets = ", ".join(f"t.{c} = u.{c}" for c in upd)
        spark.sql(
            f"MERGE INTO {self.identifier} t USING _vt_updates u ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT *"
        )
        return self.current_snapshot() or 0

    def merge_if_absent(
        self, spark: SparkSession, rows: DataFrame, key: str | list[str]
    ) -> int:
        if not self.exists():
            return self.overwrite(rows)
        keys = [key] if isinstance(key, str) else list(key)
        rows.createOrReplaceTempView("_vt_inserts")
        on = " AND ".join(f"t.{k} = u.{k}" for k in keys)
        spark.sql(
            f"MERGE INTO {self.identifier} t USING _vt_inserts u ON {on} "
            f"WHEN NOT MATCHED THEN INSERT *"
        )
        return self.current_snapshot() or 0

    def rollback_to(self, snapshot: int) -> None:
        catalog = self.identifier.split(".")[0]
        self.spark.sql(
            f"CALL {catalog}.system.rollback_to_snapshot"
            f"('{self.identifier}', {int(snapshot)})"
        )

    def compact(self, spark: SparkSession) -> int:
        catalog = self.identifier.split(".")[0]
        self.spark.sql(
            f"CALL {catalog}.system.rewrite_data_files"
            f"(table => '{self.identifier}')"
        )
        return self.current_snapshot() or 0

    def prune_tags(self, keep: list) -> int:
        """Checkpoint-horizon tag retention: shrink the cumulative
        ``vt.tags`` property cache to ``keep``. Per-snapshot summary
        properties are immutable and age out with expire_snapshots; a
        lingering summary answering has_tag=True for a pruned tag is
        still truthful (the batch IS committed), so pruning only ever
        forgets dead entries."""
        kept = sorted(self._property_tags() & {str(t) for t in keep})
        self.spark.sql(
            f"ALTER TABLE {self.identifier} SET TBLPROPERTIES "
            f"('vt.tags' = '{','.join(kept)}')"
        )
        return self.current_snapshot() or 0

    def compact_partitions(self, spark: SparkSession, col: str, values: list) -> int:
        catalog = self.identifier.split(".")[0]
        in_list = ", ".join(f"'{v}'" for v in values)
        self.spark.sql(
            f"CALL {catalog}.system.rewrite_data_files"
            f"(table => '{self.identifier}', "
            f"where => \"{col} IN ({in_list})\")"
        )
        return self.current_snapshot() or 0

    def fragmented_partitions(self, col: str, min_segments: int = 2) -> list[str]:
        rows = self.spark.sql(
            f"SELECT CAST(partition.{col} AS STRING) AS v, COUNT(*) AS n "
            f"FROM {self.identifier}.files GROUP BY partition.{col} "
            f"HAVING COUNT(*) >= {int(min_segments)}"
        ).collect()
        return sorted(r["v"] for r in rows)

    def expire_snapshots(self, keep_last: int = 1) -> None:
        catalog = self.identifier.split(".")[0]
        self.spark.sql(
            f"CALL {catalog}.system.expire_snapshots"
            f"(table => '{self.identifier}', retain_last => {int(keep_last)})"
        )

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.identifier}")
