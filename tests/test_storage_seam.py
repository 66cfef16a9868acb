"""The storage seam (VERDICT r2 item 9): every persistence call site in
the engine programs against VersionedTable; SnapshotTable is one
implementation, IcebergTable the (environment-gated) other."""

from __future__ import annotations

import inspect
import re
from pathlib import Path

import pytest

from mklab_focused_crawler_spark.storage.iceberg import (
    IcebergTable,
    IcebergUnavailable,
)
from mklab_focused_crawler_spark.storage.interface import VersionedTable
from mklab_focused_crawler_spark.storage.snapshot import SnapshotTable

PKG = Path(__file__).resolve().parents[1] / "mklab_focused_crawler_spark"


def _interface_methods() -> set:
    return {
        n
        for n, m in vars(VersionedTable).items()
        if getattr(m, "__isabstractmethod__", False)
    }


def test_snapshot_table_implements_the_seam(tmp_path):
    t = SnapshotTable(str(tmp_path), "t")
    assert isinstance(t, VersionedTable)
    # signatures line up (same names, same positional parameters)
    for name in _interface_methods():
        got = inspect.signature(getattr(SnapshotTable, name))
        want = inspect.signature(getattr(VersionedTable, name))
        assert list(got.parameters) == list(want.parameters), name


def test_iceberg_adapter_gates_cleanly(spark):
    """No Iceberg runtime in this sandbox: the adapter must refuse at
    construction with an actionable message, not fail later mid-write."""
    with pytest.raises(IcebergUnavailable, match="iceberg-spark-runtime"):
        IcebergTable(spark, "cat.db.t")
    assert issubclass(IcebergTable, VersionedTable)
    # if jars ever appear, every seam method must be implemented
    assert not getattr(IcebergTable, "__abstractmethods__", None)


def test_engine_call_sites_stay_inside_the_seam():
    """AST audit: find every name/attribute assigned from a
    ``SnapshotTable(...)`` constructor anywhere in the package, then
    every method called on those targets must exist on the interface —
    adding a call site with a new method means extending VersionedTable
    first (the seam is only a seam while it is closed)."""
    import ast

    iface = _interface_methods()
    allowed = iface | {"partition_by", "dir"}  # public attrs on both impls

    def target_key(node) -> tuple | None:
        # self.frontier -> ("attr", "frontier"); users_table -> ("name", ...)
        if isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            return ("attr", node.attr) if node.value.id == "self" else None
        if isinstance(node, ast.Name):
            return ("name", node.id)
        return None

    offenders, checked, found_ctors = [], 0, 0
    for py in PKG.rglob("*.py"):
        if py.name in ("snapshot.py", "iceberg.py", "interface.py"):
            continue
        tree = ast.parse(py.read_text())
        tables: set = set()  # per-file: names don't leak across modules
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Assign)
                and isinstance(node.value, ast.Call)
                and isinstance(node.value.func, ast.Name)
                and node.value.func.id == "SnapshotTable"
            ):
                for t in node.targets:
                    k = target_key(t)
                    if k:
                        tables.add(k)
                        found_ctors += 1
        if not tables:
            continue
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and target_key(node.func.value) in tables
            ):
                checked += 1
                if node.func.attr not in allowed:
                    offenders.append(f"{py.name}:{node.lineno} .{node.func.attr}()")
    assert found_ctors, "audit must find SnapshotTable construction sites"
    assert checked > 10, "audit must see real call sites"
    assert not offenders, offenders


def test_compact_and_expire(spark, tmp_path):
    """compact folds N per-append segments into one (contents
    unchanged, partition layout kept); expire_snapshots drops the
    superseded history and its data dirs; time travel to an expired
    snapshot fails loudly."""
    import os

    import pytest as _pytest

    t = SnapshotTable(str(tmp_path), "idx", partition_by=("b",))
    for i in range(3):
        t.append(spark.createDataFrame([(i, i % 2)], "x long, b int"))
    before = {(r["x"], r["b"]) for r in t.read(spark).collect()}
    assert len(os.listdir(t.data_dir)) == 3

    snap = t.compact(spark)
    manifest_files = t._manifest(snap)["files"]
    assert len(manifest_files) == 1
    assert {(r["x"], r["b"]) for r in t.read(spark).collect()} == before
    # partition layout preserved in the compacted segment
    assert any(
        e.startswith("b=") for e in os.listdir(manifest_files[0])
    )
    # pre-expiry: time travel still reaches an old snapshot
    assert {(r["x"], r["b"]) for r in t.read(spark, snapshot=1).collect()} == {
        (0, 0)
    }

    t.expire_snapshots(keep_last=1)
    assert len(os.listdir(t.data_dir)) == 1  # only the compacted segment
    assert {(r["x"], r["b"]) for r in t.read(spark).collect()} == before
    with _pytest.raises(FileNotFoundError):
        t.read(spark, snapshot=1)


def test_compact_partitions_is_partition_scoped(spark, tmp_path):
    """compact_partitions rewrites ONLY the listed partitions: contents
    unchanged, the untouched partition's files byte-identical (same
    paths, same mtimes — its data never moved), the folded partition
    down to one live segment. fragmented_partitions names exactly the
    multi-segment values."""
    import os

    t = SnapshotTable(str(tmp_path), "pidx", partition_by=("b",))
    # bucket 0 written once; bucket 1 fragmented across three appends
    t.append(spark.createDataFrame([(1, 0), (2, 1)], "x long, b int"))
    t.append(spark.createDataFrame([(3, 1)], "x long, b int"))
    t.append(spark.createDataFrame([(4, 1)], "x long, b int"))
    before = {(r["x"], r["b"]) for r in t.read(spark).collect()}

    assert t.fragmented_partitions("b") == ["1"]
    def _local(f):
        return f.removeprefix("file://")

    untouched = sorted(
        (f, os.path.getmtime(_local(f)))
        for f in t.read_partitions(spark, "b", [0]).inputFiles()
    )

    t.compact_partitions(spark, "b", t.fragmented_partitions("b"))
    assert {(r["x"], r["b"]) for r in t.read(spark).collect()} == before
    # bucket 0's files did not move; bucket 1 folded to one segment
    assert sorted(
        (f, os.path.getmtime(_local(f)))
        for f in t.read_partitions(spark, "b", [0]).inputFiles()
    ) == untouched
    assert t.fragmented_partitions("b") == []
    one_dir = {f.rsplit("/part-", 1)[0] for f in
               t.read_partitions(spark, "b", [1]).inputFiles()}
    assert len(one_dir) == 1

    # expiry reclaims the folded bucket's superseded subdirs AND keeps
    # the untouched bucket's segment alive
    t.expire_snapshots(keep_last=1)
    assert {(r["x"], r["b"]) for r in t.read(spark).collect()} == before
    live = {
        os.path.join(d, e)
        for d in os.listdir(t.data_dir)
        for e in os.listdir(os.path.join(t.data_dir, d))
        if e.startswith("b=")
    }
    assert sum(e.endswith("b=1") for e in live) == 1


def test_merge_history_self_cleans(spark, tmp_path):
    """Repeated partition-scoped merges on the same bucket keep the
    manifest bounded: a segment whose every partition is shadowed drops
    out of the file list (reads never open it again), so merge history
    does not accumulate one exclusion entry per batch forever."""
    t = SnapshotTable(str(tmp_path), "midx", partition_by=("b",))
    for i in range(6):
        t.merge(
            spark,
            spark.createDataFrame([(1, i, 0)], "k long, v long, b int"),
            key="k",
        )
    assert [(r["k"], r["v"], r["b"]) for r in t.read(spark).collect()] == [(1, 5, 0)]
    files = t._manifest(t.current_snapshot())["files"]
    assert len(files) == 1  # every superseded segment dropped, not excluded


def test_read_partitions_prunes_to_touched_dirs(spark, tmp_path):
    """read_partitions scans ONLY the listed partitions' files — the
    property that turns a key-bucketed SnapshotTable into an index
    (probe cost ∝ probed buckets, not accumulated history)."""
    t = SnapshotTable(str(tmp_path), "bidx", partition_by=("b",))
    t.append(spark.createDataFrame([(1, 0), (2, 1), (3, 2)], "x long, b int"))
    t.append(spark.createDataFrame([(4, 1), (5, 3)], "x long, b int"))

    got = t.read_partitions(spark, "b", [1])
    assert {(r["x"], r["b"]) for r in got.collect()} == {(2, 1), (4, 1)}
    # the scan's file set is exactly the touched partition dirs
    assert all("b=1" in f for f in got.inputFiles())
    # missing partitions are skipped, absent-only requests return None
    got2 = t.read_partitions(spark, "b", [2, 7])
    assert {(r["x"], r["b"]) for r in got2.collect()} == {(3, 2)}
    assert t.read_partitions(spark, "b", [7]) is None
    assert SnapshotTable(str(tmp_path), "nope", partition_by=("b",)).read_partitions(
        spark, "b", [1]
    ) is None


def test_prune_tags_checkpoint_horizon(spark, tmp_path):
    """The tag ledger is prunable to the replay horizon: tags for
    checkpoint-committed batches drop, the live batch's tag keeps its
    idempotence guarantee, and the ledger stays bounded instead of
    growing one entry per batch forever."""
    t = SnapshotTable(str(tmp_path), "ptags")
    df = spark.createDataFrame([(1,)], "x long")
    for i in range(4):
        t.append(df, tag=f"b{i}")
    assert all(t.has_tag(f"b{i}") for i in range(4))
    t.prune_tags(["b3"])
    assert t.has_tag("b3") and not t.has_tag("b2")
    t.append(df, tag="b3")  # replay of the live batch is still a no-op
    assert t.read(spark).count() == 4
    t.append(df, tag="b4")
    assert t._manifest(t.current_snapshot())["tags"] == ["b3", "b4"]
    t.prune_tags(["b4"])  # idempotent re-prune is a no-op commit
    snap = t.current_snapshot()
    assert t.prune_tags(["b4"]) == snap


def test_has_tag_matches_append_ledger(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "tags")
    df = spark.createDataFrame([(1,)], "x long")
    assert not t.has_tag("b0")
    t.append(df, tag="b0")
    assert t.has_tag("b0") and not t.has_tag("b1")
    t.compact(spark)
    t.expire_snapshots(keep_last=1)
    assert t.has_tag("b0")  # tags survive maintenance
