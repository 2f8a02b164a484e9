"""Table maintenance on the snapshot seam (r06): compact /
expire_snapshots / remove_orphans — the Iceberg maintenance actions
(rewrite_data_files, expire_snapshots, remove_orphan_files) a standing
landing zone needs once streaming ingest commits one snapshot per
micro-batch (SURVEY.md §2.1 S2; io/snapshots.py docstrings map each
method 1:1)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from pie_spark.io.snapshots import CommitConflictError, SnapshotTable


def _files(path: str) -> list[str]:
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def _rows(df) -> set[tuple]:
    return {tuple(r) for r in df.collect()}


def test_compact_rewrites_files_preserves_content(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(1000).select(
        F.col("id").cast("string").alias("doc_id"), (F.col("id") % 7).alias("x")
    )
    t.commit({"d": df.repartition(64), "other": spark.range(5).toDF("id")})
    before = _rows(t.scan(spark, "d"))
    assert len(_files(t.snapshots()[-1].datasets["d"])) >= 32

    sid = t.compact(spark, "d", target_files=4)
    assert t.current_snapshot() == sid
    snap = t.snapshots()[-1]
    assert len(_files(snap.datasets["d"])) <= 4
    assert _rows(t.scan(spark, "d")) == before
    assert snap.meta["operation"] == "compact"


def test_compact_carries_other_datasets_by_reference(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit({"d": spark.range(100).toDF("id"), "other": spark.range(9).toDF("id")})
    s1 = t.snapshots()[-1]
    t.compact(spark, "d", target_files=2)
    s2 = t.snapshots()[-1]
    # unchanged dataset: same dir, no rewrite (Iceberg shares manifests)
    assert s2.datasets["other"] == s1.datasets["other"]
    assert s2.datasets["d"] != s1.datasets["d"]
    # time travel to the pre-compaction snapshot still works
    assert _rows(t.scan(spark, "d", snapshot_id=s1.id)) == _rows(
        t.scan(spark, "d", snapshot_id=s2.id)
    )


def test_compact_preserves_directory_partitioning(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("bucket")
    )
    t.commit_partitioned({"d": (df.repartition(16), ["bucket"])})
    before = _rows(t.scan(spark, "d"))
    t.compact(spark, "d", target_files=1)
    snap = t.snapshots()[-1]
    # partition dirs survive the rewrite → pruning still possible
    assert glob.glob(os.path.join(snap.datasets["d"], "bucket=*"))
    assert _rows(t.scan(spark, "d")) == before
    assert snap.partitions["d"] == ["bucket"]


def test_compact_validates_concurrent_replacement(spark, tmp_path):
    """A writer replacing the dataset between the rewrite-read and the
    publish must abort the compaction (Iceberg rewrite validation) —
    a blind commit would silently drop the writer's data."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit({"d": spark.range(10).toDF("id")})
    base = t.current_snapshot()
    # the concurrent writer wins first
    t.commit({"d": spark.range(99).toDF("id")})
    with pytest.raises(CommitConflictError, match="replaced concurrently"):
        t.compact(spark, "d", expected_snapshot_id=base)
    # the winner's data is intact and current
    assert _rows(t.scan(spark, "d")) == {(i,) for i in range(99)}
    # the aborted rewrite dir was cleaned up: nothing orphaned
    assert t.remove_orphans(older_than_sec=0.0) == []


def test_expire_snapshots_prunes_metadata_then_files(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    for n in (10, 20, 30):
        t.commit({"d": spark.range(n).toDF("id")})
    dirs = [s.datasets["d"] for s in t.snapshots()]
    expired = t.expire_snapshots(keep_last=1)
    assert expired == [1, 2]
    assert [s.id for s in t.snapshots()] == [3]
    # expired data dirs gone, current intact
    assert not os.path.exists(dirs[0]) and not os.path.exists(dirs[1])
    assert _rows(t.scan(spark, "d")) == {(i,) for i in range(30)}
    # time travel past the horizon raises, like Iceberg
    with pytest.raises(ValueError, match="not found"):
        t.scan(spark, "d", snapshot_id=1)


def test_expire_keeps_dirs_shared_with_retained_snapshots(spark, tmp_path):
    """Compaction snapshots carry unchanged datasets forward by
    reference; expiring the pre-compaction snapshot must NOT delete a
    dir the retained snapshot still points at."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit({"d": spark.range(50).toDF("id"), "other": spark.range(7).toDF("id")})
    t.compact(spark, "d", target_files=1)
    shared_other = t.snapshots()[-1].datasets["other"]
    old_d = t.snapshots()[0].datasets["d"]
    assert t.expire_snapshots(keep_last=1) == [1]
    assert os.path.exists(shared_other)  # shared → retained
    assert not os.path.exists(old_d)  # only the old rewrite dies
    assert _rows(t.scan(spark, "other")) == {(i,) for i in range(7)}


def test_remove_orphans_age_guarded(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit({"d": spark.range(5).toDF("id")})
    # a crashed commit: data written, CAS never reached
    orphan = os.path.join(t.root, "d", "snap-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as f:
        f.write(b"x")
    # fresh dirs are protected (an in-flight writer looks exactly like
    # this) …
    assert t.remove_orphans(older_than_sec=3600.0) == []
    assert os.path.exists(orphan)
    # … old ones are collected; referenced dirs never touched
    assert t.remove_orphans(older_than_sec=0.0) == [orphan]
    assert not os.path.exists(orphan)
    assert _rows(t.scan(spark, "d")) == {(i,) for i in range(5)}
