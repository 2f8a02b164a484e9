"""MERGE/upsert (io/merge.py + SnapshotTable.replace_dataset):
update/insert/delete semantics, sibling-dataset carry-forward, time
travel to the pre-merge snapshot, duplicate-key rejection, and the
serializable-isolation conflict on a racing same-dataset writer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pie_spark.io.merge import merge_upsert
from pie_spark.io.snapshots import CommitConflictError, SnapshotTable


def _table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    dim = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "k long, v string"
    )
    side = spark.createDataFrame([(9, "lineage")], "id long, note string")
    t.commit({"dim": dim, "side": side})
    return t


def _rows(spark, t, ds, sid=None):
    return sorted(tuple(r) for r in t.scan(spark, ds, sid).collect())


def test_update_insert_delete(spark, tmp_path):
    t = _table(spark, tmp_path)
    pre = t.current_snapshot()
    ups = spark.createDataFrame(
        [(2, "BETA", False), (4, "delta", False), (3, None, True)],
        "k long, v string, drop boolean",
    )
    sid = merge_upsert(spark, t, "dim", ups, "k", delete_col="drop")
    assert _rows(spark, t, "dim") == [(1, "alpha"), (2, "BETA"), (4, "delta")]
    # sibling dataset carried forward into the new snapshot
    assert _rows(spark, t, "side") == [(9, "lineage")]
    # time travel: the pre-merge snapshot still reads the old rows
    assert _rows(spark, t, "dim", pre) == [(1, "alpha"), (2, "beta"), (3, "gamma")]
    assert t.meta(sid)["merge"] == {"dataset": "dim", "key": "k"}


def test_duplicate_update_keys_rejected(spark, tmp_path):
    t = _table(spark, tmp_path)
    ups = spark.createDataFrame([(2, "x"), (2, "y")], "k long, v string")
    with pytest.raises(ValueError, match="duplicate key"):
        merge_upsert(spark, t, "dim", ups, "k")


def test_concurrent_same_dataset_writer_conflicts(spark, tmp_path):
    t = _table(spark, tmp_path)
    base_dirs = t.dataset_dirs("dim")
    # a racer replaces dim between our scan and our publish
    racer = spark.createDataFrame([(7, "racer")], "k long, v string")
    t.replace_dataset("dim", racer)
    ups = spark.createDataFrame([(1, "mine")], "k long, v string")
    stale = spark.createDataFrame(
        [(1, "mine"), (2, "beta"), (3, "gamma")], "k long, v string"
    )
    with pytest.raises(CommitConflictError, match="concurrent writer"):
        t.replace_dataset("dim", stale, expected_dirs=base_dirs)
    # the racer's snapshot is untouched
    assert _rows(spark, t, "dim") == [(7, "racer")]


def test_merge_without_delete_col(spark, tmp_path):
    t = _table(spark, tmp_path)
    ups = spark.createDataFrame([(1, "A1"), (5, "eps")], "k long, v string")
    merge_upsert(spark, t, "dim", ups, "k")
    assert _rows(spark, t, "dim") == [
        (1, "A1"), (2, "beta"), (3, "gamma"), (5, "eps"),
    ]


def test_snapshot_diff_changelog(spark, tmp_path):
    from pie_spark.io.merge import snapshot_diff

    t = _table(spark, tmp_path)
    pre = t.current_snapshot()
    ups = spark.createDataFrame(
        [(2, "BETA", False), (4, "delta", False), (3, None, True)],
        "k long, v string, drop boolean",
    )
    post = merge_upsert(spark, t, "dim", ups, "k", delete_col="drop")
    got = {
        r.k: (r.change, r.before, r.after)
        for r in snapshot_diff(spark, t, "dim", pre, post, key_col="k").collect()
    }
    assert set(got) == {2, 3, 4}
    assert got[2][0] == "update" and got[2][2]["v"] == "BETA"
    assert got[3][0] == "delete" and got[3][2] is None
    assert got[4][0] == "insert" and got[4][1] is None
    # no-change diff is empty
    assert snapshot_diff(spark, t, "dim", post, post, key_col="k").count() == 0


# ---- S9: data-quality validators (io/quality.py) ----

def test_quality_checks(spark):
    from pie_spark.io.quality import (
        check_accepted_values,
        check_not_null,
        check_ref_integrity,
        check_unique,
        validate,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (2, "c", 30), (4, None, 40)],
        "k long, v string, x long",
    )
    assert check_unique(df, ["k"]) == 2  # both k=2 rows participate
    assert check_unique(df, ["k", "v"]) == 0
    assert check_not_null(df, ["v", "x"]) == 2
    assert check_accepted_values(df, "v", ["a", "b", "c"]) == 0
    assert check_accepted_values(df, "v", ["a"]) == 2  # b, c (null skipped)
    parent = spark.createDataFrame([(1,), (2,)], "k long")
    assert check_ref_integrity(df, "k", parent, "k") == 1  # k=4 orphan
    rep = {r.rule: (r.violations, r.passed) for r in validate(
        spark, [("u", 0), ("r", 3)]
    ).collect()}
    assert rep == {"u": (0, True), "r": (3, False)}
