"""Keyed MERGE / upsert into a snapshot table (S7 — the Iceberg
``MERGE INTO`` / Delta upsert analog on the repo's Parquet-manifest
seam; the SCD-type-1 primitive a standing dictionary/label/asset table
needs when corrections arrive).

Semantics (copy-on-write MERGE): given a standing dataset and an
updates frame sharing a key,

  * KEY-LEVEL replacement: every standing row whose key appears in
    updates is replaced by that key's single update row — a key with
    multiple standing rows (e.g. dictionary aliases sharing a
    norm_key) collapses to the update row, so multi-row-per-key
    tables should merge on their unique id instead;
  * update rows with no standing match are INSERTED;
  * optionally, update rows carrying ``delete_col = true`` DELETE the
    standing row instead (and are never inserted themselves);
  * all other standing rows pass through untouched.

The merged result commits as a NEW snapshot (the table's optimistic
CAS gives atomicity vs concurrent writers; time travel keeps the
pre-merge state readable at its pinned id — verified in tests).

Determinism: duplicate keys WITHIN updates would make "latest wins"
partitioning-dependent, so they are rejected up front (one count agg
over the updates — update batches are small by nature; callers with
multi-row batches pre-reduce with their own total order).

Scale shape: ONE left_anti join (standing minus touched keys — the
J5 resume-delta shape: updates are the SMALL side, broadcast by
Catalyst) + one filtered union; the standing table is scanned once and
never shuffles on its own size. Copy-on-write rewrites the dataset —
the right trade for dimension/asset tables (read-heavy, small);
corpus-sized fact data uses the append/dedup paths instead
(streaming sinks, incremental indexes), exactly Iceberg's own
CoW-vs-MoR guidance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pie_spark.io.snapshots import SnapshotTable


def merge_upsert(
    spark: SparkSession,
    table: SnapshotTable,
    dataset: str,
    updates: DataFrame,
    key_col: str,
    delete_col: str | None = None,
    meta: dict | None = None,
) -> int:
    """MERGE ``updates`` into ``table``'s ``dataset`` by ``key_col``;
    returns the new snapshot id. ``delete_col`` (boolean column on
    updates, optional) marks keys to remove."""
    dup = (
        updates.groupBy(key_col).count().filter(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"updates carry duplicate key {dup[0][key_col]!r} — 'latest "
            "wins' would be partitioning-dependent; pre-reduce the batch"
        )
    base_dirs = table.dataset_dirs(dataset)  # baseline for the CoW check
    standing = table.scan(spark, dataset)
    touched = updates.select(key_col)
    kept = standing.join(F.broadcast(touched), key_col, "left_anti")
    if delete_col is not None:
        inserts = updates.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    else:
        inserts = updates
    merged = kept.unionByName(inserts.select(*standing.columns))
    m = dict(meta or {})
    m["merge"] = {"dataset": dataset, "key": key_col}
    # replace_dataset (not commit): carries sibling datasets forward and
    # raises on a same-dataset concurrent change instead of rebasing
    # over it (serializable isolation — see its docstring)
    return table.replace_dataset(
        dataset, merged, meta=m, expected_dirs=base_dirs
    )


def snapshot_diff(
    spark: SparkSession,
    table: SnapshotTable,
    dataset: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
    key_col: str = "k",
) -> DataFrame:
    """CDC changelog between two snapshots of a keyed dataset (the
    Iceberg changelog-scan / Delta CDF analog): one row per changed
    key with ``change ∈ {insert, delete, update}`` plus the before/
    after payload structs. Downstream incremental consumers (the
    incremental-CC/LSH family) replay the changelog instead of
    re-reading the table.

    Shape: ONE full-outer join on the key between the two pinned
    scans; unchanged keys are filtered by struct equality (null-safe
    ``<=>`` so null payload fields compare stably) — the diff costs
    two scans + one shuffle regardless of how many snapshots lie
    between, because snapshots are complete states, not deltas.
    Determinism: requires the key to be unique within each snapshot
    (the merge contract); output is a plain row set."""
    a = table.scan(spark, dataset, from_snapshot)
    b = table.scan(spark, dataset, to_snapshot)
    cols = [c for c in a.columns if c != key_col]
    av = a.select(key_col, F.struct(*cols).alias("before"))
    bv = b.select(key_col, F.struct(*cols).alias("after"))
    j = av.join(bv, key_col, "full_outer")
    change = (
        F.when(F.col("before").isNull(), F.lit("insert"))
        .when(F.col("after").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return (
        j.filter(~F.expr("before <=> after"))
        .select(key_col, change.alias("change"), "before", "after")
    )
