"""S5: triple sink — bucketed on doc_id (SURVEY.md §2.1 S5; north_rule
BASELINE.json:14 "explicit bucketed partitioning on doc_id").

Layout (Parquet-manifest fallback; Iceberg mapping in the docstring of
pie_spark.io.snapshots):

    <out>/triples/snap-<id>/pred=<P>/part-*.parquet

* ``repartition(buckets, doc_id)`` hash-buckets rows so all triples of
  one document land in one task/file — the Iceberg equivalent is
  ``partitionedBy(bucket(N, "doc_id"))``. A downstream per-doc join or
  resume scan touches one bucket, not the table.
* ``partitionBy("pred")`` adds the low-cardinality predicate as a
  directory partition → predicate-family scans prune directories.
* The write and the lineage rows commit together in ONE snapshot
  (manifest-last atomicity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


from pie_spark.io.snapshots import SnapshotTable


def write_triples(
    table: SnapshotTable,
    triples: DataFrame,
    lineage: DataFrame,
    buckets: int,
    meta: dict | None = None,
) -> int:
    bucketed = triples.repartition(buckets, "doc_id").sortWithinPartitions(
        "doc_id", "pred", "subj", "obj"
    )
    sid_meta = dict(meta or {})
    sid_meta["buckets"] = buckets
    return table.commit_partitioned(
        {"triples": (bucketed, ["pred"]), "lineage": (lineage, [])}, meta=sid_meta
    )
