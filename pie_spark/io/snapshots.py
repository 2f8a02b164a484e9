"""S2/J5: snapshot-checkpointed table storage (SURVEY.md §2.1 S2, §7.3
item 5; BASELINE.json:6,14 — "resumable from Iceberg snapshot
checkpoints").

No Iceberg runtime jar exists in this sandbox (verified at survey
time), so the engine ships a **TableFormat seam** with the semantics
the spec needs — snapshot ids, atomic commits, snapshot-pinned scans,
multi-dataset checkpoints — implemented as Parquet + a JSON manifest:

    <root>/_manifest.json                 ← commit pointer (atomic rename)
    <root>/<dataset>/snap-<id>/*.parquet  ← immutable data files

On a cluster with Iceberg available, ``SnapshotTable`` maps 1:1 onto
the Iceberg API and can be swapped behind the same methods:
  * commit(...)            → df.writeTo(tbl).createOrReplace() txn
  * scan(snapshot_id=...)  → spark.read.option("snapshot-id", sid)
                             / SQL ``VERSION AS OF``
  * current_snapshot()     → table.currentSnapshot().snapshotId()

Commit protocol (manifest-last): write all parquet data for the new
snapshot → fsync-rename a tmp manifest over ``_manifest.json``. A crash
before the rename leaves the previous snapshot current — data files of
the dead snapshot are unreferenced garbage, never visible — i.e. the
same reader-visible atomicity Iceberg's metadata swap gives.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    id: int
    datasets: dict[str, str]
    committed_at: str
    parent: int | None
    meta: dict = field(default_factory=dict)


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"current": None, "snapshots": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)  # atomic on POSIX

    # -- API ----------------------------------------------------------------
    def current_snapshot(self) -> int | None:
        return self._read_manifest()["current"]

    def snapshots(self) -> list[Snapshot]:
        return [Snapshot(**s) for s in self._read_manifest()["snapshots"]]

    def commit(self, datasets: dict[str, DataFrame], meta: dict | None = None) -> int:
        """Write all datasets, then atomically publish the new snapshot."""
        return self.commit_partitioned(
            {n: (df, []) for n, df in datasets.items()}, meta=meta
        )

    def commit_partitioned(
        self,
        datasets: dict[str, tuple[DataFrame, list[str]]],
        meta: dict | None = None,
    ) -> int:
        """Like commit, but each dataset carries directory-partition
        columns (Iceberg identity-partition equivalent)."""
        m = self._read_manifest()
        sid = (m["current"] or 0) + 1
        paths: dict[str, str] = {}
        for name, (df, part_cols) in datasets.items():
            path = os.path.join(self.root, name, f"snap-{sid:06d}")
            w = df.write.mode("overwrite")
            if part_cols:
                w = w.partitionBy(*part_cols)
            w.parquet(path)
            paths[name] = path
        m["snapshots"].append(
            {
                "id": sid,
                "datasets": paths,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "parent": m["current"],
                "meta": meta or {},
            }
        )
        m["current"] = sid
        self._write_manifest(m)
        return sid

    def _resolve(self, snapshot_id: int | None) -> dict:
        m = self._read_manifest()
        sid = snapshot_id if snapshot_id is not None else m["current"]
        if sid is None:
            raise ValueError(f"table {self.root} has no snapshot")
        for s in m["snapshots"]:
            if s["id"] == sid:
                return s
        raise ValueError(f"snapshot {sid} not found in {self.root}")

    def scan(
        self, spark: SparkSession, dataset: str, snapshot_id: int | None = None
    ) -> DataFrame:
        """Snapshot-pinned read (S2): None → current snapshot."""
        s = self._resolve(snapshot_id)
        if dataset not in s["datasets"]:
            raise ValueError(f"snapshot {s['id']} has no dataset {dataset!r}")
        return spark.read.parquet(s["datasets"][dataset])

    def meta(self, snapshot_id: int | None = None) -> dict:
        return self._resolve(snapshot_id)["meta"]


def resume_delta(
    docs: DataFrame, done_doc_ids: DataFrame, broadcast_max_ids: int = 5_000_000
) -> DataFrame:
    """J5: anti-join resume — docs not yet processed by the checkpoint.

    Size-adaptive like the CC strategy choice: a shuffle left-anti join
    repartitions the ENTIRE corpus (spans payload included) on doc_id
    just to drop finished rows, while a broadcast anti-join streams the
    corpus untouched. Done-id sets up to ``broadcast_max_ids`` (id
    strings only — tens of MB) broadcast; beyond that (a mostly-finished
    10^12-doc run) the shuffle join is the right plan and AQE handles
    skew. The count probe is cheap: checkpoint tables are parquet, so
    count() is metadata-only."""
    from pyspark.sql import functions as F

    done = done_doc_ids.select("doc_id").distinct()
    if broadcast_max_ids > 0 and done_doc_ids.count() <= broadcast_max_ids:
        done = F.broadcast(done)
    return docs.join(done, "doc_id", "left_anti")
