"""Production runner: checkpointed, resumable, lineage-committing
(SURVEY.md §3.1/§3.3; BASELINE.json:6,14 — "resumable from Iceberg
snapshot checkpoints with per-partition lineage rows and extraction
metrics").

Run shape:
  1. extract stage → mention rows, committed to the checkpoint table
     as snapshot {mentions, docs_done} (atomic, manifest-last);
  2. downstream (link / CC / triples);
  3. triples + per-partition lineage committed to the output table in
     ONE snapshot, bucketed on doc_id (S5).

Resume: if the checkpoint table has an extract snapshot, only docs
absent from its ``docs_done`` are re-extracted (J5 anti-join); the
mention union is byte-identical to a fresh run because extraction is
deterministic per document.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from pie_spark.config import PipelineConfig
from pie_spark.io.lineage import new_run_id, stage_lineage
from pie_spark.io.sinks import write_triples
from pie_spark.io.snapshots import SnapshotTable, resume_delta
from pie_spark.pipeline import PipelineResult, downstream_stage, extract_stage


@dataclass
class RunOutput:
    result: PipelineResult
    run_id: str
    extract_snapshot: int | None
    output_snapshot: int | None
    resumed_docs: int | None  # docs re-extracted on resume (None = fresh run)


def run_checkpointed(
    spark: SparkSession,
    cfg: PipelineConfig,
    docs: DataFrame,
    dict_df: DataFrame,
    input_snapshot: str = "",
) -> RunOutput:
    run_id = new_run_id()
    ckpt = SnapshotTable(cfg.checkpoint_dir) if cfg.checkpoint_dir else None

    t0 = time.perf_counter()
    resumed_docs = None
    extract_sid = None

    mode: dict = {}
    if ckpt is not None and cfg.resume and ckpt.current_snapshot() is not None:
        done_docs = ckpt.scan(spark, "docs_done")
        done_mentions = ckpt.scan(spark, "mentions")
        todo = resume_delta(docs, done_docs)
        resumed_docs = todo.count()
        if resumed_docs == 0:
            # fully-covered checkpoint: skip the (empty) fresh-extract
            # branch entirely — no Python stage, no union
            merged = done_mentions
        else:
            fresh = extract_stage(spark, cfg, todo, dict_df, mode_out=mode)
            merged = done_mentions.unionByName(fresh)
        extract_sid = ckpt.current_snapshot()
        # Recover dict_mode from the extract snapshot's meta (ADVICE
        # r04): a fully-covered resume never re-probes the dictionary,
        # and defaulting to "broadcast" would hand downstream_stage an
        # F.broadcast() on the very dictionary the join fallback exists
        # to keep off the driver. Partial resumes re-probe in
        # extract_stage; setdefault keeps that (identical) answer.
        mode.setdefault(
            "dict_mode", ckpt.meta(extract_sid).get("dict_mode", "broadcast")
        )
    else:
        merged = extract_stage(spark, cfg, docs, dict_df, mode_out=mode)

    merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
    dict_mode = mode.get("dict_mode", "broadcast")

    if ckpt is not None and extract_sid is None:
        extract_sid = ckpt.commit(
            {"mentions": merged, "docs_done": docs.select("doc_id")},
            meta={"stage": "extract", "run_id": run_id,
                  "input_snapshot": input_snapshot, "dict_mode": dict_mode},
        )
    extract_ms = int((time.perf_counter() - t0) * 1000)

    res = downstream_stage(spark, cfg, docs, merged, dict_df, dict_mode=dict_mode)

    out_sid = None
    if cfg.output_path:
        out = SnapshotTable(cfg.output_path)
        wall_ms = int((time.perf_counter() - t0) * 1000)
        lineage = stage_lineage(
            merged, run_id, "extract", input_snapshot, extract_ms, mention_count=True
        ).unionByName(
            stage_lineage(
                res.triples, run_id, "materialize", input_snapshot, wall_ms,
                triple_count=True,
            )
        )
        out_sid = write_triples(
            out, res.triples, lineage, cfg.buckets,
            meta={"run_id": run_id, "input_snapshot": input_snapshot,
                  "extract_snapshot": extract_sid, "dict_mode": res.dict_mode},
        )
    return RunOutput(res, run_id, extract_sid, out_sid, resumed_docs)
