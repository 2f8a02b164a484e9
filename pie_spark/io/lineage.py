"""S6/A6: per-partition lineage rows + extraction metrics
(BASELINE.json:6,14 — "per-partition lineage rows and extraction
metrics"; SURVEY.md §1.3 lineage schema).

Lineage is computed with one native aggregation over
``spark_partition_id()`` per stage — metrics ride the same scan that
produced the stage output, no extra pass over the corpus. Run-level
counters that must not trigger extra jobs use ``df.observe``.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def new_run_id() -> str:
    return uuid.uuid4().hex[:16]


def stage_lineage(
    df: DataFrame,
    run_id: str,
    stage: str,
    input_snapshot: str,
    wall_ms: int,
    doc_col: str = "doc_id",
    mention_count: bool = False,
    triple_count: bool = False,
) -> DataFrame:
    """Per-partition lineage rows for one stage's output DataFrame."""
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.countDistinct(doc_col).alias("docs_in"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "partition_id",
            F.col("docs_in").cast("long"),
            (F.col("n_rows") if mention_count else F.lit(0)).cast("long").alias("mentions"),
            (F.col("n_rows") if triple_count else F.lit(0)).cast("long").alias("triples_out"),
            F.lit(wall_ms).cast("long").alias("wall_ms"),
            F.lit(input_snapshot).alias("input_snapshot"),
            F.current_timestamp().alias("committed_at"),
        )
    )
