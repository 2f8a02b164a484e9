"""T3: mention merge + overlap dedup (SURVEY.md §2.4 T3, §2.7 W3/U1).

Union of all detector outputs (regex ∪ gazetteer ∪ CRF), then one
winner per *overlap chain* within (doc_id, span_idx):

  1. overlap groups: order by start; a mention starts a new group iff
     its start ≥ running max(end) of everything before it (W3 —
     running-max window, no UDF);
  2. winner per group by (detector priority, longer span, earlier
     start, surface) — a total order, so results are deterministic
     under any partitioning (SURVEY.md §5.4).

Priority: regex-typed (EMAIL/SSN/PHONE/ADDRESS) > gazetteer > CRF —
typed patterns are higher-precision than dictionary hits, which beat
the sequence tagger.

Scale: two window passes sharing ONE shuffle on doc_id (same
partitioning + sort for both windows); no Python. Downstream consumers
keyed on supersets of doc_id reuse the same exchange.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _priority():
    # Column built lazily — module import must not require a live SparkContext
    return (
        F.when(F.col("detector") == "regex", 1)
        .when(F.col("detector") == "gazetteer", 2)
        .otherwise(3)
    )


def merge_mentions(*mention_dfs: DataFrame) -> DataFrame:
    """Union detector outputs and resolve overlaps; returns
    MENTION_SCHEMA plus a stable ``mention_id``.

    Windows partition by ``doc_id`` alone and order by synthetic doc-wide
    coordinates ``span_idx·2^32 + start/end``: within a span this is the
    span-local order (constant shift), and across spans coordinate
    ranges are disjoint by construction (start/end are int32), so
    overlap groups are EXACTLY the per-(doc_id, span_idx) groups for any
    input. Partitioning by doc_id — not (doc_id, span_idx) — means the
    ONE shuffle here is reused by everything downstream keyed on a
    superset of doc_id: linking's min_by aggregation and the mention
    branches all ride it exchange-free (asserted by
    tests/test_plans.py)."""
    unioned = reduce(lambda a, b: a.unionByName(b), mention_dfs)

    # r07: the doc-wide coordinates are materialized ONCE as attributes.
    # When each window recomputed them inline, the two grouping windows
    # referenced distinct expression IDs and Catalyst planned TWO
    # identical full sorts of the mention set; with shared attributes
    # both windows collapse onto one Sort. (A min_by-aggregation winner
    # election was measured as the alternative and rejected: min_by over
    # a struct plans as SortAggregate, re-adding the sort it saved.)
    span_base = F.col("span_idx").cast("long") * F.lit(1 << 32)
    coords = unioned.withColumn("__gs", span_base + F.col("start")).withColumn(
        "__ge", span_base + F.col("end")
    )
    order = Window.partitionBy("doc_id").orderBy(
        F.col("__gs").asc(), F.col("__ge").desc(),
        F.col("detector").asc(), F.col("mention_type").asc(),
    )
    prev_max_end = F.max("__ge").over(order.rowsBetween(Window.unboundedPreceding, -1))
    grouped = coords.withColumn(
        "new_group",
        F.when(prev_max_end.isNull() | (F.col("__gs") >= prev_max_end), 1).otherwise(0),
    ).withColumn(
        "overlap_group",
        F.sum("new_group").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )

    rank = Window.partitionBy("doc_id", "overlap_group").orderBy(
        _priority().asc(),
        (F.col("end") - F.col("start")).desc(),
        F.col("__gs").asc(),
        F.col("surface").asc(),
        F.col("detector").asc(),
    )
    return (
        grouped.withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") == 1)
        .drop("rn", "new_group", "overlap_group", "__gs", "__ge")
        .withColumn(
            "mention_id",
            F.xxhash64("doc_id", "span_idx", "start", "end", "mention_type"),
        )
    )
