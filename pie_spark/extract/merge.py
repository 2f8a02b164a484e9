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

    span_base = F.col("span_idx").cast("long") * F.lit(1 << 32)
    gstart = span_base + F.col("start")
    gend = span_base + F.col("end")
    order = Window.partitionBy("doc_id").orderBy(
        gstart.asc(), gend.desc(), F.col("detector").asc(), F.col("mention_type").asc()
    )
    prev_max_end = F.max(gend).over(order.rowsBetween(Window.unboundedPreceding, -1))
    grouped = unioned.withColumn(
        "new_group",
        F.when(prev_max_end.isNull() | (gstart >= prev_max_end), 1).otherwise(0),
    ).withColumn(
        "overlap_group",
        F.sum("new_group").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )

    # Winner per group via min_by over the SAME total order the old
    # row_number window used (priority, longer span, earlier start,
    # surface, detector) — r07: an aggregation gets map-side partial
    # combine and, unlike the window, needs NO second sort of the full
    # mention set; it rides the window's hash(doc_id) partitioning
    # exchange-free (clustering on (doc_id, overlap_group) is satisfied
    # by hash(doc_id)). Total order ⇒ the elected row is identical.
    # doc_id stays the GROUPING attribute in the output (not best.doc_id):
    # only then does Catalyst see the agg's hash(doc_id) partitioning as
    # satisfying downstream clustering (linking), keeping it exchange-free
    out_cols = [
        c for c in grouped.columns if c not in ("doc_id", "new_group", "overlap_group")
    ]
    order_key = F.struct(
        _priority().alias("prio"),
        (F.col("start") - F.col("end")).alias("neg_len"),
        gstart.alias("gstart"),
        F.col("surface").alias("surface"),
        F.col("detector").alias("detector"),
    )
    return (
        grouped.groupBy("doc_id", "overlap_group")
        .agg(F.min_by(F.struct(*out_cols), order_key).alias("best"))
        .select("doc_id", "best.*")
        .withColumn(
            "mention_id",
            F.xxhash64("doc_id", "span_idx", "start", "end", "mention_type"),
        )
    )
