"""Distributed range (interval) join (J9 — with J8's as-of join, the
second temporal-join primitive Spark's DataFrame API lacks): match
every point to every interval containing it.

Spark executes a raw ``point BETWEEN lo AND hi`` join condition as
BroadcastNestedLoopJoin (small side) or a cartesian product — O(|P|·|I|)
per key group, the classic scale killer. The standard reduction makes
it an EQUI-join: quantize time into fixed-width buckets, explode each
interval onto every bucket it touches, equi-join points on bucket id,
then apply the exact BETWEEN as a post-filter. Cost: |P| + |I|·(1 +
span/width) shuffled rows and a hash join — linear when ``bucket_us``
is chosen near the typical interval span (≈2 buckets per interval).

Guard rails:
  * a degenerate interval (hi < lo) matches nothing and is dropped
    BEFORE bucket expansion — Spark's ``sequence(a, b)`` DESCENDS when
    b < a (memory: the sequence(1,0) trap), which would silently
    enumerate the reversed range;
  * a pathological interval spanning > ``max_buckets`` buckets fails
    fast with ``raise_error`` (per-row check, codegen-cheap) instead
    of silently exploding the shuffle — resize ``bucket_us`` or split
    the interval upstream.

Determinism: output is a plain join result (no ranking) — row set is
partitioning-independent by construction; callers needing one-best-
interval semantics compose with W1-style max_by.

Oracle strategy: the folded query's DuckDB mirror is the direct
``JOIN ... ON point BETWEEN lo AND hi`` (DuckDB plans it as an
IEJoin) — an independent algorithm, so agreement checks semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_us: int,
    max_buckets: int = 10_000,
) -> DataFrame:
    """Inner join: each points row × each intervals row whose
    [lo_col, hi_col] contains point_col (inclusive both ends).
    Column names must be disjoint across the two inputs (rename
    upstream); all three bound columns are integer (micros)."""
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {sorted(overlap)}")
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    b_pt = points.withColumn("__b", F.expr(f"{point_col} div {bucket_us}"))
    n_b = F.expr(
        f"({hi_col} div {bucket_us}) - ({lo_col} div {bucket_us}) + 1"
    )
    seq = F.expr(f"sequence({lo_col} div {bucket_us}, {hi_col} div {bucket_us})")
    # the guard is INSIDE the exploded expression so Catalyst cannot
    # prune it as dead code — violating rows fail at expansion time
    guarded = F.when(n_b <= max_buckets, seq).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval spans more than {max_buckets} buckets of "
                    f"{bucket_us}us: lo="
                ),
                F.col(lo_col).cast("string"),
                F.lit(" hi="),
                F.col(hi_col).cast("string"),
            )
        )
    )
    b_iv = intervals.filter(F.col(hi_col) >= F.col(lo_col)).withColumn(
        "__b", F.explode(guarded)
    )
    return (
        b_pt.join(b_iv, "__b")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__b")
    )
