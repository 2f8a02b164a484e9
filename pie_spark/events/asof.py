"""Distributed as-of join (J8 — the temporal-join primitive Spark's
DataFrame API lacks; pandas has ``merge_asof``, DuckDB has ASOF JOIN).

For every left row, attach the right row with the greatest
``right_ts`` ≤ ``left_ts`` within the same key (backward as-of,
exact-match inclusive), optionally within a tolerance — the standard
"event ↔ latest dimension snapshot at event time" join (feature
stores, slowly-changing dimensions, click→view attribution).

HOW, Spark-first: NOT a join at all. Both tables are tagged and
UNIONED, hash-partitioned once by key, and a single
``last(payload, ignorenulls)`` running window ordered by
``(ts, side, tiebreak)`` hands every left row the most recent right
payload — the sort-based as-of, one shuffle, no join node, no
quadratic key-group blowup (a naive ``left.join(right, key).filter(
r.ts <= l.ts)`` materializes |L_k|·|R_k| rows per key before picking
one — hot keys explode; the union trick is linear and inherits the
window operator's spill handling).

Determinism: right rows tied on (key, ts) are resolved by the CALLER-
NAMED ``right_id`` tiebreak column (max wins) — the repo's total-order
rule; pandas' merge_asof silently takes input order, which is
partitioning-dependent. Left rows never race: every left row at equal
ts sees the same preceding-right prefix (right sorts before left at
equal ts, making exact matches visible).

Tolerance semantics: the match is the NEWEST right row ≤ left_ts; if
THAT row is older than ``tolerance_us`` the result is null (if the
newest is out of tolerance, every older one is too — no second scan).

Oracle strategy: the folded query's DuckDB mirror is an INDEPENDENT
implementation — a correlated ``LEFT JOIN LATERAL ... ORDER BY ts
DESC, id DESC LIMIT 1`` — so cross-engine agreement checks the
semantics, not a transcription.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_id: str,
    right_cols: list[str] | None = None,
    tolerance_us: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + ``prefix``-renamed right payload columns (null when
    no right row at or before ``left_ts`` — or none within tolerance).

    ``right_cols`` defaults to every right column except the keys; the
    matched timestamp is always included as ``<prefix><right_ts>``.
    ``right_id`` must totally order right rows within (key, ts)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]
    if right_ts not in right_cols:
        right_cols = [right_ts] + right_cols
    left_cols = [c for c in left.columns if c not in on]

    payload = F.struct(*[F.col(c) for c in right_cols])
    r_side = right.select(
        *on,
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_id).cast("long").alias("__tie"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l_side = left.select(
        *on,
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(r_side.schema["__payload"].dataType).alias("__payload"),
        *left_cols,
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        r_side.unionByName(l_side)
        .withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_us is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__m").isNotNull()
                & (F.col("__ts") - F.col(f"__m.{right_ts}") <= int(tolerance_us)),
                F.col("__m"),
            ),
        )
    out_right = [
        F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return matched.select(*on, *left_cols, *out_right)
