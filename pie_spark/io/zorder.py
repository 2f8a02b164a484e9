"""Z-order (Morton-curve) multi-column layout (O5 — the multi-key
companion to sinks.write_sorted's single-key clustering).

A table filtered on EITHER of two keys can't be served by a sort on
one of them; interleaving the keys' bits puts rows close on BOTH
dimensions into the same files, so parquet row-group min/max stats
prune scans for every participating predicate — the same reason
Delta/Iceberg offer OPTIMIZE ZORDER. This is the deterministic,
oracle-checkable rendition:

  * each column is min-max normalized to ``bits`` levels in PURE
    integer arithmetic — ``(v − min) · (2^bits − 1) div (max − min)``
    — from one tiny 1-row min/max aggregation (two longs per column
    to the driver; the Delta OSS approach samples range-partition ids
    instead, which is partitioning-dependent — this one is exact and
    reproducible);
  * the Morton key interleaves the normalized columns' bits with a
    closed-form shift/mask expression whose SQL TEXT is built once by
    :func:`zorder_expr_sql` and evaluated VERBATIM by both Spark and
    the DuckDB oracle (the bm25 score_expr_sql pattern) — bit-exact
    parity by construction, whole-stage-codegen friendly (pure
    shifts/ands/ors, no UDF);
  * the write is :func:`pie_spark.io.sinks.write_sorted` on the key:
    balanced ranges of the z-curve, globally sorted files.

Scale: normalization + key are narrow row-local expressions; the only
shuffle is write_sorted's range partition. ``bits`` defaults to 16 per
column (two columns → 32-bit keys); k·bits must stay ≤ 63 to fit the
LONG — asserted, not truncated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def norm_expr_sql(
    col: str, lo: int, hi: int, bits: int, intdiv: str = "div"
) -> str:
    """Min-max normalize an integer column to [0, 2^bits) in exact
    integer arithmetic; constant columns (lo == hi) map to 0.

    ``intdiv`` is the engine's integer-division spelling — Spark parses
    ``div``, DuckDB ``//`` (it rejects ``div``; checked). Both truncate
    identically on the nonnegative operands here, so the value is
    engine-independent even though the text differs by this one token."""
    levels = (1 << bits) - 1
    if hi == lo:
        return "CAST(0 AS BIGINT)"
    return (
        f"CAST((({col} - {lo}) * {levels}) {intdiv} ({hi} - {lo}) AS BIGINT)"
    )


def zorder_expr_sql(norm_cols: list[str], bits: int) -> str:
    """The Morton interleave of pre-normalized columns, as SQL text
    both engines evaluate verbatim: bit b of column i lands at key
    position b·k + i."""
    k = len(norm_cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols × {bits} bits exceeds a signed LONG")
    terms = [
        f"((({c} >> {b}) & 1) << {b * k + i})"
        for b in range(bits)
        for i, c in enumerate(norm_cols)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, dict[str, tuple[int, int]]]:
    """df + ``__zkey`` column; returns the per-column (min, max) used
    (two longs per column — the only driver data)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).cast("long").alias(f"__lo_{c}"),
                 F.max(c).cast("long").alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    bounds = {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}
    if any(lo is None for lo, _ in bounds.values()):
        return df.withColumn("__zkey", F.lit(0).cast("long")), bounds
    norms = [norm_expr_sql(c, *bounds[c], bits) for c in cols]
    return df.withColumn("__zkey", F.expr(zorder_expr_sql(norms, bits))), bounds


def write_zordered(
    df: DataFrame,
    out_dir: str,
    cols: list[str],
    num_files: int,
    bits: int = 16,
    max_records_per_file: int = 0,
) -> dict[str, tuple[int, int]]:
    """Write ``df`` clustered on the z-curve of ``cols``; returns the
    normalization bounds (callers record them in lineage so readers
    can reconstruct the curve for range pruning)."""
    from pie_spark.io.sinks import write_sorted

    keyed, bounds = zorder_key(df, cols, bits)
    write_sorted(
        keyed, out_dir, ["__zkey"], num_files,
        max_records_per_file=max_records_per_file,
    )
    return bounds
