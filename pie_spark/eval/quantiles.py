"""Mergeable log-histogram quantile sketch (X26 in SURVEY.md §2.12 —
the quantile member of the sketch family next to count-min heavy
hitters and the deterministic HLL).

Why not exact quantiles or Spark's approx_percentile at 10^12 rows:
exact needs a global sort or a value→count table the size of the
value domain; approx_percentile's GK sketch is engine-specific (the
approx_count_distinct problem all over again — no cross-engine
oracle). This sketch is the HDR-histogram / DDSketch idea built from
engine-portable INTEGER primitives only:

* bucket(v) for v > 0 keeps the top p+1 significant bits: with
  b = bitlen(v) (via binary-string length — the HLL trick; no float
  log2 to drift at power-of-two boundaries), shift = max(b−1−p, 0),
  sub = v >> shift, id = (shift << (p+1)) + sub. Values below 2^(p+1)
  map to themselves (exact); v = 0 is bucket 0. The id is MONOTONE in
  v, so quantile extraction is a prefix walk, and the bucket's value
  interval [sub << shift, ((sub+1) << shift) − 1] bounds any member
  with relative error ≤ 2^−p (width/lo = 1/sub ≤ 2^−p).
* the sketch is ONE map-side-combinable groupBy(bucket).count() —
  at most (64−p)·2^p + 2^(p+1) rows ever cross the shuffle
  (p = 6 → ≤ 3,840) regardless of input size, and two sketches merge
  by bucket-sum (pytest pins merge(halves) ≡ sketch(whole) exactly,
  the per-partition/per-epoch metrics story).
* quantile q_ppm reads the cumulative walk at rank
  ceil(q·N) = (q_ppm·N + 999999) // 10^6 (the X11 integer-ceil
  recipe) and returns the bucket's EXACT integer bounds [lo, hi] —
  the true quantile provably lies inside (pytest-pinned against
  exact sort-based quantiles).

Everything is BIGINT bit arithmetic, so the DuckDB oracle replays the
whole pipeline verbatim (``length(bin(v))`` ↔ Spark
``length(conv(v, 10, 2))``, both engines returning 1 for v = 0).

Contract: values must be non-negative integers (lengths, counts,
ppm scores — shift anything signed non-negative first, the V2 QI
discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bitlen(col):
    return F.length(F.conv(col.cast("string"), 10, 2))


def _shr(col, bits):
    # F.shiftright only takes a literal bit count; the SQL function
    # accepts a column — call it directly
    return F.call_function("shiftright", col, bits.cast("int"))


def _shl(col, bits):
    return F.call_function("shiftleft", col, bits.cast("int"))


def hdr_bucket(col, p: int = 6):
    """Monotone bucket id expression for a non-negative integer column."""
    b = _bitlen(col)
    shift = F.greatest(b - 1 - p, F.lit(0))
    sub = _shr(col, shift)
    return (
        F.when(col <= 0, F.lit(0))
        .otherwise(_shl(shift.cast("long"), F.lit(p + 1)) + sub)
        .cast("long")
    )


def hdr_sketch(
    df: DataFrame, value_col: str, p: int = 6
) -> DataFrame:
    """(bucket, lo, hi, n): the sketch. One algebraic aggregation —
    ≤ (64−p)·2^p + 2^(p+1) rows leave the map side at any input size."""
    sk = (
        df.select(hdr_bucket(F.col(value_col).cast("long"), p).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )
    return sk.select("bucket", *_bounds(p), "n")


def _bounds(p: int):
    shift = F.shiftright(F.col("bucket"), p + 1)
    rem = F.col("bucket") - F.shiftleft(shift, p + 1)
    lo = F.when(shift == 0, rem).otherwise(_shl(rem, shift)).cast("long")
    hi = (
        F.when(shift == 0, rem)
        .otherwise(_shl(rem + 1, shift) - 1)
        .cast("long")
    )
    return lo.alias("lo"), hi.alias("hi")


def merge_sketches(*sketches: DataFrame) -> DataFrame:
    """Bucket-sum merge — the property that makes the sketch usable as
    a per-partition / per-epoch metric that rolls up exactly."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return (
        u.groupBy("bucket", "lo", "hi").agg(F.sum("n").alias("n"))
    )


def hdr_quantiles(sketch: DataFrame, qs_ppm: list[int]) -> DataFrame:
    """(q_ppm, rank, lo, hi): for each requested quantile (ppm), the
    exact integer bounds of the bucket holding rank ceil(q·N). The
    cumulative window runs over the ≤ 4k-row sketch — bounded by the
    bucket-id domain, never by the input (documented single-partition
    window, the percentile_rank X17 shape on a provably tiny table)."""
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bucket", "lo", "hi", "n", F.sum("n").over(w).alias("cum")
    )
    total = sketch.agg(F.sum("n").alias("total"))
    qs = F.explode(
        F.array(*[F.lit(int(q)).cast("long") for q in qs_ppm])
    ).alias("q_ppm")
    ranks = total.select(qs, "total").select(
        "q_ppm",
        F.floor((F.col("q_ppm") * F.col("total") + 999999) / 1_000_000)
        .cast("long")
        .alias("rank"),
    )
    hit = (
        cum.join(F.broadcast(ranks), F.col("cum") >= F.col("rank"))
        .groupBy("q_ppm", "rank")
        .agg(
            F.min_by(
                F.struct(F.col("lo").alias("lo"), F.col("hi").alias("hi")),
                F.col("bucket"),
            ).alias("b")
        )
    )
    return hit.select(
        "q_ppm", "rank", F.col("b.lo").alias("lo"), F.col("b.hi").alias("hi")
    )
