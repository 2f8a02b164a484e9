"""Count-min sketch over the corpus token stream — sublinear-memory
frequency estimation (heavy hitters, join-skew pre-detection) when the
exact vocabulary is too large to materialize.

Classic CM guarantee: with ``d`` rows × ``w`` columns,
``est(x) ≥ true(x)`` always, and ``est(x) ≤ true(x) + εN`` with
probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. At 10^12 docs the exact
(token, count) table has billions of rows; the sketch is d·w longs
(e.g. 4×65536 = 2 MB) built in ONE partial-aggregable pass and cheap to
broadcast — exactly what the salting planner needs to flag hot join
keys without a full vocabulary shuffle.

Determinism: the d hash functions are the portable salted md5-prefix
h64 (``cm:<row>:<token>``), so the sketch — and every estimate — is
bit-identical across engines and partitionings (DuckDB-oracle-checked),
unlike sketch libraries keyed on JVM object hashing.

Shapes:
* build: explode tokens → unpivot to (row, bucket) via an inline d-array
  → groupBy(row, bucket) count — one shuffle of d·w bounded keys with
  map-side combine (hot tokens collapse before the exchange).
* estimate: broadcast-join the queried tokens' d (row, bucket) probes
  against the sketch → min over rows — no corpus access.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.dedup.shingles import h64

DEPTH = 4
WIDTH = 8192


def _bucket(token, row: int, width: int) -> F.Column:
    return F.pmod(h64(F.concat(F.lit(f"cm:{row}:"), token)), F.lit(width))


def build_sketch(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """(row, bucket, c): the d×w sketch counters for the corpus token
    stream (whitespace tokens, empties dropped)."""
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    probes = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col("token"), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p")
    )
    return (
        probes.select("p.row", "p.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def estimate_counts(
    sketch: DataFrame,
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """(token, est): CM point estimates (min over rows) for each queried
    token. The sketch side is broadcast (d·w rows, bounded)."""
    probes = tokens.select(
        F.col(token_col).alias("token"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(token_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select("token", "p.row", "p.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .na.fill({"c": 0})
        .groupBy("token")
        .agg(F.min("c").cast("long").alias("est"))
    )
