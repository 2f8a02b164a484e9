"""Deterministic dataset splitting for training pipelines.

train/val/test assignment must be a pure function of the example key —
never of partitioning, row order, or cluster size — so that re-sharding
a 100 TB corpus, resuming a failed run, or adding new data never moves
an old document across the split boundary (the classic eval-leak bug).
Assignment = salted md5 of the key mod 1e6 against cumulative weight
thresholds; md5 keeps it portable to any engine (DuckDB-oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pie_spark.dedup.shingles import h64

DENOM = 1_000_000


def split_bucket(key: Column, salt: str = "split:") -> Column:
    """Stable bucket in [0, 1e6) from the salted key hash."""
    return F.pmod(h64(F.concat(F.lit(salt), key.cast("string"))), F.lit(DENOM))


def split_column(
    key: Column,
    weights: dict[str, float] | None = None,
    salt: str = "split:",
) -> Column:
    """The split-name assignment as ONE column expression (for fused
    single-scan scorers). ``weights`` map split name → fraction (must
    sum to ≤ 1; remainder falls into the LAST split). Thresholds are
    cumulative in the given order, so the mapping is reproducible from
    the config alone."""
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights or any(w < 0 for w in weights.values()) or sum(weights.values()) > 1 + 1e-9:
        raise ValueError(
            f"invalid split weights (each >= 0, sum <= 1): {weights}"
        )
    bucket = split_bucket(key, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * DENOM))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def assign_splits(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split:",
) -> DataFrame:
    """Adds (split_bucket, split) columns — see :func:`split_column`."""
    key = F.col(key_col)
    return df.withColumn("split_bucket", split_bucket(key, salt)).withColumn(
        "split", split_column(key, weights, salt)
    )
