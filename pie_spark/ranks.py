"""Distributed total-order rank and prefix sums (scale fix for the
V-row single-partition window).

Several operators need "the rank of each row in ORDER BY key" (vocab
indexing for negative sampling) or "the running sum of a weight in key
order" (cumulative-interval samplers). The obvious
``row_number().over(Window.orderBy(key))`` collapses the whole table
into ONE partition — acceptable at dictionary scale (the X17
precedent), an Amdahl serial section at 10^8+ rows, and the measured
bottleneck of the negative-sampling scaling run (4→16 cores eff 0.46
at a 400k-entity vocab; BENCH/BASELINE.md).

The scalable construction: range-partition by key, sort within
partitions (both fully parallel), then offset each partition's local
rank/local prefix sum by the total of all earlier partitions — a
K-row driver aggregate (K = shuffle partitions, bounded), broadcast
back as a literal map. The output is INDEPENDENT of where the sampled
range boundaries fall: offset + local rank = global rank for ANY
boundary placement over a total order, so determinism holds even
though ``repartitionByRange`` samples boundaries.

Keys must be unique (they are: both call sites rank DISTINCT sets);
ties across a boundary would otherwise split nondeterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _offsets_map(counts: list[tuple[int, int]]) -> F.Column:
    lits: list[F.Column] = []
    acc = 0
    for pid, cnt in sorted(counts):
        lits.append(F.lit(pid))
        lits.append(F.lit(acc))
        acc += cnt
    return F.create_map(*lits)


def ordered_index(df: DataFrame, key: str, num_parts: int = 0) -> DataFrame:
    """Adds ``idx``: the 0-based rank of ``key`` in ascending order —
    ≡ row_number().over(Window.orderBy(key)) − 1, computed without a
    single-partition window. ``key`` values must be distinct."""
    k = num_parts or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    # CHECKPOINT the ranged layout: repartitionByRange SAMPLES its
    # boundaries per evaluation, so without pinning, the offsets
    # collected here could describe a DIFFERENT partitioning than the
    # one the final select reads (caught live: negative-sample counts
    # drifted across core counts before this line)
    ranged = (
        df.repartitionByRange(int(k), F.col(key))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = [
        (r["__pid"], r["n"])
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    ]  # bounded: K rows
    w = Window.partitionBy("__pid").orderBy(key)
    return ranged.select(
        *df.columns,
        (
            _offsets_map(counts)[F.col("__pid")]
            + F.row_number().over(w)
            - 1
        ).cast("long").alias("idx"),
    )


def prefix_sums(
    df: DataFrame, key: str, weight: str, num_parts: int = 0
) -> DataFrame:
    """Adds ``idx`` (as :func:`ordered_index`), ``cum_lo`` and
    ``cum_hi``: the exclusive/inclusive running sum of ``weight`` in
    ``key`` order — the cumulative-interval table of the weighted
    samplers, without the single-partition window. ``key`` values must
    be distinct; weights are summed as longs."""
    k = num_parts or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    # pinned for the same two-evaluation consistency reason as above
    ranged = (
        df.repartitionByRange(int(k), F.col(key))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    agg = [
        (r["__pid"], r["n"], r["s"])
        for r in ranged.groupBy("__pid")
        .agg(F.count("*").alias("n"), F.sum(weight).cast("long").alias("s"))
        .collect()
    ]  # bounded: K rows
    idx_map = _offsets_map([(p, n) for p, n, _ in agg])
    sum_map = _offsets_map([(p, s) for p, _, s in agg])
    w = Window.partitionBy("__pid").orderBy(key)
    run = F.sum(weight).over(w).cast("long")
    return ranged.select(
        *df.columns,
        (idx_map[F.col("__pid")] + F.row_number().over(w) - 1)
        .cast("long")
        .alias("idx"),
        (sum_map[F.col("__pid")] + run - F.col(weight)).cast("long").alias("cum_lo"),
        (sum_map[F.col("__pid")] + run - 1).cast("long").alias("cum_hi"),
    )
