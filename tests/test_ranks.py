"""Distributed total-order rank / prefix sums (pie_spark/ranks.py):
equality with the single-partition window formulation on fuzzed
inputs, partitioning invariance, and the exact interval algebra the
weighted samplers rely on."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from pie_spark.ranks import ordered_index, prefix_sums


def test_ordered_index_equals_global_window(spark):
    rng = random.Random(60615)
    keys = sorted({f"k{rng.randint(0, 10**6):07d}" for _ in range(500)})
    df = spark.createDataFrame([(k,) for k in keys], ["key"]).repartition(7)
    got = {r.key: r.idx for r in ordered_index(df, "key", num_parts=5).collect()}
    assert got == {k: i for i, k in enumerate(keys)}


def test_ordered_index_partitioning_invariant(spark):
    keys = [f"x{i:03d}" for i in range(97)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    a = sorted(tuple(r) for r in ordered_index(df.repartition(1), "key").collect())
    b = sorted(tuple(r) for r in ordered_index(df.repartition(9), "key", 3).collect())
    assert a == b


def test_prefix_sums_equal_running_window(spark):
    rng = random.Random(60616)
    rows = sorted(
        (f"e{i:04d}", rng.randint(1, 99)) for i in rng.sample(range(5000), 300)
    )
    df = spark.createDataFrame(rows, ["key", "w"]).repartition(6)
    got = {
        r.key: (r.idx, r.cum_lo, r.cum_hi)
        for r in prefix_sums(df, "key", "w", num_parts=4).collect()
    }
    win = Window.orderBy("key")
    ref = {
        r.key: (r.i, r.lo, r.hi)
        for r in df.select(
            "key",
            (F.row_number().over(win) - 1).cast("long").alias("i"),
            (F.sum("w").over(win) - F.col("w")).cast("long").alias("lo"),
            (F.sum("w").over(win) - 1).cast("long").alias("hi"),
        ).collect()
    }
    assert got == ref
    # disjoint cover of [0, total)
    ordered = [got[k] for k in sorted(got)]
    assert ordered[0][1] == 0
    for (_, _, hi_prev), (_, lo, _) in zip(ordered, ordered[1:]):
        assert lo == hi_prev + 1
