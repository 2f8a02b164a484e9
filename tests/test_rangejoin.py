"""Range join (events/rangejoin.py): planted-pair equivalence to the
naive cross-product filter, boundary inclusivity, degenerate-interval
drop, bucket-explosion guard, plan shape (equi-join, never nested
loop), and partitioning independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pie_spark.events.rangejoin import range_join

POINTS = [(1, 100), (2, 1000), (3, 2500), (4, 9999)]
INTERVALS = [
    (10, 0, 100),      # hi inclusive: contains point 100
    (11, 100, 2600),   # contains 100, 1000, 2500
    (12, 2500, 2500),  # zero-width: contains exactly 2500
    (13, 5000, 4000),  # degenerate (hi < lo): matches nothing
    (14, 9000, 20000), # spans many buckets; contains 9999
]


def _dfs(spark, parts=4):
    p = spark.createDataFrame(POINTS, "pid long, pt long").repartition(parts)
    i = spark.createDataFrame(INTERVALS, "iid long, lo long, hi long").repartition(parts)
    return p, i


def _naive(points, intervals):
    return {
        (pid, iid)
        for pid, pt in points
        for iid, lo, hi in intervals
        if lo <= pt <= hi
    }


@pytest.mark.parametrize("bucket", [1, 7, 100, 10_000])
def test_matches_naive_cross_filter(spark, bucket):
    p, i = _dfs(spark)
    got = {
        (r.pid, r.iid)
        for r in range_join(
            p, i, "pt", "lo", "hi", bucket_us=bucket, max_buckets=30_000
        ).collect()
    }
    assert got == _naive(POINTS, INTERVALS)


def test_explosion_guard_raises(spark):
    p, i = _dfs(spark)
    with pytest.raises(Exception, match="spans more than"):
        range_join(p, i, "pt", "lo", "hi", bucket_us=1, max_buckets=10).collect()


def test_column_overlap_rejected(spark):
    p, _ = _dfs(spark)
    with pytest.raises(ValueError, match="rename overlapping"):
        range_join(p, p, "pt", "pt", "pt", bucket_us=10)


def test_plan_equi_join_not_nested_loop(spark):
    p, i = _dfs(spark)
    out = range_join(p, i, "pt", "lo", "hi", bucket_us=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_partitioning_independent(spark):
    base = None
    for parts in (1, 9):
        p, i = _dfs(spark, parts)
        got = sorted(
            tuple(r) for r in range_join(p, i, "pt", "lo", "hi", bucket_us=50).collect()
        )
        if base is None:
            base = got
        else:
            assert got == base
