"""As-of join (events/asof.py): planted backward-match semantics,
exact-match inclusion, tie resolution by right_id, tolerance null-out,
no-match nulls, and determinism across partitionings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pie_spark.events.asof import asof_join

# left: (user, click_id, ts); right: (user, view_id, ts)
CLICKS = [(1, 100, 1000), (1, 101, 5000), (2, 200, 700), (3, 300, 50)]
VIEWS = [
    (1, 10, 900),   # before click 100
    (1, 11, 1000),  # exact match with click 100 → wins (inclusive)
    (1, 12, 4000),
    (2, 20, 600),
    (2, 21, 600),   # tie on (user, ts) → max view_id (21) wins
    # user 3 has no views at all
]


def _dfs(spark, parts=4):
    c = spark.createDataFrame(CLICKS, "user_id long, event_id long, ts_us long")
    v = spark.createDataFrame(VIEWS, "user_id long, view_id long, vts_us long")
    return c.repartition(parts), v.repartition(parts)


def _run(spark, tol=None, parts=4):
    c, v = _dfs(spark, parts)
    out = asof_join(
        c, v, on=["user_id"], left_ts="ts_us", right_ts="vts_us",
        right_id="view_id", tolerance_us=tol, prefix="m_",
    )
    return {r.event_id: (r.m_view_id, r.m_vts_us) for r in out.collect()}


def test_backward_match_and_exact_inclusive(spark):
    got = _run(spark)
    assert got[100] == (11, 1000)  # exact ts match included
    assert got[101] == (12, 4000)  # latest preceding
    assert got[300] == (None, None)  # no right rows for the key


def test_tie_broken_by_right_id(spark):
    got = _run(spark)
    assert got[200] == (21, 600)


def test_tolerance_nulls_stale_matches(spark):
    got = _run(spark, tol=500)
    assert got[101] == (None, None)  # newest view is 1000us stale > 500
    assert got[100] == (11, 1000)  # 0us stale, kept
    assert got[200] == (21, 600)  # 100us stale, kept


def test_partitioning_independent(spark):
    assert _run(spark, parts=1) == _run(spark, parts=9)


def test_plan_is_one_window_no_join(spark):
    c, v = _dfs(spark)
    out = asof_join(
        c, v, on=["user_id"], left_ts="ts_us", right_ts="vts_us",
        right_id="view_id", prefix="m_",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan  # union + window, never a join node
    assert plan.count("Window") >= 1
