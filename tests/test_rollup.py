"""Hypertable rollup (events/rollup.py): cascade ≡ direct-from-raw at
every level (the re-aggregation algebra), nesting validation, and
partitioning independence."""

from __future__ import annotations

import pytest

from pie_spark.events.rollup import bucket_events, rollup_cascade

# (type, ts_us, value_centi) — spans multiple minutes/hours/days
ROWS = [
    ("click", 5_000_000, 100),
    ("click", 59_000_000, 200),            # same minute as the first
    ("click", 61_000_000, 300),            # next minute, same hour
    ("view", 3_599_000_000, 400),          # last minute of hour 0
    ("view", 3_600_000_000, 500),          # first of hour 1
    ("click", 86_400_000_000 + 7, 600),    # day 1
    ("view", 2 * 86_400_000_000 - 1, 700), # last micro of day 1
]
WIDTHS = [60_000_000, 3_600_000_000, 86_400_000_000]


def _events(spark, parts=4):
    return spark.createDataFrame(
        ROWS, "event_type string, ts_us long, value_centi long"
    ).repartition(parts)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cascade_equals_direct_per_level(spark):
    e = _events(spark)
    cascade = rollup_cascade(e, WIDTHS, keys=["event_type"])
    for w in WIDTHS:
        direct = bucket_events(e, w, keys=["event_type"])
        assert _rows(cascade[w]) == _rows(direct), w


def test_counts_and_boundaries(spark):
    cascade = rollup_cascade(_events(spark), WIDTHS, keys=["event_type"])
    day = {
        (r.event_type, r.bucket_us): (r.n_events, r.value_centi)
        for r in cascade[86_400_000_000].collect()
    }
    assert day[("click", 0)] == (3, 600)
    assert day[("view", 0)] == (2, 900)
    assert day[("click", 86_400_000_000)] == (1, 600)
    assert day[("view", 86_400_000_000)] == (1, 700)  # last-micro edge


def test_non_nesting_widths_rejected(spark):
    with pytest.raises(ValueError, match="nest"):
        rollup_cascade(_events(spark), [2_000_000, 7_000_000])
    with pytest.raises(ValueError, match="ascending"):
        rollup_cascade(_events(spark), [3_600_000_000, 60_000_000])


def test_partitioning_independent(spark):
    base = None
    for parts in (1, 9):
        cascade = rollup_cascade(_events(spark, parts), WIDTHS, keys=["event_type"])
        got = [_rows(cascade[w]) for w in WIDTHS]
        if base is None:
            base = got
        else:
            assert got == base
