"""Hypertable-style multi-resolution time-bucket rollup (A9 — the
TimescaleDB continuous-aggregate / Druid rollup primitive).

Event tables at 10^12 rows are queried at coarse granularities
("errors per hour last month"), and the naive path re-scans raw events
per query. The hypertable trick: materialize a CASCADE of bucketed
aggregates where each level is computed FROM THE PREVIOUS LEVEL, not
from raw — legal exactly when every aggregate is algebraic (count =
sum of counts, sum = sum of sums, min/max compose). A day-level row
re-aggregates 24 hour-rows instead of 86,400,000 raw rows; the raw
table is scanned ONCE for the finest level, every coarser level costs
|previous level| — geometric, not linear, in resolutions.

All aggregates here are the repo's exact-integer set (counts, LONG
micro/centi sums, min/max micros), so every level is bit-identical
across partitionings/engines AND provably equal to aggregating raw
directly — both pinned: pytest asserts cascade ≡ from-raw per level,
and the folded driver oracle GROUP BYs raw in DuckDB at every
resolution (the oracle deliberately takes the road the cascade
avoids, so agreement checks the re-aggregation algebra itself).

Buckets are epoch-aligned: ``bucket = ts div width`` (LONG division,
micros) — deterministic, timezone-free, and coarser widths that are
integer multiples of finer ones nest exactly (a requirement checked at
call time; a 7-minute level over a 2-minute level would double-count
boundary-straddling buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_events(
    events: DataFrame,
    width_us: int,
    ts_col: str = "ts_us",
    keys: list[str] | None = None,
    value_centi: str = "value_centi",
) -> DataFrame:
    """Finest rollup level, from raw: (keys..., bucket_us, n_events,
    value_centi, min_ts_us, max_ts_us) with bucket_us = floor-aligned
    epoch micros."""
    keys = keys or []
    return events.groupBy(
        *keys, F.expr(f"({ts_col} div {width_us}) * {width_us}").alias("bucket_us")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(value_centi).cast("long").alias("value_centi"),
        F.min(ts_col).alias("min_ts_us"),
        F.max(ts_col).alias("max_ts_us"),
    )


def _coarsen(level: DataFrame, width_us: int, keys: list[str]) -> DataFrame:
    """One cascade step: re-aggregate a finer level's algebraic parts."""
    return level.groupBy(
        *keys,
        F.expr(f"(bucket_us div {width_us}) * {width_us}").alias("bucket_us"),
    ).agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("value_centi").cast("long").alias("value_centi"),
        F.min("min_ts_us").alias("min_ts_us"),
        F.max("max_ts_us").alias("max_ts_us"),
    )


def rollup_cascade(
    events: DataFrame,
    widths_us: list[int],
    ts_col: str = "ts_us",
    keys: list[str] | None = None,
    value_centi: str = "value_centi",
) -> dict[int, DataFrame]:
    """{width_us: level} for ascending ``widths_us``; raw is scanned
    once (finest level), each coarser level derives from the previous.
    Every width must be an integer multiple of the one before it."""
    if not widths_us or sorted(widths_us) != list(widths_us):
        raise ValueError("widths_us must be ascending and non-empty")
    for a, b in zip(widths_us, widths_us[1:]):
        if b % a != 0:
            raise ValueError(
                f"cascade widths must nest: {b} is not a multiple of {a}"
            )
    keys = keys or []
    out: dict[int, DataFrame] = {}
    level = bucket_events(events, widths_us[0], ts_col, keys, value_centi)
    out[widths_us[0]] = level
    for w in widths_us[1:]:
        level = _coarsen(level, w, keys)
        out[w] = level
    return out
