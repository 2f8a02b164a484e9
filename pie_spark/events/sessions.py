"""Gap-based sessionization + per-session rollups over event streams
(W5/A8 in SURVEY.md §2.12 — the standard event-analytics primitive:
split each user's clickstream into sessions wherever the inter-event
gap exceeds a threshold, then aggregate per session).

Shape: ONE shuffle end-to-end. Both window passes (the lag that flags
session starts, the running sum that numbers sessions) partition by
``user_col``, and the per-session rollup groups on (user, session_idx)
— a superset of the window's partitioning key, so Catalyst reuses the
same exchange for all three (the same single-exchange discipline as the
T3 merge windows; asserted in tests/test_sessions.py's plan check).

Determinism discipline: timestamps enter the arithmetic as exact
integer MICROSECONDS (``unix_micros``) — gap comparison, session
numbering, durations, and rollup sums are all pure LONG work, so
results are bit-identical across partitionings and engines (no float
timestamps, no timezone-dependent truncation; the DuckDB oracle uses
``epoch_us`` on the same parquet int64). Ties on ts break by event_id
(total order), so session numbering is reproducible even with
duplicate timestamps.

Scale: sessions at 10^12 events is exactly this plan — one hash
partition by user, narrow window passes, map-side-combinable rollup.
Skewed power users are bounded by their own event counts (a window
over one user's partition slice), the same per-key-bounded argument as
the W3 overlap chains; a pathological single-user firehose would salt
on (user, coarse time bucket) first — the documented J6 recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_sec: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Events + (ts_us, session_idx): ``session_idx`` numbers each
    user's sessions from 1 in time order; a new session starts when
    the gap since the user's previous event exceeds ``gap_sec``
    (strictly greater — an exactly-gap-sized pause continues the
    session, mirrored verbatim in the SQL oracle)."""
    gap_us = int(gap_sec) * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # parquet TIMESTAMP may surface as TIMESTAMP_NTZ; the session zone
    # is pinned UTC (session.py), so the cast is value-preserving and
    # unix_micros lands on the same int64 DuckDB's epoch_us reads
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    new_sess = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return events.withColumn("ts_us", ts_us).withColumn(
        "session_idx", F.sum(new_sess).over(running).cast("long")
    )


def session_stats(
    sessionized: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-session rollup: (user, session_idx, n_events, start_us,
    end_us, duration_us, n_clicks, value_centi). The double value
    column is quantized to exact centi-units per ROW (round half-up,
    deterministic) and summed as LONGs — no float crosses an
    aggregation boundary (the lm.py discipline)."""
    value_centi = F.expr(f"CAST(round({value_col} * 100) AS BIGINT)")
    return sessionized.groupBy(
        F.col(user_col), F.col("session_idx")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.sum(
            F.when(F.col(type_col) == "click", F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_clicks"),
        F.sum(value_centi).cast("long").alias("value_centi"),
    )
