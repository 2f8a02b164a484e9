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


# ---- streaming twin (streaming/rollup.py) ----

def test_stream_rollup_equals_batch_at_every_level(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from pie_spark.events.rollup import _coarsen
    from pie_spark.streaming.rollup import combined_rollup, stream_rollup

    # land the fixture events as 3 chronological chunks so buckets span
    # micro-batches (same drill as the sessionization twin)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    qs = ev.approxQuantile("event_id", [0.33, 0.66], 0.0)
    lz = str(tmp_path / "lz")
    bounds = [(None, qs[0]), (qs[0], qs[1]), (qs[1], None)]
    for i, (lo, hi) in enumerate(bounds):
        c = ev
        if lo is not None:
            c = c.filter(F.col("event_id") > lo)
        if hi is not None:
            c = c.filter(F.col("event_id") <= hi)
        c.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(lz, f"chunk-{i:03d}")
        )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # day-width finest level: boundary days are dense enough that a
    # bucket provably spans micro-batches (hour buckets on this sparse
    # fixture often don't straddle a chunk edge per event_type)
    stream_rollup(
        spark, lz + "/chunk-*", out, ckpt,
        width_us=86_400_000_000, keys=["event_type"], max_files_per_trigger=1,
    )
    combined = combined_rollup(spark, out, keys=["event_type"])

    raw = ev.select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("value_centi"),
    )
    from pie_spark.events.rollup import bucket_events

    batch = bucket_events(raw, 86_400_000_000, keys=["event_type"])
    assert _rows(combined) == _rows(batch)
    # a bucket must span micro-batches for the test to mean anything
    per_epoch = spark.read.option("pathGlobFilter", "*.parquet").parquet(
        out + "/epoch-*"
    ).withColumn("__e", F.input_file_name())
    n_partials = per_epoch.groupBy("event_type", "bucket_us").count()
    assert n_partials.filter(F.col("count") > 1).count() > 0

    # coarser level from the combined stream partials ≡ batch cascade
    wk = 7 * 86_400_000_000
    assert _rows(_coarsen(combined, wk, ["event_type"])) == _rows(
        _coarsen(batch, wk, ["event_type"])
    )

    # idempotent re-drain
    stream_rollup(
        spark, lz + "/chunk-*", out, ckpt,
        width_us=86_400_000_000, keys=["event_type"], max_files_per_trigger=1,
    )
    assert _rows(combined_rollup(spark, out, keys=["event_type"])) == _rows(batch)
