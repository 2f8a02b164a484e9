"""Streaming exact-dedup over an append-only landing zone: emit each
document whose normalized content hash has never been seen before;
drop late-arriving duplicates across micro-batches via the state store.

Semantics = the batch D1 operator (same Unicode-normalized content key,
pie_spark/dedup/exact.py), applied incrementally: the first arrival of
a content key wins, all later arrivals are suppressed — so draining a
landing zone through this stream and batch-deduping the same files
yield the SAME surviving key set (asserted by tests/test_streaming.py).

State-size reality at 10^12 docs: corpus-wide streaming dedup keeps one
32-byte md5 per distinct content in the state store — too large for a
single store at full corpus scale. The production shapes are (a) this
stream with ``within_watermark`` bounding state to a time window
(near-dup arrivals cluster in time: re-crawls, mirrored posts), or
(b) the batch dedup family over the accumulated table. Both are
provided; unbounded mode is the exact semantic for modest landing
zones (billions, not trillions).

``dropDuplicates``/``dropDuplicatesWithinWatermark`` ride Spark's
streaming state store (RocksDB/HDFS-backed on a cluster) — partitioned
by key hash, so hot content keys shard across executors like any
keyed state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pie_spark.dedup.exact import _content_key
from pie_spark.schemas import DOC_SCHEMA

# landing-zone schema for the bounded-state mode: the plain DOC_SCHEMA
# plus the producer's ingestion timestamp (re-crawl landing zones carry
# one; the unbounded mode neither requires nor reads it)
DOC_EVENT_SCHEMA = T.StructType(
    [*DOC_SCHEMA.fields, T.StructField("event_time", T.TimestampType(), False)]
)


def streaming_dedup_docs(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    within_watermark: str | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain available files, appending only first-seen-content docs to
    ``output_dir``. ``within_watermark`` (e.g. ``"1 hour"``) bounds
    state: duplicates are only suppressed within the watermark window,
    and the input files must carry an ``event_time`` timestamp column
    (read via :data:`DOC_EVENT_SCHEMA`; the output keeps it)."""
    schema = DOC_SCHEMA if within_watermark is None else DOC_EVENT_SCHEMA
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    flat = stream.select(
        "doc_id",
        *(["event_time"] if within_watermark is not None else []),
        F.concat_ws(
            " ",
            F.transform("spans", lambda sp: F.coalesce(sp["text"], F.lit(""))),
        ).alias("text"),
    ).withColumn("content_md5", _content_key("text"))

    if within_watermark is not None:
        deduped = flat.withWatermark(
            "event_time", within_watermark
        ).dropDuplicatesWithinWatermark(["content_md5"])
    else:
        deduped = flat.dropDuplicates(["content_md5"])

    q = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
