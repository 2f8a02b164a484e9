"""Multimodal column plumbing (training-data pipeline op).

Images / audio / video are opaque ``binary`` payload columns with typed
metadata. The Spark-side machinery here is REAL and tested — schemas,
partitioning, Arrow batch shapes, ``mapInPandas`` feature extraction —
while the codec step is STUBBED: no image/audio libraries exist in this
container, so ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless a deterministic fake is requested
(``fake=True``), which derives a payload-dependent feature vector from
the bytes themselves. Swapping the stub for PIL/torchaudio changes ONE
function; nothing in the dataflow moves.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 16

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def media_table_from_docs(docs: DataFrame) -> DataFrame:
    """Deterministic media-span rows derived NATIVELY from a documents
    table — every expression is SQL-expressible, which is what lets the
    media operators be DuckDB-oracle-checked end-to-end (the pipeline's
    own media table comes from the numpy corpus generator, which no SQL
    engine can mirror). Each doc gets ``length(text) % 4`` media items,
    alternating image/audio. Feed the result to :func:`synth_media_table`.

    Note the filter-then-explode order: Spark's ``sequence(1, 0)`` is the
    DESCENDING [1, 0], not empty like DuckDB's generate_series, so docs
    with zero items must be dropped before the sequence is built."""
    n_media = F.length("text") % 4
    return (
        docs.filter(n_media >= 1)
        .select("doc_id", F.explode(F.sequence(F.lit(1), n_media)).alias("i"))
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),  # media schemas are string-keyed
            F.concat(F.lit("media://"), F.col("doc_id").cast("string"),
                     F.lit("/"), F.col("i").cast("string")).alias("media_ref"),
            F.when(F.col("i") % 2 == 1, F.lit("image")).otherwise(F.lit("audio")).alias("kind"),
        )
    )


def synth_media_table(media_spans: DataFrame) -> DataFrame:
    """Build the binary media table from media span rows: payload =
    sha2-derived pseudo-bytes (deterministic stand-in for real blobs);
    metadata derived natively from the hash (no Python)."""
    h = F.sha2(F.col("media_ref"), 256)
    return media_spans.select(
        "doc_id",
        "media_ref",
        "kind",
        F.to_binary(h, F.lit("hex")).alias("payload"),
        F.when(F.col("kind") == "image", (F.conv(F.substring(h, 1, 3), 16, 10) % 1920 + 1).cast("int")).alias("width"),
        F.when(F.col("kind") == "image", (F.conv(F.substring(h, 4, 3), 16, 10) % 1080 + 1).cast("int")).alias("height"),
        F.when(F.col("kind") == "audio", (F.conv(F.substring(h, 7, 4), 16, 10) % 60000 + 1).cast("int")).alias("duration_ms"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs PIL/opencv (absent in this container)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv — not available in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    return _fake_features(payload)


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs soundfile/torchaudio (absent here)."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires soundfile/torchaudio — not available; "
            "pass fake=True for the deterministic stand-in"
        )
    return _fake_features(payload)


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic payload-derived feature vector: sha256 expand →
    FEATURE_DIM floats in [0, 1). Hashes the payload's lowercase-hex
    form, not the raw bytes — a VARCHAR input both Spark and DuckDB can
    build identically (DuckDB 1.0 sha256 does not accept BLOB), keeping
    the fake codec oracle-checkable."""
    raw = hashlib.sha256(payload.hex().encode()).digest() * ((FEATURE_DIM * 4) // 32 + 1)
    arr = np.frombuffer(raw[: FEATURE_DIM * 4], dtype=np.uint32).astype(np.float64)
    return (arr / 2**32).astype(np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.
    Batch shape: one pandas DataFrame per Arrow batch; decode runs
    per-payload inside the batch (the codec call is the irreducible
    per-item cost; everything around it is vectorized transport)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                (decode_image if k == "image" else decode_audio)(p, fake=True).tolist()
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.select("doc_id", "media_ref", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video/audio: one row per sampled
    timestamp, derived natively from duration metadata (the decode of
    the frame itself is the stubbed step above)."""
    return (
        media.filter(F.col("duration_ms").isNotNull())
        .select(
            "doc_id",
            "media_ref",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("ts_ms"),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def resize_payload(
    payload: bytes, w: int, h: int, out_w: int, out_h: int, fake: bool = False
) -> bytes:
    """STUB: real resize needs PIL/opencv (absent in this container).
    The deterministic fake derives the resized payload from
    (payload, out dims) so tests can assert stability and uniqueness."""
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL/opencv — not available in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    # hex-string input for DuckDB-oracle parity (see _fake_features)
    return hashlib.sha256(f"{payload.hex()}{out_w}x{out_h}".encode()).digest()


def resize_images(media: DataFrame, out_w: int = 224, out_h: int = 224) -> DataFrame:
    """Arrow-batched image resize over binary payloads (mapInPandas):
    aspect-preserving fit into (out_w, out_h) computed natively where
    possible; the pixel work is the stubbed codec call. Only image rows
    enter the Python stage (filter pushed below it)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ow, oh, blobs = [], [], []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                # aspect-fit in EXACT integer math (min(ow·h, oh·w) is the
                # shared scale numerator over w·h): floats would tie-break
                # .5 cases differently across engines (Python banker's
                # round vs SQL half-away) and break oracle parity
                w, h = max(int(w), 1), max(int(h), 1)
                m = min(out_w * h, out_h * w)
                tw = max(1, m // h)
                th = max(1, m // w)
                ow.append(tw)
                oh.append(th)
                blobs.append(resize_payload(p, w, h, tw, th, fake=True))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "out_width": ow,
                    "out_height": oh,
                    "payload": blobs,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("doc_id", "media_ref", "payload", "width", "height")
        .mapInPandas(run, schema=RESIZED_SCHEMA)
    )
