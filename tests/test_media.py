"""Multimodal plumbing: binary payload table, Arrow feature extraction
(stubbed codec), frame sampling."""

import pytest
from pyspark.sql import functions as F

from pie_spark.extract.spans import explode_spans, media_spans
from pie_spark.fixtures.gen import interleaved_docs
from pie_spark.media.features import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    sample_frames,
    synth_media_table,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = interleaved_docs(spark, SF_DIR)
    return synth_media_table(media_spans(explode_spans(docs))).cache()


def test_media_table_schema(media):
    row = media.filter(F.col("kind") == "image").first()
    assert isinstance(row.payload, (bytes, bytearray)) and len(row.payload) == 32
    assert 1 <= row.width <= 1920 and 1 <= row.height <= 1080
    assert row.duration_ms is None
    arow = media.filter(F.col("kind") == "audio").first()
    assert arow.duration_ms is not None and arow.width is None


def test_decode_stub_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx")


def test_feature_extraction_deterministic(media):
    f1 = {r.media_ref: r.features for r in extract_features(media).collect()}
    f2 = {r.media_ref: r.features for r in extract_features(media.repartition(5)).collect()}
    assert f1 == f2
    any_vec = next(iter(f1.values()))
    assert len(any_vec) == FEATURE_DIM
    assert all(0.0 <= x < 1.0 for x in any_vec)


def test_frame_sampling(media):
    frames = sample_frames(media, every_ms=10000)
    row = media.filter(F.col("kind") == "audio").first()
    n = frames.filter(F.col("media_ref") == row.media_ref).count()
    assert n == row.duration_ms // 10000 + 1


def test_resize_images_plumbing(spark):
    """Resize: aspect-preserving dims computed; payloads deterministic,
    distinct per (payload, out-dims); only image rows reach Python."""
    from pie_spark.extract.spans import explode_spans, media_spans
    from pie_spark.fixtures.gen import interleaved_docs
    from pie_spark.media.features import resize_images, synth_media_table

    docs = interleaved_docs(spark, "/root/testdata/sf0.001")
    media = synth_media_table(media_spans(explode_spans(docs)))
    out = resize_images(media, 224, 224)
    rows = out.collect()
    assert len(rows) == media.filter("kind = 'image'").count() > 0
    for r in rows:
        assert 1 <= r.out_width <= 224 and 1 <= r.out_height <= 224
        assert max(r.out_width, r.out_height) == 224  # aspect-fit touches a side
        assert len(r.payload) == 32
    # determinism
    again = {(r.doc_id, r.media_ref): bytes(r.payload) for r in out.collect()}
    assert {(r.doc_id, r.media_ref): bytes(r.payload) for r in rows} == again


def test_resize_requires_fake_flag():
    import pytest

    from pie_spark.media.features import resize_payload

    with pytest.raises(NotImplementedError):
        resize_payload(b"x", 10, 10, 5, 5)
