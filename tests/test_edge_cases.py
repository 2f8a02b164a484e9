"""Degenerate-input hardening: the full pipeline must handle empty
corpora, media-only documents, and null/empty text spans without
crashing — at 10^12 docs every weird shape WILL occur."""

from __future__ import annotations

from pie_spark.config import PipelineConfig
from pie_spark.fixtures.gen import entity_dict_df
from pie_spark.pipeline import run
from pie_spark.schemas import DOC_SCHEMA


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema=DOC_SCHEMA)


def test_empty_corpus(spark):
    res = run(spark, PipelineConfig(), _docs(spark, []), entity_dict_df(spark))
    assert res.triples.count() == 0
    res.unpersist()


def test_media_only_docs(spark):
    rows = [
        ("m1", [{"kind": "image", "text": None, "media_ref": "media://m1/0", "offset": 0}]),
        ("m2", [{"kind": "audio", "text": None, "media_ref": "media://m2/0", "offset": 0},
                 {"kind": "image", "text": None, "media_ref": "media://m2/1", "offset": 16}]),
    ]
    res = run(spark, PipelineConfig(), _docs(spark, rows), entity_dict_df(spark))
    out = res.triples.collect()
    assert {(r.subj, r.pred, r.obj) for r in out} == {
        ("m1", "HAS_MEDIA", "media://m1/0"),
        ("m2", "HAS_MEDIA", "media://m2/0"),
        ("m2", "HAS_MEDIA", "media://m2/1"),
    }
    res.unpersist()


def test_null_and_empty_text_spans(spark):
    rows = [
        ("d1", [
            {"kind": "text", "text": "", "media_ref": None, "offset": 0},
            {"kind": "text", "text": None, "media_ref": None, "offset": 1},
            {"kind": "text", "text": "reach mei.bergstrom@example1.com now",
             "media_ref": None, "offset": 2},
        ]),
    ]
    res = run(spark, PipelineConfig(), _docs(spark, rows), entity_dict_df(spark))
    mentions = res.merged_mentions.collect()
    assert [m.surface for m in mentions] == ["mei.bergstrom@example1.com"]
    res.unpersist()


def test_doc_with_no_mentions_emits_nothing(spark):
    rows = [("plain", [{"kind": "text", "text": "just lowercase words here",
                         "media_ref": None, "offset": 0}])]
    res = run(spark, PipelineConfig(), _docs(spark, rows), entity_dict_df(spark))
    assert res.triples.count() == 0
    res.unpersist()
