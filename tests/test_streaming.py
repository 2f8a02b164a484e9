"""Structured Streaming ingestion: incremental extraction ≡ batch
extraction, with checkpointed offset tracking across restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from pie_spark.config import PipelineConfig
from pie_spark.fixtures.gen import entity_dict_df, interleaved_docs
from pie_spark.pipeline import extract_stage
from pie_spark.streaming.ingest import read_streamed_mentions, stream_extract_mentions

from .conftest import SF_DIR

_MENTION_COLS = ["doc_id", "span_idx", "start", "end", "mention_type", "surface", "detector"]


def _mention_set(df):
    return {tuple(r) for r in df.select(*_MENTION_COLS).collect()}


def test_stream_equals_batch_and_resumes(spark, tmp_path):
    cfg = PipelineConfig()
    d = entity_dict_df(spark)
    docs = interleaved_docs(spark, SF_DIR).localCheckpoint(eager=True)
    half1 = docs.filter(F.crc32(F.col("doc_id")) % 2 == 0)
    half2 = docs.filter(F.crc32(F.col("doc_id")) % 2 == 1)

    in_dir = str(tmp_path / "landing")
    out_dir = str(tmp_path / "mentions")
    ckpt = str(tmp_path / "stream_ckpt")

    # first files land → drain
    half1.write.mode("append").parquet(in_dir)
    n1 = stream_extract_mentions(spark, cfg, in_dir, d, out_dir, ckpt)
    assert n1 >= 1
    got1 = _mention_set(read_streamed_mentions(spark, out_dir))
    assert got1 == _mention_set(extract_stage(spark, cfg, half1, d))
    assert len(got1) > 0

    # stream "restarts": nothing new → no duplicate reprocessing
    n_idle = stream_extract_mentions(spark, cfg, in_dir, d, out_dir, ckpt)
    assert _mention_set(read_streamed_mentions(spark, out_dir)) == got1

    # more files land → only the delta is processed; union ≡ full batch
    half2.write.mode("append").parquet(in_dir)
    stream_extract_mentions(spark, cfg, in_dir, d, out_dir, ckpt)
    got_all = _mention_set(read_streamed_mentions(spark, out_dir))
    assert got_all == _mention_set(extract_stage(spark, cfg, docs, d))
    assert got_all > got1
