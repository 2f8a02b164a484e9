"""S1/S3 multi-format sources: JSONL round-trip for the nested doc
table (span invariant preserved), CSV/JSON for the flat dictionary."""

from __future__ import annotations

import pytest

from pie_spark.fixtures.gen import entity_dict_df, interleaved_docs
from pie_spark.io.sources import read_dictionary, read_documents

from .conftest import SF_DIR


def _doc_set(df):
    return {
        (r.doc_id, tuple((s.kind, s.text, s.media_ref, s.offset) for s in r.spans))
        for r in df.collect()
    }


def test_documents_jsonl_roundtrip(spark, tmp_path):
    docs = interleaved_docs(spark, SF_DIR).limit(50)
    p = str(tmp_path / "docs_jsonl")
    docs.write.json(p)
    back = read_documents(spark, p, fmt="json")
    # JSON sources force nullable fields; the TYPE structure must match
    assert back.schema.simpleString() == docs.schema.simpleString()
    assert _doc_set(back) == _doc_set(docs)
    # binding invariant survives the format hop
    from pie_spark.extract.invariants import violations
    from pie_spark.extract.spans import explode_spans

    assert violations(back, explode_spans(back)) == 0


def test_documents_parquet_roundtrip(spark, tmp_path):
    docs = interleaved_docs(spark, SF_DIR).limit(50)
    p = str(tmp_path / "docs_parquet")
    docs.write.parquet(p)
    assert _doc_set(read_documents(spark, p)) == _doc_set(docs)


def test_documents_csv_rejected(spark):
    with pytest.raises(ValueError, match="CSV cannot represent"):
        read_documents(spark, "/nonexistent", fmt="csv")


def test_dictionary_csv_and_json(spark, tmp_path):
    d = entity_dict_df(spark)
    want = {tuple(r) for r in d.collect()}
    pc = str(tmp_path / "dict_csv")
    d.write.option("header", "true").csv(pc)
    assert {tuple(r) for r in read_dictionary(spark, pc, fmt="csv").collect()} == want
    pj = str(tmp_path / "dict_json")
    d.write.json(pj)
    assert {tuple(r) for r in read_dictionary(spark, pj, fmt="json").collect()} == want


def test_write_sorted_global_order(spark, tmp_path):
    """O4 layout writer: every written file is internally sorted AND the
    files' key ranges are pairwise disjoint (global order), with the
    row set preserved exactly; maxRecordsPerFile caps file size."""
    import glob

    from pie_spark.io.sinks import write_sorted

    docs = interleaved_docs(spark, SF_DIR)
    out = str(tmp_path / "sorted")
    write_sorted(docs, out, ["doc_id"], num_files=5, max_records_per_file=200)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 5
    ranges = []
    total = 0
    for f in files:
        ids = [r.doc_id for r in spark.read.parquet(f).select("doc_id").collect()]
        assert ids == sorted(ids), f  # within-file order
        assert len(ids) <= 200  # maxRecordsPerFile honored
        if ids:
            ranges.append((min(ids), max(ids)))
            total += len(ids)
    # between-file order: ranges sorted by min must be pairwise disjoint
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)
    # row set preserved
    assert total == docs.count()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {
        r.doc_id for r in docs.collect()
    }
