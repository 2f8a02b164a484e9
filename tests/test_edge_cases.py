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


def test_giant_document(spark):
    """One pathological document: hundreds of spans, one very long span,
    dense PII — exercises the merge windows, the batched-Viterbi cell
    budget, and pairing on a single skewed doc_id partition."""
    spans = []
    off = 0
    for i in range(300):
        # a linked PERSON before each email so the nearest-preceding
        # pairing rule emits (person, HAS_EMAIL, email)
        t = f"chunk {i} Alice Abernathy reach mei.bergstrom@example{i % 10}.com now"
        spans.append({"kind": "text", "text": t, "media_ref": None, "offset": off})
        off += len(t) + 1
    long_text = ("filler word " * 3000) + "ssn 523-45-6789 tail"
    spans.append({"kind": "text", "text": long_text, "media_ref": None, "offset": off})
    docs = _docs(spark, [("giant", spans)])
    res = run(spark, PipelineConfig(), docs, entity_dict_df(spark))
    triples = res.triples.collect()
    emails = {r.obj for r in triples if r.pred == "HAS_EMAIL"}
    assert len(emails) == 10  # distinct planted email values
    assert any(r.pred == "HAS_SSN" and r.obj == "523-45-6789" for r in triples)
    # span invariant still holds on the giant doc
    from pie_spark.extract.invariants import violations

    assert violations(res.docs, res.spans) == 0
    res.unpersist()


def test_oversized_dictionary_fails_fast(spark):
    """The gazetteer collect is size-probed: past dict_max_surfaces it
    raises instead of OOMing the driver (VERDICT r01 wrong#5)."""
    import pytest

    from pie_spark.pipeline import collect_surfaces

    big = spark.range(10).selectExpr("cast(id as string) as surface")
    with pytest.raises(ValueError, match="dict_max_surfaces"):
        collect_surfaces(big, max_surfaces=5)
    # under the cap: plain strings, all present
    assert sorted(collect_surfaces(big, max_surfaces=10)) == sorted(
        str(i) for i in range(10)
    )


def test_violation_rows_schema_has_distinct_names(spark):
    """Driver harness canonicalizes via pandas df[col] — duplicate column
    names break it (CORRECTNESS_r01 span_invariant err)."""
    from pie_spark.extract.invariants import violation_rows
    from pie_spark.extract.spans import explode_spans

    rows = [("d1", [{"kind": "text", "text": "hello", "media_ref": None, "offset": 0}])]
    docs = _docs(spark, rows)
    v = violation_rows(docs, explode_spans(docs))
    assert v.columns == ["doc_id", "src_spans_json", "rebuilt_spans_json"]
    assert v.count() == 0


def test_lang_id_tiebreak_is_lang_asc(spark):
    """At equal stopword hits the guess is the lexicographically smallest
    language code (VERDICT r01 wrong#6 — docstring/behavior mismatch)."""
    from pie_spark.text.analysis import lang_id

    docs = spark.createDataFrame([("t", "nothing matches any stopword")], ["doc_id", "text"])
    row = lang_id(docs).collect()[0]
    assert row.hits_en == row.hits_es == row.hits_de == row.hits_fr == 0
    assert row.lang_guess == "de"


def test_exact_quantiles_definition_and_partitioning(spark):
    """q_p = min{v : #{x <= v} >= ceil(p*N/1e6)} on a known
    distribution; result independent of input partitioning; ppm
    thresholds exercise the ceil edge (p=.5 on even N picks the LOWER
    middle under this definition)."""
    from pie_spark.text.analysis import exact_quantiles

    vals = [1, 1, 2, 3, 5, 8, 13, 21]  # N=8
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        r.p_ppm: r.value
        for r in exact_quantiles(df, "x", [250000, 500000, 750000, 1000000]).collect()
    }
    # ceil thresholds: .25→rank 2→1, .5→rank 4→3, .75→rank 6→8, 1.0→rank 8→21
    assert got == {250000: 1, 500000: 3, 750000: 8, 1000000: 21}
    got7 = {
        r.p_ppm: r.value
        for r in exact_quantiles(df.repartition(7), "x", [500000]).collect()
    }
    assert got7 == {500000: 3}
