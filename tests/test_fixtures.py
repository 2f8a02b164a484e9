"""M0 tests: corpus generator determinism + structure (SURVEY.md §5)."""

from __future__ import annotations

import pandas as pd

from pie_spark.fixtures import gazetteer as gz
from pie_spark.fixtures.gen import gen_doc, golden_triples, interleaved_docs

from .conftest import SF_DIR


def _docs_pdf():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]


def test_gen_doc_deterministic():
    pdf = _docs_pdf().head(50)
    for d, t in zip(pdf.doc_id, pdf.text):
        a, b = gen_doc(str(d), t), gen_doc(str(d), t)
        assert a.spans == b.spans
        assert a.mentions == b.mentions
        assert a.triples == b.triples


def test_gen_doc_structure():
    pdf = _docs_pdf()
    for d, t in zip(pdf.doc_id, pdf.text):
        g = gen_doc(str(d), t)
        offs = [s["offset"] for s in g.spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        for s in g.spans:
            if s["kind"] == "text":
                assert s["text"] is not None and s["media_ref"] is None
            else:
                assert s["kind"] in ("image", "audio")
                assert s["text"] is None and s["media_ref"] is not None
        for m in g.mentions:
            sp = g.spans[m["span_idx"]]
            assert sp["kind"] == "text"
            assert sp["text"][m["start"] : m["end"]] == m["surface"]


def test_gazetteer_shape():
    ents = gz.dictionary_entries()
    assert len({e.entity_id for e in ents}) == gz.N_ENTITIES
    cm = gz.golden_canonical_map()
    # shared surfaces (490..499 ↔ 0..9) merge exactly 10 components
    assert len(set(cm.values())) == gz.N_ENTITIES - gz.N_SHARED
    # every canonical entity is a member of its own component
    for nk, ce in cm.items():
        assert ce.startswith("ent:person:")
    # hot surfaces resolve
    for s in gz.hot_surfaces():
        assert gz.normalize_surface(s) in cm


def test_spark_synthesis_matches_local(spark):
    sdf = interleaved_docs(spark, SF_DIR)
    got = {r["doc_id"]: r["spans"] for r in sdf.collect()}
    pdf = _docs_pdf()
    assert len(got) == len(pdf)
    for d, t in zip(pdf.doc_id[:40], pdf.text[:40]):
        local = gen_doc(str(d), t).spans
        remote = [row.asDict() for row in got[str(d)]]
        assert remote == local


def test_golden_triples_shape(spark):
    gt = golden_triples(spark, SF_DIR)
    preds = {r["pred"] for r in gt.select("pred").distinct().collect()}
    assert preds == {
        "HAS_MEDIA", "MENTIONS", "HAS_EMAIL", "HAS_SSN", "HAS_PHONE", "HAS_ADDRESS",
    }
    assert gt.count() > 1000


def test_multilingual_slice_in_generator(spark):
    """VERDICT r02 #6: the synthesized corpus carries a non-ASCII slice —
    ~5% sprinkled + ~2% dominant-script docs — and lang_id's script tier
    tags the dominant-script docs non-'en' deterministically."""
    from pie_spark.fixtures.gen import interleaved_docs
    from pie_spark.text.analysis import lang_id
    from pyspark.sql import functions as F

    docs = interleaved_docs(spark, SF_DIR)
    flat = docs.select(
        "doc_id",
        F.concat_ws(
            " ", F.transform("spans", lambda s: F.coalesce(s["text"], F.lit("")))
        ).alias("text"),
    ).localCheckpoint(eager=True)
    n = flat.count()
    non_ascii = flat.filter(F.col("text").rlike("[^\\x00-\\x7F]")).count()
    assert 0.02 * n < non_ascii < 0.25 * n, (n, non_ascii)

    guesses = {
        r["lang_guess"]
        for r in lang_id(flat).select("lang_guess").distinct().collect()
    }
    # dominant-script docs must surface non-Latin guesses
    assert {"ja", "zh", "ru", "ko", "ar"} & guesses, guesses
    assert "en" in guesses


def test_pure_materialization_matches_spark(spark):
    """extract/pipeline_sql.materialize_corpus (the generator-corpus
    oracle's input) must be BIT-IDENTICAL to Spark's distributed
    interleaved_docs — same doc set, same spans structs in order. This
    is the invariant that lets the r06 pipeline_mentions /
    pipeline_triples oracles claim they read "the same corpus Spark
    reads" (VERDICT r05 next#2)."""
    import pyarrow.parquet as pq

    from pie_spark.extract.pipeline_sql import materialize_corpus

    path = materialize_corpus(SF_DIR)
    tbl = pq.read_table(path)
    pure = {
        d: s
        for d, s in zip(tbl.column("doc_id").to_pylist(), tbl.column("spans").to_pylist())
    }
    sdf = interleaved_docs(spark, SF_DIR)
    got = {r["doc_id"]: [row.asDict() for row in r["spans"]] for r in sdf.collect()}
    assert set(pure) == set(got)
    for d in got:
        assert got[d] == pure[d], f"span mismatch for doc {d}"


def test_generator_span_text_single_spaced():
    """Tokenization-parity precondition for every SQL mirror of the
    tagger (tagger_sql.py docstring): generator span text is exactly
    ' '.join of whitespace-free tokens — no doubled/leading/trailing
    whitespace of any kind."""
    import re

    pdf = _docs_pdf()
    for d, t in zip(pdf.doc_id, pdf.text):
        for s in gen_doc(str(d), t).spans:
            if s["kind"] != "text":
                continue
            txt = s["text"]
            assert txt == " ".join(re.findall(r"\S+", txt))
            assert not re.search(r"[^\S ]", txt)  # only ASCII space as ws
