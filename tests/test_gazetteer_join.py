"""Shuffle-join gazetteer (dictionary-scale M6 fallback) ≡ Aho-Corasick
automaton, plus the pipeline's oversized-dictionary degradation path
(VERDICT r03 next#8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pie_spark.extract.gazetteer import gazetteer_matches
from pie_spark.extract.gazetteer_join import gazetteer_join_matches

from .conftest import SF_DIR

_KEY = ["doc_id", "span_idx", "start", "end", "surface"]


def _hits(df):
    return {tuple(r) for r in df.select(*_KEY).collect()}


def _spans(spark, rows):
    return spark.createDataFrame(
        [(str(i), 0, 0, t) for i, t in enumerate(rows)],
        "doc_id string, span_idx int, offset int, text string",
    )


def _dict_df(spark, surfaces):
    return spark.createDataFrame([(s,) for s in surfaces], "surface string")


def test_join_matches_equal_automaton_on_adversarial_punctuation(spark):
    surfaces = [
        "Mei Novak",
        "Mei Novak Jr.",        # trailing punctuation in the SURFACE
        "A. Bergstrom",         # internal punctuation
        "Grace Whitfield",
    ]
    texts = [
        "Mei Novak spoke first",                   # span-initial hit
        "we met (Mei Novak) yesterday",            # parenthesized
        "call Mei Novak, then leave",              # trailing comma in text
        "Mei Novak Jr. arrived late",              # surface with tail punct
        "so Mei Novak Jr., they said",             # tail punct + comma
        "ask A. Bergstrom about it",               # initial alias
        "xxMei Novakzz is not a name",             # alnum flanks → no hit
        "Mei  Novak has two spaces",               # no verbatim occurrence
        "meet Grace Whitfield",                    # span-final hit
        "",                                        # empty text
        "just punctuation --- here",
    ]
    spans = _spans(spark, texts)
    ac = _hits(gazetteer_matches(spans, spark, surfaces))
    jn = _hits(gazetteer_join_matches(spans, _dict_df(spark, surfaces)))
    assert jn == ac
    # sanity: the corpus actually produced overlapping/edge hits
    assert len(ac) >= 8
    # "Mei Novak Jr." occurrences also contain "Mei Novak" — both emitted
    assert ("3", 0, 0, 9, "Mei Novak") in ac and ("3", 0, 0, 13, "Mei Novak Jr.") in ac


def test_join_matches_equal_automaton_on_generator_corpus(spark):
    """Full parity on the real fixture corpus × the real ~900-surface
    dictionary (aliases include 'X. Last' and '... Jr.' shapes)."""
    from pie_spark.extract.spans import explode_spans, text_spans
    from pie_spark.fixtures.gazetteer import dictionary_entries
    from pie_spark.fixtures.gen import entity_dict_df, interleaved_docs

    docs = interleaved_docs(spark, SF_DIR).limit(150).localCheckpoint(eager=True)
    txt = text_spans(explode_spans(docs)).localCheckpoint(eager=True)
    surfaces = sorted({e.surface for e in dictionary_entries()})

    ac = _hits(gazetteer_matches(txt, spark, surfaces))
    jn = _hits(gazetteer_join_matches(txt, entity_dict_df(spark)))
    assert len(ac) > 0
    assert jn == ac


def test_join_matches_salted_path_identical(spark):
    """Hot-surface salting must not change the hit set."""
    from pie_spark.extract.spans import explode_spans, text_spans
    from pie_spark.fixtures.gazetteer import hot_surfaces
    from pie_spark.fixtures.gen import entity_dict_df, interleaved_docs

    docs = interleaved_docs(spark, SF_DIR).limit(80).localCheckpoint(eager=True)
    txt = text_spans(explode_spans(docs)).localCheckpoint(eager=True)
    d = entity_dict_df(spark)
    plain = _hits(gazetteer_join_matches(txt, d))
    salted = _hits(gazetteer_join_matches(txt, d, hot=hot_surfaces(), salt_k=8))
    assert plain == salted and len(plain) > 0


def test_pipeline_degrades_to_join_fallback(spark):
    """PipelineConfig(dict_max_surfaces=<tiny>) must complete via the
    join path with IDENTICAL triples to the broadcast run, and record
    dict_mode='join_fallback' (lineage meta carries it — runner test)."""
    from pie_spark.config import PipelineConfig
    from pie_spark.fixtures.gen import entity_dict_df, interleaved_docs
    from pie_spark.pipeline import run

    docs = interleaved_docs(spark, SF_DIR).limit(120).localCheckpoint(eager=True)
    d = entity_dict_df(spark)

    base = run(spark, PipelineConfig(), docs, d)
    assert base.dict_mode == "broadcast"
    t_base = {tuple(r) for r in base.triples.select("subj", "pred", "obj").collect()}

    fb = run(spark, PipelineConfig(dict_max_surfaces=10), docs, d)
    assert fb.dict_mode == "join_fallback"
    t_fb = {tuple(r) for r in fb.triples.select("subj", "pred", "obj").collect()}

    assert t_fb == t_base and len(t_base) > 0
    base.unpersist()
    fb.unpersist()


def test_runner_records_dict_mode_in_lineage(spark, tmp_path):
    from pie_spark.config import PipelineConfig
    from pie_spark.fixtures.gen import entity_dict_df, interleaved_docs
    from pie_spark.io.snapshots import SnapshotTable
    from pie_spark.runner import run_checkpointed

    docs = interleaved_docs(spark, SF_DIR).limit(40).localCheckpoint(eager=True)
    cfg = PipelineConfig(
        dict_max_surfaces=10,
        checkpoint_dir=str(tmp_path / "ck"),
        output_path=str(tmp_path / "out"),
    )
    out = run_checkpointed(spark, cfg, docs, entity_dict_df(spark))
    assert out.result.dict_mode == "join_fallback"
    meta = SnapshotTable(cfg.output_path).snapshots()[-1].meta
    assert meta["dict_mode"] == "join_fallback"
    out.result.unpersist()
