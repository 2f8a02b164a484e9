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

    fb = run(
        spark, PipelineConfig(dict_max_surfaces=10, fallback_matcher="join"), docs, d
    )
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
        fallback_matcher="join",
        checkpoint_dir=str(tmp_path / "ck"),
        output_path=str(tmp_path / "out"),
    )
    out = run_checkpointed(spark, cfg, docs, entity_dict_df(spark))
    assert out.result.dict_mode == "join_fallback"
    meta = SnapshotTable(cfg.output_path).snapshots()[-1].meta
    assert meta["dict_mode"] == "join_fallback"
    out.result.unpersist()


def test_long_surfaces_match_via_derived_max_ngram(spark):
    """ADVICE r04: a fixed max_ngram=3 silently never matched 4+-token
    surfaces in fallback mode. Derived-from-dictionary width must give
    automaton parity on them."""
    surfaces = ["Ana Maria de Souza", "Mei Novak", "Jean Claude van Damme Jr."]
    texts = [
        "we saw Ana Maria de Souza yesterday",
        "(Ana Maria de Souza) and Mei Novak spoke",
        "Jean Claude van Damme Jr. arrived",
        "Ana Maria de Souzaz is not a hit",
    ]
    spans = _spans(spark, texts)
    ac = _hits(gazetteer_matches(spans, spark, surfaces))
    jn = _hits(gazetteer_join_matches(spans, _dict_df(spark, surfaces)))
    assert jn == ac
    assert ("0", 0, 7, 25, "Ana Maria de Souza") in jn
    assert ("2", 0, 0, 25, "Jean Claude van Damme Jr.") in jn
    # an explicit cap re-introduces the documented gap — only the
    # 2-token surface survives
    capped = _hits(gazetteer_join_matches(spans, _dict_df(spark, surfaces), max_ngram=3))
    assert capped == {h for h in ac if h[4] == "Mei Novak"}


def test_per_n_bounds_generate_only_dictionary_token_counts(spark):
    """A dictionary with only 2-token surfaces must generate no 1-gram
    or 3-gram candidates at all (the candidate array is built from the
    dictionary's OWN token counts), and each n prunes on its own char
    bounds."""
    from pie_spark.extract.gazetteer_join import _exploded_candidates

    spans = _spans(spark, ["Mei Novak spoke to Grace Whitfield today"])
    cands = _exploded_candidates(spans, {2: (8, 15)}).select("g.skey").collect()
    got = {r["skey"] for r in cands}
    assert got == {
        "Mei Novak", "Novak spoke", "spoke to", "to Grace",
        "Grace Whitfield", "Whitfield today",
    }
    # 1-token bounds alone → no 2-grams survive
    uni = _exploded_candidates(spans, {1: (3, 5)}).select("g.skey").collect()
    assert {r["skey"] for r in uni} == {"Mei", "Novak", "spoke", "Grace", "today"}


def test_strip_core_py_mirrors_spark_on_underscores(spark):
    """ADVICE r04: the Python hot-core mirror must strip underscores
    exactly like \\p{L}\\p{N} does on the Spark side."""
    from pie_spark.extract.gazetteer_join import _strip_core, _strip_core_py

    cases = ["_Mei Novak_", "__(A. Bergstrom)__", "Grace Whitfield", "_", "--x--", ""]
    rows = spark.createDataFrame([(c,) for c in cases], "s string").select(
        F.col("s"), _strip_core(F.col("s")).alias("core")
    ).collect()
    for r in rows:
        assert _strip_core_py(r["s"]) == r["core"], r["s"]


def test_first_char_prefilter_alphabet_guard(spark):
    """A large-alphabet dictionary (>128 distinct first chars) must skip
    the isin prefilter (plan bloat, ~zero selectivity) and still match
    correctly."""
    # 200 distinct CJK-range first chars + one Latin surface we plant
    surfaces = [chr(0x4E00 + i) + "氏" for i in range(200)] + ["Mei Novak"]
    texts = ["report by " + chr(0x4E00) + "氏 and Mei Novak", "nothing here"]
    spans = _spans(spark, texts)
    jn = gazetteer_join_matches(spans, _dict_df(spark, surfaces))
    plan = jn._jdf.queryExecution().executedPlan().toString()
    assert "INSET" not in plan and " IN (" not in plan
    got = _hits(jn)
    ac = _hits(gazetteer_matches(spans, spark, surfaces))
    assert got == ac and ("0", 0, 17, 26, "Mei Novak") in got


def test_join_parity_fuzz_batch(spark):
    """Seeded fuzz: 400 random docs assembled from gazetteer surfaces
    wrapped in random punctuation, decoy words, digit runs, doubled
    spaces, and deliberate NON-token-aligned burials. Invariants:

    * soundness — every join hit is also an automaton hit (always);
    * completeness on the covered class — every automaton hit at a
      token-aligned position is found by the join path; the only
      automaton-exclusive hits are mid-token burials (interior
      punctuation), the documented non-covered shape."""
    import random

    surfaces = [
        "Mei Novak", "Novak Petrov", "Alice Abernathy", "Grace Whitfield",
        "Mei Novak Jr.", "A. Bergstrom", "Hiro Takahashi",
    ]
    rng = random.Random(42)
    wraps = ["", "(", ")", ",", ".", "--", "'", '"', ";"]
    decoys = ["alpha", "beta", "9gamma", "x", "review2024", "-", "..."]

    docs = []
    buried = set()  # doc ids with deliberate mid-token burials
    for i in range(400):
        parts = []
        for _ in range(rng.randint(1, 8)):
            kind = rng.random()
            if kind < 0.45:
                s = rng.choice(surfaces)
                parts.append(rng.choice(wraps) + s + rng.choice(wraps))
            elif kind < 0.55:
                # NON-token-aligned burial: surface glued to alnum or
                # hidden behind interior punctuation in one token
                s = rng.choice(["Whitfield", "Mei"])
                parts.append(f"aa-{s}-bb" if rng.random() < 0.5 else f"zz{s}")
                buried.add(str(i))
            else:
                parts.append(rng.choice(decoys))
        sep = "  " if rng.random() < 0.1 else " "
        docs.append((str(i), sep.join(parts)))

    spans = spark.createDataFrame(
        [(d, 0, 0, t) for d, t in docs],
        "doc_id string, span_idx int, offset int, text string",
    )
    ac = _hits(gazetteer_matches(spans, spark, surfaces))
    jn = _hits(gazetteer_join_matches(spans, _dict_df(spark, surfaces)))

    assert jn <= ac, f"unsound join hits: {sorted(jn - ac)[:5]}"
    missed = ac - jn
    # every miss must be a genuine non-token-aligned occurrence: the
    # char before the match (within its token) or after it is adjacent
    # non-space text that breaks token alignment
    text_by_doc = dict(docs)
    for doc_id, _si, s, e, surf in missed:
        t = text_by_doc[doc_id]
        tok_start = t.rfind(" ", 0, s) + 1
        tok_end_idx = t.find(" ", e)
        tok_end = len(t) if tok_end_idx == -1 else tok_end_idx
        # token-aligned would mean the match's core starts at its
        # token's first alnum char and ends at a token's last alnum
        # char — a miss must violate that (or sit in a doubled-space
        # doc, where split-on-single-space token edges shift)
        first_alnum = next((j for j, c in enumerate(t[tok_start:], tok_start) if c.isalnum()), None)
        last_alnum = next((j for j in range(tok_end - 1, tok_start - 1, -1) if t[j].isalnum()), None)
        assert first_alnum != s or (last_alnum is not None and last_alnum + 1 != e) or "  " in t, (
            f"token-aligned hit missed by join path: doc {doc_id} [{s},{e}) {surf!r} in {t!r}"
        )
    assert len(ac) > 200  # the batch actually planted plenty of hits
