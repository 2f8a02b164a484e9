"""Dictionary-shard trie-probe gazetteer (M6 fallback path 2) ≡
Aho-Corasick automaton EXACTLY — including the non-token-aligned
occurrences the expression-join path's coverage contract excludes
(VERDICT r05 next#1)."""

from __future__ import annotations

from pie_spark.extract.gazetteer import gazetteer_matches
from pie_spark.extract.gazetteer_shard import gazetteer_shard_matches

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


def test_shard_matches_equal_automaton_incl_non_token_aligned(spark):
    """The shard path must find mid-token burials (interior punctuation)
    that the join path documents as non-covered — exact automaton
    parity, not the token-aligned contract."""
    surfaces = [
        "Mei Novak",
        "Mei Novak Jr.",
        "A. Bergstrom",
        "Grace Whitfield",
        "Whitfield",
    ]
    texts = [
        "Mei Novak spoke first",
        "we met (Mei Novak) yesterday",
        "aa-Whitfield-bb is a mid-token burial",   # join path misses this
        "Mei Novak Jr., they said",
        "ask A. Bergstrom about it",
        "xxMei Novakzz is not a name",              # alnum flanks → no hit
        "Mei  Novak has two spaces",                # no verbatim occurrence
        "meet Grace Whitfield",
        "",
        "--- punctuation only ---",
    ]
    spans = _spans(spark, texts)
    ac = _hits(gazetteer_matches(spans, spark, surfaces))
    sh = _hits(gazetteer_shard_matches(spans, _dict_df(spark, surfaces)))
    assert sh == ac
    # the burial IS found (automaton semantics), proving the stronger contract
    assert ("2", 0, 3, 12, "Whitfield") in sh
    # overlap parity: "Mei Novak Jr." occurrences also emit "Mei Novak"
    assert ("3", 0, 0, 9, "Mei Novak") in sh and ("3", 0, 0, 13, "Mei Novak Jr.") in sh


def test_shard_matches_equal_automaton_on_generator_corpus(spark):
    from pie_spark.extract.spans import explode_spans, text_spans
    from pie_spark.fixtures.gazetteer import dictionary_entries
    from pie_spark.fixtures.gen import entity_dict_df, interleaved_docs

    docs = interleaved_docs(spark, SF_DIR).limit(150).localCheckpoint(eager=True)
    txt = text_spans(explode_spans(docs)).localCheckpoint(eager=True)
    surfaces = sorted({e.surface for e in dictionary_entries()})

    ac = _hits(gazetteer_matches(txt, spark, surfaces))
    sh = _hits(gazetteer_shard_matches(txt, entity_dict_df(spark)))
    assert len(ac) > 0
    assert sh == ac


def test_shard_salt_parts_invariant(spark):
    """Any salt_parts value yields the identical hit set (salting only
    spreads groups; the dictionary shard is replicated per salt)."""
    from pie_spark.extract.spans import explode_spans, text_spans
    from pie_spark.fixtures.gen import entity_dict_df, interleaved_docs

    docs = interleaved_docs(spark, SF_DIR).limit(60).localCheckpoint(eager=True)
    txt = text_spans(explode_spans(docs)).localCheckpoint(eager=True)
    d = entity_dict_df(spark)
    one = _hits(gazetteer_shard_matches(txt, d, salt_parts=1))
    many = _hits(gazetteer_shard_matches(txt, d, salt_parts=16))
    assert one == many and len(one) > 0


def test_shard_large_alphabet_hash_bucket_regime(spark):
    """>128 distinct first chars switches routing to hash buckets on
    both sides — hits still exactly automaton-equal."""
    surfaces = [chr(0x4E00 + i) + "氏" for i in range(200)] + ["Mei Novak"]
    texts = [
        "report by " + chr(0x4E00) + "氏 and Mei Novak",
        chr(0x4E05) + "氏 opened; xxMei Novakzz did not",
        "nothing here",
    ]
    spans = _spans(spark, texts)
    ac = _hits(gazetteer_matches(spans, spark, surfaces))
    sh = _hits(gazetteer_shard_matches(spans, _dict_df(spark, surfaces)))
    assert sh == ac and ("0", 0, 17, 26, "Mei Novak") in sh


def test_shard_empty_dictionary(spark):
    spans = _spans(spark, ["Mei Novak spoke"])
    out = gazetteer_shard_matches(spans, _dict_df(spark, []))
    assert out.count() == 0


def test_shard_parity_fuzz_batch(spark):
    """Seeded fuzz (the join path's batch, same seed): the shard path
    must equal the automaton EXACTLY — burials and all — with zero
    documented misses."""
    import random

    surfaces = [
        "Mei Novak", "Novak Petrov", "Alice Abernathy", "Grace Whitfield",
        "Mei Novak Jr.", "A. Bergstrom", "Hiro Takahashi",
    ]
    rng = random.Random(42)
    wraps = ["", "(", ")", ",", ".", "--", "'", '"', ";"]
    decoys = ["alpha", "beta", "9gamma", "x", "review2024", "-", "..."]

    docs = []
    for i in range(400):
        parts = []
        for _ in range(rng.randint(1, 8)):
            kind = rng.random()
            if kind < 0.45:
                s = rng.choice(surfaces)
                parts.append(rng.choice(wraps) + s + rng.choice(wraps))
            elif kind < 0.55:
                s = rng.choice(["Whitfield", "Mei"])
                parts.append(f"aa-{s}-bb" if rng.random() < 0.5 else f"zz{s}")
            else:
                parts.append(rng.choice(decoys))
        sep = "  " if rng.random() < 0.1 else " "
        docs.append((str(i), sep.join(parts)))

    spans = spark.createDataFrame(
        [(d, 0, 0, t) for d, t in docs],
        "doc_id string, span_idx int, offset int, text string",
    )
    # add "Whitfield"/"Mei" alone so burials are matchable surfaces
    all_surfaces = surfaces + ["Whitfield", "Mei"]
    ac = _hits(gazetteer_matches(spans, spark, all_surfaces))
    sh = _hits(gazetteer_shard_matches(spans, _dict_df(spark, all_surfaces)))
    assert sh == ac
    assert len(ac) > 200
