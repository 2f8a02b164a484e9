"""Hypothesis fuzz for the pure-Python detector cores: offsets always
index valid substrings, surfaces always equal the indexed text, no
crashes on arbitrary unicode. These are the invariants the Spark layer
relies on when mapping span-local offsets to document coordinates."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pie_spark.extract.gazetteer import AhoCorasick, find_gazetteer_matches
from pie_spark.extract.matchers import find_matches
from pie_spark.extract.tagger import tag_text, tokenize
from pie_spark.fixtures import gazetteer as gz

_AC = AhoCorasick(sorted({e.surface for e in gz.dictionary_entries()}))

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_regex_matcher_offsets_are_exact(text):
    for m in find_matches(text):
        assert 0 <= m["start"] < m["end"] <= len(text)
        assert text[m["start"] : m["end"]] == m["surface"]
        assert m["mention_type"] in {"EMAIL", "SSN", "PHONE", "ADDRESS"}


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_gazetteer_offsets_are_exact(text):
    for m in find_gazetteer_matches(text, _AC):
        assert 0 <= m["start"] < m["end"] <= len(text)
        assert text[m["start"] : m["end"]] == m["surface"]
        # word-boundary guard held
        assert m["start"] == 0 or not text[m["start"] - 1].isalnum()
        assert m["end"] == len(text) or not text[m["end"]].isalnum()


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_tagger_offsets_are_exact(text):
    for m in tag_text(text):
        assert 0 <= m["start"] < m["end"] <= len(text)
        assert text[m["start"] : m["end"]] == m["surface"]
        assert m["mention_type"] in {"PERSON", "ADDRESS"}


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_tokenize_roundtrip(text):
    toks = tokenize(text)
    for s, e, t in toks:
        assert text[s:e] == t and t == t.strip()
    assert "".join(t for _, _, t in toks) == "".join(text.split())
