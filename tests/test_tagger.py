"""Unit tests (no Spark): CRF Viterbi tagger (§5.2)."""

import numpy as np

from pie_spark.extract.tagger import (
    BADDR, BPER, IADDR, IPER, O, W_EMIT, W_START, W_TRANS,
    features, tag_text, tokenize, viterbi,
)


def test_tokenize_offsets():
    toks = tokenize("ab  cd")
    assert toks == [(0, 2, "ab"), (4, 6, "cd")]


def test_viterbi_hand_case():
    # two tokens; emissions force tag 1 then tag 2 unless transition forbids
    em = np.array(
        [[0.0, 5.0, -1e4, 0.0, -1e4], [0.0, 0.0, 4.0, 0.0, 0.0]]
    )
    path = viterbi(em)
    assert path == [BPER, IPER]  # I-PER reachable only after B-PER


def test_viterbi_bio_constraint():
    # I-PER as the very first tag is impossible even with huge emission
    em = np.array([[0.0, 0.0, 100.0, 0.0, 0.0]])
    assert viterbi(em)[0] != IPER


def test_person_from_lexicon():
    out = tag_text("meet Carla Rasmussen today")
    assert [(m["mention_type"], m["surface"]) for m in out] == [
        ("PERSON", "Carla Rasmussen")
    ]


def test_person_generalizes_beyond_gazetteer():
    out = tag_text("meet Zxqw Vbnm today")
    assert [(m["mention_type"], m["surface"]) for m in out] == [("PERSON", "Zxqw Vbnm")]


def test_address():
    out = tag_text("go to 44 Sycamore Blvd now")
    assert [(m["mention_type"], m["surface"]) for m in out] == [
        ("ADDRESS", "44 Sycamore Blvd")
    ]


def test_single_token_runs_dropped():
    assert tag_text("lone Carla went home") == []
    assert tag_text("just 42 things") == []


def test_deterministic():
    t = "meet Carla Rasmussen at 44 Sycamore Blvd or call Benjamin Eriksen"
    assert tag_text(t) == tag_text(t)
