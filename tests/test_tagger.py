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


def test_viterbi_bit_identical_to_numpy_reference():
    """The pure-Python DP must reproduce the vectorized numpy decode
    exactly (same sums, same first-max tie policy) on random lattices."""
    import numpy as np

    from pie_spark.extract.tagger import W_START, W_TRANS, viterbi

    def viterbi_ref(emissions):
        n, k = emissions.shape
        delta = W_START + emissions[0]
        back = np.zeros((n, k), dtype=np.int64)
        for t in range(1, n):
            scores = delta[:, None] + W_TRANS + emissions[t][None, :]
            back[t] = np.argmax(scores, axis=0)
            delta = scores[back[t], np.arange(k)]
        path = [int(np.argmax(delta))]
        for t in range(n - 1, 0, -1):
            path.append(int(back[t, path[-1]]))
        return path[::-1]

    rng = np.random.default_rng(7)
    for _ in range(200):
        n = int(rng.integers(1, 40))
        em = rng.normal(size=(n, 5))
        # quantize to provoke exact ties
        em = np.round(em, 1)
        assert viterbi(em) == viterbi_ref(em)


def test_feature_cache_exact():
    from pie_spark.extract.tagger import _feat_row, features

    toks = ["Mei", "A.", "12345", "123456789", "street", "Ave", "x9y"]
    X = features(toks)
    for i, t in enumerate(toks):
        assert tuple(X[i]) == _feat_row(t)
    assert features(toks).tolist() == features(list(toks)).tolist()


def test_all_o_skip_is_exact_on_corpus():
    """The margin-based Viterbi skip must never change the decode:
    compare tag_text against the full no-skip decode on every span of
    the sf0.001 fixture corpus."""
    import duckdb
    import numpy as np

    from pie_spark.extract import tagger as tg
    from pie_spark.fixtures.gen import gen_doc

    def tag_text_noskip(text):
        toks = tg.tokenize(text)
        if not toks:
            return []
        X = tg.features([t[2] for t in toks])
        emissions = X @ tg.W_EMIT.T
        path = tg.viterbi(emissions)
        out = []
        i = 0
        while i < len(path):
            if path[i] in (tg.BPER, tg.BADDR):
                inner = tg.IPER if path[i] == tg.BPER else tg.IADDR
                mtype = "PERSON" if path[i] == tg.BPER else "ADDRESS"
                j = i + 1
                while j < len(path) and path[j] == inner:
                    j += 1
                if j - i >= 2:
                    out.append((toks[i][0], toks[j - 1][1], mtype))
                i = j
            else:
                i += 1
        return out

    rows = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    n_spans = n_skipped = 0
    for d, t in rows:
        for s in gen_doc(str(d), t).spans:
            if s["kind"] != "text":
                continue
            n_spans += 1
            got = [(m["start"], m["end"], m["mention_type"]) for m in tg.tag_text(s["text"])]
            assert got == tag_text_noskip(s["text"])
            if not got:
                n_skipped += 1
    assert n_spans > 500


def test_viterbi_batch_bit_identical_to_scalar():
    import numpy as np

    from pie_spark.extract.tagger import viterbi, viterbi_batch

    rng = np.random.default_rng(11)
    ems = []
    for _ in range(80):
        n = int(rng.integers(1, 35))
        ems.append([tuple(r) for r in np.round(rng.normal(size=(n, 5)), 1)])
    batch = viterbi_batch(ems)
    for rows, got in zip(ems, batch):
        assert got == viterbi(np.array(rows))


def test_tag_texts_equals_tag_text_on_corpus():
    import duckdb

    from pie_spark.extract.tagger import tag_text, tag_texts
    from pie_spark.fixtures.gen import gen_doc

    rows = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    texts = []
    for d, t in rows:
        texts += [s["text"] for s in gen_doc(str(d), t).spans if s["kind"] == "text"]
    texts += [None, "", "Mei Bergstrom at 12 Maple St"]
    assert tag_texts(texts) == [tag_text(t) if t is not None else [] for t in texts]


def test_tag_texts_mixed_extreme_lengths():
    """Chunked batching: one pathological multi-thousand-token span mixed
    with many short ones must not change results (and must not pad the
    whole batch to the long span's length — exercised via a tiny cell
    budget)."""
    from pie_spark.extract import tagger as tg

    long_text = ("Mei Bergstrom lives at 12 Maple St . " * 400).strip()
    texts = [long_text] + ["call Mei Bergstrom now"] * 50 + ["plain words"] * 50
    want = [tg.tag_text(t) for t in texts]
    old = tg.BATCH_CELL_BUDGET
    try:
        tg.BATCH_CELL_BUDGET = 500  # force many tiny chunks
        assert tg.tag_texts(texts) == want
    finally:
        tg.BATCH_CELL_BUDGET = old
    assert tg.tag_texts(texts) == want


def test_duckdb_viterbi_mirror_equals_python_tagger():
    """The recursive-CTE Viterbi oracle (extract/tagger_sql.py) must
    reproduce tag_text EXACTLY — same tokenization, integer lattice,
    first-max ties, BIO assembly — on the full constructed oracle
    corpus plus adversarial shapes (ALLCAPS aliases, 'A.' initials,
    orphan punctuation, digits)."""
    import duckdb

    from pie_spark.extract.tagger import tag_text
    from pie_spark.extract.tagger_sql import crf_sql_ctes

    texts = {
        "0": "Met Mei Novak Petrov and Alice Abernathy. Saw Katya Silveira today.",
        "1": "MEI NOVAK shouted; A. Bergstrom waved from 44 Sycamore Blvd.",
        "2": "nothing here but lowercase words and 123456789 digits",
        "3": "Freya Jankowski, Omar Lindqvist and 12 Maple Street",
        "4": "X",
        "5": "Carla Rasmussen",
    }
    con = duckdb.connect()
    vals = ", ".join(f"('{k}', '{v}')" for k, v in texts.items())
    sql = f"""
WITH RECURSIVE t(doc_id, text) AS (VALUES {vals}),
{crf_sql_ctes('t').strip()}
SELECT doc_id, mention_type, surface, s, e FROM crf_mentions
"""
    got = sorted(tuple(r) for r in con.execute(sql).fetchall())
    want = sorted(
        (d, m["mention_type"], m["surface"], m["start"], m["end"])
        for d, t in texts.items()
        for m in tag_text(t)
    )
    assert got == want
    assert any(r[1] == "PERSON" for r in want) and any(r[1] == "ADDRESS" for r in want)


def test_duckdb_viterbi_mirror_on_generator_corpus():
    """r06 (VERDICT r05 next#2 'done' criterion): the SQL Viterbi
    mirror must equal tag_text on the REAL generator corpus — every
    text span of every sf0.001 document, multilingual filler included
    (the unicode \\p{Lu}/\\p{Ll} case features earn their keep here)."""
    import duckdb

    from pie_spark.extract.pipeline_sql import materialize_corpus
    from pie_spark.extract.tagger import tag_text
    from pie_spark.extract.tagger_sql import crf_sql_ctes

    from .conftest import SF_DIR

    path = materialize_corpus(SF_DIR)
    con = duckdb.connect()
    sql = f"""
WITH RECURSIVE corpus AS (SELECT doc_id, spans FROM read_parquet('{path}')),
sp AS (SELECT doc_id AS rdoc, generate_subscripts(spans, 1) - 1 AS span_idx,
              unnest(spans) AS s
       FROM corpus),
t(doc_id, text) AS (
  SELECT rdoc || '#' || CAST(span_idx AS VARCHAR), s.text
  FROM sp WHERE s.kind = 'text' AND s.text IS NOT NULL AND length(s.text) > 0
),
{crf_sql_ctes('t').strip()}
SELECT doc_id, mention_type, surface, s, e FROM crf_mentions
"""
    got = sorted(tuple(r) for r in con.execute(sql).fetchall())
    want = []
    rows = con.execute(
        f"SELECT rdoc, span_idx, s.text FROM (SELECT doc_id AS rdoc, "
        f"generate_subscripts(spans, 1) - 1 AS span_idx, unnest(spans) AS s "
        f"FROM read_parquet('{path}')) WHERE s.kind = 'text'"
    ).fetchall()
    for rdoc, si, txt in rows:
        if not txt:
            continue
        for m in tag_text(txt):
            want.append((f"{rdoc}#{si}", m["mention_type"], m["surface"], m["start"], m["end"]))
    assert got == sorted(want)
    assert len(want) > 100  # the corpus genuinely exercises the tagger
