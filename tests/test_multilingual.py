"""Multilingual correctness for the dedup / text-analysis family
(VERDICT r02 'What's wrong #2'): the r02 ASCII-only normalizer
collapsed every CJK/Cyrillic/Arabic document to '' — exact_dedup then
marked unrelated non-Latin docs duplicates of each other and
dedup_by_cluster would DELETE them. These tests pin the r03 Unicode
normalizer (norm_text: \\p{L}\\p{N} classes + raw-text fallback) and the
script-tier lang_id, including Spark↔DuckDB oracle parity on a
non-ASCII corpus (the driver's fixtures are pure ASCII, so the main
oracle gate never sees these code paths).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

# one doc per script family + adversarial cases; two Japanese docs that
# differ only in punctuation (must still dedup together), plus distinct
# emoji-only docs (normalize to '' → raw-text fallback must keep them
# distinct)
DOCS = [
    (0, "The quick brown fox jumps over the lazy dog and the cat", "?", "web"),
    (1, "日本語のテキストです。 これはテストですよ！", "?", "web"),
    (2, "日本語のテキストです これはテストですよ", "?", "web"),  # punct-variant of 1
    (3, "これは全く別の日本語文書で、内容が違います。", "?", "web"),
    (4, "Это русский текст с Ёжиком, номер 42.", "?", "web"),
    (5, "Совершенно другой русский документ о погоде.", "?", "web"),
    (6, "هذا نص تجريبي باللغة العربية رقم ١٢٣", "?", "web"),
    (7, "한국어 텍스트 테스트 문서입니다", "?", "web"),
    (8, "这是一份简体中文测试文档，内容很短。", "?", "web"),
    (9, "Ελληνικό κείμενο δοκιμής νούμερο δύο", "?", "web"),
    (10, "यह एक हिंदी परीक्षण दस्तावेज़ है", "?", "web"),
    (11, "café naïve Ünïcode ÆØÅ ß and the señor of the house", "?", "web"),
    (12, "😀🎉🚀", "?", "web"),  # normalizes to '' → raw fallback
    (13, "!!! ??? ...", "?", "web"),  # normalizes to '' → raw fallback
    (14, "El perro y el gato de la casa y el sol", "?", "web"),
    (15, "Der Hund und die Katze und das Haus der Stadt", "?", "web"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    pdf = pd.DataFrame(DOCS, columns=["doc_id", "text", "lang", "source"])
    df = spark.createDataFrame(pdf).localCheckpoint(eager=True)
    return df


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    pdf = pd.DataFrame(DOCS, columns=["doc_id", "text", "lang", "source"])
    con.register("documents", pdf)
    yield con
    con.close()


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def _rows(pdf):
    cols = sorted(pdf.columns)
    return sorted(tuple(_canon(v) for v in row) for row in pdf[cols].itertuples(index=False))


def _assert_parity(name, got_pdf, want_pdf):
    assert sorted(got_pdf.columns) == sorted(want_pdf.columns), name
    assert len(got_pdf) == len(want_pdf), (
        f"{name}: rows {len(got_pdf)} vs {len(want_pdf)}"
    )
    g, w = _rows(got_pdf), _rows(want_pdf)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"{name}: first diffs {diffs}")


# ---------------------------------------------------------------------------
# behavior: distinct non-Latin docs must never share a dedup key
# ---------------------------------------------------------------------------


def test_exact_dedup_keeps_nonlatin_distinct(docs_df):
    from pie_spark.dedup.exact import dedup_map

    m = {r["doc_id"]: r for r in dedup_map(docs_df).collect()}
    # punct-variant Japanese pair collapses (keys equal, rep = min id)
    assert m[1]["rep_doc_id"] == 1 and m[2]["rep_doc_id"] == 1 and m[2]["is_dup"]
    # every OTHER doc is its own representative — nothing non-Latin merged
    for d in [0, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]:
        assert m[d]["rep_doc_id"] == d and not m[d]["is_dup"], f"doc {d} wrongly merged"


def test_empty_norm_falls_back_to_raw(docs_df):
    """Emoji-only and punct-only docs normalize to '' — the raw-text
    fallback must give them DISTINCT keys (r02 gave both md5(''))."""
    from pie_spark.dedup.exact import _content_key

    keys = {
        r["doc_id"]: r["k"]
        for r in docs_df.select("doc_id", _content_key("text").alias("k")).collect()
    }
    assert keys[12] != keys[13]
    import hashlib

    assert keys[12] == hashlib.md5("😀🎉🚀".encode()).hexdigest()


def test_minhash_buckets_nondegenerate(docs_df):
    """r02: all non-Latin docs shared the single '' shingle → one giant
    bucket → near-dup pairs among unrelated docs (or mass-drop via the
    max_bucket guard). r03: only the true punct-variant pair collides."""
    from pie_spark.dedup.minhash import near_duplicates

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in near_duplicates(docs_df, threshold=0.5).collect()
    }
    assert pairs == {(1, 2)}


def test_ngram_jaccard_nonlatin(docs_df):
    from pie_spark.dedup.ngram import jaccard_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(docs_df, threshold=0.3).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == 1.0  # identical after normalization


def test_simhash_nonlatin_distinct(docs_df):
    from pie_spark.dedup.simhash import near_duplicate_pairs as sim_pairs

    got = {
        (r["doc_a"], r["doc_b"]) for r in sim_pairs(docs_df, max_hamming=3).collect()
    }
    assert (1, 2) in got
    # unrelated cross-script docs must NOT be near-dups
    assert all(a == 1 and b == 2 for a, b in got), got


def test_lang_id_script_tier(docs_df):
    from pie_spark.text.analysis import lang_id

    got = {r["doc_id"]: r["lang_guess"] for r in lang_id(docs_df).collect()}
    assert got[0] == "en"
    assert got[1] == got[2] == got[3] == "ja"
    assert got[4] == got[5] == "ru"
    assert got[6] == "ar"
    assert got[7] == "ko"
    assert got[8] == "zh"
    assert got[9] == "el"
    assert got[10] == "hi"
    assert got[11] == "en"  # accented Latin, English stopwords dominate
    assert got[14] == "es"
    assert got[15] == "de"


def test_quality_punct_unicode(docs_df):
    """CJK letters must not count as punctuation (r02 scored every
    non-Latin doc punct_ppm≈1e6 → quality 0)."""
    from pie_spark.text.analysis import quality_scores

    q = {r["doc_id"]: r for r in quality_scores(docs_df).collect()}
    assert q[8]["punct_ppm"] < 200000  # only real punctuation counted
    assert q[12]["punct_ppm"] == 1000000  # emoji-only: all punctuation


# ---------------------------------------------------------------------------
# oracle parity on the multilingual corpus (driver fixtures are ASCII,
# so the main gate never exercises these paths)
# ---------------------------------------------------------------------------


def test_oracle_exact_dedup_multilingual(spark, docs_df, ddb):
    from pie_spark.dedup.exact import duplicate_groups
    from pie_spark.queries import SQL_EXACT_DEDUP

    _assert_parity(
        "exact_dedup/ml",
        duplicate_groups(docs_df).toPandas(),
        ddb.execute(SQL_EXACT_DEDUP).fetchdf(),
    )


def test_oracle_fingerprints_multilingual(spark, docs_df, ddb):
    from pie_spark.queries import SQL_FINGERPRINTS
    from pie_spark.text.analysis import fingerprints

    _assert_parity(
        "fingerprints/ml",
        fingerprints(docs_df).toPandas(),
        ddb.execute(SQL_FINGERPRINTS).fetchdf(),
    )


def test_oracle_simhash_multilingual(spark, docs_df, ddb):
    from pie_spark.dedup.simhash import simhash_chunks, simhash_sql

    _assert_parity(
        "simhash/ml",
        simhash_chunks(docs_df).toPandas(),
        ddb.execute(simhash_sql()).fetchdf(),
    )


def test_oracle_lang_id_multilingual(spark, docs_df, ddb):
    from pie_spark.queries import _lang_id_sql
    from pie_spark.text.analysis import lang_id

    _assert_parity(
        "lang_id/ml",
        lang_id(docs_df).toPandas(),
        ddb.execute(_lang_id_sql()).fetchdf(),
    )


def test_oracle_quality_multilingual(spark, docs_df, ddb):
    from pie_spark.queries import SQL_QUALITY_SCORES
    from pie_spark.text.analysis import quality_scores

    _assert_parity(
        "quality/ml",
        quality_scores(docs_df).toPandas(),
        ddb.execute(SQL_QUALITY_SCORES).fetchdf(),
    )


def test_oracle_minhash_multilingual(spark, docs_df, ddb):
    from pie_spark.dedup.minhash import K_PERMS, signatures
    from pie_spark.queries import _minhash_sql

    sig = signatures(docs_df)
    flat = sig.select(
        "doc_id", *[sig["sig"][p].alias(f"h{p}") for p in range(K_PERMS)]
    )
    _assert_parity(
        "minhash/ml", flat.toPandas(), ddb.execute(_minhash_sql()).fetchdf()
    )


def test_norm_parity_fuzz(spark, ddb):
    """Randomized cross-engine normalizer parity: 200 seeded strings
    mixing scripts, emoji, digits, combining marks, and whitespace run
    through Spark's norm_text and the DuckDB _DUCK_NORM mirror in one
    batch — any Java-regex/RE2 or lower() divergence fails here before
    it can silently skew a dedup oracle."""
    import random

    rng = random.Random(20260816)
    pools = [
        "abcXYZ012 ",
        "日本語テキスト処理",
        "русскийЁё ",
        "한국어텍스트",
        "العربية١٢٣",
        "ελληνικάΣς",
        "हिंदीपाठ",
        "àéîõüÆßǅ",
        "😀🎉🚀§¶†‡№™",
        "!?.,;:-_()[]{}'\"\t\n",
        "ⅣⅩ①②③",
        " 　​",  # nbsp, ideographic space, zero-width
        "éä",  # combining marks
    ]
    strings = [
        "".join(rng.choice(rng.choice(pools)) for _ in range(rng.randint(0, 40)))
        for _ in range(200)
    ]

    from pie_spark.dedup.shingles import norm_text

    pdf = pd.DataFrame({"i": range(len(strings)), "text": strings})
    sdf = spark.createDataFrame(pdf)
    got = {
        r["i"]: r["n"]
        for r in sdf.select("i", norm_text("text").alias("n")).collect()
    }

    from pie_spark.queries import _DUCK_NORM

    con = duckdb.connect()
    con.register("t", pdf)
    want = dict(con.execute(f"SELECT i, {_DUCK_NORM} FROM t").fetchall())
    con.close()
    diffs = {i: (got[i], want[i]) for i in got if got[i] != want[i]}
    assert not diffs, f"{len(diffs)} divergent normalizations, e.g. {list(diffs.items())[:3]}"
