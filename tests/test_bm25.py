"""BM25 retrieval (text/bm25.py): exact-equality vs a hand-computed
reference, determinism across partitionings, top-k total order, and
edge semantics (unseen terms, empty query, empty corpus)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pie_spark.text.bm25 import MICRO, BM25Index, fit_bm25, score_query

K1, B = 1.2, 0.75


def _py_bm25(corpus: dict[int, str], query: list[str]) -> dict[int, int]:
    """Plain-Python replay of the exact integer recipe (ASCII corpora
    where normalization is the identity): idf floated once per term →
    micro long; per-(doc, term) score floated from exact ints → micro
    long; per-doc sum of longs."""
    toks = {d: t.split() for d, t in corpus.items()}
    n = len(corpus)
    tl = sum(len(v) for v in toks.values())
    out: dict[int, int] = {}
    for term in set(query):
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf_micro = int(math.floor(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * MICRO + 0.5))
        for d, v in toks.items():
            tf = v.count(term)
            if tf == 0:
                continue
            dl = len(v)
            s = idf_micro * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl * float(n) / tl))
            out[d] = out.get(d, 0) + int(math.floor(s + 0.5))
    return out


CORPUS = {
    1: "the cat sat on the mat",
    2: "the dog chased the cat across the yard",
    3: "quantum flux capacitors hum quietly",
    4: "cat cat cat dog",
    5: "a yard of mat material",
}


def _docs(spark, corpus=CORPUS, parts=4):
    return spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], "doc_id long, text string"
    ).repartition(parts)


def test_exact_vs_python_reference(spark):
    docs = _docs(spark)
    idx = fit_bm25(docs)
    got = {
        r["doc_id"]: r["bm25_micro"]
        for r in score_query(docs, idx, ["cat", "yard"], k1=K1, b=B).collect()
    }
    assert got == _py_bm25(CORPUS, ["cat", "yard"])
    # tf-saturation sanity: doc 4 (tf=3, short) outranks doc 1 (tf=1)
    assert got[4] > got[1]


def test_fit_constants_and_idf_monotonic(spark):
    docs = _docs(spark)
    idx = fit_bm25(docs)
    assert idx.n_docs == 5
    assert idx.total_len == sum(len(t.split()) for t in CORPUS.values())
    stats = {r["term"]: (r["df"], r["idf_micro"]) for r in idx.terms.collect()}
    assert stats["cat"][0] == 3 and stats["quantum"][0] == 1
    # rarer term → strictly larger idf; equal df → identical idf
    assert stats["the"][0] == 2 and stats["dog"][0] == 2
    assert stats["quantum"][1] > stats["dog"][1] == stats["the"][1] > stats["cat"][1]


def test_partitioning_independent(spark):
    for parts in (1, 7):
        docs = _docs(spark, parts=parts)
        idx = fit_bm25(docs)
        got = sorted(
            tuple(r) for r in score_query(docs, idx, ["cat", "mat", "yard"]).collect()
        )
        if parts == 1:
            first = got
        else:
            assert got == first


def test_topk_total_order(spark):
    docs = _docs(spark)
    idx = fit_bm25(docs)
    full = score_query(docs, idx, ["cat", "the"])
    ordered = [
        r["doc_id"]
        for r in full.orderBy(F.desc("bm25_micro"), F.asc("doc_id")).collect()
    ]
    top2 = [r["doc_id"] for r in score_query(docs, idx, ["cat", "the"], top_k=2).collect()]
    assert top2 == ordered[:2]


def test_unseen_and_empty_edges(spark):
    docs = _docs(spark)
    idx = fit_bm25(docs)
    # wholly-unseen query → no rows (terms drop at the stats join)
    assert score_query(docs, idx, ["zeppelin"]).count() == 0
    # empty query → empty result, correct schema
    empty = score_query(docs, idx, [])
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "n_matched", "bm25_micro"]
    # empty corpus → fit yields zero constants, scoring returns empty
    none = docs.filter(F.lit(False))
    idx0 = fit_bm25(none)
    assert idx0.n_docs == 0 and idx0.total_len == 0
    assert score_query(none, idx0, ["cat"]).count() == 0


def test_n_matched_counts_distinct_query_terms(spark):
    docs = _docs(spark)
    idx = fit_bm25(docs)
    got = {r["doc_id"]: r["n_matched"] for r in score_query(docs, idx, ["cat", "yard"]).collect()}
    assert got == {1: 1, 2: 2, 4: 1, 5: 1}
