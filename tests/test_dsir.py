"""DSIR-style selection (prep/dsir.py): planted target/gibberish
separation, exact-threshold selection semantics, total-vs-mean LM
consistency, determinism across partitionings."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pie_spark.prep.dsir import importance_scores, select_top_fraction
from pie_spark.text.lm import fit_bigram_lm, score_docs

TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps under the warm sun",
    "a quick fox runs over the green hill",
    "the warm sun shines over the green field",
]
CLEAN = [
    "the quick fox sleeps under the green hill",
    "a lazy dog runs over the warm field",
]
NOISE = [
    "zqx vrb plk wfj zqx nmt plk vrb",
    "xxo yyq zzw xxo qqa wwz yyq xxo",
]


def _df(spark, texts, start=0, parts=4):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(parts)


@pytest.fixture(scope="module")
def fitted(spark):
    target_lm = fit_bigram_lm(_df(spark, TARGET))
    raw_lm = fit_bigram_lm(_df(spark, TARGET + CLEAN + NOISE))
    yield target_lm, raw_lm
    target_lm.unpersist()
    raw_lm.unpersist()


def test_separation_and_selection(spark, fitted):
    target_lm, raw_lm = fitted
    pool = _df(spark, CLEAN + NOISE, start=100)
    scores = importance_scores(pool, target_lm, raw_lm)
    got = {r.doc_id: r.importance_micro for r in scores.collect()}
    # every clean doc outranks every gibberish doc
    assert min(got[100], got[101]) > max(got[102], got[103])
    kept = {r.doc_id for r in select_top_fraction(scores, 500_000).collect()}
    assert kept == {100, 101}


def test_threshold_keeps_ties_and_order(spark, fitted):
    target_lm, raw_lm = fitted
    pool = _df(spark, CLEAN + NOISE + CLEAN, start=200)  # duplicate scores
    scores = importance_scores(pool, target_lm, raw_lm)
    kept = select_top_fraction(scores, 400_000).collect()
    dropped_max = (
        scores.join(
            spark.createDataFrame([(r.doc_id,) for r in kept], "doc_id long"),
            "doc_id",
            "left_anti",
        )
        .agg(F.max("importance_micro"))
        .collect()[0][0]
    )
    kept_min = min(r.importance_micro for r in kept)
    assert len(kept) >= math.ceil(0.4 * 6)
    assert dropped_max is None or kept_min >= dropped_max


def test_total_consistent_with_mean(spark, fitted):
    target_lm, _ = fitted
    pool = _df(spark, CLEAN + NOISE, start=300)
    mean = {r.doc_id: (r.n_bigrams, r.lm_cost_micro) for r in score_docs(pool, target_lm).collect()}
    tot = {r.doc_id: (r.n_bigrams, r.lm_cost_micro) for r in score_docs(pool, target_lm, total=True).collect()}
    for d, (n, m) in mean.items():
        tn, t = tot[d]
        assert tn == n and (n == 0 or t // n == m)


def test_partitioning_independent(spark, fitted):
    target_lm, raw_lm = fitted
    base = None
    for parts in (1, 7):
        pool = _df(spark, CLEAN + NOISE, start=400, parts=parts)
        got = sorted(
            tuple(r) for r in importance_scores(pool, target_lm, raw_lm).collect()
        )
        if base is None:
            base = got
        else:
            assert got == base


def test_frac_edges(spark, fitted):
    target_lm, raw_lm = fitted
    pool = _df(spark, CLEAN + NOISE, start=500)
    scores = importance_scores(pool, target_lm, raw_lm)
    assert select_top_fraction(scores, 1_000_000).count() == 4
    with pytest.raises(ValueError):
        select_top_fraction(scores, 0)
    with pytest.raises(ValueError):
        select_top_fraction(scores, 1_000_001)
