"""Bigram-LM perplexity scorer (X15): semantics + determinism."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pie_spark.text.lm import fit_bigram_lm, score_docs


def _df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_reference_like_text_scores_lower_than_gibberish(spark):
    ref_sentences = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "the cat ran to the dog",
        "a dog and a cat sat together",
    ]
    ref = _df(spark, [(i, t) for i, t in enumerate(ref_sentences)])
    lm = fit_bigram_lm(ref, add_k=0.5)

    probe = _df(
        spark,
        [
            (100, "the cat sat on the mat"),        # in-distribution
            (101, "zqx vbnk wpl qrtz mmzk xkcd"),   # gibberish, unseen vocab
        ],
    )
    scores = {r["doc_id"]: r["lm_cost_micro"] for r in score_docs(probe, lm).collect()}
    assert scores[100] < scores[101]
    # gibberish = all-unseen bigrams → exactly the uniform cost
    import math

    uniform = int(math.floor(math.log(lm.vocab_size) / 0.6931471805599453 * 1e6 + 0.5))
    assert scores[101] == uniform


def test_short_and_empty_docs_get_neutral_prior(spark):
    ref = _df(spark, [(0, "alpha beta gamma alpha beta")])
    lm = fit_bigram_lm(ref)
    out = {
        r["doc_id"]: (r["n_bigrams"], r["lm_cost_micro"])
        for r in score_docs(_df(spark, [(1, "solo"), (2, "")]), lm).collect()
    }
    assert out[1][0] == 0 and out[2][0] == 0
    assert out[1][1] == out[2][1] > 0


def test_scores_partitioning_independent(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    lm = fit_bigram_lm(docs.filter(F.col("doc_id") % 4 == 0))
    a = sorted(tuple(r) for r in score_docs(docs, lm).collect())
    b = sorted(
        tuple(r) for r in score_docs(docs.repartition(17, "text"), lm).collect()
    )
    assert a == b and len(a) == docs.count()
