"""Token-budget mixing with epoch repetition (prep/mixing.py): rate
solving, deterministic materialization, and the partitioning-
independence contract shared with sampling.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from pie_spark.prep.mixing import (
    DENOM,
    mix_epochs,
    mixture_rates,
    token_counts_by_source,
)

from .conftest import SF_DIR

TARGETS = {"src0": 0.40, "src1": 0.25, "src2": 0.20, "src3": 0.15}
BUDGET = 8000


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_rates_solve_token_budget(spark):
    counts = token_counts_by_source(_docs(spark))
    rates = mixture_rates(spark, counts, TARGETS, BUDGET, max_epochs=4)
    rows = {r["source"]: r for r in rates.collect()}
    assert set(rows) == set(TARGETS)  # allowlist: other sources dropped
    for s, f in TARGETS.items():
        want = (BUDGET * int(round(f * DENOM))) // rows[s]["tokens"]
        assert rows[s]["rate_ppm"] == min(want, 4 * DENOM)


def test_mix_epochs_multiset_semantics(spark):
    docs = _docs(spark)
    counts = token_counts_by_source(docs)
    rates = mixture_rates(spark, counts, TARGETS, BUDGET, max_epochs=4)
    out = mix_epochs(docs.select("doc_id", "source", "text"), rates)

    per_doc = {
        (r["doc_id"]): r["n"]
        for r in out.groupBy("doc_id").agg(F.max("copy").alias("n")).collect()
    }
    rate = {r["source"]: r["rate_ppm"] for r in rates.collect()}
    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    # every materialized doc has copies 1..n exactly once (dense epochs)
    cnt = {r["doc_id"]: r["c"] for r in out.groupBy("doc_id").agg(F.count("*").alias("c")).collect()}
    assert cnt == per_doc
    # copy count is floor(rate) or floor(rate)+1, never outside
    for d, n in per_doc.items():
        lo = rate[src[d]] // DENOM
        assert n in (lo, lo + 1)
    # with these targets at this sf, upsampling MUST occur (epochs >= 2)
    # and at least one src3 doc must be dropped (rate < 1)
    assert max(per_doc.values()) >= 2
    dropped = {d for d, s in src.items() if s in TARGETS} - set(per_doc)
    assert dropped

    # realized token mass per source lands near budget * target: the
    # deterministic Bernoulli only wobbles the fractional epoch, so the
    # error is bounded by one epoch's worth of token variance
    toks = out.withColumn("t", F.size(F.split("text", " ")))
    got = {r["source"]: r["tt"] for r in toks.groupBy("source").agg(F.sum("t").alias("tt")).collect()}
    for s, f in TARGETS.items():
        want = BUDGET * f
        assert abs(got[s] - want) / want < 0.35


def test_mix_epochs_partitioning_independent(spark):
    docs = _docs(spark)
    rates = mixture_rates(
        spark, token_counts_by_source(docs), TARGETS, BUDGET, max_epochs=4
    )
    a = mix_epochs(docs.select("doc_id", "source"), rates)
    b = mix_epochs(docs.repartition(13).select("doc_id", "source"), rates)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_max_epochs_caps_upsampling(spark):
    docs = _docs(spark)
    rates = mixture_rates(
        spark,
        token_counts_by_source(docs),
        {"src0": 1.0},
        budget_tokens=10_000_000,  # absurd budget → cap must bite
        max_epochs=3,
    )
    assert rates.collect()[0]["rate_ppm"] == 3 * DENOM
    out = mix_epochs(docs.select("doc_id", "source"), rates)
    assert out.groupBy().max("copy").collect()[0][0] == 3
