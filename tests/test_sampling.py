"""Deterministic sampling operators (prep/sampling.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # 400 'en', 80 'ru', 20 'ja' — a head-heavy mixture
    rows = (
        [(i, "en") for i in range(400)]
        + [(400 + i, "ru") for i in range(80)]
        + [(480 + i, "ja") for i in range(20)]
    )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang"])
    ).localCheckpoint(eager=True)


def test_hash_sample_deterministic_and_partition_independent(spark, skewed):
    from pie_spark.prep.sampling import hash_sample

    a = {r["doc_id"] for r in hash_sample(skewed, 0.3).collect()}
    b = {r["doc_id"] for r in hash_sample(skewed.repartition(7), 0.3).collect()}
    assert a == b and 0 < len(a) < 500
    # monotone: a lower rate yields a SUBSET (same hash, lower threshold)
    c = {r["doc_id"] for r in hash_sample(skewed, 0.1).collect()}
    assert c <= a


def test_temperature_rates_shape(spark, skewed):
    from pie_spark.prep.sampling import temperature_rates

    r = {row["lang"]: row for row in temperature_rates(skewed, temperature=0.7).collect()}
    # largest stratum pinned at cap; smaller strata sampled at HIGHER rates
    assert r["en"]["rate_ppm"] == 1_000_000
    assert r["en"]["rate_ppm"] < r["ru"]["rate_ppm"] <= 1_000_000 or r["ru"]["rate_ppm"] == 1_000_000
    # τ=0.7, n_ja/n_en = 1/20 → rate_ja = floor(1e6 * 20^0.3) capped at 1e6
    assert r["ja"]["rate_ppm"] == 1_000_000  # 20^0.3 ≈ 2.46 → capped
    assert r["ru"]["rate_ppm"] == 1_000_000  # 5^0.3 ≈ 1.62 → capped


def test_temperature_rates_uncapped(spark, skewed):
    from pie_spark.prep.sampling import temperature_rates

    r = {row["lang"]: row["rate_ppm"] for row in
         temperature_rates(skewed, temperature=0.7, cap=0.25).collect()}
    # cap=0.25: en = 250000 exactly; ru/ja scaled up by (n_max/n)^0.3
    assert r["en"] == 250_000
    assert r["en"] < r["ru"] < r["ja"] <= 1_000_000


def test_stratified_sample_allowlist_semantics(spark, skewed):
    from pie_spark.prep.sampling import stratified_sample

    rates = spark.createDataFrame(
        pd.DataFrame([("en", 500_000), ("ru", 1_000_000)], columns=["lang", "rate_ppm"])
    )
    out = stratified_sample(skewed, rates, "lang")
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "ja" not in by_lang  # unknown stratum dropped, not passed through
    assert by_lang["ru"] == 80  # rate 1.0 keeps everything
    assert 0 < by_lang["en"] < 400  # ~half of en

    # partitioning-independent keep set
    out2 = stratified_sample(skewed.repartition(5), rates, "lang")
    assert {r["doc_id"] for r in out.collect()} == {r["doc_id"] for r in out2.collect()}


def test_invalid_params(spark, skewed):
    from pie_spark.prep.sampling import hash_sample, temperature_rates

    with pytest.raises(ValueError):
        hash_sample(skewed, 1.5)
    with pytest.raises(ValueError):
        temperature_rates(skewed, temperature=0.0)
    with pytest.raises(ValueError):
        temperature_rates(skewed, cap=0.0)


# ---- X22: weighted priority sampling ----

def test_weighted_topk_matches_python_replay(spark):
    import hashlib, math

    from pie_spark.prep.sampling import weighted_sample_topk

    rows = [(i, (i % 7) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, weight long").repartition(7)
    got = [r.doc_id for r in weighted_sample_topk(df, 20, "weight").collect()]

    m = 1 << 20
    def pr(doc_id, w):
        h = int(hashlib.md5(f"wsample:{doc_id}".encode()).hexdigest()[:15], 16)
        return math.log((h % m + 1) / (m + 1)) / w
    want = sorted(rows, key=lambda r: (-pr(*r), r[0]))[:20]
    assert sorted(got) == sorted(d for d, _ in want)


def test_weighted_topk_weight_monotone_and_deterministic(spark):
    from pie_spark.prep.sampling import weighted_sample_topk

    rows = [(i, 1) for i in range(200)]
    df1 = spark.createDataFrame(rows, "doc_id long, weight long")
    base = {r.doc_id for r in weighted_sample_topk(df1, 10, "weight").collect()}
    # same input, different partitioning → identical sample
    df2 = spark.createDataFrame(rows, "doc_id long, weight long").repartition(9)
    assert {r.doc_id for r in weighted_sample_topk(df2, 10, "weight").collect()} == base
    # boost one excluded doc's weight hugely → it enters the sample
    out = sorted(base)[0]
    excluded = next(i for i in range(200) if i not in base)
    boosted = [(i, 10_000_000 if i == excluded else 1) for i in range(200)]
    df3 = spark.createDataFrame(boosted, "doc_id long, weight long")
    assert excluded in {
        r.doc_id for r in weighted_sample_topk(df3, 10, "weight").collect()
    }


def test_weighted_topk_excludes_nonpositive(spark):
    from pie_spark.prep.sampling import weighted_sample_topk

    rows = [(1, 5), (2, 0), (3, -4)]
    df = spark.createDataFrame(rows, "doc_id long, weight long")
    got = [r.doc_id for r in weighted_sample_topk(df, 10, "weight").collect()]
    assert got == [1]
    import pytest as _pt
    with _pt.raises(ValueError):
        weighted_sample_topk(df, 0, "weight")


# ---- X23: percentile-rank normalization ----

def test_percentile_rank_basic(spark):
    from pie_spark.text.analysis import percentile_rank

    rows = [(1, 10), (2, 20), (3, 20), (4, 30), (5, 40)]
    df = spark.createDataFrame(rows, "doc_id long, score long").repartition(3)
    got = {r.doc_id: r.pct_ppm for r in percentile_rank(df, "score").collect()}
    # cum: 10→1, 20→3, 30→4, 40→5 of N=5
    assert got == {1: 200_000, 2: 600_000, 3: 600_000, 4: 800_000, 5: 1_000_000}
    # ties share a rank; max value always ranks 10^6; monotone in score
    assert got[2] == got[3]


def test_percentile_rank_threshold_transfers(spark):
    from pie_spark.text.analysis import percentile_rank

    # two "corpora" with incomparable scales: percentile threshold keeps
    # the same FRACTION of each
    a = spark.createDataFrame([(i, i) for i in range(100)], "doc_id long, s long")
    b = spark.createDataFrame(
        [(i, 1_000_000 + 17 * i) for i in range(100)], "doc_id long, s long"
    )
    from pyspark.sql import functions as F
    ka = percentile_rank(a, "s").filter(F.col("pct_ppm") > 700_000).count()
    kb = percentile_rank(b, "s").filter(F.col("pct_ppm") > 700_000).count()
    assert ka == kb == 30
