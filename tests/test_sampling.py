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
