"""Bloom filter (prep/bloom.py): zero false negatives, bounded false
positives, bit-exact Python-reference words, partitioning
independence, and the sparse-word representation."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pie_spark.prep.bloom import build_bloom, probe_bloom

M, K = 1 << 12, 4
MEMBERS = [f"member-{i}" for i in range(300)]
OTHERS = [f"other-{i}" for i in range(2000)]


def _py_pos(v: str, i: int) -> int:
    h = int(hashlib.md5(f"bloom:{i}:{v}".encode()).hexdigest()[:15], 16)
    return h % M


def _py_words(values) -> dict[int, int]:
    words: dict[int, int] = {}
    for v in values:
        for i in range(K):
            p = _py_pos(v, i)
            words[p // 63] = words.get(p // 63, 0) | (1 << (p % 63))
    return words


def _df(spark, vals, parts=4):
    return spark.createDataFrame([(v,) for v in vals], "v string").repartition(parts)


def test_words_match_python_reference(spark):
    bloom = build_bloom(_df(spark, MEMBERS), "v", M, K)
    got = {r.word_idx: r.bits for r in bloom.collect()}
    want = _py_words(MEMBERS)
    assert got == want  # 63-bit words: no sign-bit wrap on either side


def test_no_false_negatives(spark):
    bloom = build_bloom(_df(spark, MEMBERS), "v", M, K)
    probed = probe_bloom(_df(spark, MEMBERS), "v", bloom, M, K)
    assert probed.filter(~F.col("maybe_member")).count() == 0


def test_false_positive_rate_bounded(spark):
    import math

    bloom = build_bloom(_df(spark, MEMBERS), "v", M, K)
    probed = probe_bloom(_df(spark, OTHERS), "v", bloom, M, K)
    fp = probed.filter(F.col("maybe_member")).count()
    bound = (1 - math.exp(-K * len(MEMBERS) / M)) ** K
    assert fp / len(OTHERS) <= 3 * bound + 0.01, (fp, bound)


def test_partitioning_independent(spark):
    base = None
    for parts in (1, 9):
        bloom = build_bloom(_df(spark, MEMBERS, parts), "v", M, K)
        got = sorted((r.word_idx, r.bits) for r in bloom.collect())
        if base is None:
            base = got
        else:
            assert got == base


def test_sparse_representation(spark):
    bloom = build_bloom(_df(spark, ["one"]), "v", M, K)
    # one value sets at most K bits → at most K nonzero words, not m/64
    assert bloom.count() <= K
