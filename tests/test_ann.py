"""Similarity search: brute-force exactness vs numpy; LSH/IVF recall
vs the exact baseline (measured, not assumed)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pie_spark.ann.search import brute_force_topk, ivf_topk, lsh_topk

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def test_brute_force_matches_numpy(spark, emb, queries):
    got = brute_force_topk(emb, queries, k=5).collect()
    pdf = emb.toPandas().sort_values("vec_id")
    M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for q_id in range(5):
        qv = M[ids == q_id][0]
        sims = Mn @ (qv / np.linalg.norm(qv))
        order = sorted(zip(-np.round(sims, 6), ids))[:5]
        want = [int(i) for _, i in order]
        have = [r.vec_id for r in sorted(got, key=lambda r: r.rank) if r.q_id == q_id]
        assert have == want, (q_id, have, want)


def _recall(approx, exact, k):
    e = {(r.q_id, r.vec_id) for r in exact if r.rank <= k}
    a = {(r.q_id, r.vec_id) for r in approx if r.rank <= k}
    return len(a & e) / len(e)


def test_lsh_recall(emb, queries):
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = lsh_topk(emb, queries, k=10, nbits=4).collect()
    # query's own vector always shares its bucket → rank-1 self-hit
    assert {r.vec_id for r in approx if r.rank == 1} == {r.q_id for r in approx if r.rank == 1}
    assert _recall(approx, exact, 10) >= 0.2  # 4-bit sketch, 16 buckets


def test_ivf_recall_beats_probe_fraction(emb, queries):
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=4).collect()
    r = _recall(approx, exact, 10)
    assert r >= 0.4, r  # probing 4/16 lists must beat the 25% random floor


def test_ivf_full_probe_is_exact(emb, queries):
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = ivf_topk(emb, queries, k=10, n_centroids=8, nprobe=8).collect()
    assert _recall(approx, exact, 10) == 1.0
