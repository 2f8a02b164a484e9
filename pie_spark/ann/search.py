"""Similarity search over an embedding column (training-data pipeline op).

Three tiers, all DataFrame-native (dot products via zip_with/aggregate
— no Python in the hot path):

* :func:`brute_force_topk` — exact cosine top-k. The correctness
  baseline; scales linearly (one broadcast of the query set, one scan).
* :func:`lsh_topk` — random-hyperplane LSH: sign-bit sketch → bucket
  equi-join → exact re-rank inside buckets. The scale path: candidate
  set is bucket-sized, not corpus-sized. Planes are fixed-seed numpy,
  shipped as literal arrays (deterministic across runs/partitionings).
* :func:`ivf_topk` — IVF coarse quantizer: k deterministic centroids,
  corpus assigned to nearest centroid (one broadcast join), query
  probes ``nprobe`` nearest lists, exact re-rank inside probed lists.

Recall/coverage of the approximate tiers vs the exact baseline is
measured in tests (no silent caps — the probe breadth is explicit).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

SEED = 42


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a, b) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k per query. Queries are the broadcast side."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).cast("array<double>").alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "q_id", "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "sim")
    )


def _planes(dim: int, nbits: int) -> list[list[float]]:
    rng = np.random.default_rng(SEED)
    return rng.standard_normal((nbits, dim)).tolist()


def _bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    bits = [
        (_dot(vec_col, F.array(*[F.lit(float(x)) for x in p])) > 0).cast("int")
        for p in planes
    ]
    out = F.lit(0)
    for i, b in enumerate(bits):
        out = out + b * (1 << i)
    return out.cast("int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nbits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Hyperplane-LSH ANN: same-bucket candidates, exact re-rank."""
    planes = _planes(dim, nbits)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", _bucket(F.col("v"), planes))
    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).cast("array<double>").alias("qv")
    ).withColumn("bucket", _bucket(F.col("qv"), planes))
    scored = c.join(F.broadcast(q), "bucket").select(
        "q_id", "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF ANN: deterministic coarse centroids (every (n/k)-th vector by
    id order — reproducible without a training pass), nearest-centroid
    assignment, ``nprobe`` probed lists per query, exact re-rank."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    w_all = Window.orderBy("vec_id")
    n = c.count()
    stride = max(n // n_centroids, 1)
    cents = (
        c.withColumn("rn", F.row_number().over(w_all))
        .filter((F.col("rn") % stride == 0) & (F.col("rn") / stride <= n_centroids))
        .select(
            (F.col("rn") / stride).cast("int").alias("cent_id"),
            F.col("v").alias("cv"),
        )
    )
    # assign corpus rows to nearest centroid (broadcast: centroids tiny)
    assign_w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cent_id"))
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("csim", cosine(F.col("v"), F.col("cv")))
        .withColumn("arn", F.row_number().over(assign_w))
        .filter(F.col("arn") == 1)
        .select("vec_id", "v", "cent_id")
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).cast("array<double>").alias("qv")
    )
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("csim"), F.asc("cent_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("csim", cosine(F.col("qv"), F.col("cv")))
        .withColumn("prn", F.row_number().over(probe_w))
        .filter(F.col("prn") <= nprobe)
        .select("q_id", "qv", "cent_id")
    )
    scored = assigned.join(F.broadcast(probes), "cent_id").select(
        "q_id", "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "sim")
    )
