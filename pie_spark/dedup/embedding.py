"""Embedding-cosine near-dedup (training-data pipeline op).

Pairs with cosine ≥ threshold, found via random-hyperplane LSH
blocking (same sketch as pie_spark.ann.search) and verified exactly
inside buckets — the O(n²) comparison never happens; bucket fan-out is
the only join, with a ``max_bucket`` boilerplate guard like MinHash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.ann.search import _bucket, _planes, cosine


def cosine_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    nbits: int = 8,
    dim: int = 64,
    max_bucket: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    planes = _planes(dim, nbits)
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", _bucket(F.col("v"), planes))
    sizes = (
        e.groupBy("bucket").agg(F.count("*").alias("n"))
        .filter(F.col("n").between(2, max_bucket))
        .select("bucket")
    )
    ok = e.join(sizes, "bucket")
    a = ok.select("bucket", F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = ok.select("bucket", F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
