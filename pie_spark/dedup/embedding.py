"""Embedding-cosine near-dedup (training-data pipeline op).

Pairs with cosine ≥ threshold, found via random-hyperplane LSH
blocking over L INDEPENDENT tables (OR-amplification — one 8-bit
table caught <50% of cosine≈0.95 pairs, VERDICT r01) and verified
exactly inside buckets — the O(n²) comparison never happens; the only
joins are per-(table, bucket), each bounded by the ``max_bucket``
boilerplate guard like MinHash. Fixed-seed plane literals make the
whole operator deterministic and DuckDB-oracle-able (generated SQL in
pie_spark.queries inlines the same planes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.ann.search import _with_table_buckets, cosine


def cosine_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    nbits: int = 6,
    n_tables: int = 4,
    dim: int = 64,
    max_bucket: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    eb = _with_table_buckets(e, "v", dim, nbits, n_tables).select(
        "vec_id", "tbl", "bucket"
    )
    sizes = (
        eb.groupBy("tbl", "bucket").agg(F.count("*").alias("n"))
        .filter(F.col("n").between(2, max_bucket))
        .select("tbl", "bucket")
    )
    ok = eb.join(sizes, ["tbl", "bucket"])
    a = ok.select("tbl", "bucket", F.col("vec_id").alias("id_a"))
    b = ok.select("tbl", "bucket", F.col("vec_id").alias("id_b"))
    pairs = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    vb = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
