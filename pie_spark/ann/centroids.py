"""Per-cluster embedding centroids — the summarization step after
near-dup clustering (cluster representative vectors feed IVF coarse
quantizers, dedup QA sampling, and drift monitoring).

Determinism across engines and partitionings is the design constraint:
a ``avg(double)`` over a shuffled group sums in partition order — two
runs can differ in the last ulp and break value-hash checks. Instead
each component is converted ONCE to integer micro-units
(``round(v·1e6) → long``), summed exactly (long addition is
associative), and floor-divided at the end — the same integer-ppm
discipline the text scorers use. Centroids come back as
``array<long>`` micro-units; callers divide by 1e6 when they need
floats.

Shape: posexplode → (cluster, dim) partial-agg sum → per-cluster
re-pack via sort_array(collect_list(struct(pos, …))) — the collect_list
is dim-sized (64 elements), never corpus-sized, and both aggregates are
map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def cluster_centroids(
    clusters: DataFrame,
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster_rep, n_members, centroid_micro: array<long>).

    ``clusters``: (id_col, cluster_rep) — e.g. cosine_near_dup_clusters
    output (ids are strings there; embedding ids are cast to match).
    Singleton vectors (absent from ``clusters``) get no centroid row.
    """
    e = embeddings.select(
        F.col(id_col).cast("string").alias(id_col),
        F.posexplode(vec_col).alias("pos", "v"),
    )
    j = clusters.select(F.col(id_col).cast("string").alias(id_col), "cluster_rep").join(
        e, id_col
    )
    per_dim = j.groupBy("cluster_rep", "pos").agg(
        F.sum(F.round(F.col("v").cast("double") * MICRO).cast("long")).alias("s"),
        F.count("*").alias("n"),
    )
    return per_dim.groupBy("cluster_rep").agg(
        F.max("n").cast("long").alias("n_members"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
            lambda st: F.floor(st["s"] / st["n"]).cast("long"),
        ).alias("centroid_micro"),
    )
