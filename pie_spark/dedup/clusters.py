"""Near-dup CLUSTERING — pairs are not enough for dedup: transitive
near-duplicates (A~B, B~C) must collapse into one cluster with one
kept representative, or a 100 TB corpus keeps one copy per PAIR
instead of one per GROUP. Composes the MinHash+LSH pair generator with
the same distributed min-label CC operator (G1) the KG pipeline uses
for surface canonicalization — the cluster graph is pair-sized
(near-dup pairs), never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.canon.cc import adaptive_components
from pie_spark.dedup.minhash import near_duplicates


def near_dup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.7,
    max_bucket: int = 50,
    max_iters: int = 20,
) -> DataFrame:
    """(doc_id, cluster_rep): connected components over the near-dup
    pair graph; rep = lexicographically smallest member id (string
    order — ids are cast to string for the label algebra). Singleton
    documents (no near-dup) do NOT appear — absence means 'keep'."""
    pairs = near_duplicates(docs, text_col, threshold=threshold, max_bucket=max_bucket)
    edges = pairs.select(
        F.col("doc_a").cast("string").alias("src"),
        F.col("doc_b").cast("string").alias("dst"),
    )
    # r07: size-adaptive CC (same pattern the pipeline uses for the
    # dictionary graph) — near-dup pair graphs are pair-sized, usually
    # far under the driver union-find threshold, where the distributed
    # loop is ~2 s of pure scheduling; past the threshold the salted
    # distributed loop runs as before. Labels identical on both paths
    # (union_find ≡ connected_components, pinned by tests/test_cc.py).
    labels = adaptive_components(docs.sparkSession, edges, max_iters=max_iters)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_rep")
    )


def cosine_near_dup_clusters(
    embeddings: DataFrame,
    threshold: float = 0.95,
    nbits: int = 6,
    n_tables: int = 4,
    dim: int = 64,
    max_bucket: int = 200,
    max_iters: int = 20,
) -> DataFrame:
    """Embedding-space analog: cosine near-dup pair graph (multi-table
    hyperplane LSH) → CC → (vec_id, cluster_rep). Same pair-sized graph
    property; reps are string-min ids."""
    from pie_spark.dedup.embedding import cosine_near_duplicates

    pairs = cosine_near_duplicates(
        embeddings, threshold=threshold, nbits=nbits,
        n_tables=n_tables, dim=dim, max_bucket=max_bucket,
    )
    edges = pairs.select(
        F.col("id_a").cast("string").alias("src"),
        F.col("id_b").cast("string").alias("dst"),
    )
    labels = adaptive_components(embeddings.sparkSession, edges, max_iters=max_iters)
    return labels.select(
        F.col("node").alias("vec_id"), F.col("component").alias("cluster_rep")
    )


def dedup_by_cluster(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.7,
    max_bucket: int = 50,
    key_col: str = "doc_id",
) -> DataFrame:
    """Corpus minus non-representative cluster members: keeps every
    singleton plus exactly one doc (the rep) per near-dup cluster."""
    clusters = near_dup_clusters(docs, text_col, threshold, max_bucket)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_rep")).select(
        F.col("doc_id").alias("__drop_key")
    )
    return docs.join(
        drop, docs[key_col].cast("string") == drop["__drop_key"], "left_anti"
    )
