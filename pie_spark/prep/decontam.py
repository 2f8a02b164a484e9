"""Benchmark decontamination — flag corpus documents that share word
n-grams with an evaluation/benchmark set, the standard pre-training
hygiene step (e.g. "remove any document containing a 13-gram from the
test set").

Scale shape: the benchmark is the SMALL side (thousands of docs) — its
distinct shingle set is broadcast, so the corpus is scanned once with a
narrow explode + broadcast semi-join + partial-agg count. No corpus
self-join, no shuffle of corpus text. md5-free (plain string shingles)
and fully SQL-expressible → DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.dedup.shingles import doc_shingles


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_hits): corpus docs sharing ≥ min_overlap DISTINCT
    n-gram shingles with the benchmark's union shingle set. ``key_col``
    names the corpus key column; the output key is always ``doc_id``."""
    if min_overlap < 1:
        raise ValueError("min_overlap must be >= 1")
    if key_col != "doc_id":
        # select/alias into a fresh frame — withColumnRenamed would leave
        # TWO doc_id columns when the corpus already has one alongside the
        # custom key, making the groupBy below ambiguous (ADVICE r02)
        corpus = corpus.select(
            F.col(key_col).alias("doc_id"), F.col(text_col)
        )
    bench = doc_shingles(benchmark, text_col, n).select("shingle").distinct()
    hits = doc_shingles(corpus, text_col, n).join(F.broadcast(bench), "shingle")
    return (
        hits.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))  # shingles are distinct per doc
        .filter(F.col("n_hits") >= min_overlap)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Corpus minus contaminated docs (left_anti on the hit set)."""
    bad = contamination_hits(
        corpus, benchmark, n, min_overlap, text_col, key_col
    ).select(F.col("doc_id").alias("__contaminated_key"))
    return corpus.join(
        bad, corpus[key_col] == bad["__contaminated_key"], "left_anti"
    )
