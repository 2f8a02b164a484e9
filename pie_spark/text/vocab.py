"""Corpus vocabulary statistics — the tokenizer-training precursor
(word-level vocab with term + document frequencies, deterministic
global top-k).

Scale shape: ONE explode → groupBy(token) with both aggregates partial
(count and approx-exact df via count(distinct) rewritten as a two-level
agg), then the global top-k is ``orderBy(...).limit(k)`` which Spark
executes as TakeOrderedAndProject — per-partition heaps + a driver
merge of k·P rows, never a full sort/shuffle of the vocabulary.

Tiebreak is total-ordered (tf desc, token asc) so the cut at k is
deterministic across partitionings — the same rule every ranked
operator in this engine uses (SURVEY.md §5.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, tf, df): corpus term frequency + document frequency.

    df is computed exactly via a (token, doc_id)-distinct pre-aggregate
    — two partial-aggregable stages — rather than count(distinct ...),
    whose expand-based plan doubles the exploded row stream.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    per_doc = toks.groupBy("token", "doc_id").agg(F.count("*").alias("n"))
    return per_doc.groupBy("token").agg(
        F.sum("n").cast("long").alias("tf"),
        F.count("*").cast("long").alias("df"),
    )


def vocab_topk(docs: DataFrame, k: int = 1000, text_col: str = "text") -> DataFrame:
    """Top-k vocabulary by (tf desc, token asc) — deterministic cut."""
    return (
        token_frequencies(docs, text_col)
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(k)
    )
