"""Exact deduplication: hash-groupBy (training-data pipeline op).

Content key = md5 of normalized text (lower, punct-stripped, collapsed
whitespace) so trivial formatting variants collapse. One hash
aggregation — partial/final combine handles any duplication skew; the
representative election (min doc_id) is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.dedup.shingles import norm_text


def _content_key(text_col: str) -> F.Column:
    # shared Unicode-aware normalizer (raw-text fallback when the
    # normalized form is empty — two distinct emoji-only docs must NOT
    # collapse to one key; see shingles.norm_text)
    return F.md5(norm_text(text_col))


def duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(content_md5, rep_doc_id, n_docs) per distinct content."""
    return (
        docs.select(F.col("doc_id"), _content_key(text_col).alias("content_md5"))
        .groupBy("content_md5")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count("*").alias("n_docs"))
    )


def dedup_map(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, rep_doc_id, is_dup): every doc mapped to its group
    representative; keep rows where doc_id == rep_doc_id to dedup."""
    keyed = docs.select("doc_id", _content_key(text_col).alias("content_md5"))
    groups = duplicate_groups(docs, text_col).select("content_md5", "rep_doc_id")
    return keyed.join(groups, "content_md5").select(
        "doc_id",
        "rep_doc_id",
        (F.col("doc_id") != F.col("rep_doc_id")).alias("is_dup"),
    )
