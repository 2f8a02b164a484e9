"""A1/A2/A4: mention-surface statistics (SURVEY.md §2.6).

Native hash aggregations — Spark performs partial (map-side) + final
aggregation automatically, so hot surfaces do not skew these ops even
at 10^12 docs. The top-k hot list (A4) is the *only* data collected to
the driver in the whole pipeline (bounded at k rows), feeding the J6
salting decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.extract.normalize import norm_key


def surface_frequencies(mentions: DataFrame) -> DataFrame:
    """A1: counts per normalized person surface."""
    return (
        mentions.filter(F.col("mention_type") == "PERSON")
        .withColumn("norm_key", norm_key("surface"))
        .groupBy("norm_key")
        .agg(
            F.count("*").alias("freq"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


def approx_surface_cardinality(mentions: DataFrame) -> int:
    """A2: HLL estimate of distinct person surfaces (planning metric)."""
    row = (
        mentions.filter(F.col("mention_type") == "PERSON")
        .agg(F.approx_count_distinct(norm_key("surface")).alias("n"))
        .collect()[0]
    )
    return int(row["n"])


def hot_keys(freqs: DataFrame, k: int) -> list[str]:
    """A4: top-k hottest norm_keys by mention count (deterministic
    tiebreak on the key). Bounded driver collect (k rows)."""
    rows = (
        freqs.orderBy(F.desc("freq"), F.asc("norm_key")).limit(k).collect()
    )
    return [r["norm_key"] for r in rows]
