"""A3/W2: canonical-form election per component (SURVEY.md §2.6 A3;
BASELINE.json:6 — "canonicalizes surface forms").

* canonical **entity** of a component = min entity_id over member
  entity nodes (deterministic; matches the golden union-find).
* canonical **surface key** of a component = most frequently mentioned
  norm_key, ties → lexicographic min (W2 window with total order);
  components with no observed mentions fall back to min norm_key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def canonical_entities(labels: DataFrame) -> DataFrame:
    """labels(node, component) → (component, canon_entity_id)."""
    return (
        labels.filter(F.col("node").startswith("e:"))
        .select("component", F.expr("substring(node, 3)").alias("entity_id"))
        .groupBy("component")
        .agg(F.min("entity_id").alias("canon_entity_id"))
    )


def key_canonical_map(labels: DataFrame) -> DataFrame:
    """(norm_key, component, canon_entity_id) for every dictionary key."""
    keys = labels.filter(F.col("node").startswith("k:")).select(
        F.expr("substring(node, 3)").alias("norm_key"), "component"
    )
    return keys.join(canonical_entities(labels), "component")


def canonical_surfaces(key_map: DataFrame, freqs: DataFrame) -> DataFrame:
    """(component, canon_entity_id, canon_norm_key): W2 election by
    (mention freq desc, norm_key asc)."""
    joined = key_map.join(freqs, "norm_key", "left").na.fill({"freq": 0})
    w = Window.partitionBy("component").orderBy(
        F.desc("freq"), F.asc("norm_key")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("component", "canon_entity_id", F.col("norm_key").alias("canon_norm_key"))
    )
