"""G2: connected-components input edges (SURVEY.md §2.8).

The canonicalization graph is the **bipartite** surface-form graph:
node ``k:<norm_key>`` — node ``e:<entity_id>`` with one edge per
dictionary row. Two norm_keys land in one component iff they share an
entity (aliases); two entities iff they share a norm_key (ambiguous
surfaces) — exactly the golden union-find in
pie_spark/fixtures/gazetteer.py.

Scale rationale: the naive alternative (self-join the dictionary on
entity_id to emit key-key pairs) is quadratic in the alias count of
hot entities; the bipartite edge list is linear in dictionary size and
pushes all hard work into the CC operator where skew is handled once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_edges(dict_df: DataFrame) -> DataFrame:
    """One (src, dst) edge per dictionary row: k:<norm_key> — e:<entity_id>."""
    return dict_df.select(
        F.concat(F.lit("k:"), F.col("norm_key")).alias("src"),
        F.concat(F.lit("e:"), F.col("entity_id")).alias("dst"),
    ).distinct()
