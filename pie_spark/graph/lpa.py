"""Label-propagation community detection over the knowledge graph
(G5 — KG analytics alongside G1 connected components and G4 PageRank).

CC answers "which entities are transitively aliased"; LPA answers the
finer question "which tightly-knit alias neighborhoods exist INSIDE a
component" — the signal for splitting over-merged canonical groups
(a giant component stitched together by one ambiguous surface form
splits into its dense cores). Classic synchronous LPA with the repo's
determinism bar: every update is an integer count + a total-ordered
argmax, so the labeling is bit-identical across partitionings,
engines, and rounds — no RNG, no visit-order dependence (the
textbook algorithm's nondeterminism is exactly what this variant
removes).

Update rule (per iteration, all nodes simultaneously):
  new_label(v) = the label maximizing (count among v's in-neighbors
  + self-vote, then label string) — count desc, label DESC as the
  deterministic tie-break (``max_by(label, struct(cnt, label))``; any
  total order works, this one is one native aggregate). The SELF-VOTE
  (node's current label counts once) damps the two-coloring
  oscillation synchronous LPA exhibits on bipartite graphs — without
  it the k:/e: alias graph flips sides every round.

Scale shape (identical to pagerank.py): the E-sized edge table is
repartitioned by src ONCE and stays put; per iteration only the
V-sized label table shuffles; the (dst, label) count is algebraic so
hub inflow collapses map-side before the shuffle; the argmax is one
``max_by`` aggregate (no window, no sort); ``localCheckpoint`` per
iteration truncates the plan. Fixed iteration count ⇒ deterministic
output; nothing corpus-sized ever reaches the driver.

Oracle strategy: ``lpa_reference`` is an independent plain-Python
replay (dict counters, same tie-break); tests pin Spark ≡ Python
exactly and the planted two-clique bridge splits as communities while
CC keeps it one component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, iters: int = 5) -> DataFrame:
    """(node, label) after ``iters`` synchronous LPA rounds.

    ``edges`` is directed (src, dst); pass both directions for an
    undirected graph (the caller owns symmetry, same contract as
    pagerank). Duplicate edges count as parallel edges (weighted
    votes), matching the multigraph semantics of mention-derived KGs.
    """
    edges = edges.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    edges = edges.repartition("src").localCheckpoint(eager=True)

    for _ in range(iters):
        votes = (
            edges.join(
                labels.select(F.col("node").alias("src"), "label"), "src"
            )
            .select(F.col("dst").alias("node"), "label")
            # self-vote: damp bipartite oscillation (docstring)
            .unionByName(labels.select("node", "label"))
            .groupBy("node", "label")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        labels = (
            votes.groupBy("node")
            .agg(F.expr("max_by(label, struct(cnt, label))").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def lpa_reference(
    edge_list: list[tuple[str, str]], iters: int = 5
) -> dict[str, str]:
    """Independent plain-Python replay — same counts, same
    (cnt desc, label desc) argmax, kept free of the Spark code paths
    so test equality is a real cross-implementation check."""
    nodes = sorted({s for s, _ in edge_list} | {d for _, d in edge_list})
    labels = {n: n for n in nodes}
    for _ in range(iters):
        votes: dict[str, dict[str, int]] = {n: {labels[n]: 1} for n in nodes}
        for s, d in edge_list:
            votes[d][labels[s]] = votes[d].get(labels[s], 0) + 1
        labels = {
            n: max(v.items(), key=lambda kv: (kv[1], kv[0]))[0]
            for n, v in votes.items()
        }
    return labels
