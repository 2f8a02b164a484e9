"""Weighted shortest paths over the knowledge graph (G12; KG
analytics).

BFS (graph/bfs.py) answers "how many hops"; association strength needs
"how CHEAP is the path" — rare co-occurrences are strong signals, so a
weighted co-mention graph (cost = 10^6 DIV pair_docs, integer "rarity
cost") turns blast-radius analysis into weighted reachability: a
breached identifier two very-strong edges away is closer than one weak
edge away. This is multi-source SSSP with NON-NEGATIVE integer
weights as pure DataFrame ops.

Algorithm — delta-stepping-flavored Bellman–Ford relaxation:
  dist_0 = sources at 0. Each round relaxes ONLY from the frontier
  (nodes whose distance improved last round — the classic work-
  efficiency fix over naive Bellman–Ford's all-edges-every-round):
  candidates = frontier ⋈ adjacency → (dst, dist+w); the new distance
  table is the per-node min of (settled ∪ candidates) — an ALGEBRAIC
  min agg, so map-side combine collapses hub inflow floods before the
  shuffle (the min-label CC / PageRank skew armor). The next frontier
  is the set of nodes whose min changed. Terminates when the frontier
  empties — at most V-1 rounds in theory, weighted-diameter rounds in
  practice; ``max_rounds`` caps pathological chains.

Determinism: integer distances have a unique per-node minimum — no
tie-breaks, no floats; bit-identical across partitionings/engines.

Scale shape (10^12-edge design point):
  * adjacency built once (symmetrized for the undirected KG),
    repartitioned by src, localCheckpointed; per round one
    frontier-sized equi-join + one algebraic min + one changed-set
    anti-semi comparison, each localCheckpointed (§7.3 discipline).
  * the convergence probe is a bounded limit(1).count() — nothing
    row-sized reaches the driver.

Oracle strategy: ``sssp_reference`` is an independent plain-Python
DIJKSTRA (heapq) — a genuinely different algorithm, so agreement
checks the relaxation fixpoint itself, not a transcription.
tests pin Spark ≡ Python on fuzzed weighted graphs; the folded
driver-style oracle replays it over the DuckDB-read weighted
co-mention edges inlined as VALUES.
"""

from __future__ import annotations

import heapq
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sssp_distances(
    edges: DataFrame,
    sources: Sequence[str],
    max_rounds: int = 50,
) -> DataFrame:
    """(node, dist): minimum total weight from the nearest of
    ``sources`` over the UNDIRECTED weighted (src, dst, w) edge list,
    for every reachable node. Weights must be non-negative integers;
    unreachable nodes are absent; sources settle at 0 even when absent
    from the edge set."""
    spark = edges.sparkSession
    e = edges.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
        F.col("w").cast("long").alias("w"),
    ).filter(F.col("src") != F.col("dst"))
    # undirected: both directions; parallel edges keep their min weight
    adj = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    settled = spark.createDataFrame(
        [(str(s), 0) for s in sorted(set(sources))], "node string, dist long"
    ).localCheckpoint(eager=True)
    frontier = settled
    for _ in range(max_rounds):
        cand = (
            frontier.join(adj, frontier.node == adj.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        new = (
            settled.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        # changed set = nodes whose min improved (new nodes included)
        frontier = (
            new.join(
                settled.select(F.col("node").alias("o_node"),
                               F.col("dist").alias("o_dist")),
                new.node == F.col("o_node"),
                "left",
            )
            .filter(F.col("o_dist").isNull() | (F.col("dist") < F.col("o_dist")))
            .select("node", "dist")
            .localCheckpoint(eager=True)
        )
        settled = new
        if frontier.limit(1).count() == 0:  # bounded convergence probe
            return settled
    # no-silent-caps rule (ADVICE r06): a relaxation that still has an
    # active frontier after max_rounds would return WRONG distances with
    # no signal — raise like connected_components does at its cap
    raise RuntimeError(
        f"sssp_distances did not converge within {max_rounds} rounds "
        "(weighted diameter exceeds the cap); raise max_rounds"
    )


def sssp_reference(
    edge_list: list[tuple[str, str, int]],
    sources: Sequence[str],
) -> dict[str, int]:
    """Independent plain-Python multi-source Dijkstra (heapq) — a
    different algorithm from the Spark relaxation on purpose."""
    adj: dict[str, dict[str, int]] = {}
    for a, b, w in edge_list:
        a, b = str(a), str(b)
        if a == b:
            continue
        w = int(w)
        for u, v in ((a, b), (b, a)):
            cur = adj.setdefault(u, {}).get(v)
            if cur is None or w < cur:
                adj[u][v] = w
    dist = {str(s): 0 for s in set(sources)}
    heap = [(0, s) for s in sorted(dist)]
    heapq.heapify(heap)
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, {}).items():
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist
