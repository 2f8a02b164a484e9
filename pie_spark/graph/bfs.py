"""Multi-source BFS distances over the knowledge graph (G8; KG
analytics).

"How many hops is this PII entity from that person cluster" is the
reachability question a privacy-KG consumer asks constantly — blast-
radius analysis (everything within d hops of a breached identifier),
linker-prior locality, and community seeding all reduce to single- or
multi-source shortest hop counts on the unweighted co-mention/alias
graph.

Algorithm — synchronous frontier expansion as pure DataFrame ops:
  dist_0 = sources at distance 0; each round joins the CURRENT
  frontier to the adjacency list, anti-joins already-settled nodes,
  dedups duplicate discoveries (a node reached via two frontier edges
  this round settles once — both paths give the same depth, so a
  plain distinct is the correct "min"), and unions into the settled
  set. Stops when the frontier empties — at most eccentricity rounds.

Scale shape (10^12-edge design point):
  * adjacency is built ONCE (both directions for the undirected KG),
    repartitioned by src, and localCheckpointed — every round's join
    probes the same layout, only the frontier (≤ V rows, usually far
    less) moves.
  * per round: one equi-join (frontier ⋈ adjacency — AQE skew-split
    covers hub frontiers), one left_anti against settled, one
    algebraic min-agg; localCheckpoint per round truncates lineage
    (§7.3 trap, same discipline as cc/kcore/pagerank).
  * the convergence probe is a bounded 1-row count; nothing row-sized
    reaches the driver.

Determinism: distances on an unweighted graph are unique — no
tie-breaks needed; exact integer hop counts, partitioning-invariant.

Oracle strategy: ``bfs_reference`` is an independent plain-Python
deque BFS; tests pin Spark ≡ Python on fuzzed graphs, and the folded
``bfs_distances`` oracle replays it over the DuckDB-read co-mention
edge set inlined as VALUES (the k-core/PageRank replay precedent).
"""

from __future__ import annotations

from collections import deque
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.graph.triangles import canonical_edges


def bfs_distances(
    edges: DataFrame,
    sources: Sequence[str],
    max_depth: int = 50,
) -> DataFrame:
    """(node, dist): hop distance from the nearest of ``sources`` over
    the undirected graph, for every node within ``max_depth`` hops
    (unreached nodes are absent). Sources not present in the edge set
    still settle at distance 0."""
    spark = edges.sparkSession
    ce = canonical_edges(edges)
    adj = (
        ce.unionByName(
            ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    settled = spark.createDataFrame(
        [(str(s), 0) for s in sorted(set(sources))], "node string, dist int"
    ).localCheckpoint(eager=True)
    frontier = settled
    for depth in range(1, max_depth + 1):
        discovered = (
            frontier.join(adj, frontier.node == adj.src)
            .select(F.col("dst").alias("node"))
            .join(settled.select("node"), "node", "left_anti")
            .distinct()
            .select("node", F.lit(depth).cast("int").alias("dist"))
        )
        frontier = discovered.localCheckpoint(eager=True)
        if frontier.limit(1).count() == 0:  # bounded convergence probe
            break
        settled = settled.unionByName(frontier).localCheckpoint(eager=True)
    return settled


def bfs_reference(
    edge_list: list[tuple[str, str]], sources: Sequence[str]
) -> dict[str, int]:
    """Independent plain-Python multi-source BFS (deque formulation)."""
    adj: dict[str, set[str]] = {}
    for a, b in edge_list:
        a, b = str(a), str(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {str(s): 0 for s in set(sources)}
    q = deque(sorted(dist))
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist
