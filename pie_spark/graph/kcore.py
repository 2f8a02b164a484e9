"""k-core decomposition by iterative peeling (G7; KG analytics).

The k-core (maximal subgraph where every node keeps degree ≥ k) is
the robustness filter for KG-derived signals: entities surviving a
high core are structurally embedded (many mutually-connected
co-mentions), while high-degree nodes OUTSIDE the core are pure hubs
— exactly the ambiguous-surface / boilerplate-mention pattern that
pollutes canonical election. Core membership is also the standard
cheap seed filter before community detection (run LPA inside the
2-core; isolated whiskers can't flip labels).

Algorithm — synchronous peeling to a fixed point:
  repeat: degrees = algebraic count over the live edge set; drop
  nodes with degree < k; keep only edges with BOTH endpoints alive
  (two semi-joins). Stop when no node was dropped.

Peeling converges in at most |V| rounds but in practice O(diameter)-
ish rounds; each round is one agg + two semi-joins on the shrinking
live set, and ``localCheckpoint(eager=True)`` per round truncates the
iterative lineage (§7.3 trap — same discipline as cc.py / pagerank /
LPA). The stop probe is a bounded 1-row count. Monotonicity does the
scale work: the live set only shrinks, so late rounds are cheap
regardless of the starting 10^12-edge size, and the first round's
degree agg is map-side combinable (hubs collapse before the shuffle).

Determinism: the k-core is UNIQUE (peeling order cannot change the
fixed point — a classic invariant), so synchronous peeling needs no
tie-breaks; output exact-integer, partitioning-invariant.

Oracle strategy: ``kcore_reference`` is an independent plain-Python
peeler (dict adjacency, while-loop); tests/test_kcore.py pins Spark ≡
Python on fuzzed graphs, and the folded ``kcore_nodes`` oracle replays
it over the DuckDB-read fixture co-mention graph inlined as VALUES
(the Lloyd/PageRank replay precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.graph.triangles import canonical_edges


def kcore(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """(node, core_deg): nodes of the k-core of the undirected graph,
    with their degree inside the core (≥ k by construction)."""
    live = canonical_edges(edges).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = (
            live.select(F.col("src").alias("node"))
            .unionByName(live.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count("*").cast("long").alias("core_deg"))
        )
        keep = deg.filter(F.col("core_deg") >= k).select("node")
        n_before = deg.count()  # bounded: 1-row agg probe
        n_keep = keep.count()
        if n_keep == n_before:
            return deg.filter(F.col("core_deg") >= k)
        if n_keep == 0:
            return deg.filter(F.lit(False))
        live = (
            live.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"k-core peeling did not converge in {max_rounds} rounds")


def kcore_reference(edge_list: list[tuple[str, str]], k: int) -> dict[str, int]:
    """Independent plain-Python peeler: {node: core_degree} of the
    k-core. Deliberately a different formulation (queue-free whole-set
    sweep) so agreement with the DataFrame loop is evidence, not
    transcription."""
    adj: dict[str, set[str]] = {}
    for a, b in edge_list:
        a, b = str(a), str(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        doomed = [n for n, nbrs in adj.items() if len(nbrs) < k]
        changed = bool(doomed)
        for n in doomed:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    return {n: len(nbrs) for n, nbrs in adj.items() if nbrs}
