"""Deterministic random-walk corpus over the knowledge graph (G10; KG
analytics → embedding training data).

DeepWalk/node2vec-style graph embeddings train word2vec on a corpus of
random walks; at the 10^12-edge design point the walk corpus itself is
a large distributed dataset, and its generation is a Spark job — the
walk corpus feeds directly into the existing skip-gram pair extractor
(text/colloc.py:skipgram_counts over ``path``), closing the loop from
materialized triples to embedding-training pairs entirely inside the
engine.

"Random" is the repo-wide deterministic recipe — NO RNG, no seed
state: the step choice at hop ``t`` of walk ``(start, walk_no)``
standing at node ``cur`` is

    idx = h64(start || '#' || walk_no || '#' || t || '#' || cur)
          mod outdeg(cur)

with h64 the portable md5-15-hex→BIGINT hash used by the whole dedup
family (dedup/shingles.py:h64 — bit-identical in DuckDB and trivially
replayable in plain Python). Neighbor ``idx`` is the rank of the
neighbor in ``ORDER BY dst`` within each src's adjacency list — a
deterministic total order on distinct neighbors. The result is
bit-identical across partitionings, engines, and rounds, yet
distributionally equivalent to a uniform neighbor choice (md5 is an
avalanche hash; successive hops decorrelate through the changing
``t``/``cur`` inputs).

Scale shape (10^12-edge design point):
  * adjacency (src, dst, idx, outdeg) is built ONCE — the per-src
    neighbor ranking is a window sort partitioned by src (same cost
    class as the degree groupBy every other graph op pays),
    repartitioned by src and localCheckpointed; every hop probes the
    same layout.
  * the moving side per hop is the frontier — exactly V·walks_per_node
    rows regardless of edge count — carrying (start, walk_no, cur,
    path). One equi-join per hop on cur (AQE skew-split covers hub
    nodes whose inflowing walk mass concentrates), no aggregation at
    all; walk_len is fixed and small (5–80 in the literature), so the
    job is walk_len narrow-ish rounds.
  * dangling nodes (outdeg 0 — possible on DIRECTED inputs) freeze:
    the left join leaves cur unchanged and the walk simply stops
    growing, matching the reference replay exactly. Undirected graphs
    (the co-mention KG) are symmetrized by the caller via
    ``symmetrize`` so every endpoint has outdeg ≥ 1.
  * localCheckpoint every CHECKPOINT_EVERY hops truncates the growing
    join lineage (§7.3 trap, same discipline as cc/kcore/pagerank).

Oracle strategy: ``random_walks_reference`` is an independent plain-
Python replay (dict adjacency over sorted neighbor lists, hashlib
md5). tests/test_walks.py pins Spark ≡ Python exactly on fuzzed
graphs plus partitioning invariance; the folded driver-style oracle
(queries.py:random_walks) replays it over the DuckDB-read co-mention
edge set inlined as VALUES (the BFS/k-core/PageRank precedent).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pie_spark.dedup.shingles import h64

CHECKPOINT_EVERY = 4


def symmetrize(edges: DataFrame) -> DataFrame:
    """Both directions of an undirected (src, dst) edge list, distinct —
    walk inputs for the co-mention KG."""
    fwd = edges.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def _step_hash(t: int) -> F.Column:
    return h64(
        F.concat_ws(
            "#",
            F.col("start"),
            F.col("walk_no").cast("string"),
            F.lit(str(t)),
            F.col("cur"),
        )
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 5,
    walks_per_node: int = 2,
) -> DataFrame:
    """(start, walk_no, path): ``walks_per_node`` deterministic walks of
    ≤ ``walk_len`` nodes from every node of the DIRECTED (src, dst)
    edge list; ``path`` is the space-joined node sequence (the text
    contract of skipgram_counts, so walk corpora feed the existing
    pair extractor unchanged). Walks freeze at dangling nodes."""
    edges = edges.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    w = Window.partitionBy("src").orderBy("dst")
    adj = (
        edges.distinct()
        .select(
            "src",
            "dst",
            (F.row_number().over(w) - 1).cast("long").alias("idx"),
            F.count("*").over(Window.partitionBy("src")).cast("long").alias("outdeg"),
        )
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    frontier = nodes.select(
        F.col("node").alias("start"),
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_node - 1))
        ).alias("walk_no"),
        F.col("node").alias("cur"),
        F.col("node").alias("path"),
    )
    deg = (
        adj.select(F.col("src").alias("deg_src"), "outdeg").distinct()
        .localCheckpoint(eager=True)
    )
    hop = adj.select(
        F.col("src").alias("a_src"),
        F.col("dst").alias("a_dst"),
        F.col("idx").alias("a_idx"),
    )
    for t in range(1, walk_len):
        picked = (
            frontier.join(deg, frontier.cur == F.col("deg_src"), "left")
            .select(
                "start",
                "walk_no",
                "cur",
                "path",
                F.when(
                    F.col("outdeg").isNotNull(),
                    F.pmod(_step_hash(t), F.col("outdeg")),
                ).alias("pick"),
            )
        )
        frontier = (
            picked.join(
                hop,
                (picked.cur == F.col("a_src")) & (picked.pick == F.col("a_idx")),
                "left",
            )
            .select(
                "start",
                "walk_no",
                F.coalesce(F.col("a_dst"), F.col("cur")).alias("cur"),
                F.when(
                    F.col("a_dst").isNotNull(),
                    F.concat_ws(" ", F.col("path"), F.col("a_dst")),
                )
                .otherwise(F.col("path"))
                .alias("path"),
            )
        )
        if t % CHECKPOINT_EVERY == 0:
            frontier = frontier.localCheckpoint(eager=True)
    return frontier.select("start", "walk_no", "path")


def _h64_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def random_walks_reference(
    edges: list[tuple[str, str]],
    walk_len: int = 5,
    walks_per_node: int = 2,
) -> list[tuple[str, int, str]]:
    """Plain-Python replay of ``random_walks`` over a directed edge
    list — dict adjacency with sorted neighbor lists, hashlib md5.
    Independent of the Spark implementation; the parity tests pin the
    two bit-equal."""
    adj: dict[str, set[str]] = defaultdict(set)
    nodes: set[str] = set()
    for s, d in edges:
        adj[s].add(d)
        nodes.add(s)
        nodes.add(d)
    nbrs = {s: sorted(ds) for s, ds in adj.items()}
    out: list[tuple[str, int, str]] = []
    for start in sorted(nodes):
        for walk_no in range(walks_per_node):
            cur, path = start, [start]
            for t in range(1, walk_len):
                ns = nbrs.get(cur)
                if not ns:
                    continue
                pick = _h64_py(f"{start}#{walk_no}#{t}#{cur}") % len(ns)
                cur = ns[pick]
                path.append(cur)
            out.append((start, walk_no, " ".join(path)))
    return out
