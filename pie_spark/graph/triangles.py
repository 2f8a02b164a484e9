"""Triangle counting over the knowledge graph — degree-ordered
orientation (G6; KG analytics).

Triangles are the unit of clustering structure in a co-mention /
alias graph: per-entity triangle participation drives local
clustering coefficients (is this entity's neighborhood a clique — a
tight community — or a hub spraying unrelated neighbors, i.e. an
ambiguous surface form that canonical election should treat
skeptically) and triangle-dense zones flag where near-duplicate
canonicalization is still leaving aliases split.

Algorithm — the shuffle-join formulation of degree-ordered (a.k.a.
"compact-forward") counting:
  1. canonicalize the undirected edge set: (least, greatest), distinct,
     self-loops dropped;
  2. compute degrees (algebraic agg);
  3. orient every edge u→v where (deg(u), u) < (deg(v), v) — a TOTAL
     order, so orientation is deterministic and every edge gets
     exactly one direction;
  4. wedges = oriented ⋈ oriented on the source node, keeping the two
     out-neighbors in orientation order;
  5. close each wedge against the oriented edge set (an equi-join) —
     each triangle is found EXACTLY once, at its lowest-order corner.

Why orientation is the scale story (10^12-edge design point): the
wedge join squares per-node OUT-degree. Without orientation a hub of
degree d contributes d² wedges — a single celebrity entity with 10^8
mentions would emit 10^16 wedge rows. Oriented, every node's
out-degree is bounded by the graph DEGENERACY (hub edges point INTO
the hub, because the hub is maximal in the (deg, node) order), and
real co-mention graphs have degeneracy orders of magnitude below max
degree. All joins are plain equi-joins (AQE skew-split applies); the
closing join's probe side never materializes — Spark streams wedge
rows against the shuffled edge hash relation.

Determinism: exact integer counts, no floats, no RNG; output is a
(node, n_triangles) table invariant to partitioning.

Oracle strategy: DuckDB replays the NAIVE 3-way self-join (a<b<c) on
the same edge set — an independent formulation, so the hash check
proves the oriented algorithm counts exactly the naive set (folded
``triangle_counts`` row in tests/test_oracle.py; fuzz parity vs a
brute-force Python counter in tests/test_triangles.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(edges: DataFrame) -> DataFrame:
    """(src, dst) with src < dst, distinct, self-loops removed — the
    canonical undirected edge set (string-typed node ids)."""
    e = edges.select(
        F.col("src").cast("string").alias("a"),
        F.col("dst").cast("string").alias("b"),
    ).filter(F.col("a") != F.col("b"))
    return e.select(
        F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
    ).distinct()


def _oriented(edges: DataFrame) -> DataFrame:
    """Orient canonical edges by the (degree, node) total order:
    lo → hi, bounding out-degree by graph degeneracy."""
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    e = (
        edges.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("deg", "deg_src")
        .join(deg.withColumnRenamed("node", "dst"), "dst")
        .withColumnRenamed("deg", "deg_dst")
    )
    src_first = (F.col("deg_src") < F.col("deg_dst")) | (
        (F.col("deg_src") == F.col("deg_dst")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
        F.when(src_first, F.col("deg_dst")).otherwise(F.col("deg_src")).alias("deg_hi"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """(x, y, z) corner table — one row per triangle in the undirected
    graph, corners in ascending (deg, node) orientation order."""
    # the oriented edge table fans out to THREE consumers (both wedge
    # sides + the closing probe); without materialization Catalyst
    # re-inlines the whole upstream subtree per consumer — measured
    # 548 exchanges on the co-mention graph vs 8 after this checkpoint
    # (the same re-inlining family as the §7.3 lineage trap). At
    # cluster scale persist the oriented table (MEMORY_AND_DISK or a
    # bucketed write) — it is E-sized, built once, probed three times.
    o = _oriented(canonical_edges(edges)).localCheckpoint(eager=True)
    # wedges at the lowest-order corner: self-join of out-edges on lo;
    # the (deg, node) order between the two out-neighbors (both sides
    # already carry deg_hi) picks each unordered wedge exactly once
    e1 = o.select("lo", F.col("hi").alias("y"), F.col("deg_hi").alias("dy"))
    e2 = o.select("lo", F.col("hi").alias("z"), F.col("deg_hi").alias("dz"))
    wedges = e1.join(e2, "lo").filter(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    # y precedes z in the orientation order, so the closing edge — if
    # present — is oriented y→z
    closing = o.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    return (
        wedges.join(closing, ["y", "z"], "left_semi")
        .select(F.col("lo").alias("x"), "y", "z")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, n_triangles): per-node triangle participation (nodes in
    ≥ 1 triangle). Global count = sum(n_triangles) / 3."""
    t = triangles(edges)
    corners = (
        t.select(F.col("x").alias("node"))
        .unionByName(t.select(F.col("y").alias("node")))
        .unionByName(t.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """(node, deg, n_triangles, cluster_ppm): local clustering
    coefficient in exact integer ppm —
        cluster_ppm = (2 · 10^6 · n_triangles) DIV (deg · (deg − 1))
    for every node with deg ≥ 2 (nodes without a wedge have no defined
    coefficient). Low coefficient at high degree is the hub/ambiguous-
    surface signature; ppm integer division keeps the value hashable
    cross-engine (no float ratio). Degrees come from the same canonical
    edge set the triangles were counted on."""
    ce = canonical_edges(edges)
    deg = (
        ce.select(F.col("src").alias("node"))
        .unionByName(ce.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    tc = triangle_counts(edges)
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tc, "node", "left")
        .withColumn("n_triangles", F.coalesce("n_triangles", F.lit(0)).cast("long"))
        .withColumn(
            "cluster_ppm",
            F.expr("(2000000L * n_triangles) DIV (deg * (deg - 1L))").cast("long"),
        )
    )
