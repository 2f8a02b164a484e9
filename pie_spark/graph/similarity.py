"""Neighborhood-Jaccard node similarity — graph-context alias
detection (G9; KG analytics).

Two surface forms that are genuine aliases of one entity co-occur
with nearly the SAME set of other entities even when their strings
share nothing ("IBM" / "Big Blue"). Distributional similarity over
the co-mention graph is therefore the canonicalizer's second opinion
beyond string-level fuzzy linking (M7): score candidate pairs by the
Jaccard of their neighborhoods and feed high scorers to the CC/LPA
alias machinery.

Algorithm — shared-neighbor counting at the middle vertex:
  |N(a) ∩ N(b)| = number of middles m adjacent to both, so the pair
  table is the middle-vertex self-join of the adjacency list
  (groupBy(a, b) count — algebraic, map-side combinable); degrees
  attach by join and
  jaccard_ppm = 10^6·shared DIV (deg(a) + deg(b) − shared)
  — exact integer, no float ratio in the hash path.

The hub guard (the scale story): a middle vertex of degree d emits
C(d, 2) pairs — one celebrity entity would emit 10^16 rows at
10^8 mentions. Middles with degree > ``max_middle_degree`` are
EXCLUDED from pair generation, with accounting (how many middles,
how much degree mass) returned alongside — the LSH dropped-bucket
precedent: a bounded, *reported* approximation instead of a silent
explosion. Semantically this is the stopword argument: a neighbor
shared with everyone carries no alias signal. Degrees in the
denominator stay FULL-graph degrees, so dropped middles can only
LOWER a score, never inflate it (no false aliases from the guard).
The oracle replays the guard verbatim, so the hash check covers the
approximation rule itself, not just the happy path.

Determinism: exact integer counts/scores; the pair table is
value-unique by (a, b); partitioning-invariant.

Oracle strategy: verbatim SQL replay (folded ``neighbor_jaccard``
row) — adjacency, middle filter, pair counts, degree join, DIV all
mirrored; fuzz vs a plain-Python reference in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.graph.triangles import canonical_edges


def _adjacency(edges: DataFrame) -> DataFrame:
    ce = canonical_edges(edges)
    return ce.unionByName(
        ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def neighborhood_jaccard(
    edges: DataFrame,
    max_middle_degree: int = 10_000,
    min_shared: int = 1,
) -> DataFrame:
    """(a, b, shared, deg_a, deg_b, jaccard_ppm) for node pairs with
    ≥ ``min_shared`` common sub-hub neighbors (a < b)."""
    adj = _adjacency(edges)
    deg = adj.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    mid = (
        adj.join(
            deg.filter(F.col("deg") <= max_middle_degree).select("node"),
            adj.src == F.col("node"),
            "left_semi",
        )
        # one checkpointed copy feeds both sides of the pair self-join
        .localCheckpoint(eager=True)
    )
    pairs = (
        mid.select(F.col("src").alias("m"), F.col("dst").alias("a"))
        .join(
            mid.select(F.col("src").alias("m"), F.col("dst").alias("b")),
            "m",
        )
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "deg_a"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "deg_b"), "b")
        .select(
            "a",
            "b",
            "shared",
            "deg_a",
            "deg_b",
            F.expr("(1000000L * shared) DIV (deg_a + deg_b - shared)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )


def neighborhood_jaccard_reference(
    edge_list: list[tuple[str, str]],
    max_middle_degree: int = 10_000,
    min_shared: int = 1,
) -> dict[tuple[str, str], tuple[int, int]]:
    """Independent plain-Python replay: {(a, b): (shared, jaccard_ppm)}."""
    adj: dict[str, set[str]] = {}
    for x, y in edge_list:
        x, y = str(x), str(y)
        if x == y:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    out: dict[tuple[str, str], int] = {}
    for m, nbrs in adj.items():
        if len(nbrs) > max_middle_degree:
            continue
        for a in nbrs:
            for b in nbrs:
                if a < b:
                    out[(a, b)] = out.get((a, b), 0) + 1
    return {
        (a, b): (s, (1_000_000 * s) // (len(adj[a]) + len(adj[b]) - s))
        for (a, b), s in out.items()
        if s >= min_shared
    }


def resource_allocation(
    edges: DataFrame,
    max_middle_degree: int = 10_000,
    min_shared: int = 1,
) -> DataFrame:
    """(a, b, shared, ra_ppm): resource-allocation link-prediction
    index (Zhou–Lü–Zhang) — Σ over common neighbors m of 1/deg(m), the
    integer-exact surrogate for Adamic–Adar (1/log deg needs a
    cross-engine log; 1/deg keeps the same "rare middles count more"
    ranking signal in exact ppm: ra_ppm = Σ 10^6 DIV deg(m)).

    Same middle-vertex machinery and hub guard as
    :func:`neighborhood_jaccard` — middles above ``max_middle_degree``
    are excluded with the shared `dropped_middle_stats` accounting,
    and since every term is positive, drops can only LOWER scores:
    no false high-confidence link predictions. deg(m) is the FULL-graph
    degree (a guard-surviving middle still weights by its true
    selectivity)."""
    adj = _adjacency(edges)
    deg = adj.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    mid = (
        adj.join(
            deg.filter(F.col("deg") <= max_middle_degree).select(
                "node", F.expr("1000000 DIV deg").cast("long").alias("w_ppm")
            ),
            adj.src == F.col("node"),
        )
        .select("src", "dst", "w_ppm")
        .localCheckpoint(eager=True)
    )
    return (
        mid.select(F.col("src").alias("m"), F.col("dst").alias("a"), "w_ppm")
        .join(
            mid.select(F.col("src").alias("m"), F.col("dst").alias("b")),
            "m",
        )
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("long").alias("shared"),
            F.sum("w_ppm").cast("long").alias("ra_ppm"),
        )
        .filter(F.col("shared") >= min_shared)
    )


def resource_allocation_reference(
    edge_list: list[tuple[str, str]],
    max_middle_degree: int = 10_000,
    min_shared: int = 1,
) -> dict[tuple[str, str], tuple[int, int]]:
    """Independent plain-Python replay: {(a, b): (shared, ra_ppm)}."""
    adj: dict[str, set[str]] = {}
    for x, y in edge_list:
        x, y = str(x), str(y)
        if x == y:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    out: dict[tuple[str, str], list[int]] = {}
    for m, nbrs in adj.items():
        if len(nbrs) > max_middle_degree:
            continue
        w = 1_000_000 // len(nbrs)
        for a in nbrs:
            for b in nbrs:
                if a < b:
                    cur = out.setdefault((a, b), [0, 0])
                    cur[0] += 1
                    cur[1] += w
    return {
        k: (s, r) for k, (s, r) in out.items() if s >= min_shared
    }


def dropped_middle_stats(
    edges: DataFrame, max_middle_degree: int = 10_000
) -> DataFrame:
    """1-row accounting of the hub guard: (n_dropped_middles,
    dropped_degree_mass) — report what the approximation skipped (the
    no-silent-caps rule)."""
    deg = _adjacency(edges).groupBy("src").agg(F.count("*").alias("deg"))
    return deg.filter(F.col("deg") > max_middle_degree).agg(
        F.count("*").cast("long").alias("n_dropped_middles"),
        F.coalesce(F.sum("deg"), F.lit(0)).cast("long").alias("dropped_degree_mass"),
    )
