"""Weighted shortest paths (graph/sssp.py): fuzz equality vs the
independent Python Dijkstra, partitioning invariance, weighted-path-
beats-hop-path fixtures, unit-weight equivalence to BFS. Driver-style
oracle parity lives in test_oracle.py (folded row)."""

from __future__ import annotations

import random

from pie_spark.graph.sssp import sssp_distances, sssp_reference


def _rand_wedges(rng, n_nodes, n_edges, wmax=9):
    nodes = [f"n{i:02d}" for i in range(n_nodes)]
    seen = set()
    out = []
    while len(out) < n_edges:
        a, b = rng.sample(nodes, 2)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        out.append((a, b, rng.randint(1, wmax)))
    return sorted(out)


def test_sssp_matches_dijkstra_fuzz(spark):
    rng = random.Random(60609)
    for _ in range(3):
        edges = _rand_wedges(rng, 12, 28)
        df = spark.createDataFrame(edges, ["src", "dst", "w"])
        got = {r.node: r.dist for r in sssp_distances(df, ["n00", "n01"]).collect()}
        assert got == sssp_reference(edges, ["n00", "n01"])


def test_sssp_weighted_path_beats_hop_path(spark):
    # direct edge cost 10; two-hop detour cost 2+3 — weighted answer 5,
    # hop answer would be 1 edge
    edges = [("s", "t", 10), ("s", "m", 2), ("m", "t", 3)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {r.node: r.dist for r in sssp_distances(df, ["s"]).collect()}
    assert got == {"s": 0, "m": 2, "t": 5}


def test_sssp_unit_weights_equal_bfs(spark):
    from pie_spark.graph.bfs import bfs_distances

    edges = _rand_wedges(random.Random(17), 10, 20)
    unit = [(a, b, 1) for a, b, _ in edges]
    df = spark.createDataFrame(unit, ["src", "dst", "w"])
    got = {r.node: r.dist for r in sssp_distances(df, ["n00"]).collect()}
    bdf = spark.createDataFrame([(a, b) for a, b, _ in edges], ["src", "dst"])
    bfs = {r.node: r.dist for r in bfs_distances(bdf, ["n00"]).collect()}
    assert got == bfs


def test_sssp_partitioning_invariant_and_parallel_edges(spark):
    edges = _rand_wedges(random.Random(23), 9, 18) + [
        ("n00", "n01", 7),
        ("n01", "n00", 2),  # reverse direction, lower weight — min wins
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    a = sorted(tuple(r) for r in sssp_distances(df.repartition(1), ["n00"]).collect())
    b = sorted(tuple(r) for r in sssp_distances(df.repartition(6), ["n00"]).collect())
    assert a == b == sorted(sssp_reference(edges, ["n00"]).items())


def test_sssp_absent_source_and_unreachable(spark):
    edges = [("a", "b", 2)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {r.node: r.dist for r in sssp_distances(df, ["z", "a"]).collect()}
    assert got == {"z": 0, "a": 0, "b": 2}
