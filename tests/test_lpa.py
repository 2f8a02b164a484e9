"""Label propagation (graph/lpa.py): Spark ≡ Python exact equality,
planted two-clique bridge splits into communities (while CC keeps one
component), determinism across partitionings, oscillation damping."""

from __future__ import annotations

import pytest

from pie_spark.graph.lpa import label_propagation, lpa_reference


def _sym(pairs):
    return pairs + [(d, s) for s, d in pairs]


# two 4-cliques joined by ONE bridge edge — the canonical
# "over-merged component with two dense cores" shape
CLIQUE_A = ["a1", "a2", "a3", "a4"]
CLIQUE_B = ["b1", "b2", "b3", "b4"]
BRIDGE = _sym(
    [(u, v) for i, u in enumerate(CLIQUE_A) for v in CLIQUE_A[i + 1:]]
    + [(u, v) for i, u in enumerate(CLIQUE_B) for v in CLIQUE_B[i + 1:]]
    + [("a4", "b1")]
)


def _run_spark(spark, edge_list, iters=5, parts=4):
    df = spark.createDataFrame(edge_list, "src string, dst string").repartition(parts)
    return {
        r["node"]: r["label"]
        for r in label_propagation(df, iters=iters).collect()
    }


def test_spark_equals_python_on_bridge(spark):
    assert _run_spark(spark, BRIDGE) == lpa_reference(BRIDGE, iters=5)


def test_cliques_split_but_cc_would_merge(spark):
    got = _run_spark(spark, BRIDGE)
    la = {got[n] for n in CLIQUE_A}
    lb = {got[n] for n in CLIQUE_B}
    # each clique converges to one label; the two cliques differ
    assert len(la) == 1 and len(lb) == 1 and la != lb


def test_partitioning_independent(spark):
    assert _run_spark(spark, BRIDGE, parts=1) == _run_spark(spark, BRIDGE, parts=9)


def test_bipartite_damping(spark):
    # a 4-cycle (bipartite): without the self-vote synchronous LPA
    # two-colors and oscillates; with it the labeling is stable and
    # Spark ≡ Python at every iteration count
    cyc = _sym([("p", "q"), ("q", "r"), ("r", "s"), ("s", "p")])
    for iters in (1, 2, 3, 6):
        assert _run_spark(spark, cyc, iters=iters) == lpa_reference(cyc, iters=iters)


def test_parallel_edges_weight_votes(spark):
    # doubled edge x->z outvotes the single y->z: z adopts x's label
    edges = [("x", "z"), ("x", "z"), ("y", "z")]
    got = _run_spark(spark, edges, iters=1)
    assert got["z"] == "x"
    assert got == lpa_reference(edges, iters=1)
