"""HyperBall neighborhood-function estimation (graph/hyperball.py):
fuzz register equality vs the independent Python replay, partitioning
invariance, monotone ball growth, saturation at the full component,
and estimate accuracy vs exact BFS balls (the float stays OFF the
hash-checked path). Driver-style oracle parity lives in test_oracle.py
(folded row)."""

from __future__ import annotations

import random
import statistics

from pie_spark.graph.hyperball import (
    ball_estimate,
    ball_estimate_py,
    hyperball,
    hyperball_reference,
)


def _sym_edges(rng, n_nodes, n_edges):
    nodes = [f"n{i:02d}" for i in range(n_nodes)]
    und = set()
    while len(und) < n_edges:
        a, b = rng.sample(nodes, 2)
        und.add((min(a, b), max(a, b)))
    return sorted(und | {(b, a) for a, b in und})


def _exact_ball(sym, v, t):
    adj: dict[str, set[str]] = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    seen, fr = {v}, {v}
    for _ in range(t):
        fr = {y for x in fr for y in adj.get(x, ())} - seen
        seen |= fr
    return len(seen)


def test_hyperball_matches_reference_fuzz(spark):
    rng = random.Random(60614)
    for _ in range(2):
        sym = _sym_edges(rng, 14, 30)
        df = spark.createDataFrame(sym, ["src", "dst"])
        got = sorted(tuple(r) for r in hyperball(df, rounds=3).collect())
        assert got == sorted(hyperball_reference(sym, rounds=3))


def test_hyperball_partitioning_invariant(spark):
    sym = _sym_edges(random.Random(19), 12, 24)
    df = spark.createDataFrame(sym, ["src", "dst"])
    a = sorted(tuple(r) for r in hyperball(df.repartition(1), 3).collect())
    b = sorted(tuple(r) for r in hyperball(df.repartition(7), 3).collect())
    assert a == b


def test_hyperball_balls_grow_then_saturate(spark):
    # path graph a-b-c-d: reg_sum is non-increasing in t (bigger ball
    # => smaller scaled sum), and saturates once the ball is the whole
    # component — rounds beyond the diameter change NOTHING
    path = [("a", "b"), ("b", "c"), ("c", "d")]
    sym = path + [(b, a) for a, b in path]
    df = spark.createDataFrame(sym, ["src", "dst"])
    rows = hyperball(df, rounds=5).collect()
    by_node: dict[str, dict[int, int]] = {}
    for r in rows:
        by_node.setdefault(r.node, {})[r.round] = r.reg_sum
    for n, seq in by_node.items():
        vals = [seq[t] for t in sorted(seq)]
        assert all(x >= y for x, y in zip(vals, vals[1:]))  # monotone
        assert vals[3] == vals[4]  # diameter 3: round 4+ is a fixpoint


def test_estimate_accuracy_vs_exact_balls(spark):
    sym = _sym_edges(random.Random(23), 40, 120)
    df = spark.createDataFrame(sym, ["src", "dst"])
    est = ball_estimate(hyperball(df, rounds=2)).collect()
    errs = []
    for r in est:
        true = _exact_ball(sym, r.node, r.round)
        errs.append(abs(r.est - true) / true)
        # Spark float formula == Python twin exactly
        assert abs(r.est - ball_estimate_py(r.reg_sum, r.empties)) < 1e-9
    # m=16 HLL: ~26% typical relative error; assert a loose envelope
    assert statistics.mean(errs) < 0.4
