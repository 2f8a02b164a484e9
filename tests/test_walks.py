"""Random-walk corpus (graph/walks.py) and filtered TransE negative
sampling (graph/negatives.py): fuzz equality vs the independent plain-
Python replays, partitioning invariance, walk validity / filtered-
property invariants, dangling freeze, and the walk→skip-gram corpus
composition. Driver-style oracle parity lives in test_oracle.py
(folded rows)."""

from __future__ import annotations

import random

from pie_spark.graph.negatives import (
    transe_negatives,
    transe_negatives_reference,
)
from pie_spark.graph.walks import (
    random_walks,
    random_walks_reference,
    symmetrize,
)


def _rand_edges(rng, n_nodes, n_edges):
    nodes = [f"n{i:02d}" for i in range(n_nodes)]
    out = set()
    while len(out) < n_edges:
        a, b = rng.sample(nodes, 2)
        out.add((a, b))
    return sorted(out)


# ------------------------------------------------------------------ walks


def test_walks_match_reference_fuzz(spark):
    rng = random.Random(60606)
    for _ in range(3):
        edges = _rand_edges(rng, 12, 30)
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = sorted(
            tuple(r) for r in random_walks(df, walk_len=6, walks_per_node=2).collect()
        )
        assert got == sorted(random_walks_reference(edges, 6, 2))


def test_walks_partitioning_invariant(spark):
    edges = _rand_edges(random.Random(7), 10, 25)
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = sorted(
        tuple(r)
        for r in random_walks(df.repartition(1), walk_len=5, walks_per_node=3).collect()
    )
    b = sorted(
        tuple(r)
        for r in random_walks(df.repartition(7), walk_len=5, walks_per_node=3).collect()
    )
    assert a == b


def test_walks_are_valid_paths(spark):
    edges = _rand_edges(random.Random(11), 10, 22)
    eset = set(edges)
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = random_walks(df, walk_len=5, walks_per_node=2).collect()
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    # every node gets exactly walks_per_node walks
    assert sorted((r.start, r.walk_no) for r in rows) == sorted(
        (n, k) for n in nodes for k in range(2)
    )
    for r in rows:
        seq = r.path.split(" ")
        assert seq[0] == r.start and len(seq) <= 5
        for u, v in zip(seq, seq[1:]):
            assert (u, v) in eset


def test_walks_freeze_at_dangling(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    got = {(r.start, r.walk_no): r.path for r in random_walks(df, 6, 1).collect()}
    # c has no out-edges: its walk is the bare start; every walk ends at c
    assert got[("c", 0)] == "c"
    assert got[("a", 0)] == "a b c" and got[("b", 0)] == "b c"


def test_symmetrize_and_skipgram_composition(spark):
    from pie_spark.text.colloc import skipgram_counts

    edges = _rand_edges(random.Random(3), 8, 14)
    walks = random_walks(
        symmetrize(spark.createDataFrame(edges, ["src", "dst"])), 5, 2
    )
    # symmetrized graph has no dangling nodes → all walks full length
    assert all(len(r.path.split(" ")) == 5 for r in walks.collect())
    from pyspark.sql import functions as F

    pairs = skipgram_counts(
        walks.select(
            F.concat_ws("#", "start", "walk_no").alias("doc_id"),
            F.col("path").alias("text"),
        ),
        window=2,
    )
    assert pairs.count() > 0


# -------------------------------------------------------------- negatives


def _rand_triples(rng, n_ents, n_preds, n):
    ents = [f"e{i:02d}" for i in range(n_ents)]
    preds = [f"P{i}" for i in range(n_preds)]
    out = set()
    while len(out) < n:
        s, o = rng.sample(ents, 2)
        out.add((s, rng.choice(preds), o))
    return sorted(out)


def test_negatives_match_reference_fuzz(spark):
    rng = random.Random(60607)
    for _ in range(3):
        trip = _rand_triples(rng, 10, 2, 25)
        df = spark.createDataFrame(trip, ["subj", "pred", "obj"])
        got = sorted(
            tuple(r) for r in transe_negatives(df, n_neg=4, probes=3).collect()
        )
        assert got == sorted(transe_negatives_reference(trip, 4, 3))


def test_negatives_are_filtered_and_bounded(spark):
    trip = _rand_triples(random.Random(5), 8, 2, 20)
    tset = set(trip)
    df = spark.createDataFrame(trip, ["subj", "pred", "obj"])
    rows = transe_negatives(df, n_neg=5, probes=3).collect()
    assert rows
    per_triple: dict[tuple, list] = {}
    for r in rows:
        assert (r.subj, r.pred, r.neg_obj) not in tset  # filtered
        assert r.neg_obj != r.obj  # never the true tail
        assert 1 <= r.slot <= 5 and 0 <= r.probe <= 2
        per_triple.setdefault((r.subj, r.pred, r.obj), []).append(r.slot)
    for slots in per_triple.values():
        assert len(slots) == len(set(slots)) <= 5


def test_negatives_partitioning_invariant(spark):
    trip = _rand_triples(random.Random(9), 9, 2, 18)
    df = spark.createDataFrame(trip, ["subj", "pred", "obj"])
    a = sorted(tuple(r) for r in transe_negatives(df.repartition(1), 3, 3).collect())
    b = sorted(tuple(r) for r in transe_negatives(df.repartition(5), 3, 3).collect())
    assert a == b


def test_negatives_dense_graph_drops_slots_deterministically(spark):
    # 3 entities, fully saturated predicate: most candidates collide with
    # true triples, so slots drop — and the replay drops the same ones
    ents = ["x", "y", "z"]
    trip = [(s, "R", o) for s in ents for o in ents if s != o]
    df = spark.createDataFrame(trip, ["subj", "pred", "obj"])
    got = sorted(tuple(r) for r in transe_negatives(df, n_neg=4, probes=2).collect())
    ref = sorted(transe_negatives_reference(trip, 4, 2))
    assert got == ref
    assert len(got) < len(trip) * 4  # some slots provably dropped


# ------------------------------------------------------------- node2vec


def test_node2vec_match_reference_fuzz(spark):
    from pie_spark.graph.walks import node2vec_walks, node2vec_walks_reference

    rng = random.Random(60608)
    for _ in range(2):
        edges = _rand_edges(rng, 11, 32)
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = sorted(
            tuple(r)
            for r in node2vec_walks(df, walk_len=6, walks_per_node=2).collect()
        )
        assert got == sorted(node2vec_walks_reference(edges, 6, 2))


def test_node2vec_guard_degrades_to_first_order(spark):
    # max_bias_degree=0 forces the uniform pick at EVERY hop — the
    # result must equal the first-order random_walks exactly
    from pie_spark.graph.walks import node2vec_walks, random_walks

    edges = _rand_edges(random.Random(13), 9, 20)
    df = spark.createDataFrame(edges, ["src", "dst"])
    n2v = sorted(
        tuple(r)
        for r in node2vec_walks(df, 5, 2, max_bias_degree=0).collect()
    )
    fo = sorted(tuple(r) for r in random_walks(df, 5, 2).collect())
    assert n2v == fo


def test_node2vec_partitioning_invariant_and_guarded_hub(spark):
    from pie_spark.graph.walks import node2vec_walks, node2vec_walks_reference

    star = (
        [("hub", f"s{i}") for i in range(6)]
        + [(f"s{i}", "hub") for i in range(6)]
        + [("s0", "s1"), ("s1", "s2"), ("s2", "s0")]
    )
    df = spark.createDataFrame(star, ["src", "dst"])
    a = sorted(
        tuple(r)
        for r in node2vec_walks(df.repartition(1), 5, 1, max_bias_degree=4).collect()
    )
    b = sorted(
        tuple(r)
        for r in node2vec_walks(df.repartition(6), 5, 1, max_bias_degree=4).collect()
    )
    assert a == b == sorted(node2vec_walks_reference(star, 5, 1, max_bias_degree=4))


# ------------------------------------------------------ weighted negatives


def test_weighted_negatives_match_reference_fuzz(spark):
    from pie_spark.graph.negatives import (
        weighted_negatives,
        weighted_negatives_reference,
    )

    rng = random.Random(60612)
    for _ in range(2):
        trip = _rand_triples(rng, 10, 2, 22)
        ents = sorted({s for s, _, _ in trip} | {o for _, _, o in trip})
        weights = {e: rng.randint(1, 40) for e in ents}
        tdf = spark.createDataFrame(trip, ["subj", "pred", "obj"])
        wdf = spark.createDataFrame(sorted(weights.items()), ["entity", "w"])
        got = sorted(
            tuple(r) for r in weighted_negatives(tdf, wdf, 4, 3).collect()
        )
        assert got == sorted(weighted_negatives_reference(trip, weights, 4, 3))


def test_weighted_negatives_follow_the_weights(spark):
    # one entity owns ~90% of the mass — it must dominate the draws
    from collections import Counter

    from pie_spark.graph.negatives import weighted_negatives

    trip = [(f"s{i:02d}", "R", "tail") for i in range(30)]
    wdf = spark.createDataFrame(
        [("heavy", 900), ("light_a", 50), ("light_b", 50), ("tail", 1)],
        ["entity", "w"],
    )
    tdf = spark.createDataFrame(trip, ["subj", "pred", "obj"])
    rows = weighted_negatives(tdf, wdf, n_neg=4, probes=2).collect()
    c = Counter(r.neg_obj for r in rows)
    assert c["heavy"] > (c["light_a"] + c["light_b"]) * 3
    assert "tail" not in c  # the true tail is always filtered


def test_weighted_negatives_partitioning_invariant(spark):
    from pie_spark.graph.negatives import weighted_negatives

    trip = _rand_triples(random.Random(31), 8, 2, 16)
    ents = sorted({s for s, _, _ in trip} | {o for _, _, o in trip})
    wdf = spark.createDataFrame([(e, i + 1) for i, e in enumerate(ents)],
                                ["entity", "w"])
    tdf = spark.createDataFrame(trip, ["subj", "pred", "obj"])
    a = sorted(tuple(r) for r in weighted_negatives(tdf.repartition(1), wdf, 3, 3).collect())
    b = sorted(tuple(r) for r in weighted_negatives(tdf.repartition(5), wdf, 3, 3).collect())
    assert a == b


# -------------------------------------------------------- weighted walks


def test_weighted_walks_match_reference_fuzz(spark):
    from pie_spark.graph.walks import weighted_walks, weighted_walks_reference

    rng = random.Random(60613)
    for _ in range(2):
        edges = [(a, b, rng.randint(1, 25)) for a, b in _rand_edges(rng, 10, 24)]
        df = spark.createDataFrame(edges, ["src", "dst", "w"])
        got = sorted(
            tuple(r) for r in weighted_walks(df, walk_len=6, walks_per_node=2).collect()
        )
        assert got == sorted(weighted_walks_reference(edges, 6, 2))


def test_weighted_walks_follow_heavy_edges(spark):
    # hub with one weight-1000 edge and nine weight-1 edges: nearly
    # every hop from the hub must take the heavy edge
    from collections import Counter

    from pie_spark.graph.walks import weighted_walks

    edges = [("hub", "heavy", 1000)] + [("hub", f"s{i}", 1) for i in range(9)]
    edges += [(d, "hub", 1) for _, d, _ in [(None, "heavy", None)]]
    edges += [(f"s{i}", "hub", 1) for i in range(9)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    rows = weighted_walks(df, walk_len=9, walks_per_node=3).collect()
    hops = Counter()
    for r in rows:
        seq = r.path.split(" ")
        for u, v in zip(seq, seq[1:]):
            if u == "hub":
                hops[v] += 1
    assert hops["heavy"] > sum(v for k, v in hops.items() if k != "heavy") * 5


def test_weighted_walks_partitioning_invariant_and_unit_weight(spark):
    from pie_spark.graph.walks import random_walks, weighted_walks

    edges = _rand_edges(random.Random(41), 9, 20)
    unit = [(a, b, 1) for a, b in edges]
    df = spark.createDataFrame(unit, ["src", "dst", "w"])
    a = sorted(tuple(r) for r in weighted_walks(df.repartition(1), 5, 2).collect())
    b = sorted(tuple(r) for r in weighted_walks(df.repartition(7), 5, 2).collect())
    assert a == b
    # all-unit weights reduce to the uniform walk (same hash, same
    # rank-ordered cumulative ranges of width 1)
    fo = sorted(
        tuple(r)
        for r in random_walks(spark.createDataFrame(edges, ["src", "dst"]), 5, 2).collect()
    )
    assert a == fo
