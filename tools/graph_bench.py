#!/usr/bin/env python
"""Planted-hub scale measurement for the graph analytics family
(graph/triangles.py, graph/kcore.py): quantify what degree-ordered
orientation buys on a skewed graph, and time the end-to-end operators
at the 10^6-edge rung.

The quadratic term in triangle counting is the wedge count. Without
orientation the wedge join emits Σ C(deg(v), 2) rows — a hub of degree
h contributes h²/2 on its own. Oriented, it emits Σ C(outdeg(v), 2)
with outdeg bounded by the graph degeneracy (hub edges point INTO the
hub). This tool builds a deterministic graph (hash-derived background
edges + one planted hub), computes BOTH wedge counts analytically
(cheap aggregates — the naive count is never materialized, that is the
point), then runs the real oriented triangle_counts + k-core peel and
reports wall times. Results recorded in BENCH/BASELINE.md.

Usage:
    python tools/graph_bench.py                 # V=1e5, E≈1e6, hub 5e4
    PIE_GRAPH_V=200000 PIE_GRAPH_E=2000000 python tools/graph_bench.py

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from pie_spark.graph.kcore import kcore
    from pie_spark.graph.triangles import _oriented, canonical_edges, triangle_counts
    from pie_spark.session import build_session

    v = int(os.environ.get("PIE_GRAPH_V", 100_000))
    e_bg = int(os.environ.get("PIE_GRAPH_E", 1_000_000))
    hub_deg = int(os.environ.get("PIE_GRAPH_HUB", 50_000))

    spark = build_session("graph-bench")
    try:
        # deterministic background: xxhash64 endpoint pairs (no RNG —
        # same discipline as the fixture generators; a LINEAR map mod v
        # is periodic in v and collapses the edge set, measured)
        bg = spark.range(e_bg).select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(v)).cast("string").alias("src"),
            F.pmod(F.xxhash64(F.col("id") + e_bg), F.lit(v)).cast("string").alias("dst"),
        )
        hub = spark.range(hub_deg).select(
            F.lit("HUB").alias("src"), (F.col("id") % v).cast("string").alias("dst")
        )
        edges = bg.unionByName(hub)

        t0 = time.time()
        ce = canonical_edges(edges).localCheckpoint(eager=True)
        n_edges = ce.count()
        build_s = time.time() - t0

        deg = (
            ce.select(F.col("src").alias("node"))
            .unionByName(ce.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        naive_wedges, max_deg = deg.select(
            F.sum(F.col("d") * (F.col("d") - 1) / 2), F.max("d")
        ).first()
        o = _oriented(ce)
        odeg = o.groupBy("lo").agg(F.count("*").alias("d"))
        oriented_wedges, max_outdeg = odeg.select(
            F.sum(F.col("d") * (F.col("d") - 1) / 2), F.max("d")
        ).first()

        t0 = time.time()
        tc = triangle_counts(ce)
        total_tri = (tc.agg(F.sum("n_triangles")).first()[0] or 0) // 3
        tri_s = time.time() - t0

        t0 = time.time()
        core = kcore(ce, k=8)
        core_n = core.count()
        kcore_s = time.time() - t0

        from pie_spark.graph.bfs import bfs_distances
        from pie_spark.graph.similarity import (
            dropped_middle_stats,
            neighborhood_jaccard,
        )

        # BFS from the hub: worst-case frontier (hub reaches hub_deg
        # nodes in one hop)
        t0 = time.time()
        bfs = bfs_distances(ce, ["HUB"])
        bfs_n = bfs.count()
        bfs_depth = bfs.agg(F.max("dist")).first()[0]
        bfs_s = time.time() - t0

        # alias-Jaccard with the hub guard biting (cut 64 ≪ hub deg):
        # pair work tracks Σ C(deg≤64, 2), not the hub's C(50k, 2)
        t0 = time.time()
        nj = neighborhood_jaccard(ce, max_middle_degree=64, min_shared=2)
        nj_n = nj.count()
        nj_s = time.time() - t0
        drops = dropped_middle_stats(ce, max_middle_degree=64).first()

        from pie_spark.graph.negatives import transe_negatives
        from pie_spark.graph.walks import random_walks, symmetrize

        # walk corpus: V walks of 5 hops over the symmetrized graph —
        # the hub is a skew stress (≈ hub_deg/v of all walk mass flows
        # through it every hop; AQE skew-split covers the probe join)
        t0 = time.time()
        walks = random_walks(symmetrize(ce), walk_len=5, walks_per_node=1)
        walk_n = walks.count()
        walk_s = time.time() - t0

        # weighted SSSP from the hub: hash-derived integer weights 1..9;
        # worst-case first frontier (hub_deg nodes), then min-relaxation
        # rounds until the weighted diameter settles
        from pie_spark.graph.sssp import sssp_distances

        t0 = time.time()
        wed = ce.select(
            "src", "dst", (F.pmod(F.xxhash64("src", "dst"), F.lit(9)) + 1).alias("w")
        )
        ss = sssp_distances(wed, ["HUB"])
        ss_n = ss.count()
        ss_s = time.time() - t0

        # second-order node2vec walks: the hub (deg ≫ cap) degrades to
        # the first-order pick — the bias fan-out stays bounded by
        # frontier·max_bias_degree while background nodes get the full
        # p/q-weighted choice
        from pie_spark.graph.walks import node2vec_walks

        t0 = time.time()
        n2v = node2vec_walks(
            symmetrize(ce), walk_len=5, walks_per_node=1, max_bias_degree=64
        )
        n2v_n = n2v.count()
        n2v_s = time.time() - t0

        # weighted walks: hash-derived 1..9 edge weights through the
        # global-offset interval draw (J9 range join per hop)
        from pie_spark.graph.walks import weighted_walks

        t0 = time.time()
        sym = symmetrize(ce)
        wwed = sym.select(
            "src", "dst", (F.pmod(F.xxhash64("src", "dst"), F.lit(9)) + 1).alias("w")
        )
        ww = weighted_walks(wwed, walk_len=5, walks_per_node=1)
        ww_n = ww.count()
        ww_s = time.time() - t0

        # HyperBall: 3 rounds of 16-column register max — the
        # approximate answer to "run BFS from every node"
        from pie_spark.graph.hyperball import hyperball

        t0 = time.time()
        hb = hyperball(sym, rounds=3)
        hb_n = hb.count()
        hb_s = time.time() - t0

        # filtered negatives over edge-derived triples: V-sized vocab
        # (one V-row window rank), E·n_neg·probes candidate fan-out,
        # one triple-sized anti-join
        t0 = time.time()
        trip = ce.select(
            F.col("src").alias("subj"),
            F.lit("LINKS").alias("pred"),
            F.col("dst").alias("obj"),
        )
        neg = transe_negatives(trip, n_neg=2, probes=2)
        neg_n = neg.count()
        neg_s = time.time() - t0

        print(
            json.dumps(
                {
                    "v": v,
                    "edges_canonical": n_edges,
                    "hub_planted_deg": hub_deg,
                    "max_deg": int(max_deg),
                    "max_outdeg_oriented": int(max_outdeg),
                    "naive_wedges": int(naive_wedges),
                    "oriented_wedges": int(oriented_wedges),
                    "wedge_reduction_x": round(naive_wedges / max(oriented_wedges, 1), 1),
                    "triangles": int(total_tri),
                    "build_sec": round(build_s, 2),
                    "triangle_sec": round(tri_s, 2),
                    "kcore8_sec": round(kcore_s, 2),
                    "kcore8_nodes": core_n,
                    "bfs_sec": round(bfs_s, 2),
                    "bfs_reached": bfs_n,
                    "bfs_depth": int(bfs_depth),
                    "jaccard_sec": round(nj_s, 2),
                    "jaccard_pairs": nj_n,
                    "jaccard_dropped_middles": drops.n_dropped_middles,
                    "jaccard_dropped_mass": drops.dropped_degree_mass,
                    "walks_sec": round(walk_s, 2),
                    "walks_rows": walk_n,
                    "node2vec_sec": round(n2v_s, 2),
                    "node2vec_rows": n2v_n,
                    "sssp_sec": round(ss_s, 2),
                    "sssp_reached": ss_n,
                    "weighted_walks_sec": round(ww_s, 2),
                    "weighted_walks_rows": ww_n,
                    "hyperball3_sec": round(hb_s, 2),
                    "hyperball3_rows": hb_n,
                    "negatives_sec": round(neg_s, 2),
                    "negatives_rows": neg_n,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
