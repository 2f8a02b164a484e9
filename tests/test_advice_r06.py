"""Correctness fixes from ADVICE.md (r06 advisor), pinned:

1. node2vec_walks at walk_len <= 1 returns bare start nodes (reference
   parity at the degenerate parameter).
2. sssp_distances raises instead of silently returning non-converged
   distances when max_rounds is exhausted.
3. negatives: the packed min-election guard fails fast, and the vocab
   broadcast hint is dropped past BROADCAST_MAX_ENTS.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


EDGES = [("a", "b"), ("b", "c"), ("b", "d"), ("c", "a")]


@pytest.mark.parametrize("walk_len", [0, 1, 2])
def test_node2vec_degenerate_walk_len_matches_reference(spark, walk_len):
    from pie_spark.graph.walks import node2vec_walks, node2vec_walks_reference

    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = sorted(
        (r.start, r.walk_no, r.path)
        for r in node2vec_walks(e, walk_len=walk_len).collect()
    )
    want = sorted(node2vec_walks_reference(EDGES, walk_len=walk_len))
    assert got == want
    if walk_len <= 1:
        assert all(" " not in p for _, _, p in got)  # bare start nodes


def test_sssp_raises_when_rounds_exhausted(spark):
    from pie_spark.graph.sssp import sssp_distances

    chain = [(f"n{i}", f"n{i+1}", 1) for i in range(6)]
    e = spark.createDataFrame(chain, "src string, dst string, w long")
    # converges fine with headroom…
    ok = {r.node: r.dist for r in sssp_distances(e, ["n0"], max_rounds=10).collect()}
    assert ok["n6"] == 6
    # …raises (not silently wrong) when the cap is too small
    with pytest.raises(RuntimeError, match="did not converge"):
        sssp_distances(e, ["n0"], max_rounds=2)


def test_negatives_pack_guard_fails_fast(spark):
    from pie_spark.graph import negatives as N

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c")], "subj string, pred string, obj string"
    )
    with pytest.raises(ValueError, match="probes"):
        N.transe_negatives(t, probes=1 << 23)
    with pytest.raises(ValueError, match="vocabulary"):
        N._check_pack(N.PACK, probes=3)


def test_negatives_broadcast_hint_gated(spark, monkeypatch):
    from pie_spark.graph import negatives as N

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("a", "p", "c")],
        "subj string, pred string, obj string",
    )
    ref = sorted(map(tuple, N.transe_negatives(t).collect()))

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("simple")
        return buf.getvalue()

    # force the over-threshold path: hint dropped, results identical
    monkeypatch.setattr(N, "BROADCAST_MAX_ENTS", 0)
    out = N.transe_negatives(t)
    assert sorted(map(tuple, out.collect())) == ref
    assert "ResolvedHint" not in plan_of(out)
