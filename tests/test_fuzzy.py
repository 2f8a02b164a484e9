"""Fuzzy linking (link/fuzzy.py): exhaustive FastSS recall proof over
every ≤1-edit pair of a planted alphabet, false-positive rejection,
best-match total order, no-match silence, determinism."""

from __future__ import annotations

import itertools

import pytest

from pie_spark.link.fuzzy import fuzzy_link


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _df(spark, vals, col):
    return spark.createDataFrame([(v,) for v in vals], f"{col} string")


def test_exhaustive_recall_small_alphabet(spark):
    """EVERY string pair over {a,b} up to length 3 with lev ≤ 1 must be
    found — the FastSS exactness claim, brute-force checked."""
    universe = [
        "".join(p)
        for n in range(1, 4)
        for p in itertools.product("ab", repeat=n)
    ]
    dict_rows = [(w, f"e:{w}") for w in universe]
    d = spark.createDataFrame(dict_rows, "norm_key string, entity_id string")
    s = _df(spark, universe, "surface_key")
    got = {
        (r.surface_key, r.norm_key)
        for r in fuzzy_link(s, d).select("surface_key", "norm_key").collect()
    }
    # linked pair exists for every surface; and for EVERY (s, k) with
    # lev<=1 the surface must be linked to SOMETHING at dist <= that
    linked_surfaces = {a for a, _ in got}
    want_surfaces = {
        a for a in universe if any(_lev(a, k) <= 1 for k in universe)
    }
    assert linked_surfaces == want_surfaces == set(universe)
    # and each link's distance is the true minimum
    best = {
        r.surface_key: r.dist for r in fuzzy_link(s, d).collect()
    }
    for a in universe:
        assert best[a] == min(_lev(a, k) for k in universe)


def test_typos_link_and_unrelated_do_not(spark):
    d = spark.createDataFrame(
        [("john smith", "e1"), ("mary jones", "e2")],
        "norm_key string, entity_id string",
    )
    s = _df(
        spark,
        ["jon smith", "john smyth", "mary jones", "zzz qqq", "maryjones"],
        "surface_key",
    )
    got = {r.surface_key: (r.norm_key, r.dist) for r in fuzzy_link(s, d).collect()}
    assert got["jon smith"] == ("john smith", 1)
    assert got["john smyth"] == ("john smith", 1)
    assert got["mary jones"] == ("mary jones", 0)
    assert got["maryjones"] == ("mary jones", 1)  # deletion
    assert "zzz qqq" not in got  # no-match emits nothing


def test_best_match_total_order(spark):
    # surface equidistant (1) from two keys → lexicographically smaller
    # key wins; within a key, smaller entity wins
    d = spark.createDataFrame(
        [("cat", "e9"), ("car", "e1"), ("car", "e5")],
        "norm_key string, entity_id string",
    )
    got = {r.surface_key: (r.norm_key, r.entity_id) for r in fuzzy_link(
        _df(spark, ["caX"], "surface_key"), d
    ).collect()}
    assert got["caX"] == ("car", "e1")


def test_partitioning_independent(spark):
    d = spark.createDataFrame(
        [(f"key{i:03d}", f"e{i}") for i in range(50)],
        "norm_key string, entity_id string",
    )
    vals = [f"key{i:03d}x" for i in range(50)] + [f"kEy{i:03d}" for i in range(50)]
    base = None
    for parts in (1, 9):
        s = _df(spark, vals, "surface_key").repartition(parts)
        got = sorted(tuple(r) for r in fuzzy_link(s, d).collect())
        if base is None:
            base = got
        else:
            assert got == base
