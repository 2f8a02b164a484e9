"""Z-order layout (io/zorder.py): bit-exact Python-reference parity,
locality of the curve, constant-column degeneracy, and the clustered
write path."""

from __future__ import annotations

import pytest

from pie_spark.io.zorder import write_zordered, zorder_key


def _py_morton(vals: list[int], bits: int) -> int:
    k = len(vals)
    out = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            out |= ((v >> b) & 1) << (b * k + i)
    return out


def _py_norm(v, lo, hi, bits):
    if hi == lo:
        return 0
    return (v - lo) * ((1 << bits) - 1) // (hi - lo)


GRID = [(x, y) for x in range(16) for y in range(16)]


def test_matches_python_reference(spark):
    df = spark.createDataFrame(GRID, "x long, y long").repartition(5)
    keyed, bounds = zorder_key(df, ["x", "y"], bits=4)
    assert bounds == {"x": (0, 15), "y": (0, 15)}
    got = {(r.x, r.y): r["__zkey"] for r in keyed.collect()}
    for x, y in GRID:
        assert got[(x, y)] == _py_morton(
            [_py_norm(x, 0, 15, 4), _py_norm(y, 0, 15, 4)], 4
        ), (x, y)


def test_curve_locality(spark):
    """Adjacent points on the z-curve are near in space: the mean
    manhattan hop over the 16×16 grid is provably 1.5 for Morton order
    (vs ~10 expected for a random order) — assert well under that."""
    df = spark.createDataFrame(GRID, "x long, y long")
    keyed, _ = zorder_key(df, ["x", "y"], bits=4)
    pts = [(r["__zkey"], r.x, r.y) for r in keyed.collect()]
    pts.sort()
    hops = [
        abs(a[1] - b[1]) + abs(a[2] - b[2]) for a, b in zip(pts, pts[1:])
    ]
    assert sum(hops) / len(hops) < 3.0
    # and the curve visits every cell exactly once (keys unique)
    assert len({z for z, *_ in pts}) == len(GRID)


def test_constant_column_degenerates(spark):
    rows = [(5, y) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    keyed, bounds = zorder_key(df, ["x", "y"], bits=3)
    assert bounds["x"] == (5, 5)
    got = sorted((r.y, r["__zkey"]) for r in keyed.collect())
    # x contributes nothing; key = spread bits of normalized y
    for y, z in got:
        assert z == _py_morton([0, _py_norm(y, 0, 7, 3)], 3)


def test_bits_overflow_guard(spark):
    df = spark.createDataFrame([(1, 2, 3, 4)], "a long, b long, c long, d long")
    with pytest.raises(ValueError, match="LONG"):
        zorder_key(df, ["a", "b", "c", "d"], bits=16)


def test_write_zordered_files_cluster_both_keys(spark, tmp_path):
    import glob

    df = spark.createDataFrame(GRID, "x long, y long")
    out = str(tmp_path / "z")
    bounds = write_zordered(df, out, ["x", "y"], num_files=4, bits=4)
    assert bounds == {"x": (0, 15), "y": (0, 15)}
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 4
    # each file covers a bounded sub-square of BOTH dimensions: with 4
    # balanced z-ranges of a 16×16 grid, every file's x and y spread
    # must be ≤ half the domain (a single-key sort would leave one
    # dimension spanning the full 16)
    total = 0
    for f in files:
        rows = spark.read.parquet(f).collect()
        total += len(rows)
        xs = [r.x for r in rows]
        ys = [r.y for r in rows]
        assert max(xs) - min(xs) <= 8, f
        assert max(ys) - min(ys) <= 8, f
    assert total == len(GRID)
