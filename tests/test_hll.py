"""Deterministic HyperLogLog (pie_spark/link/hll.py): accuracy,
partitioning independence, both estimator branches, and DuckDB parity
of the branch the driver row does NOT exercise (linear counting —
rides on ln, so it's pinned here rather than in the driver path)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pie_spark.link.hll import hll_estimate, hll_estimate_sql, hll_registers

from .conftest import SF_DIR


def test_hll_accuracy_and_determinism(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    row = hll_estimate(li, "l_orderkey", p=8).first()
    exact = li.select("l_orderkey").distinct().count()
    assert abs(row.estimate - exact) / exact < 3 * 1.04 / 16  # 3 sigma at m=256
    # sketch is a pure function of the value set: partitioning-independent
    again = hll_estimate(li.repartition(17), "l_orderkey", p=8).first()
    assert (again.register_sum, again.empty_buckets, again.estimate) == (
        row.register_sum, row.empty_buckets, row.estimate,
    )
    # duplicates never move a register (max is idempotent)
    doubled = hll_estimate(li.unionAll(li), "l_orderkey", p=8).first()
    assert doubled.register_sum == row.register_sum


def test_hll_registers_bounded(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    regs = hll_registers(li, "l_orderkey", p=4).collect()
    assert 1 <= len(regs) <= 16
    assert all(1 <= r.M <= 53 and 0 <= r.bucket < 16 for r in regs)
    with pytest.raises(ValueError):
        hll_registers(li, "l_orderkey", p=7)


def test_hll_linear_counting_branch_parity(spark, tmp_path):
    """Small cardinality (n << 2.5m): the estimator must take the
    linear-counting branch, and DuckDB must still reproduce the value
    bit-for-bit (the one branch that rides on libm ln)."""
    vals = [(f"key-{i}",) for i in range(40)] * 3  # 40 distinct, m=256
    df = spark.createDataFrame(vals, ["k"])
    row = hll_estimate(df, "k", p=8).first()
    assert row.empty_buckets > 0
    assert abs(row.estimate - 40) < 6  # LC is near-exact at this load

    p = str(tmp_path / "k.parquet")
    df.write.parquet(p)
    con = duckdb.connect()
    got = con.execute(
        hll_estimate_sql(f"SELECT k FROM read_parquet('{p}/*.parquet')", "k", p=8)
    ).fetchone()
    assert got == (8, 256, row.register_sum, row.empty_buckets, row.estimate)
