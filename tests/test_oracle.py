"""Oracle parity (§5.2): every SQL-checked query in pie_spark.queries
must match DuckDB on the sf0.01 fixtures — row count + order-insensitive
values under sorted column names (mirrors the driver's CORRECTNESS gate)."""

from __future__ import annotations

import math

import duckdb
import pytest

from pie_spark.queries import QUERIES

from .conftest import SF_DIR_01

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR_01}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def _rows(pdf):
    cols = sorted(pdf.columns)
    return sorted(tuple(_canon(v) for v in row) for row in pdf[cols].itertuples(index=False))


SQL_CHECKED = [(n, fn, sql) for n, (fn, sql) in QUERIES.items() if sql is not None]


@pytest.mark.parametrize("name,fn,sql", SQL_CHECKED, ids=[n for n, *_ in SQL_CHECKED])
def test_oracle_parity(spark, ddb, name, fn, sql):
    got = fn(spark, SF_DIR_01).toPandas()
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    g, w = _rows(got), _rows(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
