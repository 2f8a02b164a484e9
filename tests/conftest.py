"""Shared Spark fixture (SURVEY.md §5.2): session-scoped local[4],
Arrow on, AQE on, tiny shuffle-partition count for fast tests."""

from __future__ import annotations

import pytest

from pie_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="pie_spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
