"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship KG-construction pipeline on sf0.001.
queries()     — one callable per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB-equivalent SQL for every SQL-expressible op;
                iterative/UDF ops (full pipeline, CC, Arrow extraction)
                are rows-only by design (SURVEY.md §2 oracle column).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Synthesizes the interleaved-document corpus (FIXTURES.md §2), runs
    the full extraction → linking → canonicalization → materialization
    pipeline, returns the (subj, pred, obj) triples DataFrame.
    """
    from pie_spark.config import PipelineConfig
    from pie_spark.fixtures.gen import entity_dict_df, interleaved_docs
    from pie_spark.pipeline import run

    docs = interleaved_docs(spark, "/root/testdata/sf0.001")
    return run(spark, PipelineConfig(), docs, entity_dict_df(spark)).triples


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pie_spark.queries import QUERIES

    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from pie_spark.queries import QUERIES

    # an oracle may be registered as a zero-arg callable (lazy build —
    # e.g. the trained-IVF oracle replays k-means training over the
    # sf0.01 fixtures to inline centroid VALUES); resolve it here
    return {
        name: (sql() if callable(sql) else sql)
        for name, (_, sql) in QUERIES.items()
        if sql is not None
    }
