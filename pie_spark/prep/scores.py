"""Fused per-document scoring: quality + language + split in ONE scan.

The r02 `training_manifest` composed `quality_scores`, `lang_id` and
`assign_splits` as three separate frames joined back on doc_id — four
corpus scans and three self-joins (co-partitioned, but still three
sort/join stages) for what is pure per-row column math. This module
evaluates all three expression families in a single narrow projection:
one FileScan, zero joins, zero shuffles — the plan a 100 TB corpus
needs, since every extra corpus scan at that scale is hours of IO.

Semantics are IDENTICAL to the composed form (the expressions are the
same objects — quality_columns / lang_guess_column / split_column);
the training_manifest oracle, which mirrors the composed SQL, stays
green over the fused plan (tests/test_oracle.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.prep.splits import split_column
from pie_spark.text.analysis import lang_guess_column, quality_columns


def combined_doc_scores(
    docs: DataFrame,
    text_col: str = "text",
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """(doc_id, quality_ppm, lang_guess, split) in one pass."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        quality_columns(t)["quality_ppm"].alias("quality_ppm"),
        lang_guess_column(t).alias("lang_guess"),
        split_column(F.col("doc_id"), split_weights).alias("split"),
    )
