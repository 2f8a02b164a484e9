"""Shared shingling for the near-dup family (MinHash / n-gram Jaccard).

Word n-gram shingles as a native array column — no Python. The hash
used throughout the dedup family is md5-prefix→bigint, chosen over
xxhash64 deliberately: it is bit-identical in DuckDB, keeping every
dedup operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def norm_text(text_col: str) -> Column:
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""))


def shingle_array(text_col: str = "text", n: int = 3) -> Column:
    """Array of word n-gram shingles (distinct, order-free)."""
    toks = F.split(norm_text(text_col), " ")
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    # try_element_at: docs shorter than n produce a truncated shingle
    # (nulls skipped by concat_ws) instead of an ANSI index error —
    # matching DuckDB's out-of-range-→-NULL list semantics
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


def h64(col: Column) -> Column:
    """Portable 60-bit hash: md5 hex prefix → bigint (same in DuckDB via
    ('0x' || substr(md5(x),1,15))::UBIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def doc_shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Exploded (doc_id, shingle) rows, distinct per doc."""
    return docs.select(
        "doc_id", F.explode(shingle_array(text_col, n)).alias("shingle")
    )
