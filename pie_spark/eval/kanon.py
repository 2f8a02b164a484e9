"""Re-identification risk profiling: k-anonymity / l-diversity audit
(V2; privacy analytics over extracted PII).

A privacy-KG engine doesn't just EXTRACT PII — downstream consumers
must decide whether a derived table is safe to release. The standard
instruments are k-anonymity (every individual is hidden in an
equivalence class of ≥ k records sharing its quasi-identifier tuple)
and l-diversity (each class contains ≥ l distinct sensitive values,
so class membership doesn't leak the secret even when k holds). This
module computes the full class-size × diversity histogram in two
partial-aggregable passes — the audit a release gate runs over the
triples/mentions tables before anything leaves the cluster.

Scale shape (10^12-row design point):
  * pass 1 groups by (QI…, sensitive) then by (QI…) — the two-level
    exact-distinct rewrite (vocab.py precedent) instead of
    count(distinct), which would double the row stream through an
    Expand. Both stages are algebraic → map-side combine collapses
    hot classes before the shuffle; AQE handles residual skew (a
    giant "unknown nation" class is one hot key).
  * pass 2 aggregates the CLASS table (≤ #distinct QI tuples — orders
    of magnitude smaller than the input) into the (class_size,
    min_l_diversity) histogram. Nothing is ever collected; the report
    is a bounded histogram DataFrame.

Determinism: exact integer counts end to end; no floats, no RNG.

Oracle strategy: pure relational algebra — DuckDB replays it verbatim
(folded ``kanon_risk`` row in tests/test_oracle.py); property tests in
tests/test_kanon.py pin hand-computed micro-fixtures and the
histogram-mass invariant Σ(class_size · n_classes) = N.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anonymity_classes(
    df: DataFrame, qi_cols: Sequence[str], sensitive_col: str
) -> DataFrame:
    """One row per quasi-identifier equivalence class:
    (*qi_cols, class_size, l_distinct)."""
    qi = list(qi_cols)
    per_value = df.groupBy(*qi, sensitive_col).agg(
        F.count("*").cast("long").alias("n")
    )
    return per_value.groupBy(*qi).agg(
        F.sum("n").cast("long").alias("class_size"),
        F.count("*").cast("long").alias("l_distinct"),
    )


def kanon_report(
    df: DataFrame, qi_cols: Sequence[str], sensitive_col: str
) -> DataFrame:
    """(class_size, n_classes, n_individuals, min_l, n_l1_classes):
    the release-gate histogram — how many individuals sit in classes
    of each size, the worst l-diversity at that size, and how many of
    those classes are fully sensitive-homogeneous (l = 1, attribute
    disclosure even when k is large)."""
    classes = anonymity_classes(df, qi_cols, sensitive_col)
    return classes.groupBy("class_size").agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_individuals"),
        F.min("l_distinct").cast("long").alias("min_l"),
        F.sum((F.col("l_distinct") == 1).cast("long"))
        .cast("long")
        .alias("n_l1_classes"),
    )


def suppress_below_k(
    df: DataFrame, qi_cols: Sequence[str], k: int
) -> DataFrame:
    """The enforcement half of the audit: keep only rows whose QI
    equivalence class has ≥ k members (record suppression — the
    fallback when the generalization ladder's acceptable levels still
    leave small classes). Output carries ``class_size`` so downstream
    consumers can re-verify the guarantee without re-aggregating.

    Scale shape: one algebraic class-size agg (|classes| rows — far
    below row count) joined back on the QI key; Catalyst broadcasts
    the class table when it fits, AQE covers skewed giant classes.
    Deterministic: suppression is a pure function of the class size,
    never a sample.
    """
    qi = list(qi_cols)
    sizes = df.groupBy(*qi).agg(F.count("*").cast("long").alias("class_size"))
    return df.join(sizes.filter(F.col("class_size") >= k), qi)


def generalization_ladder(df: DataFrame, qi_cols: Sequence[str]) -> DataFrame:
    """(level, n_classes, min_class_size, n_below_5, n_below_25): class
    statistics at EVERY prefix-generalization level of the QI hierarchy
    in ONE pass — level d keeps the first d quasi-identifiers and
    suppresses the rest (the standard full-domain generalization
    ladder, finest-first ordering of ``qi_cols``). level = len(qi_cols)
    is the raw table; level = 0 the fully-suppressed single class.

    Implementation is a ROLLUP: Spark's Expand emits every prefix
    grouping from a single scan (the grouping-sets machinery the OLAP
    rollup operator uses), so choosing the finest level that satisfies
    a k threshold costs one job however deep the ladder. The chooser
    reads THIS bounded table (≤ len(qi_cols)+1 rows), never the data.
    """
    qi = list(qi_cols)
    lvl = F.lit(len(qi)) - (
        sum(F.grouping(c).cast("long") for c in qi) if qi else F.lit(0)
    )
    # grouping(c) flags suppressed columns; prefix levels are the rows
    # where suppression is a suffix of the ladder (rollup emits exactly
    # those), level = #kept columns
    classes = df.rollup(*qi).agg(
        F.count("*").cast("long").alias("class_size"),
        lvl.cast("long").alias("level"),
    )
    return classes.groupBy("level").agg(
        F.count("*").cast("long").alias("n_classes"),
        F.min("class_size").cast("long").alias("min_class_size"),
        F.sum((F.col("class_size") < 5).cast("long")).cast("long").alias("n_below_5"),
        F.sum((F.col("class_size") < 25).cast("long")).cast("long").alias("n_below_25"),
    )
