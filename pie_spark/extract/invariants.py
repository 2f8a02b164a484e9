"""P5: span-sequence invariant (BASELINE.json:15 — binding).

The pipeline must never reorder, drop, or mutate the per-document
span sequence (kind, text, media_ref, order). This operator reassembles
the sequence from the exploded rows and compares it — via canonical
JSON — against the source table. Any pipeline run can assert
``violations(...) == 0`` cheaply (one shuffle on doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_json(docs: DataFrame, alias: str = "spans_json") -> DataFrame:
    return docs.select("doc_id", F.to_json("spans").alias(alias))


def reassemble(spans: DataFrame) -> DataFrame:
    """Rebuild docs(doc_id, spans) from exploded span rows, ordered by
    span_idx (O1: array_sort on struct orders by first field)."""
    return (
        spans.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("span_idx", "kind", "text", "media_ref", "offset")
                )
            ).alias("s")
        )
        .select(
            "doc_id",
            F.transform(
                "s",
                lambda x: F.struct(
                    x["kind"].alias("kind"),
                    x["text"].alias("text"),
                    x["media_ref"].alias("media_ref"),
                    x["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )


def violation_rows(source_docs: DataFrame, exploded_spans: DataFrame) -> DataFrame:
    """Docs whose reassembled sequence differs from the source.

    The two sides get distinct column names (src_/rebuilt_) so the
    output schema has no duplicate columns — a duplicate name is
    illegal for downstream pandas/oracle consumers."""
    a = _canon_json(source_docs, "src_spans_json")
    b = _canon_json(reassemble(exploded_spans), "rebuilt_spans_json")
    return a.join(b, "doc_id", "full_outer").filter(
        ~F.col("src_spans_json").eqNullSafe(F.col("rebuilt_spans_json"))
    )


def violations(source_docs: DataFrame, exploded_spans: DataFrame) -> int:
    return violation_rows(source_docs, exploded_spans).count()
