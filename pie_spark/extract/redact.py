"""PII redaction — the natural output stage of a privacy-extraction
engine feeding a training-data pipeline: replace every detected mention
with a typed placeholder (``[EMAIL]``, ``[SSN]``, …) so the corpus can
be used for training without leaking the extracted PII.

Pure native expressions: mentions are collected per span (one shuffle,
partial-agg safe), sorted by offset, and folded over the text with
``F.aggregate`` — substring splicing happens inside whole-stage codegen,
no Python in the path. Works with mentions from ANY detector (regex,
gazetteer, CRF) since it consumes the merged mention table, not the
patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def redact_spans(
    text_spans: DataFrame,
    mentions: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, span_idx, text) ⟕ mentions(doc_id, span_idx, start, end,
    mention_type) → (doc_id, span_idx, redacted).

    Spans with no mentions pass through unchanged (left join). Overlaps
    are guarded (``greatest``) so a malformed mention list degrades to
    skipping the overlap instead of corrupting offsets.
    """
    ms = mentions.groupBy("doc_id", "span_idx").agg(
        F.array_sort(
            F.collect_list(F.struct("start", "end", "mention_type"))
        ).alias("ms")
    )
    joined = text_spans.join(ms, ["doc_id", "span_idx"], "left")
    t = F.col(text_col)
    # accumulator pos is LONG regardless of the mention columns' int
    # width, so the fold's struct type is stable (aggregate requires the
    # step lambda to return exactly the init type)
    init = F.struct(F.lit(0).cast("long").alias("pos"), F.lit("").alias("out"))

    def step(acc, m):
        keep_len = F.greatest(m["start"].cast("long") - acc["pos"], F.lit(0).cast("long"))
        return F.struct(
            F.greatest(acc["pos"], m["end"].cast("long")).alias("pos"),
            F.concat(
                acc["out"],
                t.substr((acc["pos"] + 1).cast("int"), keep_len.cast("int")),
                F.lit("["), m["mention_type"], F.lit("]"),
            ).alias("out"),
        )

    def finish(acc):
        return F.concat(
            acc["out"],
            t.substr(
                (acc["pos"] + 1).cast("int"),
                (F.length(t) - acc["pos"]).cast("int"),
            ),
        )

    redacted = F.when(
        F.col("ms").isNull() | t.isNull(), t
    ).otherwise(F.aggregate("ms", init, step, finish))
    return joined.select("doc_id", "span_idx", redacted.alias("redacted"))
