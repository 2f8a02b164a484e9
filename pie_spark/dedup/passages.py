"""Passage/line-level deduplication (C4 / RefinedWeb-style): drop every
repeated passage CORPUS-WIDE, keeping exactly one deterministically
elected occurrence, then reassemble documents with original passage
order preserved.

Doc-level dedup (exact.py / clusters.py) removes whole documents;
web-scale pretraining corpora additionally need sub-document dedup —
navigation chrome, licence blocks, and quote chains repeat across
millions of otherwise-distinct pages (the C4 recipe dedups at the
line/3-sentence level for exactly this reason).

Segmentation is configurable:
  * ``delimiter="\\n"`` — real corpora: one passage per line/paragraph.
  * ``block_words=k`` — fixed non-overlapping k-word blocks, for
    corpora without line structure (the driver fixtures are
    single-line word streams).

Scale shape: passages are keyed by md5 and the survivor is elected
with ``groupBy(key).agg(min(<occurrence hash>))`` — a partial-
aggregable (map-side combine) HASH reduction, deliberately NOT a
row_number window: a window must sort each key group, and the single
hyper-hot key a boilerplate passage produces (millions of rows) would
serialize one reducer. The min partial agg collapses the hot key on
the map side. Reassembly sorts per doc via ``sort_array`` over
collected (idx, passage) structs — array-local, no extra shuffle
beyond the groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def passages(
    docs: DataFrame,
    text_col: str = "text",
    delimiter: str = "\n",
    block_words: int = 0,
) -> DataFrame:
    """(doc_id, passage_idx, passage) — ordered segmentation of each doc.

    ``delimiter`` is a Java REGEX (Spark split semantics): "\\n" splits
    lines, "\\n{2,}" paragraphs; escape literal metacharacters."""
    if block_words > 0:
        toks = docs.select(
            "doc_id", F.split(F.col(text_col), " ").alias("toks")
        )
        n_blocks = F.ceil(F.size("toks") / F.lit(block_words)).cast("int")
        blocks = F.transform(
            F.sequence(F.lit(0), F.greatest(n_blocks - 1, F.lit(0))),
            lambda i: F.concat_ws(
                " ", F.slice("toks", i * block_words + 1, block_words)
            ),
        )
        seg = toks.select("doc_id", F.posexplode(blocks).alias("passage_idx", "passage"))
    else:
        seg = docs.select(
            "doc_id",
            F.posexplode(F.split(F.col(text_col), F.lit(delimiter), -1)).alias(
                "passage_idx", "passage"
            ),
        )
    return seg.filter(F.col("passage") != "")


def _occ_hash() -> F.Column:
    """Fixed-width (long) occurrence key: the portable 60-bit md5-prefix
    hash of ``doc_id:passage_idx``.

    Why a hash, not the pair: the survivor election must be a partial
    MIN aggregate, and Spark's HashAggregate only takes fixed-width
    buffers — ``min(struct(doc_id, idx))`` and ``min(<string key>)``
    both fall back to SortAggregate, which sorts every partition by
    passage hash on BOTH sides of the shuffle (verified in the r03 plan
    audit). ``min(long)`` stays a hash aggregate with map-side combine,
    works for string doc_ids too, and is bit-identical in DuckDB via
    the h64 recipe. The survivor is therefore the min-HASH occurrence —
    a deterministic, partitioning-independent total order, just not
    document order; dedup semantics (exactly one deterministic survivor
    per duplicate group) don't need document order. Collision cost: two
    same-passage occurrences sharing a 60-bit hash would BOTH survive
    (never a wrong deletion) at p ≈ n²/2⁶¹ per group."""
    from pie_spark.dedup.shingles import h64

    return h64(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("passage_idx").cast("string"),
        )
    )


def passage_dedup_map(
    docs: DataFrame,
    text_col: str = "text",
    delimiter: str = "\n",
    block_words: int = 0,
) -> DataFrame:
    """(doc_id, passage_idx, passage_md5, is_dup): every passage flagged
    against its group's deterministic survivor (min occurrence hash —
    see :func:`_occ_hash`)."""
    p = passages(docs, text_col, delimiter, block_words).select(
        "doc_id",
        "passage_idx",
        F.md5("passage").alias("passage_md5"),
        _occ_hash().alias("occ"),
    )
    firsts = p.groupBy("passage_md5").agg(F.min("occ").alias("first_occ"))
    return p.join(firsts, "passage_md5").select(
        "doc_id",
        "passage_idx",
        "passage_md5",
        (F.col("occ") != F.col("first_occ")).alias("is_dup"),
    )


def dedup_passages_text(
    docs: DataFrame,
    text_col: str = "text",
    delimiter: str = "\n",
    block_words: int = 0,
    join_str: str | None = None,
) -> DataFrame:
    """(doc_id, text): documents rebuilt WITHOUT corpus-duplicate
    passages, original passage order preserved (sort_array over
    (idx, passage) structs — the O1 ordered-reassembly pattern). Docs
    whose every passage was a duplicate disappear entirely.

    ``delimiter`` is a Java REGEX on the split side; rejoining uses
    ``join_str``, defaulting to the delimiter only when it contains no
    regex metacharacters (ADVICE r03: splitting on "\\n{2,}" and
    rejoining with the literal pattern would splice "\\n{2,}" into the
    rebuilt text). Pass ``join_str`` explicitly for regex delimiters."""
    p = passages(docs, text_col, delimiter, block_words).withColumn(
        "passage_md5", F.md5("passage")
    )
    keep = passage_dedup_map(docs, text_col, delimiter, block_words).filter(
        ~F.col("is_dup")
    )
    if join_str is None:
        if block_words > 0:
            join_str = " "
        elif not any(c in delimiter for c in "\\.^$|?*+()[]{}"):
            join_str = delimiter  # plain literal (e.g. "\n") — safe to reuse
        else:
            raise ValueError(
                f"delimiter {delimiter!r} is a regex pattern — pass join_str "
                "explicitly (e.g. join_str='\\n\\n' for delimiter='\\n{{2,}}')"
            )
    joiner = join_str
    return (
        p.join(keep, ["doc_id", "passage_idx", "passage_md5"])
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("passage_idx", "passage"))
                    ),
                    lambda s: s["passage"],
                ),
                joiner,
            ).alias(text_col)
        )
    )
