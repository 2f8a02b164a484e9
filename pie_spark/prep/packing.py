"""Concat-and-chunk sequence packing — the standard LLM-pretraining
layout: documents are laid into one contiguous token stream per shard
and cut into fixed-budget chunks (documents may straddle a boundary).

Scale shape: a document's placement depends only on the cumulative
token count of its predecessors WITHIN ITS SHARD, so the whole layout
is one hash-shuffle on shard + one window cumsum — no sequential
driver loop, and shard count is the parallelism knob (thousands of
shards at 100 TB). Deterministic: shard = salted md5 of doc_id, order
within shard = doc_id. (True first-fit bin packing is inherently
sequential per bin; concat-and-chunk is what pretraining pipelines
actually use, and it is exactly expressible as window math — mirrored
1:1 by the DuckDB oracle.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pie_spark.dedup.shingles import h64


def pack_concat_chunks(
    docs: DataFrame,
    budget_tokens: int = 2048,
    n_shards: int = 8,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, shard, n_tokens, start_token, chunk_id, chunk_offset):
    ``start_token`` is the document's offset in its shard's token
    stream; ``chunk_id``/``chunk_offset`` locate its first token in the
    fixed-size chunk grid."""
    if budget_tokens <= 0 or n_shards <= 0:
        raise ValueError("budget_tokens and n_shards must be positive")
    key = F.col(key_col).cast("string")
    # count only non-empty tokens: a bare size(split(...)) charges empty
    # and multi-space docs phantom tokens, silently shifting every later
    # start_token in the shard
    tok = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    ).cast("long")
    shard = F.pmod(h64(F.concat(F.lit("pack:"), key)), F.lit(n_shards)).cast("int")
    base = docs.select(
        F.col(key_col).alias("doc_id"), shard.alias("shard"), tok.alias("n_tokens")
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        start.alias("start_token"),
        F.floor(start / budget_tokens).cast("long").alias("chunk_id"),
        (start % budget_tokens).cast("long").alias("chunk_offset"),
    )


def chunk_with_overlap(
    docs: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text): sliding-window token
    chunks with overlap = chunk_tokens − stride (the RAG/context-window
    chunker; pack_concat_chunks is the disjoint packing layout).

    All narrow expressions — one scan, zero shuffles: token array bound
    to its own projection (the shingles.py Catalyst invariant), starts =
    sequence stepping by ``stride``, slices re-joined per start. The
    final start always covers the tail (last chunk may be short); empty
    docs yield no chunks."""
    if chunk_tokens < 1 or stride < 1 or stride > chunk_tokens:
        raise ValueError(
            f"need 1 <= stride <= chunk_tokens: stride={stride}, chunk={chunk_tokens}"
        )
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias("toks"),
    )
    n = F.size("toks")
    n_chunks = F.ceil(n / F.lit(stride)).cast("int")
    starts = F.sequence(F.lit(0), (F.greatest(n_chunks, F.lit(1)) - 1) * stride, F.lit(stride))
    chunks = F.transform(
        starts, lambda st: F.concat_ws(" ", F.slice("toks", st + 1, chunk_tokens))
    )
    return (
        toks.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .filter(F.col("chunk_text") != "")
        .select(
            "doc_id",
            "chunk_idx",
            F.size(F.split("chunk_text", " ")).cast("long").alias("n_tokens"),
            "chunk_text",
        )
    )
