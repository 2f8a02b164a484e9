"""Distributed BPE tokenizer training + encoding (LLM-pipeline op).

The one tokenizer-stack layer vocab.py (word stats) and analysis.py
(BPE-ish regex token counts) did not cover: actually TRAINING a
byte-pair-encoding merge table over the corpus, Sennrich-2016 style,
and encoding with it.

Scale shape — the whole point of the classic algorithm maps cleanly
onto Spark:
  * ONE corpus-sized partial aggregation builds the (word, freq) table;
    every subsequent iteration runs on that vocabulary-sized table
    (10^6–10^9 rows at 100 TB — thousands of times smaller than the
    corpus), never on the corpus again.
  * per merge iteration: explode adjacent symbol pairs weighted by
    word freq → groupBy(pair).sum — map-side combinable — → global
    top-1 via orderBy().limit(1) (TakeOrderedAndProject: per-partition
    heaps, a 1-row driver collect; the only driver data per iteration).
  * the winning merge is applied to every word's symbol array with a
    NATIVE left fold (`F.aggregate` with (out, pending) struct state —
    greedy leftmost non-overlapping semantics, the same fold-splice
    pattern redact.py uses), so the loop stays JVM-side end to end;
    `localCheckpoint` per iteration truncates the k-deep lambda tree
    (the Catalyst re-inlining trap, SNIPPETS/cc pattern).
  * tie-break is total-ordered (count desc, left asc, right asc) —
    merge sequence is deterministic across partitionings, no RNG.

Determinism proof in tests/test_bpe.py: an independent plain-Python
BPE trainer replays the same word-frequency table and the merge
sequences must be EXACTLY equal, every rank; encode parity likewise.

``bpe_encode`` applies the trained ranks with the standard
lowest-rank-first loop inside an Arrow batch UDF (the per-word
sequential dependence is real; the merge table is k rows and rides the
closure as a plain dict — broadcast-small by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"  # word terminator symbol (distinguishes suffix merges)

MERGE_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the one corpus-sized pass; training iterates on
    this table only."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _init_symbols(words: DataFrame) -> DataFrame:
    """word → its character symbols + the END marker."""
    return words.select(
        "freq",
        F.concat(
            F.split(F.col("word"), "").cast("array<string>"), F.array(F.lit(END))
        ).alias("symbols"),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    pairs = F.expr(
        "transform(sequence(1, size(symbols) - 1),"
        " i -> struct(symbols[i - 1] AS l, symbols[i] AS r))"
    )
    return (
        syms.filter(F.size("symbols") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").cast("long").alias("n"))
    )


def _apply_merge(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy leftmost non-overlapping merge of the adjacent pair
    (left, right) in every symbol array — a native left fold with
    (out, pending) state: pending holds the last unresolved symbol;
    pair completion flushes the merged token with pending cleared so
    an overlapping occurrence ('aaa' under (a,a)) cannot reuse it."""
    l_lit, r_lit = F.lit(left), F.lit(right)
    folded = F.aggregate(
        "symbols",
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit("").alias("pending"),
        ),
        lambda acc, x: F.when(
            (acc["pending"] == l_lit) & (x == r_lit),
            F.struct(
                F.concat(acc["out"], F.array(F.concat(l_lit, r_lit))).alias("out"),
                F.lit("").alias("pending"),
            ),
        ).otherwise(
            F.struct(
                F.when(acc["pending"] == "", acc["out"])
                .otherwise(F.concat(acc["out"], F.array(acc["pending"])))
                .alias("out"),
                x.alias("pending"),
            )
        ),
        lambda acc: F.when(acc["pending"] == "", acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pending"]))
        ),
    )
    return syms.select("freq", folded.alias("symbols"))


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_freq: int = 2,
) -> DataFrame:
    """Train a BPE merge table: (rank, left, right, pair_count), ranks
    in merge order. Stops early when no pair reaches ``min_freq``."""
    spark = docs.sparkSession
    syms = _init_symbols(word_frequencies(docs, text_col)).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(syms)
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )  # bounded driver collect: exactly one row per iteration
        if not top or top[0].n < min_freq:
            break
        l, r, n = top[0].l, top[0].r, int(top[0].n)
        merges.append((rank, l, r, n))
        syms = _apply_merge(syms, l, r).localCheckpoint(eager=True)
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def train_bpe_reference(word_freqs: list[tuple[str, int]], n_merges: int,
                        min_freq: int = 2) -> list[tuple[int, str, str, int]]:
    """Independent plain-Python BPE trainer (the oracle): dict-based,
    same greedy-leftmost merge and same total-ordered tie-break. Kept
    deliberately free of the Spark code paths so test equality is a
    real cross-implementation check."""
    vocab = {tuple(w) + (END,): f for w, f in word_freqs}
    out = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (l, r), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_freq:
            break
        out.append((rank, l, r, n))
        merged = {}
        for syms, f in vocab.items():
            new: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            merged[tuple(new)] = merged.get(tuple(new), 0) + f
        vocab = merged
    return out


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE encode: repeatedly merge the lowest-rank adjacent
    pair (leftmost on rank ties) until none applies."""
    syms = list(word) + [END]
    while len(syms) >= 2:
        best_i, best_rank = -1, None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_i, best_rank = i, rk
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame, merges: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, tokens, n_tokens) — encode with a trained merge table.
    The k-row table collects to a rank dict and rides the Arrow UDF
    closure (broadcast-small by construction; the per-word merge loop
    is sequentially dependent, the honest Python-side cost)."""
    import pandas as pd

    ranks = {
        (r.left, r.right): r.rank for r in merges.collect()
    }  # bounded: k rows

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.StringType()), False),
            T.StructField("n_tokens", T.IntegerType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            toks = [
                [
                    t
                    for w in str(txt).split(" ")
                    if w
                    for t in encode_word(w, ranks)
                ]
                for txt in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(text_col).alias("text"),
    ).mapInPandas(run, schema=out_schema)
