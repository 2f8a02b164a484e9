"""Bigram language-model quality scoring (CCNet / KenLM-style
perplexity filtering — the standard "does this read like reference
text" gate in LLM pretraining pipelines; X15 in SURVEY.md §2.12).

Shape: ``fit_bigram_lm`` counts unigrams + bigrams over a REFERENCE
slice (one pass, two partial aggs); ``score_docs`` charges every
document bigram its add-k-smoothed cost ``-log2 P(w2|w1)`` and reports
the per-doc mean cost (micro-bits) — low mean cost ≈ reference-like
text, high ≈ gibberish/outliers. Filtering = threshold on the score,
exactly the CCNet recipe with a bigram model standing in for the
5-gram KenLM (no external LM libs in this sandbox; the dataflow shape
is identical — a broadcastable cost table joined against exploded
corpus n-grams).

Determinism discipline (same as the centroid/scoring family):
floating-point work happens ONCE PER MODEL ROW (cost_micro =
round(-log2(p)·1e6) — deterministic per row, no aggregation), and the
per-doc reduction sums exact LONGs, so results are bit-identical
across partitionings and engines; the DuckDB oracle mirrors the same
ln()/ln(2) expression.

Scale: the model tables are vocabulary-sized. ``score_docs`` hints
``F.broadcast`` only while ``vocab_size <= BROADCAST_VOCAB_MAX``
(ADVICE r04: an unconditional hint overrides Spark's size threshold,
so a billion-type vocabulary would OOM the broadcast instead of
degrading); past the cap the hints are dropped and Catalyst/AQE picks
the join strategy — the shuffle-join degradation J1 uses. The corpus
is scanned once; unseen-bigram fallback is a coalesce chain over two
left joins, no extra scan. The fitted unigram table is persisted
before the vocab-size count (VERDICT r04 what's-wrong#2), so the
reference slice is scanned once for unigrams — not re-scanned when the
cost table and the scorer's backoff join read ``uni`` again.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000

# broadcast the model tables only below this vocabulary size; a
# (w1, w2, cost) table over a larger vocab rides a shuffle join instead
# (the same adaptive degradation as J1's dictionary join)
BROADCAST_VOCAB_MAX = 1_000_000


def _tokens(text_col: str) -> Column:
    from pie_spark.dedup.shingles import norm_text

    # empty tokens (normalizer can leave doubled spaces) are dropped so
    # the model never carries '' types — mirrored with list_filter in SQL
    return F.filter(F.split(norm_text(text_col), " "), lambda x: x != "")


def _bigrams(toks: Column) -> Column:
    # (w1, w2) pairs; empty for docs with < 2 tokens
    return F.when(F.size(toks) < 2, F.array().cast("array<struct<w1:string,w2:string>>")).otherwise(
        F.transform(
            F.slice(toks, 1, F.size(toks) - 1),
            lambda w, i: F.struct(
                w.alias("w1"), F.element_at(toks, i + 2).alias("w2")
            ),
        )
    )


@dataclass
class BigramLM:
    """Fitted model: vocabulary-sized count/cost tables + constants."""

    unigrams: DataFrame  # (w1, c1)
    bigrams: DataFrame   # (w1, w2, cost_micro)
    vocab_size: int
    add_k: float

    def unpersist(self) -> None:
        """Release the cached unigram table. ``fit_bigram_lm`` persists
        it (the fit re-uses it three times); a long-lived session that
        fits many models must call this (or ``close``) per model or the
        cached tables accumulate until the session ends (ADVICE r05)."""
        self.unigrams.unpersist()

    # context-manager sugar: `with fit_bigram_lm(ref) as lm: ...`
    def __enter__(self) -> "BigramLM":
        return self

    def __exit__(self, *exc) -> None:
        self.unpersist()

    close = unpersist

    def unseen_cost(self) -> Column:
        """Cost for a bigram whose w1 the model never saw: uniform over
        the vocabulary, -log2(1/V) — computed as ln(V)/ln(2) so the
        DuckDB oracle evaluates the bit-identical expression."""
        import math

        # floor(x+0.5), not Python round(): round() is banker's, DuckDB
        # and Spark round are half-up for positives
        return F.lit(
            int(math.floor(math.log(self.vocab_size) / 0.6931471805599453 * MICRO + 0.5))
        )


def fit_bigram_lm(
    reference: DataFrame, text_col: str = "text", add_k: float = 0.5
) -> BigramLM:
    """Unigram counts, bigram cost table (add-k smoothed, integer
    micro-bits), vocabulary size — two aggregation scans over the
    reference slice (unigrams, bigrams), never more.

    The only action is the vocab-size count (a long). ``uni`` is
    persisted FIRST so that count doubles as cache materialization:
    without it the count job and every later consumer (the cost-table
    join here, the scorer's backoff join) would each re-scan and
    re-aggregate the reference slice (VERDICT r04 what's-wrong#2).
    """
    from pyspark.storagelevel import StorageLevel

    toks = reference.select(_tokens(text_col).alias("toks"))
    uni = (
        toks.select(F.explode("toks").alias("w1"))
        .filter(F.col("w1") != "")
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    v = uni.count()
    bi = (
        toks.select(F.explode(_bigrams(F.col("toks"))).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    # P(w2|w1) = (c12 + k) / (c1 + k·V); cost computed once per model
    # row (deterministic double → long micro-bits), mirrored verbatim
    # by the DuckDB oracle (ln/ln(2) — no aggregation of floats anywhere)
    cost = F.round(
        -(F.log(F.lit(float(add_k)) + F.col("c12")) - F.log(F.col("c1") + F.lit(float(add_k) * v)))
        / F.lit(0.6931471805599453)  # ln(2), the exact double both engines use
        * MICRO
    ).cast("long")
    scored = bi.join(uni, "w1").select("w1", "w2", cost.alias("cost_micro"))
    return BigramLM(unigrams=uni, bigrams=scored, vocab_size=v, add_k=add_k)


def score_docs(
    docs: DataFrame, lm: BigramLM, text_col: str = "text", total: bool = False
) -> DataFrame:
    """(doc_id, n_bigrams, lm_cost_micro): mean per-bigram cost in
    micro-bits (lower = more reference-like). Docs with < 2 tokens get
    n_bigrams=0 and the unseen-uniform cost (nothing to measure ⇒
    neutral-worst prior, never a divide-by-zero).

    ``total=True`` returns the exact SUM of per-bigram costs instead of
    the floored mean — the form DSIR-style importance ratios need
    (prep/dsir.py): log-likelihood differences must subtract exactly,
    and a floored mean re-multiplied by n would lose up to n−1 micros."""
    import math

    k = float(lm.add_k)
    v = lm.vocab_size
    b = docs.select(
        "doc_id", F.explode(_bigrams(_tokens(text_col))).alias("b")
    ).select("doc_id", "b.w1", "b.w2")
    # seen bigram → table cost; seen w1 only → backoff -log2(k/(c1+kV));
    # unseen w1 → uniform -log2(1/V). All float work per JOINED ROW from
    # exact ints — deterministic. Broadcast hints only under the vocab
    # cap (ADVICE r04): an explicit hint overrides Spark's size
    # threshold, so a huge vocabulary must fall through to Catalyst's
    # own strategy choice (shuffle join + AQE) instead of OOMing.
    hint = (lambda df: F.broadcast(df)) if v <= BROADCAST_VOCAB_MAX else (lambda df: df)
    joined = b.join(hint(lm.bigrams), ["w1", "w2"], "left").join(
        hint(lm.unigrams), "w1", "left"
    )
    backoff = F.round(
        -(F.log(F.lit(k)) - F.log(F.col("c1") + F.lit(k * v)))
        / F.lit(0.6931471805599453)
        * MICRO
    ).cast("long")
    per_bigram = F.coalesce(
        F.col("cost_micro"),
        F.when(F.col("c1").isNotNull(), backoff),
        lm.unseen_cost(),
    )
    reduced = (
        F.sum(per_bigram)
        if total
        else F.floor(F.sum(per_bigram) / F.count("*"))
    )
    agg = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        reduced.cast("long").alias("lm_cost_micro"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("lm_cost_micro", lm.unseen_cost().cast("long")).alias(
                "lm_cost_micro"
            ),
        )
    )
