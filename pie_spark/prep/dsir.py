"""DSIR-style importance-weighted data selection (X20 — Xie et al.
2023, "Data Selection for Language Models via Importance Resampling":
keep raw documents whose n-gram distribution looks like a high-quality
TARGET corpus, weighted by the likelihood ratio under two cheap LMs).

This repo's rendition composes three already-scale-proven stages, no
new dataflow:

  1. fit TWO bigram LMs (X15 machinery): one on the target/reference
     slice, one on the raw pool;
  2. per-doc importance = total_cost_raw − total_cost_target in exact
     micro-bits (log p_target − log p_raw up to the shared log₂ scale;
     positive ⇒ the target model likes the doc more than the raw
     model does). Totals are exact LONG sums (``score_docs`` with
     ``total=True``) so the subtraction is exact — no float crosses
     an aggregation boundary anywhere;
  3. selection by EXACT keep-count threshold (the X17 inverse-CDF
     machinery, probed at rank N−K+1): keep the top ``frac_ppm`` of
     documents by importance. Thresholding (filter vs a 1-row
     broadcast) is the 10^12-doc-safe selection — a top-k
     TakeOrderedAndProject would pull k = frac·N rows to the driver.
     Ties AT the threshold are all kept (selection is ≥ frac_ppm, by
     at most the threshold tie count — the deterministic,
     partitioning-independent choice; sub-tie sampling, if needed,
     is ``prep/sampling.py``'s salted-hash threshold on doc_id).

The paper's hashed-ngram feature space is replaced by the bigram LMs'
exact vocabulary — same estimator family (product of n-gram
probabilities), minus the hash collisions; the importance-RESAMPLING
step (Gumbel top-k) is replaced by the deterministic threshold above,
trading sampling variance for reproducibility (this repo's bar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.text.lm import BigramLM, score_docs


def importance_scores(
    docs: DataFrame,
    target_lm: BigramLM,
    raw_lm: BigramLM,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, importance_micro): exact micro-bit
    log-likelihood ratio; higher = more target-like. Zero-bigram docs
    get the difference of the two models' unseen-uniform priors
    (vocabulary-size dependent, usually ≈ 0) — scored, not dropped."""
    t = score_docs(docs, target_lm, text_col=text_col, total=True)
    r = score_docs(docs, raw_lm, text_col=text_col, total=True).select(
        "doc_id", F.col("lm_cost_micro").alias("raw_cost_micro")
    )
    return t.join(r, "doc_id").select(
        "doc_id",
        "n_bigrams",
        (F.col("raw_cost_micro") - F.col("lm_cost_micro"))
        .cast("long")
        .alias("importance_micro"),
    )


def select_top_fraction(
    scores: DataFrame, frac_ppm: int, score_col: str = "importance_micro"
) -> DataFrame:
    """Keep the top ``frac_ppm``/10^6 of rows by score — exact
    keep-count threshold + filter, never a driver-sized top-k.
    Returns the surviving scores rows unchanged.

    Threshold: with K = ceil(frac·N), keep score ≥ t where t is the
    ascending-rank-(N−K+1) score — the largest value with ≥ K rows at
    or above it (exactly K kept, plus any ties AT t). Same X17
    machinery and scale story: one groupBy(value) partial agg (the
    shuffle carries V distinct scores, never N rows), a cumulative
    window over the V-row table, pure integer rank arithmetic
    (``(frac·N + 999999) div 10^6`` — exact at N = 10^12 where a
    float path misranks), and a 1-row broadcast for the filter."""
    from pyspark.sql import Window

    if not 0 < frac_ppm <= 1_000_000:
        raise ValueError(f"frac_ppm must be in (0, 10^6], got {frac_ppm}")
    if frac_ppm == 1_000_000:
        return scores
    counts = scores.groupBy(F.col(score_col).cast("long").alias("v")).agg(
        F.count("*").alias("c")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select("v", F.sum("c").over(w).alias("cum"))
    total = counts.agg(F.sum("c").alias("n"))
    thr = (
        cum.crossJoin(F.broadcast(total))
        .filter(
            F.col("cum")
            >= F.expr(f"n - ((({frac_ppm} * n) + 999999) div 1000000) + 1")
        )
        .agg(F.min("v").alias("__thr"))
    )
    return (
        scores.crossJoin(F.broadcast(thr))
        .filter(F.col(score_col) >= F.col("__thr"))
        .drop("__thr")
    )
