"""Token-budget corpus mixing with epoch repetition (the Pile /
DoReMi-style static mixture step): given per-source TARGET token
proportions and a total token budget, solve per-source sampling rates
and materialize the mixture — downsampling over-represented sources
and REPEATING under-represented ones (rate > 1 → multiple epochs, the
standard "sample with replacement to hit mixture weights" recipe).

This is distinct from sampling.py's count-based temperature /
stratified samplers: the unit here is TOKENS (what a training run
actually budgets), and rates may exceed 1, producing per-copy rows
tagged ``copy`` (1-based epoch index) that a downstream packer
(prep/packing.py) consumes.

Scale shape (10^12-doc corpus):
* token totals: ONE map-side-combinable partial agg over the corpus
  (``sum(size(split(text)))`` per source) — no shuffle of row data,
  only the per-source partials.
* rate table: source-sized (tiny), pure integer column math against a
  broadcast targets table; integer ppm throughout so the DuckDB oracle
  is bit-equal (no float-division drift across engines).
* materialization: narrow map + generate — ZERO corpus shuffles. The
  copy count per doc is ``rate // 1e6`` plus one Bernoulli draw on the
  salted 60-bit md5 bucket (same portable hash as sampling.py), so the
  result is a pure function of (key, salt): re-sharding, resume, or
  appended data never flips an old row's fate, and expected tokens per
  source ≈ budget × target.

Spark gotcha encoded here: ``F.sequence(1, 0)`` DESCENDS (returns
[1, 0]) instead of being empty, so zero-copy rows must be filtered
BEFORE the sequence is built.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pie_spark.dedup.shingles import h64

DENOM = 1_000_000


def token_counts_by_source(
    docs: DataFrame, strata_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """(source, n_docs, tokens): whitespace-token totals per source —
    one partial-agg pass, map-side combinable."""
    return docs.groupBy(strata_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("tokens"),
    )


def mixture_rates(
    spark: SparkSession,
    counts: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    strata_col: str = "source",
    max_epochs: int = 16,
) -> DataFrame:
    """(source, tokens, rate_ppm): rate_ppm = budget·target/tokens in
    integer parts-per-million; values above 1e6 mean epoch repetition.
    Sources absent from ``targets`` are dropped (allowlist semantics,
    same as stratified_sample). ``max_epochs`` caps runaway upsampling
    of a tiny source (DoReMi and friends cap repetition; unbounded
    repeats overfit) — capped entries simply contribute fewer tokens
    than their target asks."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive: {budget_tokens}")
    t = spark.createDataFrame(
        [(s, int(round(f * DENOM))) for s, f in sorted(targets.items())],
        [strata_col, "target_ppm"],
    )
    # all-integer: floor(budget * target_ppm / tokens) — identical in
    # DuckDB as (budget * target_ppm) // tokens on BIGINTs
    return (
        counts.join(F.broadcast(t), strata_col)
        .select(
            strata_col,
            "tokens",
            F.least(
                F.expr(f"({budget_tokens}L * target_ppm) div tokens"),
                F.lit(int(max_epochs) * DENOM).cast("long"),
            ).alias("rate_ppm"),
        )
    )


def mix_epochs(
    docs: DataFrame,
    rates: DataFrame,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix:",
) -> DataFrame:
    """Materialize the mixture: each doc appears ``rate_ppm // 1e6``
    times plus one more iff its salted hash bucket < ``rate_ppm % 1e6``
    (deterministic Bernoulli for the fractional epoch), with a 1-based
    ``copy`` column. Zero-copy docs vanish. Broadcast join against the
    source-sized rate table + generate: no corpus shuffle."""
    bucket = F.pmod(
        h64(F.concat(F.lit(salt), F.col(key_col).cast("string"))), F.lit(DENOM)
    )
    n_copies = F.expr(f"rate_ppm div {DENOM}") + (
        bucket < F.col("rate_ppm") % DENOM
    ).cast("long")
    return (
        docs.join(F.broadcast(rates.select(strata_col, "rate_ppm")), strata_col)
        .withColumn("__n", n_copies)
        .filter(F.col("__n") >= 1)  # BEFORE sequence: sequence(1,0) descends
        .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("rate_ppm", "__n")
    )
