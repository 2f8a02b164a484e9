"""Deterministic sampling for training-data curation.

Two operators the big-corpus mixing step needs:

* :func:`hash_sample` — flat Bernoulli sample that is a pure function
  of the salted key (same contract as splits.py: re-sharding, resume,
  or appended data never flips an old row's fate — `df.sample()` is
  partitioning-dependent and non-reproducible across cluster sizes, so
  it is banned here).
* :func:`stratified_sample` — per-stratum rates (e.g. downsample an
  over-represented domain/language to a target mixture). Explicit
  rates, no per-stratum shuffling: the rate lookup is a BROADCAST join
  against the (tiny) rate map, the keep decision is the same salted
  hash threshold. One narrow pass over the corpus, zero corpus
  shuffles.
* :func:`temperature_rates` — derives per-stratum rates from observed
  counts with temperature rebalancing: rate_s ∝ (count_s / total)^(τ−1)
  scaled so the largest stratum keeps ``cap`` of its rows (τ=1 → keep
  everything; τ→0 → uniform mixture; the multilingual-sampling rule
  from the XLM/mC4 line of work). Counts come from one partial agg over
  the corpus; the rate table is stratum-sized (small), computed with
  plain column math, then fed to :func:`stratified_sample`.

All thresholds are integer parts-per-million of the portable 60-bit
md5 hash — bit-identical in DuckDB, so both samplers are oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pie_spark.dedup.shingles import h64

DENOM = 1_000_000


def _bucket(key: Column, salt: str) -> Column:
    return F.pmod(h64(F.concat(F.lit(salt), key.cast("string"))), F.lit(DENOM))


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "sample:",
) -> DataFrame:
    """Keep rows whose salted-hash bucket < rate·1e6 (deterministic,
    partitioning-independent)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1]: {rate}")
    return df.filter(_bucket(F.col(key_col), salt) < int(round(rate * DENOM)))


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "sample:",
) -> DataFrame:
    """Per-stratum deterministic sampling.

    ``rates``: (strata_col, rate_ppm:int) — small; broadcast. Strata
    absent from the rate map are DROPPED (explicit allowlist semantics:
    an unknown domain appearing mid-crawl must not silently flood the
    mixture at rate 1.0)."""
    r = rates.select(
        F.col(strata_col),
        F.col("rate_ppm").cast("long").alias("rate_ppm"),
    )
    return (
        df.join(F.broadcast(r), strata_col)
        .filter(_bucket(F.col(key_col), salt) < F.col("rate_ppm"))
        .drop("rate_ppm")
    )


def temperature_rates(
    df: DataFrame,
    strata_col: str = "lang",
    temperature: float = 0.7,
    cap: float = 1.0,
) -> DataFrame:
    """(strata_col, n, rate_ppm): sampling rates ∝ share^(τ−1),
    normalized so the LARGEST stratum's rate equals ``cap`` — i.e. the
    head is downsampled hardest and the tail kept (near-)whole, the
    standard temperature mixture. τ must be in (0, 1]; τ=1 degenerates
    to rate=cap everywhere."""
    if not 0.0 < temperature <= 1.0:
        raise ValueError(f"temperature must be in (0, 1]: {temperature}")
    if not 0.0 < cap <= 1.0:
        raise ValueError(f"cap must be in (0, 1]: {cap}")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n"))
    n_max = counts.agg(F.max("n").alias("n_max"))
    # share^(τ−1) / share_max^(τ−1) = (n / n_max)^(τ−1) — the corpus
    # total cancels, leaving ONE pow per stratum (fewer float ops, and
    # the identical expression is what the DuckDB oracle evaluates)
    return counts.crossJoin(F.broadcast(n_max)).select(
        strata_col,
        "n",
        F.least(
            F.floor(
                F.lit(float(cap) * DENOM)
                * F.pow(F.col("n") / F.col("n_max"), F.lit(temperature - 1.0))
            ),
            F.lit(DENOM),
        )
        .cast("long")
        .alias("rate_ppm"),
    )


def priority_score_sql(key_expr: str, weight_expr: str, salt: str) -> str:
    """The Efraimidis–Spirakis priority both engines evaluate verbatim
    (X22): u = (h64(salt||key) % 2^20 + 1) / (2^20 + 1) ∈ (0, 1]
    derived from exact ints, score = ln(u) / w — a monotone transform
    of the textbook u^(1/w), float work once per ROW from exact-int
    inputs (the lm.py discipline: no float ever crosses an
    aggregation). Larger score = more likely sampled; w doubles ⇒
    score strictly improves at fixed u. The h64 literal matches the
    repo recipe, bit-identical in DuckDB."""
    m = 1 << 20
    h = (
        f"CAST(('0x' || substr(md5('{salt}' || CAST({key_expr} AS VARCHAR)), 1, 15)) "
        f"AS UBIGINT)::BIGINT"
    )
    return f"(ln(CAST(({h} % {m}) + 1 AS DOUBLE) / {m + 1}.0) / ({weight_expr}))"


def _priority_score_spark(key: Column, weight: Column, salt: str) -> Column:
    m = 1 << 20
    u = (F.pmod(h64(F.concat(F.lit(salt), key.cast("string"))), F.lit(m)) + 1).cast(
        "double"
    ) / F.lit(float(m + 1))
    return F.log(u) / weight


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsample:",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (X22, Efraimidis–Spirakis
    A-ES): the k rows with the largest ``ln(u)/w`` priorities are a
    weight-proportional sample — deterministic (u is the salted hash of
    the key, so the same corpus gives the same sample on any
    partitioning or cluster size; change ``salt`` for a fresh draw),
    one TakeOrderedAndProject, no global sort, nothing corpus-sized on
    the driver beyond the k result rows. Non-positive weights are
    excluded (zero weight = never sampled — by definition, and
    ln(u)/w would flip sign). Ties (identical priority requires
    identical hash AND weight) break by key for a total order."""
    if k <= 0:
        raise ValueError("k must be positive")
    scored = df.filter(F.col(weight_col) > 0).withColumn(
        "__priority",
        _priority_score_spark(F.col(key_col), F.col(weight_col), salt),
    )
    return (
        scored.orderBy(F.desc("__priority"), F.asc(key_col))
        .limit(k)
        .drop("__priority")
    )
