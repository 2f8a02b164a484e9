"""Distributed Bloom filter as a table asset (X21 — the scale path for
X7 decontamination when the benchmark shingle set outgrows a broadcast
set: billions of shingles fit in m/8 bytes of bit-words instead of
hundreds of GB of strings; no false NEGATIVES, so nothing contaminated
ever slips through — false positives only over-clean, the safe
direction for training-data hygiene).

Representation: the filter is a sparse DataFrame of 63-bit words —
(word_idx LONG, bits LONG; 63 usable bits per word — bit 63 would
overflow DuckDB's CHECKED left shift and wrap Spark's, so neither
engine ever touches the sign bit) — only nonzero words stored, so an
under-filled filter costs what it uses and the asset is a plain
parquet table (snapshot-committable, shippable between runs).

Determinism / parity: bit positions come from the repo's portable h64
(md5-prefix → BIGINT — bit-identical in DuckDB, the minhash/CM-sketch
recipe), k positions per value via ``h64('bloom:<i>:' || value) pmod
m``; building is ONE ``groupBy(word_idx).agg(bit_or(...))`` partial
agg — at most m/63 rows ever cross the shuffle regardless of input
size (the HLL register-table argument). Probing explodes each
candidate to its k word positions, joins the word table (broadcast
while it fits, shuffle-join beyond — Catalyst's call), and demands ALL
k bits present; a missing word row is a miss by construction.

Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k; the classic optimum
is k ≈ 0.7·m/n. Callers pick m as a power of two so ``pmod`` is a
mask-speed operation and the filter shards evenly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.dedup.shingles import h64


def _positions(col, m_bits: int, k: int):
    """The k bit positions of a value — h64('bloom:<i>:' || v) pmod m."""
    return [
        F.pmod(h64(F.concat(F.lit(f"bloom:{i}:"), col)), F.lit(m_bits))
        for i in range(k)
    ]


def build_bloom(
    values: DataFrame, col: str, m_bits: int, k: int
) -> DataFrame:
    """(word_idx, bits): the filter's nonzero 63-bit words. One narrow
    explode + ONE partial-aggregated bit_or — ≤ m/63 rows shuffle."""
    pos = F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias("p")
    return (
        values.select(pos)
        .select(
            F.expr("p div 63").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").alias("b"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )


def probe_bloom(
    candidates: DataFrame, col: str, bloom: DataFrame, m_bits: int, k: int
) -> DataFrame:
    """candidates + ``maybe_member`` (true ⇔ all k bits set — never a
    false negative). Distinct probe values are tested once and joined
    back, so repeated candidates don't multiply probe work."""
    vals = candidates.select(F.col(col).alias("__v")).distinct()
    probes = vals.select(
        "__v",
        F.posexplode(F.array(*_positions(F.col("__v"), m_bits, k))).alias(
            "__i", "p"
        ),
    ).select(
        "__v",
        F.expr("p div 63").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").alias("b"),
    )
    hits = (
        probes.join(bloom, "word_idx", "left")
        .select(
            "__v",
            (
                F.col("bits").isNotNull()
                & (F.expr("bits & b") == F.col("b"))
            ).cast("int").alias("hit"),
        )
        .groupBy("__v")
        .agg((F.sum("hit") == F.lit(k)).alias("maybe_member"))
    )
    return candidates.join(
        hits.select(F.col("__v").alias(col), "maybe_member"), col
    )
