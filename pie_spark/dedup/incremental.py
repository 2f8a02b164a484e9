"""Incremental MinHash near-dedup against a STANDING index (r06).

At the 10^12-doc design point the corpus is a landing zone that grows
by epochs; re-running LSH dedup over the accumulated corpus per epoch
is O(corpus). This operator dedups ONE ingest delta against the
standing index in O(|delta|) shuffle work — the standing tables are
scanned (stream side of broadcast joins), never hash-partitioned:

  index (two snapshot datasets, maintained append-only by the caller
  through the snapshot seam):
    sigs(doc_id, sig array<long>[K])     — one row per indexed doc
    buckets(doc_id, band, bucket)        — BANDS rows per indexed doc

  per epoch:
    1. sign the delta (one narrow pass, the shared minhash machinery);
    2. probe: standing buckets ⋈ broadcast(delta's distinct band
       buckets) — scan #1, partial-agg counts only (a boilerplate
       mega-bucket never materializes);
    3. guard on COMBINED size (old count + delta count) — exactly the
       semantics a full re-run over old ∪ new would apply, so
       incremental ≡ full holds even at guard boundaries;
    4. members of surviving buckets: scan #2 of standing buckets,
       output ≤ max_bucket · |probed buckets| rows;
    5. candidates = delta×old ∪ delta×delta within surviving buckets;
    6. verify: fetch ONLY the candidate old docs' signatures —
       standing sigs ⋈ broadcast(candidate ids), scan #3 — and apply
       the agreeing-slot Jaccard estimate.

Equivalence contract (pinned by tests/test_dedup.py and the
``minhash_delta`` driver row): the emitted pairs are EXACTLY
``near_duplicates(old ∪ delta)`` restricted to pairs touching the
delta. Pairs between two OLD docs were the previous epochs' output;
like any append-only streaming system, a bucket that outgrows the
boilerplate guard only suppresses pairs from the epoch that tipped it
— already-emitted pairs are never retracted (documented semantics).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pie_spark.dedup.minhash import BANDS, K_PERMS, band_buckets, signatures


class DeltaDupResult(NamedTuple):
    """pairs: (doc_a, doc_b, est_jaccard) — every pair touches the
    delta; new_sigs/new_buckets: the delta's index rows, for the caller
    to append to the standing index (snapshot seam ``append``)."""

    pairs: DataFrame
    new_sigs: DataFrame
    new_buckets: DataFrame


def build_index(
    docs: DataFrame, text_col: str = "text", n: int = 3
) -> tuple[DataFrame, DataFrame]:
    """(sigs, buckets) for an initial standing index."""
    sigs = signatures(docs, text_col, n)
    return sigs, band_buckets(sigs)


def delta_near_duplicates(
    old_sigs: DataFrame,
    old_buckets: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 50,
) -> DeltaDupResult:
    # the delta's index rows; eagerly materialized — the K md5 hash
    # columns must never re-inline into downstream join sides (the
    # measured 75s→3s checkpoint note in minhash.candidate_pairs)
    new_sigs = signatures(new_docs, text_col, n).localCheckpoint(eager=True)
    new_bk = band_buckets(new_sigs).localCheckpoint(eager=True)

    probe = new_bk.select("band", "bucket").distinct()
    # scan #1 of the standing bucket table: per-probed-bucket COUNTS
    # only — partial agg absorbs a mega-bucket map-side, the shuffle
    # carries at most |probe| rows
    old_counts = (
        old_buckets.join(F.broadcast(probe), ["band", "bucket"])
        .groupBy("band", "bucket")
        .agg(F.count("*").alias("n_old"))
    )
    new_counts = new_bk.groupBy("band", "bucket").agg(F.count("*").alias("n_new"))
    surviving = (
        new_counts.join(old_counts, ["band", "bucket"], "left")
        .withColumn("n", F.col("n_new") + F.coalesce("n_old", F.lit(0)))
        # combined-size guard — identical to a full re-run over old ∪ new
        .filter(F.col("n").between(2, max_bucket))
        .select("band", "bucket")
        .localCheckpoint(eager=True)
    )
    # scan #2: members of surviving buckets (≤ max_bucket · |surviving|)
    old_m = old_buckets.join(F.broadcast(surviving), ["band", "bucket"]).select(
        "band", "bucket", "doc_id"
    )
    new_m = new_bk.join(F.broadcast(surviving), ["band", "bucket"]).select(
        "band", "bucket", "doc_id"
    )
    n_x_o = new_m.withColumnRenamed("doc_id", "doc_n").join(
        old_m.withColumnRenamed("doc_id", "doc_o"), ["band", "bucket"]
    )
    pairs_no = n_x_o.select(
        F.least("doc_n", "doc_o").alias("doc_a"),
        F.greatest("doc_n", "doc_o").alias("doc_b"),
    )
    a_side = new_m.withColumnRenamed("doc_id", "doc_a")
    b_side = new_m.withColumnRenamed("doc_id", "doc_b")
    pairs_nn = (
        a_side.join(b_side, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    cand = pairs_no.unionByName(pairs_nn).distinct().localCheckpoint(eager=True)

    # scan #3: signatures of ONLY the candidate old docs
    cand_ids = cand.select(F.col("doc_a").alias("doc_id")).union(
        cand.select(F.col("doc_b").alias("doc_id"))
    ).distinct()
    old_sigs_hit = old_sigs.join(F.broadcast(cand_ids), "doc_id")
    lookup = old_sigs_hit.unionByName(new_sigs).localCheckpoint(eager=True)

    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(K_PERMS)
    pairs = (
        cand.join(
            F.broadcast(lookup.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))),
            "doc_a",
        )
        .join(
            F.broadcast(lookup.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))),
            "doc_b",
        )
        .withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )
    return DeltaDupResult(pairs, new_sigs, new_bk)
