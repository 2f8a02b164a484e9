#!/usr/bin/env python
"""PQ / IVF-PQ scale measurement (N6): what byte codes + ADC +
exact-rerank buy vs the exact scan.

Deterministic synthetic corpus (no RNG — the fixture-generator
discipline): N vectors, d=64, 512 hash-derived anchor directions
(components ±1 from xxhash) with ±0.1 noise — clusters of ~N/512
members, so ADC at the 4×16-code budget resolves CLUSTERS while the
exact top-k inside a cluster needs the rerank stage, exactly the
production split (ADC shortlist from the code table, exact rerank on
a few-hundred-row raw fetch per query). Ground truth = exact
integer-L2 top-k with the same micro quantization, so recall isolates
the algorithm, not metric mismatch.

Reports one JSON line: exact-scan wall, PQ train/encode/ADC/rerank
walls, recall@k of raw ADC vs ADC+rerank, and the index-size story
(raw vector bytes vs code bytes, parquet on disk). Recorded in
BENCH/BASELINE.md.

Usage:
    python tools/ann_bench.py                    # N=200k
    PIE_ANN_N=1000000 python tools/ann_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

D = 64
GROUPS = 512
K = 10


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pie_spark.ann.pq import (
        _l2,
        _sub_rows,
        pq_encode,
        pq_rerank_topk,
        pq_topk,
        train_pq,
    )
    from pie_spark.session import build_session

    n = int(os.environ.get("PIE_ANN_N", 200_000))
    n_queries = int(os.environ.get("PIE_ANN_Q", 8))
    # the production tuning rule: the shortlist must cover a
    # quantization cell's expected occupancy (ADC cannot order within
    # a cell), so it scales with N/GROUPS — measured at 1M: shortlist
    # 800 < cell ~1953 → recall 0.5; 2×occupancy → 1.0
    shortlist = int(
        os.environ.get("PIE_ANN_SHORTLIST", max(800, 2 * n // GROUPS + 200))
    )

    # partition for the exact-scan stage: its rows carry BOTH micro
    # arrays (~1 KB/row × n_queries fan-out), so tasks must stay small
    # or the per-thread execution-memory slice exhausts (measured
    # SparkOutOfMemoryError at 5M × 32 partitions)
    parts = max(32, n // 20_000)
    spark = build_session("ann-bench", shuffle_partitions=parts)
    tmp = tempfile.mkdtemp(prefix="pie_ann_bench_")
    try:
        # anchor[g][j] = ±1 from xxhash(g, j); vector = anchor + ±0.1 noise
        g = F.col("id") % GROUPS
        comp = F.transform(
            F.sequence(F.lit(0), F.lit(D - 1)),
            lambda j: (
                (F.pmod(F.xxhash64(g, j), F.lit(2001)) - 1000) / F.lit(1000.0)
                + (F.pmod(F.xxhash64(F.col("id"), j + D), F.lit(2001)) - 1000)
                / F.lit(10000.0)
            ),
        )
        emb = (
            spark.range(n)
            .select(F.col("id").cast("string").alias("vec_id"), comp.alias("embedding"))
            .repartition(parts)
            .localCheckpoint(eager=True)
        )
        q = emb.filter(F.col("vec_id").cast("long") < n_queries).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        ).localCheckpoint(eager=True)

        # exact integer-L2 scan: ground truth AND the cost baseline
        t0 = time.time()
        c_micro = _sub_rows(emb, 1, D, "vec_id", "embedding").drop("sub")
        q_micro = _sub_rows(q, 1, D, "q_id", "q_vec", out_id="q_id", out_vec="qsv").drop("sub")
        w = Window.partitionBy("q_id").orderBy(F.asc("dist"), F.asc("vec_id"))
        exact = (
            c_micro.crossJoin(F.broadcast(q_micro))
            .select("q_id", "vec_id", _l2(F.col("sv"), F.col("qsv")).alias("dist"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= K)
            .select("q_id", "vec_id")
            .localCheckpoint(eager=True)
        )
        n_exact = exact.count()
        exact_s = time.time() - t0

        t0 = time.time()
        cb = train_pq(emb, m=4, ksub=16, iters=3)
        train_s = time.time() - t0
        t0 = time.time()
        codes = pq_encode(emb, cb, m=4).localCheckpoint(eager=True)
        codes.count()
        encode_s = time.time() - t0

        # index-size story: raw vectors vs codes, parquet on disk
        emb.write.mode("overwrite").parquet(os.path.join(tmp, "raw"))
        codes.write.mode("overwrite").parquet(os.path.join(tmp, "codes"))
        raw_b, code_b = _dir_bytes(os.path.join(tmp, "raw")), _dir_bytes(
            os.path.join(tmp, "codes")
        )

        t0 = time.time()
        adc = pq_topk(codes, q, cb, k=K).localCheckpoint(eager=True)
        adc.count()
        adc_s = time.time() - t0
        recall_adc = (
            adc.join(exact, ["q_id", "vec_id"], "left_semi").count() / n_exact
        )

        t0 = time.time()
        rr = pq_rerank_topk(
            emb, codes, q, cb, k=K, shortlist=shortlist
        ).localCheckpoint(eager=True)
        rr.count()
        rerank_s = time.time() - t0
        recall_rr = (
            rr.join(exact, ["q_id", "vec_id"], "left_semi").count() / n_exact
        )

        print(
            json.dumps(
                {
                    "n_vectors": n,
                    "dim": D,
                    "clusters": GROUPS,
                    "n_queries": n_queries,
                    "k": K,
                    "exact_scan_sec": round(exact_s, 2),
                    "pq_train_sec": round(train_s, 2),
                    "pq_encode_sec": round(encode_s, 2),
                    "pq_adc_sec": round(adc_s, 2),
                    "adc_recall": round(recall_adc, 4),
                    "rerank_shortlist": shortlist,
                    "pq_rerank_sec": round(rerank_s, 2),
                    "rerank_recall": round(recall_rr, 4),
                    "raw_parquet_bytes": raw_b,
                    "code_parquet_bytes": code_b,
                    "index_compression_x": round(raw_b / max(code_b, 1), 1),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
