#!/usr/bin/env python
"""Cluster entrypoint for the graph-embedding training-data family
(SURVEY.md §2 G10/G10b/G11; BASELINE.json — "runs end-to-end via
spark-submit --py-files on multi-executor clusters").

    spark-submit --master <url> --py-files dist/pie_spark.zip \
        jobs/run_embedding_corpus.py \
        --triples /tmp/pie_out/triples --output /tmp/pie_embed \
        [--walk-len 10] [--walks-per-node 2] [--node2vec] \
        [--window 4] [--n-neg 4] [--probes 3]

Consumes the triples table the flagship pipeline materializes
(``jobs/run_pipeline.py --output``) and writes the three
embedding-trainer feeds:

    <output>/walks/      (start, walk_no, path)         walk corpus
    <output>/pairs/      (w1, w2, n_pairs, glove_weight_ppm)
    <output>/negatives/  (subj, pred, obj, slot, probe, neg_obj)

The entity graph is (subj, obj) edges symmetrized; every stage is the
deterministic hash recipe, so TWO RUNS OF THIS JOB PRODUCE BYTE-EQUAL
RESULTS — the CLI drill in BENCH/BASELINE.md proves it by comparing
output content hashes across runs. The master comes from spark-submit;
nothing is hardcoded.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--triples", required=True,
                   help="parquet path of a (subj, pred, obj, ...) triple table")
    p.add_argument("--output", required=True)
    p.add_argument("--walk-len", type=int, default=10)
    p.add_argument("--walks-per-node", type=int, default=2)
    p.add_argument("--node2vec", action="store_true",
                   help="second-order biased walks instead of first-order")
    p.add_argument("--max-bias-degree", type=int, default=1024)
    p.add_argument("--window", type=int, default=4)
    p.add_argument("--n-neg", type=int, default=4)
    p.add_argument("--probes", type=int, default=3)
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("pie_spark-embed-corpus")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    try:
        from pie_spark.graph.negatives import transe_negatives
        from pie_spark.graph.walks import (
            node2vec_walks,
            random_walks,
            symmetrize,
        )
        from pie_spark.text.colloc import skipgram_counts

        t0 = time.time()
        triples = spark.read.parquet(args.triples).select("subj", "pred", "obj")
        edges = symmetrize(
            triples.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        )

        if args.node2vec:
            walks = node2vec_walks(
                edges,
                walk_len=args.walk_len,
                walks_per_node=args.walks_per_node,
                max_bias_degree=args.max_bias_degree,
            )
        else:
            walks = random_walks(
                edges, walk_len=args.walk_len, walks_per_node=args.walks_per_node
            )
        walks.write.mode("overwrite").parquet(f"{args.output}/walks")

        walks_rd = spark.read.parquet(f"{args.output}/walks")
        pairs = skipgram_counts(
            walks_rd.select(
                F.concat_ws("#", "start", "walk_no").alias("doc_id"),
                F.col("path").alias("text"),
            ),
            window=args.window,
        )
        pairs.write.mode("overwrite").parquet(f"{args.output}/pairs")

        negs = transe_negatives(triples, n_neg=args.n_neg, probes=args.probes)
        negs.write.mode("overwrite").parquet(f"{args.output}/negatives")

        # content hashes: ONE row each — the determinism drill compares
        # these across independent runs (bounded driver data)
        def _h(path: str, cols: list[str]) -> tuple[int, int]:
            df = spark.read.parquet(path)
            # bit_xor: order-independent, overflow-free under ANSI
            row = df.agg(
                F.count("*").alias("n"),
                F.coalesce(
                    F.expr(f"bit_xor(xxhash64({', '.join(cols)}))"), F.lit(0)
                ).alias("h"),
            ).collect()[0]
            return int(row["n"]), int(row["h"])

        wn, wh = _h(f"{args.output}/walks", ["start", "walk_no", "path"])
        pn, ph = _h(f"{args.output}/pairs",
                    ["w1", "w2", "n_pairs", "glove_weight_ppm"])
        nn, nh = _h(f"{args.output}/negatives",
                    ["subj", "pred", "obj", "slot", "probe", "neg_obj"])
        print(
            json.dumps(
                {
                    "wall_sec": round(time.time() - t0, 2),
                    "walks": {"rows": wn, "hash": wh},
                    "pairs": {"rows": pn, "hash": ph},
                    "negatives": {"rows": nn, "hash": nh},
                    "mode": "node2vec" if args.node2vec else "first_order",
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
