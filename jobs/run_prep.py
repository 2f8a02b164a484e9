#!/usr/bin/env python
"""Cluster entrypoint for the training-data prep flow (SURVEY.md §2.12;
stage-checkpointed + resumable like the KG pipeline):

    spark-submit --master <url> --py-files dist/pie_spark.zip \
        jobs/run_prep.py \
        --corpus /root/testdata/sf0.001/documents.parquet \
        --benchmark-mod 20 --checkpoint /tmp/prep_ckpt \
        --output /tmp/prep_manifest \
        [--quality-min 600000] [--lang en] [--split train] \
        [--neardup-threshold 0.5] [--no-resume]

``--corpus`` is a parquet path with (doc_id, text, ...). The benchmark
(decontamination) slice is either ``--benchmark <path>`` or carved from
the corpus with ``--benchmark-mod N`` (doc_id ≡ 0 mod N). The master
comes from spark-submit; nothing is hardcoded. A killed run re-launched
with the same --checkpoint resumes finished stages and produces a
byte-identical manifest (tests/test_resume.py::test_prep_resume_byte_identical).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--benchmark", default="")
    p.add_argument("--benchmark-mod", type=int, default=0)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--quality-min", type=int, default=600_000)
    p.add_argument("--lang", default="en")
    p.add_argument("--split", default="train")
    p.add_argument("--neardup-threshold", type=float, default=0.5)
    args = p.parse_args()
    if not args.benchmark and not args.benchmark_mod:
        p.error("one of --benchmark or --benchmark-mod is required")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("pie_spark-prep")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from pie_spark.prep.runner import PrepConfig, run_prep_checkpointed

    t0 = time.perf_counter()
    corpus = spark.read.parquet(args.corpus).select("doc_id", "text")
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark).select("doc_id", "text")
    else:
        bench = corpus.filter(F.col("doc_id") % args.benchmark_mod == 0)
        corpus = corpus.filter(F.col("doc_id") % args.benchmark_mod != 0)

    cfg = PrepConfig(
        checkpoint_dir=args.checkpoint or None,
        resume=not args.no_resume,
        quality_min_ppm=args.quality_min,
        lang=args.lang,
        split=args.split,
        neardup_threshold=args.neardup_threshold,
    )
    out = run_prep_checkpointed(spark, corpus, bench, cfg)
    out.manifest.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()

    print(
        json.dumps(
            {
                "run_id": out.run_id,
                "manifest_rows": n,
                "manifest_snapshot": out.manifest_snapshot,
                "resumed_stages": out.resumed_stages,
                "wall_sec": round(time.perf_counter() - t0, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
