#!/usr/bin/env python
"""A/B evidence harness for OPTIMIZATION_r07.md: the shipped min_by
linking top-1 vs a surface-keyed election prototype (elect the best
candidate once per distinct surface, broadcast it back — never
sort/shuffle the mention set).

Result (this box, 1M-doc bench corpus, persisted mentions, noop sink,
interleaved warm-JVM runs): current 1.683/3.012/1.415/1.484 s vs
election 1.256/4.327/1.371/1.487 s — no measurable difference, so the
prototype was NOT shipped (it would add a distinct-surface pass and a
broadcast-size guard for zero benefit). Kept here so the measurement
is reproducible.

NOT part of the frozen measurement surface (bench.py is the driver's
protocol).

Usage: python tools/link_ab.py
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _mk(app: str):
    from pie_spark.session import build_session

    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = int(os.environ.get("PIE_BENCH_SHUFFLE", 2 * int(cores)))
    return build_session(app_name=app, master=f"local[{cores}]", shuffle_partitions=sp)


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


OUT_ORDER = [
    "norm_key", "doc_id", "span_idx", "span_offset", "start", "end",
    "mention_type", "surface", "detector", "score", "mention_id",
    "entity_id", "entity_type", "link_score",
]


def link_surface_election(mentions, dict_df):
    """Prototype: score depends only on the mention surface, so elect
    the winning candidate once per distinct surface and broadcast the
    (surface -> entity, score) table back onto the mention set."""
    from pie_spark.extract.normalize import norm_key
    from pie_spark.link.linker import W_EXACT, W_JACCARD, W_PRIOR

    m = mentions.filter(F.col("mention_type") == "PERSON").withColumn(
        "norm_key", norm_key("surface")
    )
    d = dict_df.select(
        F.col("norm_key"), F.col("surface").alias("dict_surface"),
        "entity_id", "entity_type", "prior",
    )
    surf = m.select("surface").distinct().withColumn("norm_key", norm_key("surface"))
    cand = surf.join(F.broadcast(d), "norm_key", "inner")
    m_toks = F.split(F.lower("surface"), " ")
    d_toks = F.split(F.lower("dict_surface"), " ")
    jaccard = F.size(F.array_intersect(m_toks, d_toks)) / F.size(
        F.array_union(m_toks, d_toks)
    )
    exact = (F.col("surface") == F.col("dict_surface")).cast("double")
    scored = cand.withColumn(
        "link_score", W_EXACT * exact + W_JACCARD * jaccard + W_PRIOR * F.col("prior")
    )
    order_key = F.struct(
        (-F.col("link_score")).alias("neg_score"), F.col("entity_id").alias("eid")
    )
    best = (
        scored.groupBy("surface")
        .agg(F.min_by(F.struct("entity_id", "entity_type", "link_score"),
                      order_key).alias("b"))
        .select("surface", "b.entity_id", "b.entity_type", "b.link_score")
    )
    return m.join(F.broadcast(best), "surface", "inner").select(*OUT_ORDER)


def checksum(df):
    # sum raw 64-bit row hashes in decimal space (ANSI mode forbids the
    # overflowing BIGINT sum)
    return df.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]


def main() -> None:
    from pie_spark.config import PipelineConfig
    from pie_spark.extract.fused import fused_matches
    from pie_spark.extract.merge import merge_mentions
    from pie_spark.extract.spans import explode_spans, text_spans
    from pie_spark.fixtures.gen import entity_dict_df, interleaved_docs
    from pie_spark.link.linker import link_mentions
    from pie_spark.pipeline import try_collect_surfaces
    from pie_spark.schemas import DOC_SCHEMA

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = int(os.environ.get("PIE_BENCH_MULT", "200"))
    tmp = tempfile.mkdtemp(prefix="link_ab_")
    docs_path = os.path.join(tmp, "docs.parquet")

    spark = _mk("link-ab-gen")
    interleaved_docs(spark, sf_dir, mult=mult, parts=128 if mult > 1 else 0) \
        .write.mode("overwrite").parquet(docs_path)
    spark.stop()

    spark = _mk("link-ab")
    sc = spark.sparkContext
    cfg = PipelineConfig()
    docs = spark.read.schema(DOC_SCHEMA).parquet(docs_path)
    dict_df = entity_dict_df(spark)
    surfaces = try_collect_surfaces(dict_df, cfg.dict_max_surfaces)
    txt = text_spans(explode_spans(docs))
    fused = fused_matches(
        txt, spark, surfaces,
        enable_phone=cfg.enable_phone, enable_crf=cfg.enable_crf,
    )
    sc.setJobDescription("extract+merge persist")
    merged = merge_mentions(fused).persist(StorageLevel.MEMORY_AND_DISK)
    print("merged rows:", merged.count(), flush=True)

    cur = link_mentions(merged, dict_df)
    new = link_surface_election(merged, dict_df)
    assert cur.columns == new.columns, (cur.columns, new.columns)

    sc.setJobDescription("warmup current"); _noop(cur)
    sc.setJobDescription("warmup election"); _noop(new)
    times: dict[str, list[float]] = {"cur": [], "new": []}
    for i in range(4):
        sc.setJobDescription(f"current linking #{i}")
        times["cur"].append(_noop(link_mentions(merged, dict_df)))
        sc.setJobDescription(f"election linking #{i}")
        times["new"].append(_noop(link_surface_election(merged, dict_df)))
    print("current :", [round(t, 3) for t in times["cur"]], flush=True)
    print("election:", [round(t, 3) for t in times["new"]], flush=True)

    sc.setJobDescription("checksum current")
    c1 = checksum(cur)
    sc.setJobDescription("checksum election")
    c2 = checksum(new)
    print("current :", tuple(c1), "\nelection:", tuple(c2), flush=True)
    print("EQUAL" if (c1.n == c2.n and c1.h == c2.h) else "MISMATCH", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
