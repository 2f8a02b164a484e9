#!/usr/bin/env python
"""Stage-split profile of the flagship pipeline at bench scale: where
do the headline seconds actually go? Times, in one fresh session:

  scan       — corpus scan + span explode + text filter (no Python)
  detect     — + fused Arrow detector stage (regex ∪ gazetteer ∪ CRF)
  merge      — + overlap-merge windows (the extract_stage output)
  full       — the whole pipeline.run → triples count

Each step re-runs from cold cache (no persist), so step deltas are the
marginal cost of the added stage. One warmup pass first. Usage:

    python tools/profile_stages.py [mult]    # default 200 → 1M docs
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import _materialize_corpus, _mk_session
    from pie_spark.config import PipelineConfig
    from pie_spark.extract.fused import fused_matches
    from pie_spark.extract.merge import merge_mentions
    from pie_spark.extract.spans import explode_spans, text_spans
    from pie_spark.fixtures.gen import entity_dict_df
    from pie_spark.pipeline import collect_surfaces, run
    from pie_spark.schemas import DOC_SCHEMA

    spark = _mk_session(cores, "pie-profile")
    tmp = tempfile.mkdtemp(prefix="pie_profile_")
    docs_path = os.path.join(tmp, "docs.parquet")
    n = _materialize_corpus(spark, sf_dir, docs_path, mult=mult)
    print(f"docs: {n}")

    cfg = PipelineConfig()
    dict_df = entity_dict_df(spark)
    surfaces = collect_surfaces(dict_df, cfg.dict_max_surfaces)

    def t(label, thunk):
        t0 = time.perf_counter()
        out = thunk()
        w = time.perf_counter() - t0
        print(f"{label:8s} {w:7.2f}s  ({out} rows)")
        return w

    def docs():
        return spark.read.schema(DOC_SCHEMA).parquet(docs_path)

    def txt():
        return text_spans(explode_spans(docs()))

    # warmup (full pipeline, untimed)
    res = run(spark, cfg, docs(), dict_df)
    res.triples.count()
    res.unpersist()

    t("scan", lambda: txt().count())
    t("detect", lambda: fused_matches(txt(), spark, surfaces).count())
    t("merge", lambda: merge_mentions(fused_matches(txt(), spark, surfaces)).count())

    def full():
        r = run(spark, cfg, docs(), dict_df)
        c = r.triples.count()
        r.unpersist()
        return c

    t("full", full)
    spark.stop()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
