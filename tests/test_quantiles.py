"""X26 mergeable log-histogram quantile sketch: bounds contain the
exact quantile (the sketch's contract), exact multiset merge, bucket
monotonicity fuzz, bounded sketch size, scale-safe plan."""

import pytest
from pyspark.sql import functions as F

from pie_spark.eval.quantiles import (
    hdr_bucket,
    hdr_quantiles,
    hdr_sketch,
    merge_sketches,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def vals(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.length("text").cast("long").alias("v"))
        .localCheckpoint(eager=True)
    )


def test_quantile_bounds_contain_exact(spark, vals):
    """For every requested q, the returned [lo, hi] contains the exact
    rank-ceil(q·N) order statistic, and the relative width is ≤ 2^−p."""
    qs = [10000, 250000, 500000, 750000, 900000, 990000, 1000000]
    got = {r["q_ppm"]: r for r in hdr_quantiles(hdr_sketch(vals, "v", p=6), qs).collect()}
    arr = sorted(r["v"] for r in vals.collect())
    n = len(arr)
    assert set(got) == set(qs)
    for q in qs:
        rank = (q * n + 999999) // 1_000_000
        exact = arr[rank - 1]
        r = got[q]
        assert r["rank"] == rank
        assert r["lo"] <= exact <= r["hi"], (q, exact, r["lo"], r["hi"])
        if r["lo"] > 0:
            assert (r["hi"] - r["lo"]) / r["lo"] <= 2**-6 + 1e-12


def test_merge_is_exact(spark, vals):
    """sketch(A) ⊕ sketch(B) ≡ sketch(A ⊎ B) bucket-for-bucket — the
    per-partition / per-epoch rollup property."""
    half = vals.limit(4000).localCheckpoint(eager=True)
    rest = vals.exceptAll(half)
    merged = merge_sketches(
        hdr_sketch(half, "v", p=6), hdr_sketch(rest, "v", p=6)
    )
    whole = hdr_sketch(vals, "v", p=6)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_bucket_monotone_and_bounds_fuzz(spark):
    """Adversarial values (0, 1, powers of two ±1, wide magnitudes):
    bucket id is monotone in v and every v lies inside its own
    bucket's [lo, hi]."""
    vs = sorted(
        {0, 1, 2, 3}
        | {2**k + d for k in range(1, 62) for d in (-1, 0, 1)}
    )
    df = spark.createDataFrame([(v,) for v in vs], "v: long")
    out = (
        df.select("v", hdr_bucket(F.col("v"), p=6).alias("bucket"))
        .join(
            hdr_sketch(df, "v", p=6).select("bucket", "lo", "hi"),
            "bucket",
        )
        .orderBy("v")
        .collect()
    )
    assert [r["v"] for r in out] == vs
    prev = -1
    for r in out:
        assert r["bucket"] >= prev, f"bucket not monotone at v={r['v']}"
        prev = r["bucket"]
        assert r["lo"] <= r["v"] <= r["hi"], (r["v"], r["lo"], r["hi"])


def test_sketch_size_bounded_and_plan(spark):
    """The sketch row count is bounded by the bucket-id domain (not the
    input), and the plan is one partial-aggregable HashAggregate pair —
    no EvalPython, no join, no sort on the corpus."""
    big = spark.range(0, 200_000).select(
        (F.xxhash64("id") % 1_000_000_000).alias("raw")
    ).select(F.abs("raw").alias("v"))
    sk = hdr_sketch(big, "v", p=6)
    assert sk.count() <= (64 - 6) * 2**6 + 2**7
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_stream_sketch_equals_batch(spark, tmp_path):
    """Streaming continuous quantile aggregate: 3 landed chunks drained
    one file per micro-batch → merged epoch partials ≡ the batch sketch
    of all documents, quantiles identical, re-drain idempotent."""
    import os

    from pie_spark.streaming.rollup import combined_hdr_sketch, stream_hdr_sketch

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    lz = str(tmp_path / "lz")
    third = n // 3
    chunks = [(0, third), (third, 2 * third), (2 * third, n + 1)]
    for i, (lo, hi) in enumerate(chunks):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(lz, f"chunk-{i:03d}"))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_hdr_sketch(spark, lz + "/chunk-*", out, ckpt, p=6, max_files_per_trigger=1)
    merged = combined_hdr_sketch(spark, out)
    batch = hdr_sketch(docs.select(F.length("text").cast("long").alias("v")), "v", p=6)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, batch.collect()))

    # a bucket must span epochs for the merge to be load-bearing
    per_epoch = spark.read.option("pathGlobFilter", "*.parquet").parquet(
        out + "/epoch-*"
    )
    assert per_epoch.groupBy("bucket").count().filter("count > 1").count() > 0

    qs = [500000, 990000]
    assert sorted(map(tuple, hdr_quantiles(merged, qs).collect())) == sorted(
        map(tuple, hdr_quantiles(batch, qs).collect())
    )

    # idempotent re-drain (AvailableNow checkpoint: no new epochs)
    stream_hdr_sketch(spark, lz + "/chunk-*", out, ckpt, p=6, max_files_per_trigger=1)
    again = combined_hdr_sketch(spark, out)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, batch.collect()))


# ------------------------------------------------- X27 compression signals


def test_compression_signals_known_and_invariant(spark):
    """Repetitive text compresses far below prose; high-entropy text
    doesn't. Output is one row per doc and partitioning-invariant."""
    import pandas as pd

    from pie_spark.text.analysis import compression_signals

    rows = [
        (1, "spam " * 400),
        (2, "The quick brown fox jumps over the lazy dog. " * 5),
        (3, "".join(__import__("hashlib").sha256(str(i).encode()).hexdigest()
                    for i in range(40))),
        (4, None),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r["doc_id"]: r for r in compression_signals(df).collect()}
    assert len(out) == 4
    import zlib

    for did, text in rows:
        raw = (text or "").encode()
        assert out[did]["raw_bytes"] == len(raw)
        assert out[did]["zlib_bytes"] == len(zlib.compress(raw, 6))
    assert out[1]["ratio_ppm"] < 30_000          # boilerplate collapses
    assert out[2]["ratio_ppm"] < 500_000         # prose compresses some
    assert out[3]["ratio_ppm"] > 500_000         # high entropy doesn't
    again = sorted(
        map(tuple, compression_signals(df.repartition(7)).collect())
    )
    assert again == sorted(map(tuple, compression_signals(df).collect()))
