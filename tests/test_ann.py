"""Similarity search: brute-force exactness vs numpy; LSH/IVF recall
vs the exact baseline (measured, not assumed)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pie_spark.ann.search import brute_force_topk, ivf_topk, lsh_topk

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def test_brute_force_matches_numpy(spark, emb, queries):
    got = brute_force_topk(emb, queries, k=5).collect()
    pdf = emb.toPandas().sort_values("vec_id")
    M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for q_id in range(5):
        qv = M[ids == q_id][0]
        sims = Mn @ (qv / np.linalg.norm(qv))
        order = sorted(zip(-np.round(sims, 6), ids))[:5]
        want = [int(i) for _, i in order]
        have = [r.vec_id for r in sorted(got, key=lambda r: r.rank) if r.q_id == q_id]
        assert have == want, (q_id, have, want)


def _recall(approx, exact, k):
    e = {(r.q_id, r.vec_id) for r in exact if r.rank <= k}
    a = {(r.q_id, r.vec_id) for r in approx if r.rank <= k}
    return len(a & e) / len(e)


@pytest.fixture(scope="module")
def planted(spark, emb, queries):
    """Corpus ∪ 5 true near-neighbors (cosine ≈ 0.95+) per query —
    hyperplane LSH's actual contract is finding NEAR vectors; the raw
    fixture corpus is near-orthogonal noise (top-10 at cosine ≈ 0.3)."""
    rng = np.random.default_rng(123)
    rows = []
    for q in queries.collect():
        base = np.asarray(q.q_vec, dtype=np.float64)
        for j in range(5):
            v = base + rng.standard_normal(base.shape) * 0.08
            rows.append((100000 + int(q.q_id) * 10 + j, [float(x) for x in v]))
    extra = spark.createDataFrame(rows, ["vec_id", "embedding"])
    return emb.select("vec_id", "embedding").unionByName(extra)


def test_lsh_recall_planted_neighbors(planted, queries):
    """Production params (4×6-bit tables): ≥0.8 of true near-neighbors
    (the r01 single-table sketch caught ≈0.43 of cosine-0.95 pairs)."""
    exact = brute_force_topk(planted, queries, k=6).collect()
    single = lsh_topk(planted, queries, k=6, nbits=6, n_tables=1).collect()
    multi = lsh_topk(planted, queries, k=6, nbits=6, n_tables=4).collect()
    assert _recall(multi, exact, 6) >= _recall(single, exact, 6)
    assert _recall(multi, exact, 6) >= 0.8


def test_lsh_recall_fixture(emb, queries):
    exact = brute_force_topk(emb, queries, k=10).collect()
    # near-orthogonal data needs the wide setting: more tables, fewer
    # bits (8×3). Same operator, recall/candidate tradeoff is the knob.
    approx = lsh_topk(emb, queries, k=10, nbits=3, n_tables=8).collect()
    # query's own vector always shares all its buckets → rank-1 self-hit
    assert {r.vec_id for r in approx if r.rank == 1} == {r.q_id for r in approx if r.rank == 1}
    assert _recall(approx, exact, 10) >= 0.8


def test_ivf_recall_beats_probe_fraction(emb, queries):
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=4).collect()
    r = _recall(approx, exact, 10)
    assert r >= 0.4, r  # probing 4/16 lists must beat the 25% random floor


def test_ivf_full_probe_is_exact(emb, queries):
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = ivf_topk(emb, queries, k=10, n_centroids=8, nprobe=8).collect()
    assert _recall(approx, exact, 10) == 1.0


def test_ivf_deterministic_and_scale_safe_plan(emb, queries):
    """Pin the hash-sampled-centroid output (same result on repeat runs /
    repartitionings) and assert the plan has NO un-partitioned window:
    centroid pick must be TakeOrderedAndProject, assignment a partial-agg
    min_by (VERDICT r01 wrong#4 — the global row_number sort)."""
    out1 = [(r.q_id, r.rank, r.vec_id) for r in ivf_topk(emb, queries, k=5).collect()]
    out2 = [
        (r.q_id, r.rank, r.vec_id)
        for r in ivf_topk(emb.repartition(7), queries, k=5).collect()
    ]
    assert sorted(out1) == sorted(out2) and len(out1) > 0
    plan = ivf_topk(emb, queries, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "q_id" in line, f"un-partitioned window in plan: {line}"


def test_cluster_centroids_deterministic(spark):
    """Integer micro-unit centroids are partitioning-independent (the
    whole reason they're not avg(double)), singletons absent, values
    = floor(sum(round(v*1e6))/n) per dim."""
    import pandas as pd
    from pie_spark.ann.centroids import cluster_centroids

    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [1, 2, 3, 4],
                "embedding": [[1.0, -0.5], [0.0, 0.5], [0.25, 0.25], [9.0, 9.0]],
            }
        )
    )
    clusters = spark.createDataFrame(
        pd.DataFrame({"vec_id": ["1", "2", "3"], "cluster_rep": ["1", "1", "1"]})
    )
    got = cluster_centroids(clusters, emb).collect()
    assert len(got) == 1  # vec 4 is a singleton — no centroid row
    row = got[0]
    assert row["n_members"] == 3
    # dim0: (1e6 + 0 + 250000)/3 -> 416666; dim1: (-500000+500000+250000)/3 -> 83333
    assert row["centroid_micro"] == [416666, 83333]

    got2 = cluster_centroids(
        clusters.repartition(5), emb.repartition(3)
    ).collect()[0]
    assert got2["centroid_micro"] == row["centroid_micro"]


def _py_lloyd(vecs: dict, k: int, iters: int):
    """Plain-Python replay of train_kmeans with IDENTICAL arithmetic:
    left-to-right double folds for cosine, (−cos, cent_id) tiebreak,
    exact integer-micro means. Bit-equality with the Spark trajectory
    is the determinism claim under test."""
    import hashlib
    import math

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def cos(a, b):
        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    seeds = sorted(vecs, key=lambda i: (h64(i), i))[:k]
    cents = {i: list(vecs[i]) for i in seeds}
    for _ in range(iters):
        members = {}
        for vid, v in vecs.items():
            best = min(cents, key=lambda c: (-cos(v, cents[c]), c))
            members.setdefault(best, []).append(v)
        new = {}
        for cid, cs in cents.items():
            mem = members.get(cid)
            if not mem:
                new[cid] = cs
                continue
            dim = len(cs)
            out = []
            for p in range(dim):
                s = sum(int(_round_half_up(v[p] * 1e6)) for v in mem)
                out.append(math.floor(s / len(mem)) / 1e6)
            new[cid] = out
        cents = new
    return cents


def _round_half_up(x):
    import math

    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_kmeans_matches_python_replay_exactly(spark):
    from pie_spark.ann.kmeans import train_kmeans

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200)
    got = {
        r["cent_id"]: list(r["cv"])
        for r in train_kmeans(emb, k=6, iters=3).collect()
    }
    vecs = {
        str(r["vec_id"]): [float(x) for x in r["embedding"]] for r in emb.collect()
    }
    want = _py_lloyd(vecs, k=6, iters=3)
    assert set(got) == set(want)
    for cid in got:
        assert got[cid] == want[cid], f"centroid {cid} diverged"


def test_kmeans_partitioning_invariant_and_feeds_ivf(spark):
    from pyspark.sql import functions as F

    from pie_spark.ann.kmeans import train_kmeans
    from pie_spark.ann.search import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {r["cent_id"]: list(r["cv"]) for r in train_kmeans(emb, k=8, iters=2).collect()}
    b = {
        r["cent_id"]: list(r["cv"])
        for r in train_kmeans(emb.repartition(13, "label"), k=8, iters=2).collect()
    }
    assert a == b

    cents = train_kmeans(emb, k=8, iters=2)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ivf_topk(emb, q, k=5, nprobe=3, centroids=cents)
    assert out.count() == 15  # 3 queries × top-5
    assert out.filter("rank = 1").count() == 3


def test_kmeans_recovers_planted_clusters(spark):
    """3 well-separated planted directions → after training, every
    member's nearest trained centroid is in its own planted group."""
    import pandas as pd

    from pie_spark.ann.kmeans import assign, train_kmeans

    rows = []
    for g in range(3):
        base = [0.0] * 12
        base[g * 4] = 1.0
        for j in range(30):
            v = list(base)
            v[g * 4 + 1] = 0.05 + (j % 7) * 0.01  # small in-group jitter
            rows.append((f"g{g}-{j}", v, g))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    # k > #groups: plain Lloyd from hash-order seeds cannot split a
    # group it drew no seed from (no k-means++ here by design — seeding
    # stays deterministic/RNG-free); over-provisioning centroids is the
    # standard IVF practice anyway (nlist >> natural cluster count)
    cents = train_kmeans(df, k=8, iters=4)
    c = df.selectExpr(
        "cast(vec_id as string) vec_id", "cast(embedding as array<double>) v",
        "label",
    )
    assigned = assign(c.select("vec_id", "v"), cents).join(
        c.select("vec_id", "label"), "vec_id"
    )
    # each trained centroid's members all share one planted label
    mixed = (
        assigned.groupBy("cent_id")
        .agg({"label": "collect_set"})
        .withColumnRenamed("collect_set(label)", "labels")
        .filter("size(labels) > 1")
        .count()
    )
    assert mixed == 0


# -------------------------------------------------------------------- PQ


def test_pq_matches_python_replay_exactly(spark):
    """train_pq / pq_encode / pq_topk vs the plain-Python integer
    replay — EXACT equality of every codebook entry, every code and
    every ADC distance (the kmeans bit-equality contract, extended to
    the whole PQ chain; this is what licenses the folded DuckDB oracle
    to train via pq_reference)."""
    from pie_spark.ann.pq import (
        pq_encode,
        pq_encode_reference,
        pq_reference,
        pq_topk,
        pq_topk_reference,
        train_pq,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    cb = train_pq(emb, m=4, ksub=8, iters=3)
    got_cb = {(r["sub"], r["code"]): list(r["cv"]) for r in cb.collect()}
    vecs = {
        str(r["vec_id"]): [float(x) for x in r["embedding"]] for r in emb.collect()
    }
    want_cb = pq_reference(vecs, m=4, ksub=8, iters=3)
    assert got_cb == want_cb

    codes = pq_encode(emb, cb, m=4)
    got_codes = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    want_codes = pq_encode_reference(vecs, want_cb, m=4)
    assert got_codes == want_codes

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got_t = sorted(
        (r["q_id"], r["rank"], r["vec_id"], r["adist"])
        for r in pq_topk(codes, q, cb, k=5).collect()
    )
    qv = {str(r["q_id"]): [float(x) for x in r["q_vec"]] for r in q.collect()}
    want_t = sorted(pq_topk_reference(want_codes, want_cb, qv, k=5))
    assert got_t == want_t


def test_pq_partitioning_invariant(spark):
    from pie_spark.ann.pq import train_pq

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = {
        (r["sub"], r["code"]): list(r["cv"])
        for r in train_pq(emb, m=4, ksub=8, iters=2).collect()
    }
    b = {
        (r["sub"], r["code"]): list(r["cv"])
        for r in train_pq(emb.repartition(13, "label"), m=4, ksub=8, iters=2).collect()
    }
    assert a == b


def test_pq_adc_recovers_planted_clusters(spark):
    """ADC top-k over PQ codes keeps planted-group members closer than
    cross-group vectors: for every query, ALL top-k neighbors share the
    query's planted direction (groups are axis-orthogonal, so subspace
    quantization cannot confuse them — a recall floor, not a tie bet)."""
    import pandas as pd

    from pie_spark.ann.pq import pq_encode, pq_topk, train_pq

    rows = []
    for g in range(3):
        base = [0.0] * 12
        base[g * 4] = 1.0
        for j in range(30):
            v = list(base)
            v[g * 4 + 1] = 0.05 + (j % 7) * 0.01
            rows.append((f"g{g}-{j}", v, g))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    cb = train_pq(df, m=3, ksub=6, iters=3)
    codes = pq_encode(df, cb, m=3)
    q = df.filter(F.col("vec_id").isin("g0-0", "g1-0", "g2-0")).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = pq_topk(codes, q, cb, k=10).collect()
    assert len(out) == 30
    for r in out:
        assert r["vec_id"].split("-")[0] == r["q_id"].split("-")[0], (
            f"query {r['q_id']} pulled cross-group neighbor {r['vec_id']}"
        )


def test_pq_plan_scale_safe(spark):
    """Plan audit: zero Python stages; the codebook and LUT ride
    broadcast joins (no Exchange on the corpus side of the ADC join);
    the per-(q,vec) SUM is a partial-aggregable hash aggregate."""
    from pie_spark.ann.pq import pq_encode, pq_topk, train_pq

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb = train_pq(emb, m=4, ksub=8, iters=1)
    codes = pq_encode(emb, cb, m=4)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    plan = pq_topk(codes, q, cb, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_pq_ivf_full_probe_equals_pq_topk(spark):
    """nprobe = n_cells ⇒ IVF-PQ is exactly flat-PQ ADC (the coarse
    layer prunes nothing): same trained fine codebooks, same exact
    integer distances, row-for-row."""
    from pie_spark.ann.pq import pq_encode, pq_ivf_topk, pq_topk, train_pq

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cb = train_pq(emb, m=4, ksub=8, iters=2)
    flat = sorted(
        map(tuple, pq_topk(pq_encode(emb, cb, m=4), q, cb, k=5).collect())
    )
    ivf = sorted(
        map(
            tuple,
            pq_ivf_topk(
                emb, q, k=5, n_cells=6, nprobe=6, m=4, ksub=8, iters=2
            ).collect(),
        )
    )
    assert flat == ivf


def test_pq_ivf_partial_probe_planted_recall(spark):
    """nprobe=1 on axis-orthogonal planted groups: the probed cell is
    the query's own group's cell, so every neighbor returned shares the
    query's group — and the scored row count is cell-local."""
    import pandas as pd

    from pie_spark.ann.pq import pq_ivf_topk

    rows = []
    for g in range(3):
        base = [0.0] * 12
        base[g * 4] = 1.0
        for j in range(30):
            v = list(base)
            v[g * 4 + 1] = 0.05 + (j % 7) * 0.01
            rows.append((f"g{g}-{j}", v, g))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    q = df.filter(F.col("vec_id").isin("g0-0", "g1-0", "g2-0")).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = pq_ivf_topk(df, q, k=10, n_cells=6, nprobe=1, m=3, ksub=6, iters=3).collect()
    assert len(out) == 30
    for r in out:
        assert r["vec_id"].split("-")[0] == r["q_id"].split("-")[0]


def test_pq_rerank_full_shortlist_is_exact(spark):
    """shortlist ≥ corpus ⇒ pq_rerank_topk IS the exact integer-L2
    scan: compare against a direct exact top-k computed without PQ."""
    from pyspark.sql import Window

    from pie_spark.ann.pq import (
        _l2,
        _sub_rows,
        pq_encode,
        pq_rerank_topk,
        train_pq,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(150)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cb = train_pq(emb, m=4, ksub=8, iters=2)
    codes = pq_encode(emb, cb, m=4)
    got = sorted(
        map(
            tuple,
            pq_rerank_topk(emb, codes, q, cb, k=5, shortlist=1000).collect(),
        )
    )
    dim = 64
    c = _sub_rows(emb, 1, dim, "vec_id", "embedding").drop("sub")
    qs = _sub_rows(q, 1, dim, "q_id", "q_vec", out_id="q_id", out_vec="qsv").drop("sub")
    w = Window.partitionBy("q_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    want = sorted(
        map(
            tuple,
            c.crossJoin(F.broadcast(qs))
            .select("q_id", "vec_id", _l2(F.col("sv"), F.col("qsv")).alias("dist"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("q_id", "rank", "vec_id", "dist")
            .collect(),
        )
    )
    assert got == want
