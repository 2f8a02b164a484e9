"""Driver-verified query surface (SURVEY.md §2 oracle column;
__spark_entry__.py contract).

Each entry: name → (spark_callable(spark, sf_dir) -> DataFrame,
oracle_sql | None). SQL-marked operators get a DuckDB-equivalent ANSI
query over the pre-registered fixture views; genuinely non-SQL ops
(iterative CC, Arrow-UDF extraction, full pipeline) have oracle=None →
the driver records a rows-only check.

Column names and types are aligned pairwise (the driver hashes values
under sorted column names): every computed column is aliased on BOTH
sides, counts cast to BIGINT, float aggregates rounded.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pie_spark.config import PipelineConfig
from pie_spark.extract.matchers import EMAIL_RE


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tp(spark: SparkSession, sf_dir: str, name: str, key: str = "doc_id") -> DataFrame:
    """Fixture table repartitioned 32-way: each fixture is ONE parquet
    file → one scan task, which serializes any heavy narrow stage above
    it (UDFs, shingling, hashing). Real corpora arrive as many files;
    the repartition stands in for that layout."""
    return _t(spark, sf_dir, name).repartition(32, key)


# ---------------------------------------------------------------------------
# pipeline (rows-only: Arrow-UDF extraction + iterative CC not SQL-expressible)
# ---------------------------------------------------------------------------


_PIPE_LAST_SF_DIR: str | None = None


def _pipe_oracle_sf_dir() -> str:
    import os

    return _PIPE_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )


def _pipeline(spark: SparkSession, sf_dir: str):
    from pie_spark.fixtures.gen import entity_dict_df, interleaved_docs
    from pie_spark.pipeline import run

    # record the corpus dir so the lazily-built generator-corpus oracles
    # (extract/pipeline_sql.py) materialize and replay the SAME corpus
    global _PIPE_LAST_SF_DIR
    _PIPE_LAST_SF_DIR = sf_dir
    docs = interleaved_docs(spark, sf_dir)
    return run(spark, PipelineConfig(), docs, entity_dict_df(spark))


def q_pipeline_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full KG-construction pipeline → (subj,pred,obj) triples.

    Hash-checked since r06: the oracle reads the SAME deterministic
    corpus, materialized to parquet by the pure generator, and replays
    every stage — position-accurate detectors, merge, linking, CC,
    media-aware W4 pairing, HAS_MEDIA, A5 — in DuckDB
    (extract/pipeline_sql.py:pipeline_triples_sql)."""
    return _pipeline(spark, sf_dir).triples


def _pipeline_triples_gen_sql() -> str:
    from pie_spark.extract.pipeline_sql import pipeline_triples_sql

    return pipeline_triples_sql(_pipe_oracle_sf_dir())


def q_pipeline_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged mention set (regex ∪ gazetteer ∪ CRF after overlap dedup).

    Hash-checked since r06 (VERDICT r05 next#2): the oracle never
    generates the corpus — it reads the same materialized parquet and
    replays the full per-span mention stack with position-accurate
    finditer/Aho-Corasick scans (extract/pipeline_sql.py)."""
    res = _pipeline(spark, sf_dir)
    return res.merged_mentions.select(
        "doc_id", "span_idx", "start", "end", "mention_type", "surface", "detector"
    )


def _pipeline_mentions_gen_sql() -> str:
    from pie_spark.extract.pipeline_sql import pipeline_mentions_sql

    return pipeline_mentions_sql(_pipe_oracle_sf_dir())


def q_cc_canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed CC canonicalization map over the dictionary graph.

    Hash-checked from r03: the dictionary is closed-form deterministic
    (fixtures/gazetteer.py), so the oracle inlines its distinct
    (norm_key, entity_id) pairs as a VALUES literal — same precedent as
    the embedding oracle's inlined hyperplanes — and replays the
    bipartite closure as a DuckDB recursive CTE."""
    from pie_spark.canon.canonical import key_canonical_map
    from pie_spark.canon.cc import connected_components
    from pie_spark.canon.edges import build_edges
    from pie_spark.fixtures.gen import entity_dict_df

    labels = connected_components(build_edges(entity_dict_df(spark)))
    return key_canonical_map(labels).select("norm_key", "canon_entity_id")


def _cc_canonical_map_sql() -> str:
    """DuckDB mirror of q_cc_canonical_map: recursive-CTE transitive
    closure over the SAME bipartite k:<norm_key> — e:<entity_id> graph,
    component = min node (string order), canonical entity = min
    entity_id among the component's entity nodes."""
    from pie_spark.fixtures.gazetteer import dictionary_entries

    pairs = sorted({(e.norm_key, e.entity_id) for e in dictionary_entries()})
    values = ",\n".join(
        "('" + k.replace("'", "''") + "', '" + eid.replace("'", "''") + "')"
        for k, eid in pairs
    )
    return f"""
WITH RECURSIVE dict(norm_key, entity_id) AS (VALUES {values}),
edges AS (SELECT DISTINCT 'k:' || norm_key AS src, 'e:' || entity_id AS dst FROM dict),
und AS (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
reach AS (
  SELECT src AS node, src AS r FROM und
  UNION
  SELECT u.src AS node, r.r FROM und u JOIN reach r ON r.node = u.dst
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
canon AS (
  SELECT component, min(substr(node, 3)) AS canon_entity_id
  FROM comp WHERE node LIKE 'e:%' GROUP BY component
)
SELECT substr(c.node, 3) AS norm_key, canon.canon_entity_id
FROM comp c JOIN canon USING (component)
WHERE c.node LIKE 'k:%'
"""


def q_cc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 distributed min-label CC hash-checked against an independent
    engine: chain edges derived from the documents fixture (consecutive
    doc_ids within (lang, source, doc_id%50) groups), oracled by a
    DuckDB recursive-CTE transitive closure. Unlike cc_canonical_map
    (dictionary graph, rows-only), this pins the iterated-join operator
    itself to an external fixpoint computation."""
    from pie_spark.canon.cc import connected_components

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source", (F.col("doc_id") % 50).alias("g")).orderBy("doc_id")
    edges = (
        d.select("doc_id", F.lag("doc_id").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull())
        .select(
            F.col("prev").cast("string").alias("src"),
            F.col("doc_id").cast("string").alias("dst"),
        )
    )
    return connected_components(edges)


def q_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1-incremental (r06): delta canonicalization — merge new edges
    into an EXISTING canonical map without recomputing CC on the whole
    graph (canon/cc.py:incremental_components; big map scanned twice,
    never shuffled).

    The driver row pins incremental ≡ full CROSS-ENGINE: edges are the
    same chain graph as cc_components, deterministically split into
    old (¾) and delta (¼, doc_id % 4 == 0 endpoints); Spark computes
    CC(old) then merges the delta incrementally, and the DuckDB oracle
    computes full CC over ALL edges — any divergence between the
    incremental path and the ground-truth fixpoint hash-mismatches.
    cc_components (full-CC on the same graph) moves to the FOLDED
    pytest oracle; full CC stays driver-checked in cc_canonical_map
    and inside pipeline_triples_all.

    r07: the OLD map is built via adaptive_components — the repo's
    size-adaptive CC entry point (driver union-find under the
    5M-edge threshold, salted distributed loop above) — matching how a
    standing landing zone would actually obtain it; the iterated
    distributed loop remains headline-timed in cc_canonical_map and
    cross-engine-pinned in the folded cc_components oracle. Labels are
    identical on both paths (tests/test_cc.py), so the driver hash is
    unchanged."""
    from pie_spark.canon.cc import adaptive_components, incremental_components

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source", (F.col("doc_id") % 50).alias("g")).orderBy("doc_id")
    edges = (
        d.select("doc_id", F.lag("doc_id").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull())
        .select(
            F.col("prev").cast("string").alias("src"),
            F.col("doc_id").cast("string").alias("dst"),
        )
    )
    is_delta = (F.col("dst").cast("long") % 4) == 0
    old_labels = adaptive_components(spark, edges.filter(~is_delta))
    return incremental_components(spark, old_labels, edges.filter(is_delta))


SQL_CC_COMPONENTS = """
WITH RECURSIVE base AS (
  SELECT doc_id,
         lag(doc_id) OVER (PARTITION BY lang, source, doc_id % 50 ORDER BY doc_id) AS prev
  FROM documents
),
edges AS (SELECT CAST(prev AS VARCHAR) AS src, CAST(doc_id AS VARCHAR) AS dst
          FROM base WHERE prev IS NOT NULL),
und AS (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
reach AS (
  SELECT src AS node, src AS r FROM und
  UNION
  SELECT u.src AS node, r.r FROM und u JOIN reach r ON r.node = u.dst
)
SELECT node, min(r) AS component FROM reach GROUP BY node
"""


def q_span_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-sequence invariant violations — MUST be empty (0 rows)."""
    from pie_spark.extract.invariants import violation_rows
    from pie_spark.extract.spans import explode_spans
    from pie_spark.fixtures.gen import interleaved_docs

    docs = interleaved_docs(spark, sf_dir)
    return violation_rows(docs, explode_spans(docs))


# The binding invariant (BASELINE.json:15) states the violation set is
# empty for EVERY document — so the oracle is the empty relation with
# the matching schema: any violation row hash-mismatches the driver.
SQL_SPAN_INVARIANT = """
SELECT CAST(NULL AS VARCHAR) AS doc_id,
       CAST(NULL AS VARCHAR) AS src_spans_json,
       CAST(NULL AS VARCHAR) AS rebuilt_spans_json
WHERE 1 = 0
"""


# ---------------------------------------------------------------------------
# SQL-checked operators (SURVEY.md §2: P1, M1, M2, A1, J2/W1, A3/W2, J1,
# W4, G2, A5, A7)
# ---------------------------------------------------------------------------


def q_span_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: order-preserving explode with position."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")


SQL_SPAN_EXPLODE = """
SELECT doc_id,
       unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
       unnest(string_split(text, ' ')) AS tok
FROM documents
"""


def q_email_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 native email matcher with URL-decoy rejection, zero Python."""
    c = _t(spark, sf_dir, "customer")
    local = F.regexp_replace(F.lower("c_name"), "[^a-z0-9]", "")
    text = F.concat(
        F.lit("contact "), local, F.lit("@example.com via http://host/"),
        local, F.lit("@decoy.com"),
    )
    return c.select(
        "c_custkey",
        F.explode(
            F.regexp_extract_all(text, F.lit(f"(^| )({EMAIL_RE})"), 2)
        ).alias("email"),
    )


SQL_EMAIL_EXTRACT = rf"""
SELECT c_custkey,
       unnest(regexp_extract_all(
         'contact ' || regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g')
         || '@example.com via http://host/'
         || regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g') || '@decoy.com',
         '(^| )({EMAIL_RE})', 2)) AS email
FROM customer
"""


def q_ssn_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: SSN shaping + validity filter (area ∉ {000,666,9xx}, group>0,
    serial>0) on deterministically derived numbers."""
    li = _t(spark, sf_dir, "lineitem")
    area = (F.col("l_orderkey") * 7 % 1000).cast("int")
    group = (F.col("l_partkey") % 100).cast("int")
    serial = (F.col("l_suppkey") * 13 % 10000).cast("int")
    ssn = F.concat_ws(
        "-",
        F.lpad(area.cast("string"), 3, "0"),
        F.lpad(group.cast("string"), 2, "0"),
        F.lpad(serial.cast("string"), 4, "0"),
    )
    return (
        li.select("l_orderkey", "l_linenumber", area.alias("a"), group.alias("g"),
                  serial.alias("s"), ssn.alias("ssn"))
        .filter((F.col("a") != 0) & (F.col("a") != 666) & (F.col("a") < 900)
                & (F.col("g") > 0) & (F.col("s") > 0))
        .select("l_orderkey", "l_linenumber", "ssn")
    )


SQL_SSN_VALIDITY = """
WITH t AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_orderkey * 7 % 1000 AS INT) AS a,
         CAST(l_partkey % 100 AS INT) AS g,
         CAST(l_suppkey * 13 % 10000 AS INT) AS s
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       lpad(CAST(a AS VARCHAR), 3, '0') || '-' || lpad(CAST(g AS VARCHAR), 2, '0')
         || '-' || lpad(CAST(s AS VARCHAR), 4, '0') AS ssn
FROM t
WHERE a <> 0 AND a <> 666 AND a < 900 AND g > 0 AND s > 0
"""


def q_surface_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: hash aggregation with count + distinct + sum."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


SQL_SURFACE_FREQ = """
SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang, source
"""


def q_top1_candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/W1: deterministic top-1 per key via ranking window."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_order"),
            F.round("o_totalprice", 2).alias("top_price"),
        )
    )


SQL_TOP1_CANDIDATE = """
SELECT o_custkey, o_orderkey AS top_order, round(o_totalprice, 2) AS top_price
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
"""


def q_canonical_election(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/W2: most-frequent election with lexicographic tiebreak."""
    c = _t(spark, sf_dir, "customer")
    counts = c.groupBy("c_nationkey", "c_mktsegment").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("cnt"), F.asc("c_mktsegment"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", F.col("c_mktsegment").alias("canon_segment"), "cnt")
    )


SQL_CANONICAL_ELECTION = """
SELECT c_nationkey, c_mktsegment AS canon_segment, cnt
FROM (
  SELECT c_nationkey, c_mktsegment, count(*) AS cnt,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY count(*) DESC, c_mktsegment ASC) AS rn
  FROM customer GROUP BY c_nationkey, c_mktsegment
) WHERE rn = 1
"""


def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: small-dim join chain (broadcast on the Spark side)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


SQL_BROADCAST_DIM_JOIN = """
SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_nearest_prev_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: nearest-preceding pairing via last(ignorenulls) window —
    the exact primitive behind (person, HAS_EMAIL, email) pairing."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_view = F.last(
        F.when(F.col("event_type") == "view", F.col("event_id")), ignorenulls=True
    ).over(w)
    return (
        e.withColumn("prev_view", prev_view)
        .filter((F.col("event_type") == "click") & F.col("prev_view").isNotNull())
        .select("event_id", "user_id", "prev_view")
    )


SQL_NEAREST_PREV_PAIR = """
SELECT event_id, user_id, prev_view
FROM (
  SELECT event_id, user_id, event_type,
         last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_view
  FROM events
)
WHERE event_type = 'click' AND prev_view IS NOT NULL
"""


def q_edges_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: equi-self-join edge construction (bounded: pair counts)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(b, "c_nationkey").filter(F.col("a.c_custkey") < F.col("b.c_custkey"))
    return pairs.groupBy("c_nationkey").agg(F.count("*").alias("n_pairs"))


SQL_EDGES_SELFJOIN = """
SELECT a.c_nationkey AS c_nationkey, count(*) AS n_pairs
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
GROUP BY a.c_nationkey
"""


def q_triple_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: distinct (subj, pred, obj) projection."""
    return (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("subj"),
            F.lit("PLACED_STATUS").alias("pred"),
            F.col("o_orderstatus").alias("obj"),
        )
        .distinct()
    )


SQL_TRIPLE_DEDUP = """
SELECT DISTINCT o_custkey AS subj, 'PLACED_STATUS' AS pred, o_orderstatus AS obj
FROM orders
"""


def q_anti_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: resume delta via left_anti — exactly the checkpoint-resume
    shape: all work items minus the 'done' set from the last snapshot
    (here: done = orderkeys ≡ 0 mod 3)."""
    o = _t(spark, sf_dir, "orders")
    done = o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey")
    return o.join(done, "o_orderkey", "left_anti").select("o_orderkey", "o_custkey")


SQL_ANTI_JOIN_DELTA = """
SELECT o_orderkey, o_custkey FROM orders
WHERE NOT EXISTS (
  SELECT 1 FROM orders d
  WHERE d.o_orderkey = orders.o_orderkey AND d.o_orderkey % 3 = 0
)
"""


def q_salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 wired to the STREAMING hot-key counters end-to-end (VERDICT
    r04 next#5): the hot list feeding the salted join comes from the
    real incremental detector — a multi-file mention landing zone is
    drained through ``stream_surface_counts`` (applyInPandasWithState,
    maxFilesPerTrigger=1 forcing one micro-batch per file so the
    cross-batch keyed state actually accumulates), then
    ``hot_keys_from_counts`` yields the top-5 — instead of a batch A4
    job. The oracle stays the PLAIN join: the driver's value-hash match
    proves the whole streaming→hot-list→salting composition is
    result-preserving (salting must be correct for ANY hot list, so
    streaming/batch tie-break differences cannot leak into results)."""
    import os
    import tempfile

    from pie_spark.canon.salting import salted_join
    from pie_spark.streaming.counters import (
        hot_keys_from_counts,
        stream_surface_counts,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    # landing zone: lineitem rows re-shaped as MENTION_SCHEMA files
    # (surface = supplier key), 3 landed batches
    base = tempfile.mkdtemp(prefix="pie_hotstream_")
    try:
        mdir = os.path.join(base, "mentions")
        for b in range(3):
            (
                li.filter(F.col("l_orderkey") % 3 == b)
                .select(
                    F.col("l_orderkey").cast("string").alias("doc_id"),
                    F.col("l_linenumber").cast("int").alias("span_idx"),
                    F.lit(0).cast("int").alias("span_offset"),
                    F.lit(0).cast("int").alias("start"),
                    F.lit(1).cast("int").alias("end"),
                    F.lit("PERSON").alias("mention_type"),
                    F.col("l_suppkey").cast("string").alias("surface"),
                    F.lit("regex").alias("detector"),
                    F.lit(1.0).alias("score"),
                )
                .repartition(1)
                .write.parquet(os.path.join(mdir, f"batch-{b:06d}"))
            )
        counts_dir = os.path.join(base, "counts")
        stream_surface_counts(
            spark, mdir, counts_dir,
            checkpoint_dir=os.path.join(base, "ckpt"),
            max_files_per_trigger=1,
        )
        # norm_key of a digit string is the digit string itself
        hot = [int(k) for k in hot_keys_from_counts(spark, counts_dir, k=5)]
    finally:
        # the hot list is already on the driver; the landing zone /
        # checkpoint / counts dirs (3 lineitem-sized parquet copies)
        # would otherwise leak per invocation (ADVICE r05)
        import shutil

        shutil.rmtree(base, ignore_errors=True)
    fact = li.withColumnRenamed("l_suppkey", "suppkey")
    dim = s.withColumnRenamed("s_suppkey", "suppkey")
    joined = salted_join(
        fact, dim, key="suppkey", spread_col="l_orderkey",
        hot=hot, salt_k=8, how="inner",
    )
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


SQL_SALTED_HOT_JOIN = """
SELECT s_nationkey, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: HLL approximate distinct — HASH-checked since late r06, the
    last rows-only row closed. The five-round floor was Spark's
    black-box approx_count_distinct (engine-specific registers); the
    row now runs OUR deterministic HLL (pie_spark/link/hll.py —
    sha256-derived registers, one partial agg, exact integer register
    sum, one shared-literal float division), which DuckDB reproduces
    bit-for-bit. l_orderkey at sf0.01 has ~15k distinct >> 2.5·m=640,
    so the checked value sits in the plain-HLL branch (no libm ln on
    the driver path; the linear-counting branch is pytest-pinned).
    Native approx_count_distinct stays in A4/stats as the production
    shortcut; this row proves the ALGORITHM cross-engine. The exact
    count rides along to show the estimator lands (±1.04/√256 ≈ 6.5%)."""
    from pie_spark.link.hll import hll_estimate

    li = _t(spark, sf_dir, "lineitem")
    est = hll_estimate(li, "l_orderkey", p=8)
    exact = li.agg(F.countDistinct("l_orderkey").cast("long").alias("exact_orders"))
    return est.crossJoin(exact).select(
        "p", "m", "register_sum", "empty_buckets",
        F.round("estimate", 4).alias("estimate"),
        "exact_orders",
    )


def _approx_distinct_sql() -> str:
    from pie_spark.link.hll import hll_estimate_sql

    inner = hll_estimate_sql("SELECT l_orderkey FROM lineitem", "l_orderkey", p=8)
    return f"""
WITH est AS ({inner}),
ex AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders FROM lineitem)
SELECT p, m, register_sum, empty_buckets, round(estimate, 4) AS estimate, exact_orders
FROM est CROSS JOIN ex
"""


def q_prf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: precision/recall of one derived set vs another, join-based."""
    o = _t(spark, sf_dir, "orders")
    emitted = o.filter(F.col("o_totalprice") > 150000).select("o_orderkey").distinct()
    golden = o.filter(F.col("o_totalprice") > 100000).select("o_orderkey").distinct()
    m = emitted.join(golden, "o_orderkey").count()
    ne, ng = emitted.count(), golden.count()
    return spark.createDataFrame(
        [(round(m / ne, 6), round(m / ng, 6), ne, ng, m)],
        "precision double, recall double, n_emitted long, n_golden long, n_matched long",
    )


SQL_PRF_SCORE = """
WITH e AS (SELECT DISTINCT o_orderkey FROM orders WHERE o_totalprice > 150000),
     g AS (SELECT DISTINCT o_orderkey FROM orders WHERE o_totalprice > 100000),
     m AS (SELECT count(*) AS n FROM e JOIN g USING (o_orderkey))
SELECT round(m.n / (SELECT count(*) FROM e), 6) AS precision,
       round(m.n / (SELECT count(*) FROM g), 6) AS recall,
       (SELECT count(*) FROM e) AS n_emitted,
       (SELECT count(*) FROM g) AS n_golden,
       m.n AS n_matched
FROM m
"""


def _pii_text_parts(custkey, name_col):
    """Shared recipe for a natively-constructed PII-bearing text column:
    every component is SQL-expressible, so the REAL Python fused matcher
    (find_matches — the pipeline's Arrow-UDF core) can be hash-checked
    against per-type DuckDB regex extraction (VERDICT r01 next#8: a
    pipeline-level oracle on the highest-precision slice)."""
    from pie_spark.fixtures import gazetteer as gz

    local = F.regexp_replace(F.lower(name_col), "[^a-z0-9]", "")
    def pad(col, n):
        return F.lpad(col.cast("int").cast("string"), n, "0")
    streets = F.array(*[F.lit(s) for s in gz.STREET_NAMES])
    suffixes = F.array(*[F.lit(s) for s in gz.STREET_SUFFIXES])
    addr = F.concat(
        (custkey % 9999 + 1).cast("string"), F.lit(" "),
        F.element_at(streets, (custkey % 15 + 1).cast("int")), F.lit(" "),
        F.when(
            custkey % 3 == 0,
            F.concat(F.element_at(streets, (custkey * 5 % 15 + 1).cast("int")), F.lit(" ")),
        ).otherwise(F.lit("")),
        F.element_at(suffixes, (custkey % 11 + 1).cast("int")),
        F.when(custkey % 4 == 0, F.concat(F.lit(" Apt "), (custkey % 50 + 1).cast("string"))).otherwise(F.lit("")),
    )
    return F.concat(
        F.lit("Contact "), name_col,
        F.lit(" at "), local, F.lit("@example"), (custkey % 10).cast("string"), F.lit(".com"),
        F.lit(" or call ("), (custkey * 3 % 700 + 200).cast("string"), F.lit(") "),
        (custkey * 7 % 700 + 200).cast("string"), F.lit("-"), pad(custkey * 13 % 10000, 4),
        F.lit(" SSN "), pad(custkey * 7 % 1000, 3), F.lit("-"),
        pad(custkey % 100, 2), F.lit("-"), pad(custkey * 13 % 10000, 4),
        F.lit(" ref "), pad(custkey * 11 % 1000000000, 9),  # 9 digits, NOT an SSN
        F.lit(" bad 666-12-3456 near "), addr, F.lit(" today"),
    )


def _pii_text_sql() -> str:
    from pie_spark.fixtures import gazetteer as gz

    streets = "[" + ", ".join(f"'{s}'" for s in gz.STREET_NAMES) + "]"
    suffixes = "[" + ", ".join(f"'{s}'" for s in gz.STREET_SUFFIXES) + "]"
    pad = lambda e, n: f"lpad(CAST(CAST({e} AS INT) AS VARCHAR), {n}, '0')"
    addr = (
        f"CAST(c_custkey % 9999 + 1 AS VARCHAR) || ' ' || ({streets})[c_custkey % 15 + 1] || ' ' || "
        f"(CASE WHEN c_custkey % 3 = 0 THEN ({streets})[c_custkey * 5 % 15 + 1] || ' ' ELSE '' END) || "
        f"({suffixes})[c_custkey % 11 + 1] || "
        f"(CASE WHEN c_custkey % 4 = 0 THEN ' Apt ' || CAST(c_custkey % 50 + 1 AS VARCHAR) ELSE '' END)"
    )
    return (
        "'Contact ' || c_name || ' at ' || regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g')"
        " || '@example' || CAST(c_custkey % 10 AS VARCHAR) || '.com'"
        " || ' or call (' || CAST(c_custkey * 3 % 700 + 200 AS VARCHAR) || ') '"
        f" || CAST(c_custkey * 7 % 700 + 200 AS VARCHAR) || '-' || {pad('c_custkey * 13 % 10000', 4)}"
        f" || ' SSN ' || {pad('c_custkey * 7 % 1000', 3)} || '-' || {pad('c_custkey % 100', 2)}"
        f" || '-' || {pad('c_custkey * 13 % 10000', 4)}"
        f" || ' ref ' || {pad('c_custkey * 11 % 1000000000', 9)}"
        f" || ' bad 666-12-3456 near ' || {addr} || ' today'"
    )


def q_regex_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Arrow-batched Python matcher (M5 find_matches: combined
    alternation + SSN validity) hash-checked against DuckDB per-type
    regex extraction on a constructed corpus containing every PII type
    plus adversarial negatives (bare 9-digit id, invalid-area SSN)."""
    from pie_spark.extract.matchers import regex_matches

    # single-file fixture → repartition so the Arrow UDF parallelizes
    c = _t(spark, sf_dir, "customer").repartition(32, "c_custkey")
    spans = c.select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        F.lit(0).alias("span_idx"),
        F.lit(0).alias("offset"),
        _pii_text_parts(F.col("c_custkey"), F.col("c_name")).alias("text"),
    )
    m = regex_matches(spans)
    w = Window.partitionBy("doc_id", "mention_type").orderBy("start")
    return m.select(
        "doc_id", "mention_type", "surface",
        F.row_number().over(w).cast("long").alias("idx"),
    )


def _regex_mentions_sql() -> str:
    from pie_spark.extract.matchers import EMAIL_RE, PHONE_RE, SSN_RE, ADDRESS_RE

    # duckdb single-quoted literals do no backslash processing, so the
    # python regex strings pass through verbatim; only quotes double
    def lit(pattern: str) -> str:
        return pattern.replace("'", "''")

    ex = " UNION ALL".join(
        f"""
  SELECT doc_id, '{tname}' AS mention_type,
         unnest(regexp_extract_all(text, '{lit(pat)}')) AS surface,
         unnest(range(1, len(regexp_extract_all(text, '{lit(pat)}')) + 1)) AS ord
  FROM t"""
        for tname, pat in [
            ("EMAIL", EMAIL_RE), ("SSN", SSN_RE),
            ("PHONE", PHONE_RE), ("ADDRESS", ADDRESS_RE),
        ]
    )
    return f"""
WITH t AS (SELECT CAST(c_custkey AS VARCHAR) AS doc_id, {_pii_text_sql()} AS text FROM customer),
ex AS ({ex}),
valid AS (
  SELECT * FROM ex
  WHERE mention_type <> 'SSN' OR (
    substr(surface, 1, 3) NOT IN ('000', '666') AND substr(surface, 1, 3) < '900'
    AND substr(surface, 5, 2) <> '00' AND substr(surface, 8, 4) <> '0000')
)
SELECT doc_id, mention_type, surface,
       CAST(row_number() OVER (PARTITION BY doc_id, mention_type ORDER BY ord) AS BIGINT) AS idx
FROM valid
"""


# Gazetteer slice for the merged-mention oracle: a controlled surface
# list whose planted occurrences produce REAL overlap chains for T3/W3
# to adjudicate (two-hit chains, equal-length ties, a three-hit chain)
# while staying strpos-computable in DuckDB (each surface occurs at most
# once per doc, always space-flanked).
_GAZ_Q_SOLO = ["Alice Abernathy", "Hiro Takahashi", "Grace Whitfield"]
_GAZ_Q_OVERLAP_PHRASES = [
    "Mei Novak Petrov",        # "Mei Novak"(9) vs "Novak Petrov"(12) → longer wins
    "Diego Novak Ulloa",       # "Diego Novak"(11) vs "Novak Ulloa"(11) → tie → earlier start
    "Mei Novak Petrov Moreau", # 3-hit chain → single winner "Petrov Moreau"(13)
]
_GAZ_Q_SURFACES = [
    "Mei Novak", "Novak Petrov", "Diego Novak", "Novak Ulloa", "Petrov Moreau",
    *_GAZ_Q_SOLO,
]
# CRF-only planted pairs (r05): lexicon FIRST+LAST combinations that are
# NOT in _GAZ_Q_SURFACES and share no word with them — the tagger finds
# them, the 8-surface gazetteer cannot, so detector='crf' rows survive
# the priority merge into the hash-checked output. They are also NOT
# dictionary entities, so in the full-pipeline row they prove G3's
# precision guard (unlinked persons emit no triples).
_CRF_Q_NAMES = ["Katya Silveira", "Omar Lindqvist", "Freya Jankowski"]
# Dictionary-LINKED planted persons (r05 pipeline_triples_all): real
# entity_dict_df primary surfaces (entities 41 / 97 / 129), no word
# shared with any other planted list — these link, canonicalize, and
# anchor the W4 HAS_* pairing in the full-pipeline oracle.
_DICT_Q_NAMES = ["Benjamin Bergstrom", "Rosa Castellano", "Jamal Dumont"]


def _mentions_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII corpus + planted gazetteer phrases + CRF-only name pairs +
    dictionary-linked persons (SQL-mirrored lockstep)."""
    c = _t(spark, sf_dir, "customer").repartition(32, "c_custkey")
    k = F.col("c_custkey")
    pick = lambda xs: F.element_at(F.array(*[F.lit(s) for s in xs]), (k % 3 + 1).cast("int"))
    text = F.concat(
        F.lit("Met "), pick(_GAZ_Q_OVERLAP_PHRASES),
        F.lit(" and "), pick(_GAZ_Q_SOLO),
        F.lit(". Saw "), pick(_CRF_Q_NAMES),
        F.lit(" today. Knew "), pick(_DICT_Q_NAMES), F.lit(" well. "),
        _pii_text_parts(k, F.col("c_name")),
    )
    return c.select(
        k.cast("string").alias("doc_id"),
        F.lit(0).alias("span_idx"),
        F.lit(0).alias("offset"),
        text.alias("text"),
    )


def _mentions_corpus_sql() -> str:
    solo = "[" + ", ".join(f"'{s}'" for s in _GAZ_Q_SOLO) + "]"
    over = "[" + ", ".join(f"'{s}'" for s in _GAZ_Q_OVERLAP_PHRASES) + "]"
    crf = "[" + ", ".join(f"'{s}'" for s in _CRF_Q_NAMES) + "]"
    dct = "[" + ", ".join(f"'{s}'" for s in _DICT_Q_NAMES) + "]"
    return (
        f"'Met ' || ({over})[c_custkey % 3 + 1] || ' and ' || "
        f"({solo})[c_custkey % 3 + 1] || '. Saw ' || "
        f"({crf})[c_custkey % 3 + 1] || ' today. Knew ' || "
        f"({dct})[c_custkey % 3 + 1] || ' well. ' || {_pii_text_sql()}"
    )


def q_pipeline_mentions_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's COMPLETE merged-mention layer, every detector
    real: Arrow-batched regex matcher (M5) ∪ Aho-Corasick gazetteer
    (M6) ∪ **CRF Viterbi tagger (T2 — new r05)**, resolved by the REAL
    overlap-merge operator (T3/W3 window logic). The DuckDB mirror
    replays the ENTIRE chain independently — including the full Viterbi
    DP (tokenize → indicator features → integer emissions → recursive
    forward pass → backpointer backtrace → BIO assembly, see
    pie_spark/extract/tagger_sql.py; exact because the tagger's weights
    are integer deci-units) and the cross-detector priority
    adjudication (regex > gazetteer > crf). r03/r04 called the tagger
    "not SQL-expressible" and left pipeline_mentions rows-only; this
    row closes that gap on the SQL-expressible corpus (the generator
    corpus itself remains the only non-mirrorable piece). Output keys
    on absolute (start, end) offsets, so chain bridging by CRF spans
    (a tagger mention can merge two gazetteer chains into one) is
    hash-visible."""
    from pie_spark.extract.gazetteer import gazetteer_matches
    from pie_spark.extract.matchers import regex_matches
    from pie_spark.extract.merge import merge_mentions
    from pie_spark.extract.tagger import crf_matches

    spans = _mentions_corpus(spark, sf_dir)
    merged = merge_mentions(
        regex_matches(spans),
        gazetteer_matches(spans, spark, _GAZ_Q_SURFACES),
        crf_matches(spans),
    )
    return merged.select(
        "doc_id", "mention_type", "surface", "detector",
        F.col("start").cast("long").alias("start"),
        F.col("end").cast("long").alias("end"),
    )


def _merged_mention_ctes(gaz_surfaces: list[str]) -> str:
    """Shared CTE chain replaying the FULL T3 merge across all three
    detectors, ending in ``win`` (merged mentions: doc_id,
    mention_type, surface, detector, s, e): union of regex (positions
    via strpos — every regex surface occurs exactly once per
    constructed doc), gazetteer over ``gaz_surfaces`` (strpos + alnum
    flank guard ≡ the automaton semantic), and the recursive-CTE
    Viterbi mentions; then the exact Spark chain logic — running
    max(end) over (start asc, end desc, detector asc, type asc) splits
    chains, winner per chain by (priority asc, length desc, start asc,
    surface asc, detector asc). Expects CTE ``t(doc_id, text)``;
    embed under WITH RECURSIVE."""
    from pie_spark.extract.matchers import ADDRESS_RE, EMAIL_RE, PHONE_RE, SSN_RE
    from pie_spark.extract.tagger_sql import crf_sql_ctes

    def lit(pattern: str) -> str:
        return pattern.replace("'", "''")

    rx = " UNION ALL".join(
        f"""
  SELECT doc_id, '{tname}' AS mention_type,
         unnest(regexp_extract_all(text, '{lit(pat)}')) AS surface
  FROM t"""
        for tname, pat in [
            ("EMAIL", EMAIL_RE), ("SSN", SSN_RE),
            ("PHONE", PHONE_RE), ("ADDRESS", ADDRESS_RE),
        ]
    )
    surfaces = ", ".join(
        "('" + s.replace("'", "''") + "')" for s in gaz_surfaces
    )
    return f"""
{crf_sql_ctes('t').strip()},
rx AS ({rx}),
rx_valid AS (
  SELECT * FROM rx
  WHERE mention_type <> 'SSN' OR (
    substr(surface, 1, 3) NOT IN ('000', '666') AND substr(surface, 1, 3) < '900'
    AND substr(surface, 5, 2) <> '00' AND substr(surface, 8, 4) <> '0000')
),
rxp AS (
  SELECT r.doc_id, r.mention_type, r.surface, 'regex' AS detector,
         strpos(t.text, r.surface) - 1 AS s,
         strpos(t.text, r.surface) - 1 + length(r.surface) AS e
  FROM rx_valid r JOIN t USING (doc_id)
),
gaz_hits AS (
  SELECT t.doc_id, t.text, s.surface,
         strpos(t.text, s.surface) - 1 AS s,
         strpos(t.text, s.surface) - 1 + length(s.surface) AS e
  FROM t CROSS JOIN (VALUES {surfaces}) s(surface)
  WHERE strpos(t.text, s.surface) > 0
),
gb AS (
  SELECT doc_id, 'PERSON' AS mention_type, surface, 'gazetteer' AS detector, s, e
  FROM gaz_hits
  WHERE (s = 0 OR NOT regexp_matches(substr(text, s, 1), '[A-Za-z0-9]'))
    AND (e >= length(text) OR NOT regexp_matches(substr(text, e + 1, 1), '[A-Za-z0-9]'))
),
allm AS (
  SELECT * FROM rxp
  UNION ALL SELECT * FROM gb
  UNION ALL SELECT doc_id, mention_type, surface, 'crf' AS detector, s, e
            FROM crf_mentions
),
ch AS (
  SELECT *,
         CASE WHEN max(e) OVER w_prev IS NULL OR s >= max(e) OVER w_prev
              THEN 1 ELSE 0 END AS new_group
  FROM allm
  WINDOW w_prev AS (PARTITION BY doc_id
                    ORDER BY s ASC, e DESC, detector ASC, mention_type ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
grp AS (
  SELECT *, sum(new_group) OVER (PARTITION BY doc_id
                ORDER BY s ASC, e DESC, detector ASC, mention_type ASC
                ROWS UNBOUNDED PRECEDING) AS g
  FROM ch
),
win AS MATERIALIZED (
  SELECT * FROM grp
  QUALIFY row_number() OVER (PARTITION BY doc_id, g
     ORDER BY CASE detector WHEN 'regex' THEN 1 WHEN 'gazetteer' THEN 2 ELSE 3 END ASC,
              (e - s) DESC, s ASC, surface ASC, detector ASC) = 1
)"""


def _pipeline_mentions_all_sql() -> str:
    return f"""
WITH RECURSIVE
t AS MATERIALIZED (SELECT CAST(c_custkey AS VARCHAR) AS doc_id, {_mentions_corpus_sql()} AS text
      FROM customer),
{_merged_mention_ctes(_GAZ_Q_SURFACES).strip()}
SELECT doc_id, mention_type, surface, detector,
       CAST(s AS BIGINT) AS "start", CAST(e AS BIGINT) AS "end"
FROM win
"""


def q_pipeline_triples_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE WHOLE PIPELINE hash-checked cross-engine (r05). Runs the
    REAL ``pipeline.run`` — fused Arrow detector stage (regex ∪
    full-dictionary Aho-Corasick gazetteer ∪ CRF Viterbi), T3 merge,
    J1/J2 broadcast linking with jaccard/prior scoring, G1 CC
    canonicalization, W4 nearest-preceding PII pairing, G3 triple
    materialization with A5 dedup — over the SQL-constructed corpus
    with DOC_SCHEMA single-span docs and the REAL entity dictionary.
    The oracle replays every stage independently in DuckDB: the merged
    mentions via _merged_mention_ctes (full ~900-surface dictionary as
    the gazetteer), linking as a VALUES join + the identical
    left-associated float score, canonicalization via the recursive-CTE
    closure, pairing via IGNORE-NULLS running windows, and the final
    dedup. The corpus plants linked persons (dictionary entities),
    unlinked CRF-only persons (G3's precision guard — they must emit
    NOTHING), and shared-surface entities (ambiguous linking + CC
    canonical election). pipeline_triples (generator corpus) stays
    rows-only ONLY because the numpy corpus generator is not SQL.

    Folds top1_candidate out of the driver registry (fold policy,
    tests/test_oracle.py): J2/W1 top-1 selection is exercised here on
    real pipeline output; the standalone query keeps its full
    hash-checked oracle in FOLDED."""
    from pie_spark.config import PipelineConfig
    from pie_spark.fixtures.gen import entity_dict_df
    from pie_spark.pipeline import run

    spans = _mentions_corpus(spark, sf_dir)
    docs = spans.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    res = run(spark, PipelineConfig(), docs, entity_dict_df(spark))
    return res.triples


def _pipeline_triples_all_sql() -> str:
    from pie_spark.fixtures.gazetteer import dictionary_entries

    entries = sorted(
        {(e.surface, e.norm_key, e.entity_id, e.prior) for e in dictionary_entries()}
    )
    def _q(v: str) -> str:
        return v.replace("'", "''")

    dict_vals = ",\n".join(
        f"('{_q(s)}', '{_q(k)}', '{_q(eid)}', CAST({p!r} AS DOUBLE))"
        for s, k, eid, p in entries
    )
    gaz_surfaces = sorted({e.surface for e in dictionary_entries()})
    jac = (
        "CAST(len(list_intersect(string_split(lower(surface), ' '),"
        " string_split(lower(dict_surface), ' '))) AS DOUBLE)"
        " / len(list_distinct(list_concat(string_split(lower(surface), ' '),"
        " string_split(lower(dict_surface), ' '))))"
    )
    return f"""
WITH RECURSIVE
t AS MATERIALIZED (SELECT CAST(c_custkey AS VARCHAR) AS doc_id, {_mentions_corpus_sql()} AS text
      FROM customer),
{_merged_mention_ctes(gaz_surfaces).strip()},
pdict(dict_surface, norm_key, entity_id, prior) AS (VALUES {dict_vals}),
pm AS (
  SELECT doc_id, s, e, surface,
         trim(regexp_replace(lower(surface), '[^a-z0-9]+', ' ', 'g')) AS norm_key
  FROM win WHERE mention_type = 'PERSON'
),
sc AS (
  SELECT pm.doc_id, pm.s, pm.e, pm.norm_key, d.entity_id,
         CAST(0.4 AS DOUBLE) * (CASE WHEN pm.surface = d.dict_surface
                                     THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)
         + CAST(0.3 AS DOUBLE) * ({jac})
         + CAST(0.3 AS DOUBLE) * d.prior AS link_score
  FROM pm JOIN pdict d USING (norm_key)
),
best AS (
  SELECT * FROM sc
  QUALIFY row_number() OVER (PARTITION BY doc_id, s, e
                             ORDER BY link_score DESC, entity_id ASC) = 1
),
kcanon AS ({_cc_canonical_map_sql()}),
linked AS MATERIALIZED (
  SELECT b.doc_id, b.s, b.link_score, k.canon_entity_id
  FROM best b JOIN kcanon k USING (norm_key)
),
ev AS (
  SELECT doc_id, s AS goff, canon_entity_id AS person, link_score,
         CAST(NULL AS VARCHAR) AS pii_type, CAST(NULL AS VARCHAR) AS pii_value
  FROM linked
  UNION ALL
  SELECT doc_id, s, NULL, NULL, mention_type, surface
  FROM win
  WHERE detector = 'regex'
    AND mention_type IN ('EMAIL', 'SSN', 'PHONE', 'ADDRESS')
),
pr AS (
  SELECT *, last_value(person IGNORE NULLS) OVER w AS prev_person,
            last_value(link_score IGNORE NULLS) OVER w AS prev_score
  FROM ev
  WINDOW w AS (PARTITION BY doc_id ORDER BY goff
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
pii_t AS (
  SELECT prev_person AS subj, 'HAS_' || pii_type AS pred, pii_value AS obj,
         'PERSON' AS subj_type, pii_type AS obj_type, doc_id,
         prev_score AS confidence
  FROM pr WHERE pii_type IS NOT NULL AND prev_person IS NOT NULL
),
men_t AS (
  SELECT doc_id AS subj, 'MENTIONS' AS pred, canon_entity_id AS obj,
         'DOC' AS subj_type, 'PERSON' AS obj_type, doc_id,
         link_score AS confidence
  FROM linked
)
SELECT subj, pred, obj, max(subj_type) AS subj_type, max(obj_type) AS obj_type,
       doc_id, max(confidence) AS confidence
FROM (SELECT * FROM men_t UNION ALL SELECT * FROM pii_t)
GROUP BY subj, pred, obj, doc_id
"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the constructed corpus: detect with the REAL
    fused Python matcher, splice typed placeholders with the native
    offset-fold operator. Hash-checked against chained DuckDB
    regexp_replace (with the validity rule as a pure regular language),
    which is equivalent because merged mentions never overlap."""
    from pie_spark.extract.matchers import regex_matches
    from pie_spark.extract.redact import redact_spans

    c = _t(spark, sf_dir, "customer").repartition(32, "c_custkey")
    spans = c.select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        F.lit(0).alias("span_idx"),
        F.lit(0).alias("offset"),
        _pii_text_parts(F.col("c_custkey"), F.col("c_name")).alias("text"),
    )
    m = regex_matches(spans).select(
        "doc_id", "span_idx", "start", "end", "mention_type"
    )
    return redact_spans(spans, m).select("doc_id", "redacted")


def _redact_pii_sql() -> str:
    from pie_spark.extract.matchers import (
        ADDRESS_RE,
        EMAIL_RE,
        PHONE_RE,
        SSN_VALID_RE,
    )

    def lit(p: str) -> str:
        return p.replace("'", "''")

    out = "text"
    for tname, pat in [
        ("EMAIL", EMAIL_RE), ("SSN", SSN_VALID_RE),
        ("PHONE", PHONE_RE), ("ADDRESS", ADDRESS_RE),
    ]:
        out = f"regexp_replace({out}, '{lit(pat)}', '[{tname}]', 'g')"
    return f"""
WITH t AS (SELECT CAST(c_custkey AS VARCHAR) AS doc_id, {_pii_text_sql()} AS text FROM customer)
SELECT doc_id, {out} AS redacted FROM t
"""


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (salted-md5 buckets —
    stable under resharding, the anti-eval-leak property)."""
    from pie_spark.prep.splits import assign_splits

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return assign_splits(d, weights={"train": 0.9, "val": 0.05, "test": 0.05})


SQL_SPLIT_ASSIGN = """
WITH b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT
           % 1000000 AS split_bucket
  FROM documents
)
SELECT doc_id, split_bucket,
       CASE WHEN split_bucket < 900000 THEN 'train'
            WHEN split_bucket < 950000 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (per-shard token stream cut
    into fixed budgets) — one shuffle + one window cumsum."""
    from pie_spark.prep.packing import pack_concat_chunks

    return pack_concat_chunks(_t(spark, sf_dir, "documents"), budget_tokens=512, n_shards=8)


def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (32-token chunks, stride 24 → 8-token
    overlap) — the RAG/context-window chunker, one scan, no shuffle."""
    from pie_spark.prep.packing import chunk_with_overlap

    return chunk_with_overlap(
        _tp(spark, sf_dir, "documents"), chunk_tokens=32, stride=24
    )


SQL_CHUNK_OVERLAP = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, toks,
         unnest(range(greatest(CAST(ceil(len(toks) / 24.0) AS INT), 1))) AS i
  FROM t
),
c AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         array_to_string(list_slice(toks, i * 24 + 1, i * 24 + 32), ' ') AS chunk_text
  FROM s
)
SELECT doc_id, chunk_idx,
       CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_tokens,
       chunk_text
FROM c WHERE chunk_text <> ''
"""


SQL_PACK_CHUNKS = """
WITH b AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT
              % 8 AS INT) AS shard,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
s AS (
  -- CAST to BIGINT: DuckDB's windowed sum(BIGINT) yields HUGEINT, which
  -- pandas renders float64 and the driver's value-hash sees 1500.0 vs
  -- 1500 (the one red cell in CORRECTNESS_r02)
  SELECT doc_id, shard, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
  FROM b
)
SELECT doc_id, shard, n_tokens, start_token,
       CAST(start_token // 512 AS BIGINT) AS chunk_id,
       CAST(start_token % 512 AS BIGINT) AS chunk_offset
FROM s
"""


# ---------------------------------------------------------------------------
# training-data pipeline operators (dedup / similarity / text analysis)
# ---------------------------------------------------------------------------

# lockstep mirror of pie_spark.dedup.shingles.norm_text: Unicode
# letter/number classes (RE2 == Java regex here, parity-verified) with
# raw-text fallback when normalization yields ''
_DUCK_NORM = (
    "coalesce(nullif(trim(regexp_replace(replace(lower(text), 'ς', 'σ'), "
    "'[^\\p{L}\\p{N} ]', '', 'g')), ''), text)"
)
_DUCK_TOKS = f"string_split({_DUCK_NORM}, ' ')"
_DUCK_SHINGLES = (
    "list_distinct(list_transform(range(greatest(len(toks)-3,0)+1), "
    "i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3])))"
)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs sharing ≥1 word-3-gram with the
    'benchmark' slice (doc_id ≡ 0 mod 20) are flagged with hit counts."""
    from pie_spark.prep.decontam import contamination_hits

    # the fixture table is ONE parquet file → one scan task; repartition
    # so the shingle pass parallelizes (real corpora have many files)
    d = _t(spark, sf_dir, "documents").repartition(32, "doc_id")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    return contamination_hits(corpus, bench, n=3, min_overlap=1)


SQL_DECONTAMINATE = f"""
WITH bench_base AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents WHERE doc_id % 20 = 0),
corp_base AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents WHERE doc_id % 20 <> 0),
bench AS (SELECT DISTINCT unnest(sh) AS shingle
          FROM (SELECT {_DUCK_SHINGLES} AS sh FROM bench_base) _ ),
corp AS (SELECT doc_id, unnest(sh) AS shingle
         FROM (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM corp_base) _ )
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM corp JOIN bench USING (shingle)
GROUP BY doc_id
HAVING count(*) >= 1
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pie_spark.text.analysis import token_counts

    return token_counts(_t(spark, sf_dir, "documents"))


SQL_TOKEN_COUNTS = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens
FROM documents
"""


_QUANTILE_PROBS_PPM = [250000, 500000, 750000, 900000, 990000]


def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus token-length quantiles (r06, folded oracle): the
    distributed inverse-CDF operator — groupBy(value) partial-agg
    shuffle of V distinct values (never N rows), cumulative window
    over the V-row table, integer ppm rank thresholds so the same
    arithmetic is exact in both engines at any N
    (text/analysis.py:exact_quantiles)."""
    from pie_spark.text.analysis import exact_quantiles, token_counts

    tc = token_counts(_t(spark, sf_dir, "documents"))
    return exact_quantiles(tc, "n_tokens", _QUANTILE_PROBS_PPM)


SQL_LENGTH_QUANTILES = f"""
WITH counts AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v, count(*) AS c
  FROM documents GROUP BY 1
),
cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM counts),
tot AS (SELECT sum(c) AS n FROM counts)
SELECT p_ppm, min(v) AS value
FROM cum, tot,
     (VALUES {", ".join(f"({p})" for p in _QUANTILE_PROBS_PPM)}) AS probs(p_ppm)
WHERE cum >= (p_ppm * n + 999999) // 1000000
GROUP BY p_ppm
"""


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pie_spark.text.analysis import quality_scores

    return quality_scores(_t(spark, sf_dir, "documents"))


def _hits_sql(word: str) -> str:
    pad = f"(' ' || text || ' ')"
    return (
        f"CAST((length({pad}) - length(regexp_replace({pad}, ' {word} ', ' ', 'g')))"
        f" / {len(word) + 1} AS INT)"
    )


SQL_QUALITY_SCORES = f"""
WITH t AS (
  SELECT doc_id, text,
         length(text) AS n_chars_m,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         length(text) - length(regexp_replace(text, '[^\\p{{L}}\\p{{N}} ]', '', 'g')) AS punct,
         {_hits_sql('the')} + {_hits_sql('and')} + {_hits_sql('of')} + {_hits_sql('a')} AS stop_hits
  FROM documents
), p AS (
  SELECT doc_id, n_chars_m, n_tokens,
         CAST(floor(punct * 1000000 / greatest(n_chars_m, 1)) AS BIGINT) AS punct_ppm,
         CAST(floor(stop_hits * 1000000 / greatest(n_tokens, 1)) AS BIGINT) AS stopword_ppm,
         CAST(floor(n_distinct * 1000000 / greatest(n_tokens, 1)) AS BIGINT) AS ttr_ppm,
         least(CAST(floor(n_chars_m * 1000000 / 400) AS BIGINT), 1000000) AS len_ppm
  FROM t
)
SELECT doc_id,
       CAST(n_chars_m AS BIGINT) AS n_chars_m,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       punct_ppm, stopword_ppm, ttr_ppm,
       CAST(floor(len_ppm * 2 / 5)
            + floor(least(stopword_ppm * 5, 1000000) * 3 / 10)
            + floor((1000000 - punct_ppm) * 3 / 10) AS BIGINT) AS quality_ppm
FROM p
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pie_spark.text.analysis import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


def _script_cnt_sql(cls: str) -> str:
    # RE2 spells scripts \p{X} (vs Java's \p{IsX}) — same property
    return f"length(text) - length(regexp_replace(text, '{cls}', '', 'g'))"


def _lang_id_sql() -> str:
    from pie_spark.text.analysis import KANA_RE2, LANG_STOPWORDS, LATIN_RE2, SCRIPT_LANGS

    hit_exprs = {
        lang: " + ".join(_hits_sql(w) for w in words)
        for lang, words in LANG_STOPWORDS.items()
    }
    cols = ", ".join(
        f"CAST({e} AS BIGINT) AS hits_{lang}" for lang, e in hit_exprs.items()
    )
    script_cols = ", ".join(
        f"{_script_cnt_sql(re2)} AS sc_{lang}" for lang, _j, re2, _r in SCRIPT_LANGS
    )
    # stopword argmax with asc-lang tiebreak — mirror Spark's
    # sort-by-(neg_hits, lang)-take-first pick exactly
    structs = ", ".join(
        f"{{'neg_hits': -hits_{lang}, 'lang': '{lang}'}}" for lang in hit_exprs
    )
    # dominant-script argmax (neg count, rank, lang) with Latin at rank 0
    # carrying the stopword guess — lockstep with analysis.lang_id
    script_structs = ", ".join(
        [f"{{'neg': -sc_latin, 'rank': 0, 'lang': stop_guess}}"]
        + [
            f"{{'neg': -sc_{lang}, 'rank': {rank}, 'lang': '{lang}'}}"
            for lang, _j, _re2, rank in SCRIPT_LANGS
        ]
    )
    return f"""
WITH t AS (SELECT doc_id, {cols}, {script_cols},
                  {_script_cnt_sql(KANA_RE2)} AS sc_kana,
                  {_script_cnt_sql(LATIN_RE2)} AS sc_latin
           FROM documents),
g AS (SELECT *, list_sort([{structs}])[1].lang AS stop_guess FROM t)
SELECT doc_id, {', '.join(f'hits_{lang}' for lang in hit_exprs)},
       CASE WHEN sc_kana > 0 THEN 'ja'
            ELSE list_sort([{script_structs}])[1].lang END AS lang_guess
FROM g
"""


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pie_spark.text.analysis import fingerprints

    return fingerprints(_tp(spark, sf_dir, "documents"))


SQL_FINGERPRINTS = f"""
WITH t AS (SELECT doc_id, {_DUCK_NORM} AS norm, {_DUCK_TOKS} AS toks FROM documents)
SELECT doc_id, md5(norm) AS content_md5,
       list_min(list_transform({_DUCK_SHINGLES}, s -> md5(s))) AS min_shingle_md5
FROM t
"""


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+X3+X4 in one driver row: token counts ⨝ quality scores ⨝
    fingerprints on doc_id. Consolidated so every operator keeps a row
    inside the driver's 50-query hard-signal cap (VERDICT r03 next#2);
    each component is still unit-tested standalone and its original SQL
    mirror is reused verbatim as a CTE here."""
    from pie_spark.text.analysis import fingerprints, quality_scores, token_counts

    d = _tp(spark, sf_dir, "documents")
    tc = token_counts(d)
    qs = quality_scores(d).drop("n_tokens")  # same value as tc.n_tokens
    fp = fingerprints(d)
    return tc.join(qs, "doc_id").join(fp, "doc_id")


def _doc_stats_sql() -> str:
    return f"""
WITH tc AS ({SQL_TOKEN_COUNTS}),
qs AS ({SQL_QUALITY_SCORES}),
fp AS ({SQL_FINGERPRINTS})
SELECT tc.doc_id, tc.n_tokens, tc.n_bpe_est, tc.n_distinct_tokens,
       qs.n_chars_m, qs.punct_ppm, qs.stopword_ppm, qs.ttr_ppm, qs.quality_ppm,
       fp.content_md5, fp.min_shingle_md5
FROM tc JOIN qs ON tc.doc_id = qs.doc_id JOIN fp ON tc.doc_id = fp.doc_id
"""


def q_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X15: bigram-LM perplexity scoring (CCNet-style quality gate) —
    model fit on the doc_id%4==0 reference slice, every doc charged its
    mean per-bigram cost in micro-bits. Float work happens once per
    MODEL ROW; per-doc reduction sums exact longs (partitioning- and
    engine-independent)."""
    from pie_spark.text.lm import fit_bigram_lm, score_docs

    d = _tp(spark, sf_dir, "documents")
    lm = fit_bigram_lm(d.filter(F.col("doc_id") % 4 == 0), add_k=0.5)
    return score_docs(d, lm)


def _lm_scores_sql(add_k: float = 0.5) -> str:
    ln2 = "0.6931471805599453"
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter({_DUCK_TOKS}, x -> x <> '') AS toks FROM documents
),
ref AS (SELECT toks FROM toks WHERE doc_id % 4 = 0),
uni AS (
  SELECT w1, count(*) AS c1
  FROM (SELECT unnest(toks) AS w1 FROM ref) _ GROUP BY 1
),
vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
ref_bi AS (
  SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c12
  FROM (SELECT unnest(list_transform(range(1, len(toks)),
                                     i -> {{'w1': toks[i], 'w2': toks[i+1]}})) AS b
        FROM ref) _ GROUP BY 1, 2
),
cost AS (
  SELECT w1, w2,
         CAST(round(-(ln({add_k} + c12) - ln(c1 + {add_k} * v)) / {ln2} * 1000000)
              AS BIGINT) AS cost_micro
  FROM ref_bi JOIN uni USING (w1), vv
),
doc_bi AS (
  SELECT doc_id, b.w1 AS w1, b.w2 AS w2
  FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                                             i -> {{'w1': toks[i], 'w2': toks[i+1]}})) AS b
        FROM toks) _
),
charged AS (
  SELECT doc_id,
         coalesce(cost.cost_micro,
                  CASE WHEN uni.c1 IS NOT NULL THEN
                    CAST(round(-(ln({add_k}) - ln(uni.c1 + {add_k} * vv.v)) / {ln2} * 1000000)
                         AS BIGINT) END,
                  CAST(round(ln(vv.v) / {ln2} * 1000000) AS BIGINT)) AS pc
  FROM doc_bi
  LEFT JOIN cost USING (w1, w2)
  LEFT JOIN uni USING (w1), vv
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(floor(CAST(sum(pc) AS BIGINT) / count(*)) AS BIGINT) AS lm_cost_micro
  FROM charged GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_bigrams, 0) AS n_bigrams,
       coalesce(a.lm_cost_micro,
                (SELECT CAST(round(ln(v) / {ln2} * 1000000) AS BIGINT) FROM vv)) AS lm_cost_micro
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide passage-level dedup map (C4-style sub-document
    dedup); fixtures have no line structure, so 3-word blocks stand in
    for lines (the operator's delimiter mode is tested in
    tests/test_passages.py)."""
    from pie_spark.dedup.passages import passage_dedup_map

    return passage_dedup_map(_tp(spark, sf_dir, "documents"), block_words=3)


SQL_PASSAGE_DEDUP = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
seg0 AS (
  SELECT doc_id, toks,
         unnest(range(greatest(CAST(ceil(len(toks) / 3.0) AS INT), 1))) AS i
  FROM t
),
seg AS (
  SELECT doc_id, CAST(i AS INT) AS passage_idx,
         array_to_string(list_slice(toks, i * 3 + 1, i * 3 + 3), ' ') AS passage
  FROM seg0
),
p AS (SELECT doc_id, passage_idx, md5(passage) AS passage_md5,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                   CAST(passage_idx AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT AS occ
      FROM seg WHERE passage <> ''),
f AS (SELECT passage_md5, min(occ) AS first_occ FROM p GROUP BY 1)
SELECT doc_id, passage_idx, passage_md5, occ <> first_occ AS is_dup
FROM p JOIN f USING (passage_md5)
"""


def q_passage_dedup_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents rebuilt without corpus-duplicate passages (order
    preserved) — the O1 reassembly pattern applied to sub-doc dedup."""
    from pie_spark.dedup.passages import dedup_passages_text

    return dedup_passages_text(_tp(spark, sf_dir, "documents"), block_words=3)


SQL_PASSAGE_DEDUP_TEXT = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
seg0 AS (
  SELECT doc_id, toks,
         unnest(range(greatest(CAST(ceil(len(toks) / 3.0) AS INT), 1))) AS i
  FROM t
),
seg AS (
  SELECT doc_id, CAST(i AS INT) AS passage_idx,
         array_to_string(list_slice(toks, i * 3 + 1, i * 3 + 3), ' ') AS passage
  FROM seg0
),
p AS (SELECT doc_id, passage_idx, passage, md5(passage) AS passage_md5,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                   CAST(passage_idx AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT AS occ
      FROM seg WHERE passage <> ''),
f AS (SELECT passage_md5, min(occ) AS first_occ FROM p GROUP BY 1)
SELECT doc_id, string_agg(passage, ' ' ORDER BY passage_idx) AS text
FROM p JOIN f USING (passage_md5)
WHERE occ = first_occ
GROUP BY doc_id
"""


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 corpus vocabulary with tf+df (k < fixture vocab size so
    the deterministic (tf desc, token asc) cut actually bites)."""
    from pie_spark.text.vocab import vocab_topk

    return vocab_topk(_tp(spark, sf_dir, "documents"), k=25)


SQL_VOCAB_TOPK = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
f AS (SELECT token, doc_id, count(*) AS n FROM toks WHERE token <> '' GROUP BY 1, 2),
v AS (SELECT token, CAST(sum(n) AS BIGINT) AS tf, CAST(count(*) AS BIGINT) AS df
      FROM f GROUP BY 1)
SELECT token, tf, df FROM v ORDER BY tf DESC, token ASC LIMIT 25
"""


BPE_N_MERGES = 24
_BPE_LAST_SF_DIR: str | None = None


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (r06 operator, born folded —
    registry at the 50 cap): the merge table (rank, left, right,
    pair_count) trained by the native-DataFrame Sennrich loop
    (pie_spark/text/bpe.py — one corpus-sized word-frequency pass, then
    vocabulary-sized iterations only). The oracle replays training in
    the independent plain-Python trainer over DuckDB-read word
    frequencies from the SAME parquet and inlines the merge sequence as
    VALUES (the trained-IVF Lloyd-replay precedent), so the row checks
    Spark-BPE ≡ Python-BPE on identical input, every rank."""
    from pie_spark.text.bpe import train_bpe

    global _BPE_LAST_SF_DIR
    _BPE_LAST_SF_DIR = sf_dir
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    return train_bpe(docs, n_merges=BPE_N_MERGES)


def _bpe_merges_sql() -> str:
    """Lazy oracle: independent Python BPE replay over word frequencies
    DuckDB reads from the same documents parquet q_bpe_merges trained
    on (same split semantics: literal single-space split, empties
    dropped)."""
    import os

    import duckdb

    from pie_spark.text.bpe import train_bpe_reference

    base = _BPE_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    wf = con.execute(
        f"""
        SELECT word, COUNT(*)::BIGINT AS freq FROM (
          SELECT unnest(string_split(text, ' ')) AS word
          FROM read_parquet('{base}/documents.parquet')
        ) WHERE word <> '' GROUP BY word
        """
    ).fetchall()
    con.close()
    merges = train_bpe_reference(
        [(w, int(f)) for w, f in wf], n_merges=BPE_N_MERGES
    )

    def _q(v: str) -> str:
        return v.replace("'", "''")

    values = ",\n".join(
        f"(CAST({rank} AS INTEGER), '{_q(l)}', '{_q(r)}', CAST({n} AS BIGINT))"
        for rank, l, r, n in merges
    )
    return (
        f'SELECT * FROM (VALUES {values}) '
        f'AS t("rank", "left", "right", pair_count)'
    )


PAGERANK_ITERS = 10


def q_pagerank_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-importance PageRank over the canonical alias graph (r06
    KG-analytics operator, born folded — registry at the 50 cap):
    exact-integer power iteration (graph/pagerank.py) on the bipartite
    norm_key↔entity dictionary graph, both edge directions so neither
    side is a mass sink. The oracle replays the identical integer
    recipe in the independent plain-Python implementation over the
    closed-form dictionary (the cc_canonical_map VALUES precedent) —
    the row checks Spark-PR ≡ Python-PR at every node, every unit."""
    from pie_spark.canon.edges import build_edges
    from pie_spark.fixtures.gen import entity_dict_df
    from pie_spark.graph.pagerank import pagerank

    fwd = build_edges(entity_dict_df(spark))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank(edges, iters=PAGERANK_ITERS)


def _pagerank_entities_sql() -> str:
    """Lazy oracle: plain-Python PageRank replay over the closed-form
    dictionary edge set, inlined as VALUES."""
    from pie_spark.fixtures.gazetteer import dictionary_entries
    from pie_spark.graph.pagerank import pagerank_reference

    fwd = sorted(
        {(f"k:{e.norm_key}", f"e:{e.entity_id}") for e in dictionary_entries()}
    )
    edge_list = fwd + [(d, s) for s, d in fwd]
    ranks = pagerank_reference(edge_list, iters=PAGERANK_ITERS)

    def _q(v: str) -> str:
        return v.replace("'", "''")

    values = ",\n".join(
        f"('{_q(n)}', CAST({r} AS BIGINT))" for n, r in sorted(ranks.items())
    )
    return f"SELECT * FROM (VALUES {values}) AS t(node, rank_ppb)"


def q_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: data-quality constraint report over the relational fixtures
    (r06, born folded — registry at the 50 cap): uniqueness, not-null,
    accepted-values, and referential integrity as exact violation
    counts. Three rules pass at zero, three report REAL fixture
    properties (the generator's lineitem has no unique line key —
    25,953 rows share a (orderkey, linenumber); the validator is doing
    its job), and one planted-duplicate probe exercises the failing
    path deliberately. The oracle recomputes every count in direct
    SQL."""
    from pie_spark.io.quality import (
        check_accepted_values,
        check_not_null,
        check_ref_integrity,
        check_unique,
        validate,
    )

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")
    dup_events = ev.unionByName(ev.orderBy("event_id").limit(5))  # planted duplicates
    rules = [
        ("customer.c_custkey unique", check_unique(cust, ["c_custkey"])),
        ("orders.o_orderkey unique", check_unique(orders, ["o_orderkey"])),
        (
            # REAL finding: the synthetic generator draws line numbers
            # randomly, so this key is NOT unique — kept as an honest
            # nonzero report (both engines agree on the exact count)
            "lineitem (o,line) unique [real finding]",
            check_unique(li, ["l_orderkey", "l_linenumber"]),
        ),
        (
            "lineitem keys not null",
            check_not_null(li, ["l_orderkey", "l_linenumber", "l_partkey"]),
        ),
        ("orders.o_custkey not null", check_not_null(orders, ["o_custkey"])),
        (
            "orders→customer ref integrity",
            check_ref_integrity(orders, "o_custkey", cust, "c_custkey"),
        ),
        (
            "lineitem→orders ref integrity",
            check_ref_integrity(li, "l_orderkey", orders, "o_orderkey"),
        ),
        (
            "events.event_type accepted",
            check_accepted_values(
                ev, "event_type",
                ["click", "view", "purchase", "error", "signup"],
            ),
        ),
        (
            "events+5dups unique (planted fail)",
            check_unique(dup_events, ["event_id"]),
        ),
    ]
    return validate(spark, rules)


def _quality_checks_sql() -> str:
    return """
WITH evdup AS (
  SELECT event_id FROM events
  UNION ALL
  SELECT event_id FROM (SELECT event_id FROM events ORDER BY event_id LIMIT 5) _
),
r AS (
  SELECT 'customer.c_custkey unique' AS rule,
         (SELECT coalesce(sum(c), 0) FROM (SELECT count(*) AS c FROM customer GROUP BY c_custkey HAVING count(*) > 1) _) AS violations
  UNION ALL SELECT 'orders.o_orderkey unique',
         (SELECT coalesce(sum(c), 0) FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1) _)
  UNION ALL SELECT 'lineitem (o,line) unique [real finding]',
         (SELECT coalesce(sum(c), 0) FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1) _)
  UNION ALL SELECT 'lineitem keys not null',
         (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL OR l_linenumber IS NULL OR l_partkey IS NULL)
  UNION ALL SELECT 'orders.o_custkey not null',
         (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
  UNION ALL SELECT 'orders→customer ref integrity',
         (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
  UNION ALL SELECT 'lineitem→orders ref integrity',
         (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL SELECT 'events.event_type accepted',
         (SELECT count(*) FROM events WHERE event_type IS NOT NULL
            AND event_type NOT IN ('click', 'view', 'purchase', 'error', 'signup'))
  UNION ALL SELECT 'events+5dups unique (planted fail)',
         (SELECT coalesce(sum(c), 0) FROM (SELECT count(*) AS c FROM evdup GROUP BY event_id HAVING count(*) > 1) _)
)
SELECT rule, CAST(violations AS BIGINT) AS violations, violations = 0 AS passed FROM r
"""


def q_fuzzy_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7: fuzzy gazetteer linking (r06, born folded — registry at the
    50 cap): every dictionary norm_key is corrupted with a
    deterministic leading-character substitution and linked BACK via
    FastSS deletion-neighborhood blocking + native levenshtein verify.
    The oracle replays variants/join/verify/election in DuckDB
    (levenshtein checked bit-identical), so the hash covers the
    blocking's recall and the election's total order."""
    from pie_spark.fixtures.gen import entity_dict_df
    from pie_spark.link.fuzzy import fuzzy_link

    d = entity_dict_df(spark).select("norm_key", "entity_id")
    surfaces = d.select(
        F.concat(F.lit("@"), F.expr("substring(norm_key, 2)")).alias(
            "surface_key"
        )
    )
    return fuzzy_link(surfaces, d)


def _fuzzy_link_sql() -> str:
    """Lazy oracle: the dictionary is closed-form (fixtures), inlined
    as VALUES; variants/verify/election replayed in DuckDB SQL."""
    from pie_spark.fixtures.gazetteer import dictionary_entries

    rows = sorted({(e.norm_key, e.entity_id) for e in dictionary_entries()})

    def _q(v: str) -> str:
        return v.replace("'", "''")

    values = ",\n".join(f"('{_q(k)}', '{_q(e)}')" for k, e in rows)
    var = (
        "list_distinct(list_append(list_transform(range(length({c})), "
        "i -> substr({c}, 1, i) || substr({c}, i + 2)), {c}))"
    )
    return f"""
WITH dict(norm_key, entity_id) AS (VALUES {values}),
surf AS (SELECT DISTINCT '@' || substr(norm_key, 2) AS s FROM dict),
s_var AS (SELECT DISTINCT s, unnest({var.format(c='s')}) AS v FROM surf),
d_var AS (SELECT DISTINCT norm_key AS k, entity_id AS e,
                 unnest({var.format(c='norm_key')}) AS v FROM dict),
pairs AS (
  SELECT DISTINCT s, k, e FROM s_var JOIN d_var USING (v)
),
verified AS (
  SELECT s, k, e, levenshtein(s, k) AS dist FROM pairs
  WHERE levenshtein(s, k) <= 1
),
ranked AS (
  SELECT s, k, e, dist,
         row_number() OVER (PARTITION BY s ORDER BY dist, k, e) AS rn
  FROM verified
)
SELECT s AS surface_key, k AS norm_key, e AS entity_id,
       CAST(dist AS INTEGER) AS dist
FROM ranked WHERE rn = 1
"""


def q_grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP grouping-sets surface (r06, born folded — registry at the
    50 cap): per-(event_type, day) counts WITH subtotal rows per
    event_type and a grand total, in ONE aggregation pass —
    `DataFrame.rollup` plans a single Expand + hash agg (each input
    row fans out once per grouping set, all sets partial-aggregate
    map-side) instead of three scans + union. NULL marks the rolled-up
    level on both engines (`GROUP BY ROLLUP` in the DuckDB oracle);
    day = epoch-aligned integer division (the A9 bucket)."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000) * 86400000000"
        ).alias("day_us"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("value_centi"),
    )
    return e.rollup("event_type", "day_us").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("value_centi").cast("long").alias("value_centi"),
    )


SQL_GROUPING_ROLLUP = """
SELECT event_type,
       (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_centi
FROM events
GROUP BY ROLLUP (event_type, day_us)
"""


def q_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X23: percentile-rank normalization of document lengths (r06
    operator, born folded — registry at the 50 cap): every doc gains
    its length's global empirical-CDF position in integer ppm — the
    cross-corpus score normalizer. Pure integer arithmetic on the X17
    V-row machinery."""
    from pie_spark.text.analysis import percentile_rank

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("doc_len")
    )
    return percentile_rank(d, "doc_len")


SQL_PERCENTILE_RANK = """
WITH w AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS doc_len FROM documents),
counts AS (SELECT doc_len AS v, count(*) AS c FROM w GROUP BY 1),
cum AS (SELECT v, sum(c) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM counts),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w),
ranks AS (SELECT v, CAST((cum * 1000000) // n AS BIGINT) AS pct_ppm FROM cum, n)
SELECT doc_id, doc_len, pct_ppm FROM w JOIN ranks ON w.doc_len = ranks.v
"""


HDR_P = 6
HDR_QS = [500000, 900000, 990000]


def q_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X26: mergeable log-histogram quantile sketch (r06 operator, born
    folded — registry at the 50 cap): document-length quantiles read
    from a ≤ 4k-bucket integer sketch instead of a global sort —
    Spark's approx_percentile is engine-specific (the
    approx_count_distinct problem), this one is pure BIGINT bit
    arithmetic and DuckDB replays it verbatim."""
    from pie_spark.eval.quantiles import hdr_quantiles, hdr_sketch

    vals = _t(spark, sf_dir, "documents").select(
        F.length("text").cast("long").alias("v")
    )
    return hdr_quantiles(hdr_sketch(vals, "v", p=HDR_P), HDR_QS)


SQL_HDR_QUANTILES = f"""
WITH vals AS (SELECT CAST(length(text) AS BIGINT) AS v FROM documents),
bk AS (
  SELECT CASE WHEN v <= 0 THEN 0 ELSE (sh << {HDR_P + 1}) + (v >> sh) END AS bucket
  FROM (SELECT v, greatest(length(bin(v)) - 1 - {HDR_P}, 0) AS sh FROM vals)
),
sk AS (SELECT bucket, count(*) AS n FROM bk GROUP BY bucket),
skb AS (SELECT bucket, n, bucket >> {HDR_P + 1} AS sh,
               bucket - ((bucket >> {HDR_P + 1}) << {HDR_P + 1}) AS rem FROM sk),
skl AS (SELECT bucket, n,
               CAST(CASE WHEN sh = 0 THEN rem ELSE rem << sh END AS BIGINT) AS lo,
               CAST(CASE WHEN sh = 0 THEN rem ELSE ((rem + 1) << sh) - 1 END AS BIGINT) AS hi
        FROM skb),
cum AS (SELECT bucket, lo, hi, n, sum(n) OVER (ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM skl),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM skl),
ranks AS (SELECT q_ppm, CAST((q_ppm * total + 999999) // 1000000 AS BIGINT) AS rank
          FROM (SELECT unnest([{", ".join(str(q) for q in HDR_QS)}]::BIGINT[]) AS q_ppm), tot),
hit AS (SELECT q_ppm, rank, lo, hi,
               row_number() OVER (PARTITION BY q_ppm ORDER BY bucket) AS rn
        FROM cum JOIN ranks ON cum.cum >= ranks.rank)
SELECT q_ppm, rank, lo, hi FROM hit WHERE rn = 1
"""


_COMPRESS_LAST_SF_DIR: str | None = None


def q_compression_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X27: zlib compression-ratio curation signal (r06 operator, born
    folded). The oracle replays zlib over the duckdb-read corpus and
    inlines the rows as VALUES — an independent data path (duckdb read
    + direct zlib vs Spark scan + Arrow batches + zlib), so the hash
    checks encoding/batching/row alignment; zlib itself is the shared
    primitive, same stance as the media codec recipe oracles."""
    from pie_spark.text.analysis import compression_signals

    global _COMPRESS_LAST_SF_DIR
    _COMPRESS_LAST_SF_DIR = sf_dir
    return compression_signals(_t(spark, sf_dir, "documents"))


def _compression_signals_sql() -> str:
    import os
    import zlib

    import duckdb

    base = _COMPRESS_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    path = base.rstrip("/") + "/documents.parquet"
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(doc_id AS BIGINT), coalesce(text, '') "
        f"FROM read_parquet('{path}')"
    ).fetchall()
    con.close()
    vals = []
    for did, text in rows:
        raw = text.encode("utf-8")
        rb, zb = len(raw), len(zlib.compress(raw, 6))
        vals.append(f"({did}, {rb}, {zb}, {zb * 1_000_000 // max(rb, 1)})")
    return (
        "SELECT * FROM (VALUES "
        + ",\n".join(vals)
        + ") AS t(doc_id, raw_bytes, zlib_bytes, ratio_ppm)"
    )


WSAMPLE_K = 50


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X22: weighted sampling without replacement (Efraimidis–Spirakis
    priority top-k; r06 operator, born folded — registry at the 50
    cap): the 50 documents sampled proportionally to text length —
    priorities from the salted-h64 uniform (the repo hash recipe,
    bit-identical in DuckDB), float work once per row from exact ints,
    TakeOrderedAndProject."""
    from pie_spark.prep.sampling import weighted_sample_topk

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("weight")
    )
    return weighted_sample_topk(d, WSAMPLE_K, "weight")


def _weighted_sample_sql() -> str:
    from pie_spark.prep.sampling import priority_score_sql

    score = priority_score_sql("doc_id", "weight", "wsample:")
    return f"""
WITH w AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS weight FROM documents),
s AS (SELECT doc_id, weight, {score} AS pr FROM w WHERE weight > 0)
SELECT doc_id, weight FROM s ORDER BY pr DESC, doc_id ASC LIMIT {WSAMPLE_K}
"""


BLOOM_M_BITS = 1 << 16
BLOOM_K = 4


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X21: Bloom-filter decontamination — X7's semantics with the
    benchmark shingle set compressed into a bit-word table (the scale
    path past broadcast-set size; r06 operator, born folded — registry
    at the 50 cap). The oracle replays the FILTER, not the exact set
    (same h64 positions, same bit_or words, same all-k probe), so the
    hash check covers construction and probe bit-for-bit — false
    positives and all."""
    from pie_spark.dedup.shingles import doc_shingles
    from pie_spark.prep.bloom import build_bloom, probe_bloom

    d = _t(spark, sf_dir, "documents")
    bench = (
        doc_shingles(d.filter(F.col("doc_id") % 20 == 0), "text", 3)
        .select("shingle")
        .distinct()
    )
    bloom = build_bloom(bench, "shingle", BLOOM_M_BITS, BLOOM_K)
    corp = doc_shingles(d.filter(F.col("doc_id") % 20 != 0), "text", 3)
    flagged = probe_bloom(corp, "shingle", bloom, BLOOM_M_BITS, BLOOM_K)
    return (
        flagged.filter(F.col("maybe_member"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_maybe_hits"))
    )


def _bloom_h64_sql(i: int, expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('bloom:{i}:' || {expr}), 1, 15)) "
        f"AS UBIGINT)::BIGINT % {BLOOM_M_BITS}"
    )


SQL_BLOOM_DECONTAMINATE = f"""
WITH bench_base AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents WHERE doc_id % 20 = 0),
corp_base AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents WHERE doc_id % 20 <> 0),
bench AS (SELECT DISTINCT unnest(sh) AS shingle
          FROM (SELECT {_DUCK_SHINGLES} AS sh FROM bench_base) _ ),
bpos AS ({' UNION ALL '.join(f"SELECT {_bloom_h64_sql(i, 'shingle')} AS p FROM bench" for i in range(4))}),
words AS MATERIALIZED (
  SELECT p // 63 AS word_idx, bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS bits
  FROM bpos GROUP BY 1
),
corp AS (SELECT doc_id, unnest(sh) AS shingle
         FROM (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM corp_base) _ ),
cvals AS (SELECT DISTINCT shingle FROM corp),
cpos AS ({' UNION ALL '.join(f"SELECT shingle, {_bloom_h64_sql(i, 'shingle')} AS p FROM cvals" for i in range(4))}),
member AS (
  SELECT shingle,
         sum(CASE WHEN w.bits IS NOT NULL
                       AND (w.bits & (CAST(1 AS BIGINT) << CAST(p % 63 AS INT)))
                           = (CAST(1 AS BIGINT) << CAST(p % 63 AS INT))
                  THEN 1 ELSE 0 END) = {BLOOM_K} AS maybe_member
  FROM cpos LEFT JOIN words w ON p // 63 = w.word_idx
  GROUP BY shingle
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_maybe_hits
FROM corp JOIN member USING (shingle)
WHERE maybe_member
GROUP BY doc_id
"""


ROLLUP_WIDTHS_US = [
    60 * 1_000_000,          # 1 min
    3_600 * 1_000_000,       # 1 h
    86_400 * 1_000_000,      # 1 d
]


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: hypertable rollup cascade (r06 operator, born folded —
    registry at the 50 cap): per-event_type minute → hour → day
    buckets where each level re-aggregates the PREVIOUS level; the
    returned union carries all three resolutions. The oracle GROUP BYs
    raw events directly at every resolution — the road the cascade
    avoids — so the hash check proves the re-aggregation algebra."""
    from pie_spark.events.rollup import rollup_cascade

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("value_centi"),
    )
    levels = rollup_cascade(e, ROLLUP_WIDTHS_US, keys=["event_type"])
    out = None
    for w, df in levels.items():
        tagged = df.select(F.lit(w).cast("long").alias("width_us"), "*")
        out = tagged if out is None else out.unionByName(tagged)
    return out


def _hypertable_rollup_sql() -> str:
    parts = []
    for w in ROLLUP_WIDTHS_US:
        parts.append(f"""
SELECT CAST({w} AS BIGINT) AS width_us, event_type,
       (ts_us // {w}) * {w} AS bucket_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(value_centi) AS BIGINT) AS value_centi,
       min(ts_us) AS min_ts_us, max(ts_us) AS max_ts_us
FROM raw GROUP BY 2, 3""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH raw AS (
  SELECT event_type, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS value_centi
  FROM events
)
{body}
"""


RANGE_PAD_US = 300 * 1_000_000  # sessions padded ±5 min
RANGE_BUCKET_US = 3_600 * 1_000_000  # 1 h buckets


def q_range_join_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: range join — every error event matched to every user session
    active within ±5 minutes of it, across users (concurrency blast-
    radius analysis; r06 operator, born folded — registry at the 50
    cap). Spark side is the bucketized equi-join reduction
    (events/rangejoin.py); the DuckDB oracle is the direct BETWEEN
    join (IEJoin) — independent algorithms agreeing on the row set."""
    from pie_spark.events.rangejoin import range_join
    from pie_spark.events.sessions import session_stats, sessionize

    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("err_ts_us"),
    )
    sess = session_stats(sessionize(e, gap_sec=SESSION_GAP_SEC)).select(
        F.col("user_id").alias("s_user"),
        F.col("session_idx").alias("s_idx"),
        (F.col("start_us") - RANGE_PAD_US).alias("s_lo"),
        (F.col("end_us") + RANGE_PAD_US).alias("s_hi"),
    )
    return range_join(
        errors, sess, "err_ts_us", "s_lo", "s_hi", bucket_us=RANGE_BUCKET_US
    )


def _range_join_sessions_sql() -> str:
    return f"""
WITH s0 AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us, value FROM events
),
flag AS (
  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                      OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_SEC * 1_000_000}
                 THEN 1 ELSE 0 END AS new_sess
  FROM s0 WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
n AS (
  SELECT *, CAST(sum(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts_us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s_idx
  FROM flag
),
sess AS (
  SELECT user_id AS s_user, s_idx,
         min(ts_us) - {RANGE_PAD_US} AS s_lo,
         max(ts_us) + {RANGE_PAD_US} AS s_hi
  FROM n GROUP BY 1, 2
),
errs AS (
  SELECT event_id AS err_id, ts_us AS err_ts_us FROM s0
  WHERE event_type = 'error'
)
SELECT err_id, err_ts_us, s_user, s_idx, s_lo, s_hi
FROM errs JOIN sess ON err_ts_us BETWEEN s_lo AND s_hi
"""


ASOF_TOL_US = 1_800 * 1_000_000  # 30 min


def q_asof_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: as-of join — every click attributed to the user's latest
    view at or before it, within 30 minutes (r06 operator, born folded
    — registry at the 50 cap). Spark side is the one-shuffle
    union+running-window implementation (events/asof.py); the DuckDB
    oracle is an INDEPENDENT correlated-lateral implementation, so
    agreement checks as-of semantics, not a transcription."""
    from pie_spark.events.asof import asof_join

    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts_us"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts_us").alias("vts_us"),
    )
    return asof_join(
        clicks,
        views,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="vts_us",
        right_id="view_id",
        tolerance_us=ASOF_TOL_US,
        prefix="m_",
    )


SQL_ASOF_CLICK_VIEW = f"""
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
c AS (SELECT user_id, event_id, ts_us FROM e WHERE event_type = 'click'),
v AS (SELECT user_id, event_id AS view_id, ts_us AS vts_us FROM e WHERE event_type = 'view')
SELECT c.user_id, c.event_id, c.ts_us, m.vts_us AS m_vts_us, m.view_id AS m_view_id
FROM c LEFT JOIN LATERAL (
  SELECT vts_us, view_id FROM v
  WHERE v.user_id = c.user_id AND v.vts_us <= c.ts_us
    AND c.ts_us - v.vts_us <= {ASOF_TOL_US}
  ORDER BY vts_us DESC, view_id DESC LIMIT 1
) m ON TRUE
"""


ZORDER_BITS = 16
_ZORDER_LAST_SF_DIR: str | None = None


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: Morton z-order key over (p_partkey, p_size) — the multi-key
    layout clustering primitive (r06 operator, born folded — registry
    at the 50 cap). Both engines evaluate the SAME normalize +
    bit-interleave expression text (io/zorder.py builders; only the
    integer-division token differs — Spark `div`, DuckDB `//`,
    value-identical on these nonnegative operands), so the hash check
    covers every bit of every key."""
    from pie_spark.io.zorder import zorder_key

    global _ZORDER_LAST_SF_DIR
    _ZORDER_LAST_SF_DIR = sf_dir
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_size")
    keyed, _ = zorder_key(part, ["p_partkey", "p_size"], bits=ZORDER_BITS)
    return keyed.select(
        "p_partkey", "p_size", F.col("__zkey").alias("zkey")
    )


def _zorder_key_sql() -> str:
    """Lazy oracle: same min/max bounds (exact ints from the same
    parquet), same expression builders with the DuckDB division token."""
    import os

    import duckdb

    from pie_spark.io.zorder import norm_expr_sql, zorder_expr_sql

    base = _ZORDER_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    bounds = {}
    for c in ("p_partkey", "p_size"):
        bounds[c] = con.execute(
            f"SELECT CAST(min({c}) AS BIGINT), CAST(max({c}) AS BIGINT) "
            f"FROM read_parquet('{base}/part.parquet')"
        ).fetchone()
    con.close()
    norms = [
        norm_expr_sql(c, *bounds[c], ZORDER_BITS, intdiv="//")
        for c in ("p_partkey", "p_size")
    ]
    z = zorder_expr_sql(norms, ZORDER_BITS)
    return f"SELECT p_partkey, p_size, CAST({z} AS BIGINT) AS zkey FROM part"


DSIR_FRAC_PPM = 250_000
_DSIR_LAST_SF_DIR: str | None = None


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20: DSIR-style importance selection (r06 operator, born folded
    — registry at the 50 cap): target LM fit on the doc_id%4==0
    reference slice, raw LM on the whole pool, per-doc importance =
    exact micro-bit total-cost difference, top 25 % kept by the exact
    keep-count threshold. Every float the oracle must match is the
    per-model-row ln already hash-proven by lm_scores; all reductions
    are exact longs."""
    from pie_spark.prep.dsir import importance_scores, select_top_fraction
    from pie_spark.text.lm import fit_bigram_lm

    global _DSIR_LAST_SF_DIR
    _DSIR_LAST_SF_DIR = sf_dir
    d = _tp(spark, sf_dir, "documents")
    tgt = fit_bigram_lm(d.filter(F.col("doc_id") % 4 == 0), add_k=0.5)
    raw = fit_bigram_lm(d, add_k=0.5)
    try:
        # evaluate WHILE the model caches are hot, then hand the driver
        # a checkpoint scan: unpersisting first re-inlines both model
        # aggregations per reference in the lazy plan — 162 exchanges
        # at sf0.001, the Spark-side edition of the DuckDB CTE
        # re-inlining trap (caught in the r06 plan audit, BENCH/PLANS.md)
        return select_top_fraction(
            importance_scores(d, tgt, raw), DSIR_FRAC_PPM
        ).localCheckpoint(eager=True)
    finally:
        tgt.unpersist()
        raw.unpersist()


def _lm_total_ctes(tag: str, ref_where: str, add_k: float = 0.5) -> str:
    """CTE block mirroring ``score_docs(..., total=True)`` for one
    bigram LM fit on ``toks`` rows satisfying ``ref_where`` — the same
    per-row expressions as the hash-green _lm_scores_sql, with the
    exact SUM instead of the floored mean. Multi-referenced CTEs are
    AS MATERIALIZED (DuckDB re-inlines per reference otherwise — the
    251 s lesson from the whole-pipeline oracle)."""
    ln2 = "0.6931471805599453"
    return f"""
ref_{tag} AS (SELECT toks FROM toks WHERE {ref_where}),
uni_{tag} AS MATERIALIZED (
  SELECT w1, count(*) AS c1
  FROM (SELECT unnest(toks) AS w1 FROM ref_{tag}) _ GROUP BY 1
),
vv_{tag} AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS v FROM uni_{tag}),
ref_bi_{tag} AS (
  SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c12
  FROM (SELECT unnest(list_transform(range(1, len(toks)),
                                     i -> {{'w1': toks[i], 'w2': toks[i+1]}})) AS b
        FROM ref_{tag}) _ GROUP BY 1, 2
),
cost_{tag} AS MATERIALIZED (
  SELECT w1, w2,
         CAST(round(-(ln({add_k} + c12) - ln(c1 + {add_k} * v)) / {ln2} * 1000000)
              AS BIGINT) AS cost_micro
  FROM ref_bi_{tag} JOIN uni_{tag} USING (w1), vv_{tag}
),
charged_{tag} AS (
  SELECT doc_id,
         coalesce(cost_{tag}.cost_micro,
                  CASE WHEN uni_{tag}.c1 IS NOT NULL THEN
                    CAST(round(-(ln({add_k}) - ln(uni_{tag}.c1 + {add_k} * vv_{tag}.v)) / {ln2} * 1000000)
                         AS BIGINT) END,
                  CAST(round(ln(vv_{tag}.v) / {ln2} * 1000000) AS BIGINT)) AS pc
  FROM doc_bi
  LEFT JOIN cost_{tag} USING (w1, w2)
  LEFT JOIN uni_{tag} USING (w1), vv_{tag}
),
agg_{tag} AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(pc) AS BIGINT) AS cost
  FROM charged_{tag} GROUP BY doc_id
),
tot_{tag} AS MATERIALIZED (
  SELECT d.doc_id,
         coalesce(a.n_bigrams, 0) AS n_bigrams,
         coalesce(a.cost,
                  (SELECT CAST(round(ln(v) / {ln2} * 1000000) AS BIGINT) FROM vv_{tag})) AS cost
  FROM documents d LEFT JOIN agg_{tag} a USING (doc_id)
)"""


def _dsir_select_sql() -> str:
    """Lazy oracle: two LM replays (target slice, whole pool) over the
    mirrored tokenizer, exact total-cost difference, and the K-th-
    largest threshold via ORDER BY ... LIMIT 1 OFFSET K-1 (identical
    keep-≥-threshold semantics to the Spark rank arithmetic)."""
    import os

    import duckdb

    base = _DSIR_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{base}/documents.parquet')"
    ).fetchone()[0]
    con.close()
    k = (DSIR_FRAC_PPM * int(n) + 999_999) // 1_000_000
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, list_filter({_DUCK_TOKS}, x -> x <> '') AS toks FROM documents
),
doc_bi AS MATERIALIZED (
  SELECT doc_id, b.w1 AS w1, b.w2 AS w2
  FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                                             i -> {{'w1': toks[i], 'w2': toks[i+1]}})) AS b
        FROM toks) _
),
{_lm_total_ctes("t", "doc_id % 4 = 0")},
{_lm_total_ctes("r", "TRUE")},
scored AS MATERIALIZED (
  SELECT t.doc_id, t.n_bigrams,
         CAST(r.cost - t.cost AS BIGINT) AS importance_micro
  FROM tot_t t JOIN tot_r r USING (doc_id)
),
thr AS (SELECT importance_micro AS t FROM scored
        ORDER BY importance_micro DESC LIMIT 1 OFFSET {k - 1})
SELECT doc_id, n_bigrams, importance_micro
FROM scored, thr WHERE importance_micro >= thr.t
"""


LPA_ITERS = 5


def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: label-propagation communities over the canonical alias
    graph (r06 operator, born folded — registry at the 50 cap):
    deterministic synchronous LPA (graph/lpa.py — integer votes,
    total-ordered argmax, self-vote damping) on the same bipartite
    norm_key↔entity graph CC and PageRank run on. The oracle replays
    the identical recipe in the independent plain-Python
    implementation over the closed-form dictionary, inlined as VALUES
    (the pagerank_entities precedent)."""
    from pie_spark.canon.edges import build_edges
    from pie_spark.fixtures.gen import entity_dict_df
    from pie_spark.graph.lpa import label_propagation

    fwd = build_edges(entity_dict_df(spark))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return label_propagation(edges, iters=LPA_ITERS)


def _lpa_communities_sql() -> str:
    """Lazy oracle: plain-Python LPA replay over the closed-form
    dictionary edge set, inlined as VALUES."""
    from pie_spark.fixtures.gazetteer import dictionary_entries
    from pie_spark.graph.lpa import lpa_reference

    fwd = sorted(
        {(f"k:{e.norm_key}", f"e:{e.entity_id}") for e in dictionary_entries()}
    )
    edge_list = fwd + [(d, s) for s, d in fwd]
    labels = lpa_reference(edge_list, iters=LPA_ITERS)

    def _q(v: str) -> str:
        return v.replace("'", "''")

    values = ",\n".join(
        f"('{_q(n)}', '{_q(l)}')" for n, l in sorted(labels.items())
    )
    return f"SELECT * FROM (VALUES {values}) AS t(node, label)"


SESSION_GAP_SEC = 600


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/A8: gap-based sessionization + per-session rollup over the
    events table (r06 operator, born folded — registry at the 50 cap).
    One shuffle: both window passes and the rollup share the user_id
    partitioning. All arithmetic in exact integer micros/centis, so
    the hash check covers every session boundary and every sum."""
    from pie_spark.events.sessions import session_stats, sessionize

    e = _t(spark, sf_dir, "events")
    return session_stats(sessionize(e, gap_sec=SESSION_GAP_SEC))


def _event_sessions_sql() -> str:
    gap_us = SESSION_GAP_SEC * 1_000_000
    return f"""
WITH s AS (
  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
n AS (
  SELECT *, CAST(sum(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts_us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM s
)
SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
       min(ts_us) AS start_us, max(ts_us) AS end_us,
       max(ts_us) - min(ts_us) AS duration_us,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_centi
FROM n GROUP BY 1, 2
"""


BM25_QUERY_TERMS = ["customer", "merge", "spark", "window"]
BM25_TOP_K = 50
_BM25_LAST_SF_DIR: str | None = None


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (r06 operator, born folded — registry at
    the 50 cap): fit term stats over the documents corpus, score a
    fixed normalized query, return the total-ordered top 50 (score
    desc, doc_id asc). Both engines evaluate the SAME score-expression
    text built by text/bm25.py:score_expr_sql from exact-int inputs,
    so the hash check covers every micro-unit of every score."""
    from pie_spark.text.bm25 import fit_bm25, score_query

    global _BM25_LAST_SF_DIR
    _BM25_LAST_SF_DIR = sf_dir
    d = _tp(spark, sf_dir, "documents")
    idx = fit_bm25(d)
    return score_query(d, idx, BM25_QUERY_TERMS, top_k=BM25_TOP_K)


def _bm25_topk_sql() -> str:
    """Lazy oracle: DuckDB replays fit + scoring on the same parquet;
    the corpus constants (N docs, total token length) are computed
    with the mirrored tokenizer and inlined as literals so the idf and
    score expressions are TEXTUALLY the ones Spark evaluated."""
    import os

    import duckdb

    from pie_spark.text.bm25 import idf_expr_sql, score_expr_sql

    base = _BM25_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    n, tl = con.execute(
        f"""
        SELECT CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(len(list_filter({_DUCK_TOKS}, x -> x <> ''))), 0) AS BIGINT)
        FROM read_parquet('{base}/documents.parquet') documents
        """
    ).fetchone()
    con.close()
    terms_sql = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter({_DUCK_TOKS}, x -> x <> '') AS toks FROM documents
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM toks) _
  WHERE term IN ({terms_sql}) GROUP BY term
),
stats AS (SELECT term, df, {idf_expr_sql(int(n))} AS idf_micro FROM dfreq),
hits AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term FROM toks
),
tf AS (
  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM hits WHERE term IN ({terms_sql}) GROUP BY 1, 2, 3
),
per_term AS (
  SELECT doc_id, {score_expr_sql(int(n), int(tl), 1.2, 0.75)} AS s_micro
  FROM tf JOIN stats USING (term)
),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
         CAST(sum(s_micro) AS BIGINT) AS bm25_micro
  FROM per_term GROUP BY doc_id
)
SELECT doc_id, n_matched, bm25_micro
FROM scored ORDER BY bm25_micro DESC, doc_id ASC LIMIT {BM25_TOP_K}
"""


def q_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch estimates vs true counts for the top-25 tokens
    (est ≥ tf always; bounded overestimate — the sublinear heavy-hitter
    path for skew pre-detection at vocabulary scales where the exact
    (token, count) table is itself too big)."""
    from pie_spark.text.sketch import build_sketch, estimate_counts
    from pie_spark.text.vocab import vocab_topk

    docs = _tp(spark, sf_dir, "documents")
    sketch = build_sketch(docs)
    top = vocab_topk(docs, k=25).select("token", "tf")
    return top.join(estimate_counts(sketch, top.select("token")), "token")


def _cm_heavy_hitters_sql(depth: int = 4, width: int = 8192) -> str:
    rows = "[" + ", ".join(str(r) for r in range(depth)) + "]"
    bkt = (
        "CAST(('0x' || substr(md5('cm:' || CAST(row AS VARCHAR) || ':' || token), "
        f"1, 15)) AS UBIGINT)::BIGINT % {width}"
    )
    return f"""
WITH tk AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
tk2 AS (SELECT token FROM tk WHERE token <> ''),
pr AS (SELECT token, unnest({rows}) AS row FROM tk2),
pb AS (SELECT row, {bkt} AS bucket FROM pr),
sk AS (SELECT row, bucket, CAST(count(*) AS BIGINT) AS c FROM pb GROUP BY 1, 2),
f AS (SELECT token, doc_id, count(*) AS n
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> '' GROUP BY 1, 2),
v AS (SELECT token, CAST(sum(n) AS BIGINT) AS tf FROM f GROUP BY 1
      ORDER BY tf DESC, token ASC LIMIT 25),
q AS (SELECT token, unnest({rows}) AS row FROM v),
qp AS (SELECT token, row, {bkt} AS bucket FROM q),
est AS (SELECT token, CAST(min(coalesce(c, 0)) AS BIGINT) AS est
        FROM qp LEFT JOIN sk USING (row, bucket) GROUP BY 1)
SELECT v.token, v.tf, est.est FROM v JOIN est USING (token)
"""


def q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pie_spark.text.analysis import repetition_scores

    return repetition_scores(_tp(spark, sf_dir, "documents"))


SQL_REPETITION_SCORES = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
b AS (SELECT doc_id,
             unnest(CASE WHEN len(toks) >= 2
                    THEN list_transform(range(len(toks) - 1),
                                        i -> concat_ws(' ', toks[i + 1], toks[i + 2]))
                    ELSE [] END) AS bg
      FROM t),
c AS (SELECT doc_id, bg, count(*) AS n FROM b GROUP BY 1, 2),
a AS (SELECT doc_id, max(n) AS top, sum(n) AS total, count(*) AS uniq
      FROM c GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(total, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(floor(top * 1000000 / total), 0) AS BIGINT) AS top_bigram_ppm,
       CAST(coalesce(floor((total - uniq) * 1000000 / total), 0) AS BIGINT) AS dup_bigram_ppm
FROM documents d LEFT JOIN a USING (doc_id)
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced stratified sampling over the lang column
    (τ=0.7, cap=0.5 — cap < 1 so every stratum gets a REAL hash-threshold
    cut at fixture scale; cap=1.0 saturates all rates on this
    distribution and the oracle would only verify a pass-through):
    head language downsampled hardest, tail kept fuller; keep decision =
    salted-hash ppm threshold (reshard/resume-stable)."""
    from pie_spark.prep.sampling import stratified_sample, temperature_rates

    docs = _t(spark, sf_dir, "documents")
    rates = temperature_rates(docs, "lang", temperature=0.7, cap=0.5)
    return stratified_sample(docs.select("doc_id", "lang"), rates, "lang").select(
        "doc_id", "lang"
    )


def _stratified_sample_sql(temperature: float = 0.7, cap: float = 0.5) -> str:
    # embed the EXACT double Spark computes for τ−1 (0.7−1.0 is not
    # representable as -0.3; repr() round-trips the bit pattern)
    exp = repr(temperature - 1.0)
    cap_denom = repr(float(cap) * 1_000_000)
    return f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
m AS (SELECT max(n) AS n_max FROM c),
r AS (SELECT lang,
             CAST(least(floor({cap_denom} * pow(n / CAST(n_max AS DOUBLE), {exp})),
                        1000000) AS BIGINT) AS rate_ppm
      FROM c, m)
SELECT d.doc_id, d.lang
FROM documents d JOIN r USING (lang)
WHERE CAST(('0x' || substr(md5('sample:' || CAST(d.doc_id AS VARCHAR)), 1, 15))
           AS UBIGINT)::BIGINT % 1000000 < r.rate_ppm
"""


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampling with the RATE TABLE in the output: per-lang
    (n, rate_ppm, n_kept) at τ=0.5/cap=0.9 — r03's stratified_sample row
    verified only the surviving doc set; this row pins the
    temperature_rates derivation itself (counts → pow → ppm) plus the
    realized keep counts (VERDICT r03 next#7)."""
    from pie_spark.prep.sampling import stratified_sample, temperature_rates

    docs = _t(spark, sf_dir, "documents")
    rates = temperature_rates(docs, "lang", temperature=0.5, cap=0.9)
    kept = stratified_sample(docs.select("doc_id", "lang"), rates, "lang")
    per_lang = kept.groupBy("lang").agg(F.count("*").cast("long").alias("n_kept"))
    return rates.join(per_lang, "lang", "left").select(
        "lang",
        F.col("n").cast("long").alias("n"),
        "rate_ppm",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


def _temperature_sample_sql(temperature: float = 0.5, cap: float = 0.9) -> str:
    exp = repr(temperature - 1.0)
    cap_denom = repr(float(cap) * 1_000_000)
    return f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
m AS (SELECT max(n) AS n_max FROM c),
r AS (SELECT lang, n,
             CAST(least(floor({cap_denom} * pow(n / CAST(n_max AS DOUBLE), {exp})),
                        1000000) AS BIGINT) AS rate_ppm
      FROM c, m),
k AS (SELECT d.lang, count(*) AS n_kept
      FROM documents d JOIN r USING (lang)
      WHERE CAST(('0x' || substr(md5('sample:' || CAST(d.doc_id AS VARCHAR)), 1, 15))
                 AS UBIGINT)::BIGINT % 1000000 < r.rate_ppm
      GROUP BY d.lang)
SELECT r.lang, CAST(r.n AS BIGINT) AS n, r.rate_ppm,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM r LEFT JOIN k USING (lang)
"""


def q_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing with epoch repetition (prep/mixing.py):
    4 allowlisted sources, targets 40/25/20/15 % of an 8,000-token
    budget — at sf0.01 that upsamples src0–src2 (rates ≈ 2.2/1.3/1.1 →
    repeated epochs) and downsamples src3 (≈ 0.87), so the row
    exercises BOTH directions plus the allowlist drop of the other 16
    sources. Output is the materialized mixture multiset
    (doc_id, source, epoch) — row-level evidence for the salted-hash
    Bernoulli machinery (the folded stratified_sample row's job, now
    carried here on the harder multiset semantics)."""
    from pie_spark.prep.mixing import mix_epochs, mixture_rates, token_counts_by_source

    docs = _t(spark, sf_dir, "documents")
    targets = {"src0": 0.40, "src1": 0.25, "src2": 0.20, "src3": 0.15}
    rates = mixture_rates(
        spark, token_counts_by_source(docs), targets, budget_tokens=8000, max_epochs=4
    )
    return mix_epochs(docs.select("doc_id", "source"), rates).select(
        "doc_id", "source", F.col("copy").cast("long").alias("epoch")
    )


SQL_MIX_EPOCHS = """
WITH c AS (SELECT source, sum(len(string_split(text, ' '))) AS tokens
           FROM documents GROUP BY 1),
t(source, target_ppm) AS (VALUES ('src0', 400000), ('src1', 250000),
                                 ('src2', 200000), ('src3', 150000)),
r AS (SELECT source,
             CAST(least((CAST(8000 AS BIGINT) * target_ppm) // tokens,
                        CAST(4000000 AS BIGINT)) AS BIGINT) AS rate_ppm
      FROM c JOIN t USING (source)),
b AS (SELECT d.doc_id, d.source, r.rate_ppm,
             CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15))
                  AS UBIGINT)::BIGINT % 1000000 AS bkt
      FROM documents d JOIN r USING (source))
SELECT doc_id, source,
       CAST(unnest(range(1, (rate_ppm // 1000000)
                            + CASE WHEN bkt < rate_ppm % 1000000
                                   THEN 1 ELSE 0 END + 1)) AS BIGINT) AS epoch
FROM b
"""


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat deterministic Bernoulli sample (X11 flat mode) — pure salted
    hash threshold, reshard/resume-stable; df.sample() is banned because
    its output depends on partitioning."""
    from pie_spark.prep.sampling import hash_sample

    return hash_sample(_t(spark, sf_dir, "documents").select("doc_id"), rate=0.35)


SQL_HASH_SAMPLE = """
SELECT doc_id FROM documents
WHERE CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))
           AS UBIGINT)::BIGINT % 1000000 < 350000
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pie_spark.dedup.exact import duplicate_groups

    return duplicate_groups(_tp(spark, sf_dir, "documents"))


SQL_EXACT_DEDUP = f"""
SELECT md5({_DUCK_NORM}) AS content_md5, min(doc_id) AS rep_doc_id, count(*) AS n_docs
FROM documents GROUP BY 1
"""


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pie_spark.dedup.minhash import K_PERMS, signatures

    sig = signatures(_tp(spark, sf_dir, "documents"))
    return sig.select(
        "doc_id", *[sig["sig"][p].alias(f"h{p}") for p in range(K_PERMS)]
    )


def _minhash_sql() -> str:
    from pie_spark.dedup.minhash import K_PERMS

    mins = ", ".join(
        f"min(CAST(('0x' || substr(md5('p{p}:' || s), 1, 15)) AS UBIGINT)::BIGINT) AS h{p}"
        for p in range(K_PERMS)
    )
    return f"""
WITH base AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM base)
SELECT doc_id, {mins} FROM sh GROUP BY doc_id
"""


def q_minhash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (banded bucket join — SQL-checked via
    a generated lockstep mirror of bands, guard, and est-Jaccard)."""
    from pie_spark.dedup.minhash import near_duplicates

    return near_duplicates(_tp(spark, sf_dir, "documents"), threshold=0.5)


def _minhash_neardups_sql(threshold: float = 0.5, max_bucket: int = 50) -> str:
    from pie_spark.dedup.minhash import BANDS, K_PERMS

    r = K_PERMS // BANDS
    bands = ", ".join(
        "{'band': %d, 'bucket': md5(%s)}"
        % (b, " || ',' || ".join(f"CAST(h{p} AS VARCHAR)" for p in range(b * r, (b + 1) * r)))
        for b in range(BANDS)
    )
    agree = " + ".join(
        f"(CASE WHEN a.h{p} = b.h{p} THEN 1 ELSE 0 END)" for p in range(K_PERMS)
    )
    return f"""
WITH sigs AS ({_minhash_sql()}),
bk AS (SELECT doc_id, unnest([{bands}], recursive := true) FROM sigs),
sizes AS (SELECT band, bucket FROM bk GROUP BY band, bucket
          HAVING count(*) BETWEEN 2 AND {max_bucket}),
ok AS (SELECT bk.* FROM bk JOIN sizes USING (band, bucket)),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM ok x JOIN ok y
           ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id)
SELECT doc_a, doc_b, round(({agree}) / {K_PERMS}, 6) AS est_jaccard
FROM cand
JOIN sigs a ON a.doc_id = doc_a
JOIN sigs b ON b.doc_id = doc_b
WHERE round(({agree}) / {K_PERMS}, 6) >= {threshold}
"""


def q_minhash_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH dedup (r06): dedup an ingest delta (doc_id % 5
    == 0) against a standing index built from the rest of the corpus
    (dedup/incremental.py — standing tables scanned via broadcast
    probes, never shuffled). Oracle = the FULL-corpus LSH mirror
    restricted to pairs touching the delta, so the row pins
    incremental ≡ full cross-engine, including the combined-size
    boilerplate-guard semantics."""
    from pie_spark.dedup.incremental import build_index, delta_near_duplicates

    docs = _tp(spark, sf_dir, "documents")
    is_new = (F.col("doc_id") % 5) == 0
    sigs, bk = build_index(docs.filter(~is_new))
    return delta_near_duplicates(sigs, bk, docs.filter(is_new), threshold=0.5).pairs


def _minhash_delta_sql(threshold: float = 0.5, max_bucket: int = 50) -> str:
    return f"""
SELECT * FROM ({_minhash_neardups_sql(threshold, max_bucket)})
WHERE doc_a % 5 = 0 OR doc_b % 5 = 0
"""


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: MinHash pair graph → distributed
    CC → (doc_id, cluster_rep). Oracle: the minhash-pair SQL feeding a
    recursive-CTE closure — the whole composition is hash-checked."""
    from pie_spark.dedup.clusters import near_dup_clusters

    return near_dup_clusters(_tp(spark, sf_dir, "documents"), threshold=0.5)


def _neardup_clusters_sql(threshold: float = 0.5) -> str:
    pairs = _minhash_neardups_sql(threshold=threshold)
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (SELECT CAST(doc_a AS VARCHAR) AS src, CAST(doc_b AS VARCHAR) AS dst FROM pairs),
und AS (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
reach AS (
  SELECT src AS node, src AS r FROM und
  UNION
  SELECT u.src AS node, r.r FROM und u JOIN reach r ON r.node = u.dst
)
SELECT node AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY node
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pie_spark.dedup.simhash import simhash_chunks

    return simhash_chunks(_tp(spark, sf_dir, "documents"))


def q_simhash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-block near-dup pairs (SQL-checked: the blocking
    keys and bit arithmetic are mirrored by generated DuckDB SQL)."""
    from pie_spark.dedup.simhash import near_duplicate_pairs

    return near_duplicate_pairs(_tp(spark, sf_dir, "documents"), max_hamming=6)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pie_spark.dedup.ngram import jaccard_pairs

    return jaccard_pairs(_tp(spark, sf_dir, "documents"), threshold=0.4)


SQL_NGRAM_JACCARD = f"""
WITH base AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
arr AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM base),
ex  AS (SELECT doc_id, unnest(sh) AS shingle FROM arr),
rare AS (SELECT shingle FROM ex GROUP BY shingle HAVING count(*) <= 20),
rsh AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN rare USING (shingle)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM rsh a JOIN rsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       round(len(list_filter(pa.sh, x -> list_contains(pb.sh, x))) * 1.0 /
             len(list_distinct(list_concat(pa.sh, pb.sh))), 6) AS jaccard
FROM cand
JOIN arr pa ON pa.doc_id = cand.doc_a
JOIN arr pb ON pb.doc_id = cand.doc_b
WHERE round(len(list_filter(pa.sh, x -> list_contains(pb.sh, x))) * 1.0 /
            len(list_distinct(list_concat(pa.sh, pb.sh))), 6) >= 0.4
"""


def q_embedding_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via multi-table hyperplane-LSH blocking
    (SQL-checked: generated oracle inlines the same fixed-seed planes)."""
    from pie_spark.dedup.embedding import cosine_near_duplicates

    # fixture embeddings are near-orthogonal (max pairwise cosine ≈ 0.51
    # at sf0.01); 0.3 yields a meaningful near-dup set on every sf
    return cosine_near_duplicates(
        _t(spark, sf_dir, "embeddings"), threshold=0.3
    )


# --- generated DuckDB mirrors for the hyperplane-LSH family ----------------
# The planes are fixed-seed numpy literals shipped into BOTH engines, so
# the only cross-engine risk is float summation order; the dot product is
# written identically (list fold) on each side and verified by the oracle
# parity test at sf0.01 before the driver ever sees it.


def _cos_sql(v: str, q: str) -> str:
    return (
        f"(list_sum(list_transform(range(1, len({v}) + 1), j -> {v}[j] * {q}[j]))"
        f" / (sqrt(list_sum(list_transform({v}, x -> x * x)))"
        f" * sqrt(list_sum(list_transform({q}, x -> x * x)))))"
    )


def _planes_cte(nbits: int, n_tables: int, dim: int) -> str:
    from pie_spark.ann.search import _planes

    rows = []
    for t in range(n_tables):
        for bit, p in enumerate(_planes(dim, nbits, t)):
            lit = "[" + ", ".join(repr(float(x)) for x in p) + "]"
            rows.append(f"({t}, {bit}, {lit}::DOUBLE[])")
    return "planes(tbl, bit, p) AS (VALUES " + ",\n".join(rows) + ")"


def _bucket_cte(name: str, src: str, id_expr: str, vec: str, dim: int) -> str:
    dot = f"list_sum(list_transform(range(1, {dim} + 1), j -> {vec}[j] * p[j]))"
    return (
        f"{name} AS (SELECT {id_expr}, tbl, CAST(sum(CASE WHEN {dot} > 0"
        f" THEN 1 << bit ELSE 0 END) AS INT) AS bucket"
        f" FROM {src}, planes GROUP BY 1, 2)"
    )


def _ann_lsh_sql(k: int = 10, nbits: int = 6, n_tables: int = 4, dim: int = 64) -> str:
    return f"""
WITH {_planes_cte(nbits, n_tables, dim)},
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
{_bucket_cte('cb', 'c', 'vec_id', 'v', dim)},
{_bucket_cte('qb', 'q', 'q_id', 'qv', dim)},
cand AS (SELECT DISTINCT q_id, vec_id FROM cb JOIN qb USING (tbl, bucket)),
scored AS (
  SELECT cand.q_id, cand.vec_id, round({_cos_sql('c.v', 'q.qv')}, 6) AS sim
  FROM cand JOIN c USING (vec_id) JOIN q USING (q_id)
)
SELECT q_id,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS INT) AS rank,
       vec_id, sim
FROM scored QUALIFY rank <= {k}
"""


def _embedding_neardups_sql(
    threshold: float = 0.3, nbits: int = 6, n_tables: int = 4,
    dim: int = 64, max_bucket: int = 200,
) -> str:
    return f"""
WITH {_planes_cte(nbits, n_tables, dim)},
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_bucket_cte('eb', 'e', 'vec_id', 'v', dim)},
sizes AS (SELECT tbl, bucket FROM eb GROUP BY tbl, bucket
          HAVING count(*) BETWEEN 2 AND {max_bucket}),
ok AS (SELECT eb.* FROM eb JOIN sizes USING (tbl, bucket)),
cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM ok a JOIN ok b
           ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT id_a, id_b, round({_cos_sql('ea.v', 'ebb.v')}, 6) AS sim
FROM cand JOIN e ea ON ea.vec_id = id_a JOIN e ebb ON ebb.vec_id = id_b
WHERE round({_cos_sql('ea.v', 'ebb.v')}, 6) >= {threshold}
"""


def _ann_ivf_sql(k: int = 10, n_centroids: int = 16, nprobe: int = 4) -> str:
    hk = "CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT"
    return f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
cents AS (SELECT vec_id AS cent_id, v AS cv FROM c ORDER BY {hk}, vec_id LIMIT {n_centroids}),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT c.vec_id, c.v, cents.cent_id,
           row_number() OVER (PARTITION BY c.vec_id
             ORDER BY {_cos_sql('c.v', 'cents.cv')} DESC, cents.cent_id ASC) AS rn
    FROM c, cents
  ) WHERE rn = 1
),
probes AS (
  SELECT q_id, qv, cent_id FROM (
    SELECT q.q_id, q.qv, cents.cent_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY {_cos_sql('q.qv', 'cents.cv')} DESC, cents.cent_id ASC) AS rn
    FROM q, cents
  ) WHERE rn <= {nprobe}
),
scored AS (
  SELECT probes.q_id, assigned.vec_id, round({_cos_sql('assigned.v', 'probes.qv')}, 6) AS sim
  FROM assigned JOIN probes USING (cent_id)
)
SELECT q_id,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS INT) AS rank,
       vec_id, sim
FROM scored QUALIFY rank <= {k}
"""


def q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive embedding near-dup clusters: cosine pair graph → CC."""
    from pie_spark.dedup.clusters import cosine_near_dup_clusters

    return cosine_near_dup_clusters(_t(spark, sf_dir, "embeddings"), threshold=0.3)


def _embedding_clusters_sql(threshold: float = 0.3) -> str:
    pairs = _embedding_neardups_sql(threshold=threshold)
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (SELECT CAST(id_a AS VARCHAR) AS src, CAST(id_b AS VARCHAR) AS dst FROM pairs),
und AS (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
reach AS (
  SELECT src AS node, src AS r FROM und
  UNION
  SELECT u.src AS node, r.r FROM und u JOIN reach r ON r.node = u.dst
)
SELECT node AS vec_id, min(r) AS cluster_rep FROM reach GROUP BY node
"""


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-micro-unit centroids per embedding near-dup cluster
    (deterministic across partitionings — no float-sum order
    dependence; see pie_spark/ann/centroids.py).

    Output is FLATTENED to (cluster_rep, n_members, pos, value_micro)
    rows — the driver's canonicalizer sorts with pandas, which cannot
    hash a raw ``array<long>`` column (r03 ERR); same precedent as
    minhash_signatures' h0..hk flattening."""
    from pie_spark.ann.centroids import cluster_centroids
    from pie_spark.dedup.clusters import cosine_near_dup_clusters

    emb = _t(spark, sf_dir, "embeddings")
    clusters = cosine_near_dup_clusters(emb, threshold=0.3)
    cent = cluster_centroids(clusters, emb)
    return cent.select(
        "cluster_rep",
        "n_members",
        F.posexplode("centroid_micro").alias("pos0", "value_micro"),
    ).select(
        "cluster_rep",
        "n_members",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.col("value_micro").cast("long").alias("value_micro"),
    )


def _embedding_centroids_sql(threshold: float = 0.3) -> str:
    clusters = _embedding_clusters_sql(threshold=threshold)
    return f"""
WITH cl AS ({clusters}),
e AS (SELECT CAST(vec_id AS VARCHAR) AS vec_id, unnest(embedding) AS v,
             unnest(range(1, len(embedding) + 1)) AS pos FROM embeddings),
j AS (SELECT cl.cluster_rep, e.pos,
             CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS mv
      FROM cl JOIN e USING (vec_id)),
pd AS (SELECT cluster_rep, pos, sum(mv) AS s, count(*) AS n FROM j GROUP BY 1, 2),
nm AS (SELECT cluster_rep, CAST(max(n) AS BIGINT) AS n_members FROM pd GROUP BY 1)
SELECT pd.cluster_rep, nm.n_members, CAST(pd.pos AS INT) AS pos,
       CAST(floor(s / n) AS BIGINT) AS value_micro
FROM pd JOIN nm ON pd.cluster_rep = nm.cluster_rep
"""


def _ann_queries(spark: SparkSession, sf_dir: str):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return emb, q


def q_ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pie_spark.ann.search import brute_force_topk

    emb, q = _ann_queries(spark, sf_dir)
    return brute_force_topk(emb, q, k=10)


SQL_ANN_BRUTE_FORCE = """
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (
  SELECT q.q_id, c.vec_id,
         list_sum(list_transform(range(1, len(c.v) + 1), i -> c.v[i] * q.qv[i]))
         / (sqrt(list_sum(list_transform(c.v, x -> x * x)))
            * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS sim_raw
  FROM c, q
)
SELECT q_id, vec_id, round(sim_raw, 6) AS sim,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim_raw DESC, vec_id ASC) AS INT) AS rank
FROM s QUALIFY rank <= 10
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN (bucketed candidates — rows-only)."""
    from pie_spark.ann.search import lsh_topk

    emb, q = _ann_queries(spark, sf_dir)
    return lsh_topk(emb, q, k=10)


# trained-IVF driver row: coarse quantizer size / Lloyd iterations.
# Small k on the sf0.01 fixtures (500 vecs → ~62/cluster); the replay
# oracle re-runs the identical training in plain Python, so these
# constants must be shared by q_ann_ivf and _ann_ivf_trained_sql.
ANN_IVF_K = 8
ANN_IVF_ITERS = 3


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer (N5 → N3, VERDICT r04
    next#1): centroids come from the distributed Lloyd loop
    (pie_spark/ann/kmeans.py) instead of hash-order seed picks, so the
    round's k-means operator sits inside the driver's hash-checked
    signal. The oracle replays the identical training in plain Python
    (exact arithmetic — bit-equality proven by
    tests/test_ann.py::test_kmeans_matches_python_replay_exactly) and
    inlines the centroids as VALUES into the IVF DuckDB SQL, so the
    driver row checks Spark-Lloyd ≡ Python-Lloyd ≡ DuckDB-IVF."""
    from pie_spark.ann.kmeans import train_kmeans
    from pie_spark.ann.search import ivf_topk

    # record the fixture dir so the lazily-built oracle replays training
    # over the SAME embeddings table this query trained on (ADVICE r05:
    # a caller-passed sf_dir diverging from the oracle's env default
    # guaranteed a false hash mismatch)
    global _ANN_IVF_LAST_SF_DIR
    _ANN_IVF_LAST_SF_DIR = sf_dir
    emb, q = _ann_queries(spark, sf_dir)
    cents = train_kmeans(emb, k=ANN_IVF_K, iters=ANN_IVF_ITERS)
    return ivf_topk(emb, q, k=10, nprobe=4, centroids=cents)


def q_ann_ivf_hashseed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the training-free hash-order quantizer (the scale
    path when a training pass is not affordable) — folded out of the
    driver registry in favor of the trained row; keeps its own oracle
    in tests/test_oracle.py::FOLDED."""
    from pie_spark.ann.search import ivf_topk

    emb, q = _ann_queries(spark, sf_dir)
    return ivf_topk(emb, q, k=10)


def _lloyd_replay_centroids(path: str, k: int, iters: int) -> dict[str, list[float]]:
    """Independent plain-Python replay of the distributed Lloyd loop,
    reading the fixture parquet via duckdb (no Spark, no
    pie_spark.ann.kmeans import): hash-order seeds, left-to-right
    double folds for cosine, (−cos, cent_id) string tiebreak, exact
    integer-micro means, empty clusters keep their centroid. Bit-equal
    to train_kmeans by construction — that equality is itself pinned by
    tests/test_ann.py, so inlining these values into the oracle SQL
    makes the driver row check the whole chain."""
    import hashlib
    import math

    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(vec_id AS VARCHAR), embedding::DOUBLE[] "
        f"FROM read_parquet('{path}')"
    ).fetchall()
    con.close()
    vecs = {r[0]: [float(x) for x in r[1]] for r in rows}

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def cos(a, b):
        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    def rhu(x):  # round-half-up (Spark/DuckDB round), not banker's
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    seeds = sorted(vecs, key=lambda i: (h64(i), i))[:k]
    cents = {i: list(vecs[i]) for i in seeds}
    for _ in range(iters):
        members: dict[str, list[list[float]]] = {}
        for v in vecs.values():
            best = min(cents, key=lambda c: (-cos(v, cents[c]), c))
            members.setdefault(best, []).append(v)
        nxt = {}
        for cid, cv in cents.items():
            mem = members.get(cid)
            if not mem:
                nxt[cid] = cv
                continue
            nxt[cid] = [
                math.floor(sum(rhu(m[p] * 1e6) for m in mem) / len(mem)) / 1e6
                for p in range(len(cv))
            ]
        cents = nxt
    return cents


_ANN_IVF_LAST_SF_DIR: str | None = None


# shared by q_pq_topk and _pq_topk_sql (the trained-IVF lockstep rule)
PQ_M = 4
PQ_KSUB = 16
PQ_ITERS = 3
PQ_TOPK = 10
_PQ_LAST_SF_DIR: str | None = None


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (N6, folded oracle): train per-subspace
    Lloyd codebooks, encode the corpus to m uint8-sized codes, answer
    top-k by exact-integer ADC — the memory-scale path where raw
    vectors never ride a broadcast or a shuffle again after encoding.
    Every distance is BIGINT micro² so the DuckDB replay is bit-equal;
    the oracle trains via pq_reference (the plain-Python twin pinned
    bit-equal to train_pq by tests/test_ann.py), inlines the codebook
    as VALUES, and replays encode + ADC + top-k in pure BIGINT SQL —
    Spark-PQ ≡ Python-PQ ≡ DuckDB-ADC, the trained-IVF chain shape."""
    from pie_spark.ann.pq import pq_encode, pq_topk, train_pq

    global _PQ_LAST_SF_DIR
    _PQ_LAST_SF_DIR = sf_dir
    emb, q = _ann_queries(spark, sf_dir)
    cb = train_pq(emb, m=PQ_M, ksub=PQ_KSUB, iters=PQ_ITERS)
    codes = pq_encode(emb, cb, m=PQ_M)
    return pq_topk(codes, q, cb, k=PQ_TOPK)


def _pq_topk_sql(k: int = PQ_TOPK) -> str:
    """DuckDB mirror of q_pq_topk: codebook = Python-replay training
    over the SAME embeddings parquet (inlined VALUES, micro BIGINT),
    then encode + ADC entirely in integer SQL. Lazy so importing
    pie_spark.queries stays cheap."""
    import os

    import duckdb

    from pie_spark.ann.pq import pq_reference

    base = _PQ_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    path = base.rstrip("/") + "/embeddings.parquet"
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(vec_id AS VARCHAR), embedding::DOUBLE[] "
        f"FROM read_parquet('{path}')"
    ).fetchall()
    con.close()
    vecs = {r[0]: [float(x) for x in r[1]] for r in rows}
    cb = pq_reference(vecs, m=PQ_M, ksub=PQ_KSUB, iters=PQ_ITERS)
    d = len(next(iter(cb.values())))
    values = ",\n".join(
        f"({s}, {c}, [" + ", ".join(str(int(x)) for x in cv) + "]::BIGINT[])"
        for (s, c), cv in sorted(cb.items())
    )
    sq = (
        f"CAST(list_sum(list_transform(range(1, {d} + 1), "
        f"j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))) AS BIGINT)"
    )
    return f"""
WITH cb(sub, code, cv) AS (VALUES {values}),
mv AS (SELECT CAST(vec_id AS VARCHAR) AS vec_id,
              list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1e6) AS BIGINT)) AS mvv
       FROM embeddings),
subs AS (SELECT vec_id, sub, list_slice(mvv, sub * {d} + 1, (sub + 1) * {d}) AS sv
         FROM mv, (SELECT unnest(range({PQ_M})) AS sub)),
assigned AS (
  SELECT vec_id, sub, code FROM (
    SELECT subs.vec_id, subs.sub, cb.code,
           row_number() OVER (PARTITION BY subs.vec_id, subs.sub
             ORDER BY {sq} ASC, cb.code ASC) AS rn
    FROM subs JOIN cb USING (sub)
  ) WHERE rn = 1
),
qmv AS (SELECT CAST(vec_id AS VARCHAR) AS q_id,
               list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1e6) AS BIGINT)) AS mvv
        FROM embeddings WHERE vec_id < 3),
qsubs AS (SELECT q_id, sub, list_slice(mvv, sub * {d} + 1, (sub + 1) * {d}) AS sv
          FROM qmv, (SELECT unnest(range({PQ_M})) AS sub)),
lut AS (SELECT q_id, sub, code, {sq} AS qd
        FROM qsubs JOIN cb USING (sub)),
scored AS (SELECT lut.q_id, assigned.vec_id, CAST(sum(qd) AS BIGINT) AS adist
           FROM assigned JOIN lut USING (sub, code)
           GROUP BY lut.q_id, assigned.vec_id)
SELECT q_id,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS INT) AS rank,
       vec_id, adist
FROM scored QUALIFY rank <= {k}
"""


def _ann_ivf_trained_sql(k: int = 10, nprobe: int = 4) -> str:
    """DuckDB mirror of the trained-IVF query. Training happens at
    SQL-build time via the independent Python replay over the SAME
    sf_dir q_ann_ivf last trained on (falling back to the
    SPARK_GRAFT_ORACLE_SF env default when the query has not run in
    this process — e.g. an oracle-only invocation); the centroids land
    as literal VALUES. Lazy (registered as a callable) so importing
    pie_spark.queries stays cheap."""
    import os

    base = _ANN_IVF_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    path = base.rstrip("/") + "/embeddings.parquet"
    cents = _lloyd_replay_centroids(path, ANN_IVF_K, ANN_IVF_ITERS)
    values = ",\n".join(
        f"('{cid}', [" + ", ".join(repr(float(x)) for x in cv) + "]::DOUBLE[])"
        for cid, cv in sorted(cents.items())
    )
    return f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
cents(cent_id, cv) AS (VALUES {values}),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT c.vec_id, c.v, cents.cent_id,
           row_number() OVER (PARTITION BY c.vec_id
             ORDER BY {_cos_sql('c.v', 'cents.cv')} DESC, cents.cent_id ASC) AS rn
    FROM c, cents
  ) WHERE rn = 1
),
probes AS (
  SELECT q_id, qv, cent_id FROM (
    SELECT q.q_id, q.qv, cents.cent_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY {_cos_sql('q.qv', 'cents.cv')} DESC, cents.cent_id ASC) AS rn
    FROM q, cents
  ) WHERE rn <= {nprobe}
),
scored AS (
  SELECT probes.q_id, assigned.vec_id, round({_cos_sql('assigned.v', 'probes.qv')}, 6) AS sim
  FROM assigned JOIN probes USING (cent_id)
)
SELECT q_id,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS INT) AS rank,
       vec_id, sim
FROM scored QUALIFY rank <= {k}
"""


def _media_table(spark: SparkSession, sf_dir: str, png: bool = True):
    """Media payload table derived NATIVELY from the documents fixture —
    same synth_media_table operator the pipeline path uses (tested on
    generator output in test_media.py), but over a SQL-expressible span
    source so all three media queries are DuckDB-hash-checked.

    ``png=True`` (the driver rows) replaces payloads with REAL encoded
    files — genuine PNGs for images AND genuine RIFF/PCM WAVs for audio
    since r06 (attach_codec_payloads) — so the feature/resample rows
    exercise both stdlib decode chains; ``png=False`` keeps the
    sha-byte stand-in payloads — the stub path the folded media_resize
    oracle covers."""
    from pie_spark.media.features import (
        attach_codec_payloads,
        media_table_from_docs,
        synth_media_table,
    )

    m = synth_media_table(media_table_from_docs(_t(spark, sf_dir, "documents")))
    return attach_codec_payloads(m) if png else m


# shared SQL mirror of _media_table (lockstep with media_table_from_docs
# + synth_media_table: sha256-derived payload/metadata)
_SQL_MEDIA_CTE = """
m AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         'media://' || CAST(doc_id AS VARCHAR) || '/' || CAST(i AS VARCHAR) AS media_ref,
         CASE WHEN i % 2 = 1 THEN 'image' ELSE 'audio' END AS kind
  FROM (SELECT doc_id, unnest(generate_series(1, length(text) % 4)) AS i FROM documents)
),
mt AS (
  SELECT doc_id, media_ref, kind,
         unhex(sha256(media_ref)) AS payload,
         CASE WHEN kind = 'image'
              THEN CAST(('0x' || substr(sha256(media_ref), 1, 3))::UBIGINT % 1920 + 1 AS INT) END AS width,
         CASE WHEN kind = 'image'
              THEN CAST(('0x' || substr(sha256(media_ref), 4, 3))::UBIGINT % 1080 + 1 AS INT) END AS height,
         CASE WHEN kind = 'audio'
              THEN CAST(('0x' || substr(sha256(media_ref), 7, 4))::UBIGINT % 60000 + 1 AS INT) END AS duration_ms
  FROM m
)
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction, Arrow-batched — both modalities
    real since r06, and since late r06 the image rows exercise THREE
    real stdlib codecs: a deterministic sha256-bit mix of genuine PNGs
    (chunk walk, inflate, unfilter) and genuine baseline JPEGs (Huffman
    entropy decode, dequant, IDCT, media/jpeg.py), plus genuine RIFF/
    PCM WAVs on audio rows — features on every branch are computed from
    actually-decoded bytes. SQL-checked: the oracle recomputes features
    from the planted recipes (PNG/WAV: byte stream, sound because
    decode∘encode = id; JPEG: block-constant gray subclass, the one
    the lossy codec round-trips exactly — tests/test_media.py pins all
    three round-trips)."""
    from pie_spark.media.features import extract_features

    feats = extract_features(_media_table(spark, sf_dir))
    return feats.select(
        "doc_id", "media_ref", "kind",
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 5).alias("feat_sum"),
    )


# image payload pixel dims (attach_png_payloads recipe): hex offsets
# 13-16 of sha256(media_ref), range 3..8
_SQL_PNG_DIMS = """
  CAST(('0x' || substr(sha256(media_ref), 13, 2))::UBIGINT % 6 + 3 AS INT) AS pw,
  CAST(('0x' || substr(sha256(media_ref), 15, 2))::UBIGINT % 6 + 3 AS INT) AS ph
"""

# planted pixel byte at stream index s: byte s%32 of sha256(media_ref':'s//32)
_SQL_PNG_BYTE = (
    "CAST(('0x' || substr(sha256(media_ref || ':' || CAST({s} // 32 AS VARCHAR)),"
    " ({s} % 32) * 2 + 1, 2))::UBIGINT AS BIGINT)"
)

# image payload codec selector (attach-pass recipe, hex 21-22 parity):
# TRUE -> the row carries a genuine baseline JPEG, FALSE -> a genuine PNG
_SQL_IMG_JPEG = "(('0x' || substr(sha256(media_ref), 21, 2))::UBIGINT % 2 = 1)"

# JPEG payload BLOCK dims (hex 23-26, 1..3; pixel dims are blocks*8 —
# the block-constant planted subclass on which the lossy codec
# round-trips exactly, media/jpeg.py docstring)
_SQL_JPEG_DIMS = """
  CAST(('0x' || substr(sha256(media_ref), 23, 2))::UBIGINT % 3 + 1 AS INT) AS jbw,
  CAST(('0x' || substr(sha256(media_ref), 25, 2))::UBIGINT % 3 + 1 AS INT) AS jbh
"""


def _media_features_sql() -> str:
    from pie_spark.media.features import FEATURE_DIM

    # audio: _wav_features over the planted-sample recipe (r06 — the
    # Spark side round-trips genuine RIFF/PCM WAV bytes; the oracle is
    # sound because decode∘encode = id). rate from the 4-value ladder
    # at hex 17–18, frame count n = hex 19–20 % 48 + 16; sample t is
    # the signed LE int16 at planted bytes (2t, 2t+1); features are
    # rate/96000, n/256, then 14 modular class means mapped to [0,1] —
    # each one double op from exact ints, narrowed to float32, summed
    # left-to-right like Spark's aggregate fold.
    mm = FEATURE_DIM - 2
    lo = _SQL_PNG_BYTE.format(s="(t * 2)")
    hi = _SQL_PNG_BYTE.format(s="(t * 2 + 1)")
    u = f"({lo} + 256 * {hi})"
    wav_feats = ["CAST(rate / 96000.0 AS FLOAT)", "CAST(n / 256.0 AS FLOAT)"]
    for i in range(mm):
        n_i = f"((n - 1 - {i}) // {mm} + 1)"
        s_i = f"list_sum(list_transform(range({n_i}), j -> sv[{i} + {mm} * j + 1]))"
        wav_feats.append(
            f"CAST(({s_i} + 32768 * {n_i}) / (65535.0 * {n_i}) AS FLOAT)"
        )
    wav_total = " + ".join(f"CAST({f} AS DOUBLE)" for f in wav_feats)

    # image: _png_features over the planted recipe — decoded dims /256
    # plus 14 modular byte-class means, each one double op from exact
    # ints then narrowed to float32, summed left-to-right like Spark's
    # aggregate fold over the features array
    m = FEATURE_DIM - 2
    png_feats = ["CAST(pw / 256.0 AS FLOAT)", "CAST(ph / 256.0 AS FLOAT)"]
    for i in range(m):
        n_i = f"((pw * ph * 3 - 1 - {i}) // {m} + 1)"
        s_i = (
            f"list_sum(list_transform(range({n_i}), j -> bts[{i} + {m} * j + 1]))"
        )
        png_feats.append(f"CAST({s_i} / (255.0 * {n_i}) AS FLOAT)")
    png_total = " + ".join(f"CAST({f} AS DOUBLE)" for f in png_feats)
    byte_t = _SQL_PNG_BYTE.format(s="t")
    # JPEG rows: decoded buffer byte t belongs to pixel t//3 of a
    # jbw*8-wide image; gray value = planted byte at 8x8-block index
    # (y//8)*jbw + x//8 — the block-constant recipe the attach pass
    # encodes and the real decoder round-trips exactly
    jblk = "((((t // 3) // (jbw * 8)) // 8) * jbw + ((t // 3) % (jbw * 8)) // 8)"
    byte_j = _SQL_PNG_BYTE.format(s=jblk)
    return f"""
WITH {_SQL_MEDIA_CTE.strip()},
aw AS (SELECT doc_id, media_ref, kind,
              CASE (('0x' || substr(sha256(media_ref), 17, 2))::UBIGINT % 4)
                WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 32000
                ELSE 48000 END AS rate,
              CAST(('0x' || substr(sha256(media_ref), 19, 2))::UBIGINT % 48 + 16 AS BIGINT) AS n
       FROM mt WHERE kind = 'audio'),
au AS (SELECT doc_id, media_ref, kind, rate, n,
              list_transform(range(n),
                t -> {u} - CASE WHEN {u} >= 32768 THEN 65536 ELSE 0 END) AS sv
       FROM aw),
pimgs AS (SELECT doc_id, media_ref, kind, {_SQL_PNG_DIMS.strip()}
          FROM mt WHERE kind = 'image' AND NOT {_SQL_IMG_JPEG}),
jimgs AS (SELECT doc_id, media_ref, kind, {_SQL_JPEG_DIMS.strip()}
          FROM mt WHERE kind = 'image' AND {_SQL_IMG_JPEG}),
ib AS (SELECT doc_id, media_ref, kind, pw, ph,
              list_transform(range(pw * ph * 3), t -> {byte_t}) AS bts
       FROM pimgs
       UNION ALL
       SELECT doc_id, media_ref, kind, jbw * 8 AS pw, jbh * 8 AS ph,
              list_transform(range(jbw * 8 * jbh * 8 * 3), t -> {byte_j}) AS bts
       FROM jimgs)
SELECT doc_id, media_ref, kind, round({wav_total}, 5) AS feat_sum FROM au
UNION ALL
SELECT doc_id, media_ref, kind, round({png_total}, 5) AS feat_sum FROM ib
"""


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: Arrow-batched aspect-fit resize on the STUB codec
    path (sha-byte payloads, png=False — the shape non-PNG formats take
    until a real imaging library exists; the REAL PNG resample is the
    driver row, q_media_transforms). SQL-checked via the sha256 fake
    and exact integer dims."""
    from pie_spark.media.features import resize_images

    out = resize_images(_media_table(spark, sf_dir, png=False))
    return out.select(
        "doc_id", "media_ref", "out_width", "out_height",
        F.md5(F.hex("payload")).alias("payload_md5"),
    )


def _media_resize_sql(out_w: int = 224, out_h: int = 224) -> str:
    # integer aspect-fit (m = min(ow·h, oh·w); tw = m//h; th = m//w) and
    # fake resize payload = sha256(payload || '{tw}x{th}')
    return f"""
WITH {_SQL_MEDIA_CTE.strip()},
dims AS (
  SELECT doc_id, media_ref, payload,
         greatest(1, least({out_w} * height, {out_h} * width) // height) AS tw,
         greatest(1, least({out_w} * height, {out_h} * width) // width) AS th
  FROM mt WHERE kind = 'image'
)
SELECT doc_id, media_ref,
       CAST(tw AS INT) AS out_width, CAST(th AS INT) AS out_height,
       md5(upper(sha256(lower(hex(payload)) || CAST(tw AS VARCHAR) || 'x' || CAST(th AS VARCHAR)))) AS payload_md5
FROM dims
"""


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: native frame-timestamp sampling from duration
    metadata (SQL-checked: generate_series mirror)."""
    from pie_spark.media.features import sample_frames

    out = sample_frames(_media_table(spark, sf_dir, png=False), every_ms=5000)
    return out.select("doc_id", "media_ref", F.col("ts_ms").cast("long").alias("ts_ms"))


_SQL_MEDIA_FRAME_SAMPLE = f"""
WITH {_SQL_MEDIA_CTE.strip()}
SELECT doc_id, media_ref, unnest(generate_series(0, duration_ms, 5000)) AS ts_ms
FROM mt WHERE duration_ms IS NOT NULL
"""


def q_media_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM2 image resize ∪ MM3 frame sampling in one driver row — r03's
    driver evaluated only the first 50 registered queries and these two
    fell off the end; folding them keeps both operators inside the hard
    signal (VERDICT r03 next#2). Sentinels (-1 / '') instead of NULLs:
    numeric NULL columns turn into float64 NaN in pandas on BOTH sides
    and make the driver's value-hash fragile.

    The resize branch is the REAL path (VERDICT r04 next#4): image
    payloads are a deterministic mix of genuine PNGs and genuine
    baseline JPEGs (late r06), the operator decodes them with the
    stdlib codecs and nearest-neighbor-resamples the actual pixels;
    payload_md5 hashes the resampled RGB buffer. The oracle reproduces
    that buffer from the planted recipes (PNG: decode∘encode = id;
    JPEG: the block-constant subclass round-trips exactly)."""
    from pie_spark.media.features import (
        attach_png_payloads,
        resample_png_images,
        sample_frames,
    )

    # frames only read duration metadata — the native (no-PNG-attach)
    # table keeps the Python payload-synthesis stage off that branch;
    # the resample branch attaches PNGs to IMAGE rows only (the filter
    # sits below the Python stages, not after them)
    media_native = _media_table(spark, sf_dir, png=False)
    media_img = attach_png_payloads(media_native.filter(F.col("kind") == "image"))
    resized = resample_png_images(media_img).select(
        "doc_id", "media_ref", F.lit("resize").alias("op"),
        F.col("out_width").cast("int").alias("out_width"),
        F.col("out_height").cast("int").alias("out_height"),
        F.lit(-1).cast("long").alias("ts_ms"),
        F.md5(F.hex("payload")).alias("payload_md5"),
    )
    frames = sample_frames(media_native, every_ms=5000).select(
        "doc_id", "media_ref", F.lit("frame").alias("op"),
        F.lit(-1).cast("int").alias("out_width"),
        F.lit(-1).cast("int").alias("out_height"),
        F.col("ts_ms").cast("long").alias("ts_ms"),
        F.lit("").alias("payload_md5"),
    )
    return resized.unionByName(frames)


def _media_transforms_sql(out_w: int = 8, out_h: int = 8) -> str:
    # resize branch = the REAL image resample over BOTH codecs: decoded
    # dims (pw, ph) → integer aspect-fit (tw, th) → nearest-neighbor
    # source index per output byte → planted byte (stream recipe for
    # PNG rows; block-constant recipe for JPEG rows, jbw > 0 marks
    # them) → md5 of the uppercase hex (Spark's F.hex is uppercase).
    # All per-row list ops, no unnest.
    src = (
        f"(((i // (tw * 3)) * ph // th) * pw"
        f" + ((i % (tw * 3)) // 3) * pw // tw) * 3 + (i % 3)"
    )
    # source-buffer byte s -> planted byte: PNG = stream byte s; JPEG =
    # stream byte at the 8x8-block index of pixel s//3 in a pw-wide image
    jblk = "((((s // 3) // pw) // 8) * jbw + ((s // 3) % pw) // 8)"
    byte_hex = (
        "substr(sha256(media_ref || ':' || CAST({b} // 32 AS VARCHAR)),"
        " ({b} % 32) * 2 + 1, 2)"
    )
    png_hex = byte_hex.format(b="s")
    jpeg_hex = byte_hex.format(b=jblk)
    frames = _SQL_MEDIA_FRAME_SAMPLE
    return f"""
WITH {_SQL_MEDIA_CTE.strip()},
imgs AS (
  SELECT doc_id, media_ref, pw, ph, 0 AS jbw
  FROM (SELECT doc_id, media_ref, {_SQL_PNG_DIMS.strip()}
        FROM mt WHERE kind = 'image' AND NOT {_SQL_IMG_JPEG})
  UNION ALL
  SELECT doc_id, media_ref, jbw * 8 AS pw, jbh * 8 AS ph, jbw
  FROM (SELECT doc_id, media_ref, {_SQL_JPEG_DIMS.strip()}
        FROM mt WHERE kind = 'image' AND {_SQL_IMG_JPEG})
),
dims AS (
  SELECT doc_id, media_ref, pw, ph, jbw,
         greatest(1, least({out_w} * ph, {out_h} * pw) // ph) AS tw,
         greatest(1, least({out_w} * ph, {out_h} * pw) // pw) AS th
  FROM imgs
),
rs AS (
  SELECT doc_id, media_ref, tw, th,
         md5(upper(array_to_string(
           list_transform(
             list_transform(range(tw * th * 3), i -> {src}),
             s -> CASE WHEN jbw = 0 THEN {png_hex} ELSE {jpeg_hex} END), ''))) AS payload_md5
  FROM dims
),
f AS ({frames})
SELECT doc_id, media_ref, 'resize' AS op, CAST(tw AS INT) AS out_width,
       CAST(th AS INT) AS out_height, CAST(-1 AS BIGINT) AS ts_ms, payload_md5
FROM rs
UNION ALL
SELECT doc_id, media_ref, 'frame' AS op, CAST(-1 AS INT) AS out_width,
       CAST(-1 AS INT) AS out_height, CAST(ts_ms AS BIGINT) AS ts_ms,
       '' AS payload_md5
FROM f
"""


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup under the driver's hasher (VERDICT r03
    next#4): build a deterministic multi-file landing zone (documents as
    single-span DOC_SCHEMA docs + a re-keyed duplicate slice), drain it
    through the REAL Structured Streaming dedup (cross-batch state,
    maxFilesPerTrigger=2 forces multiple micro-batches), and return the
    surviving content keys with their output multiplicities. n_out=1
    everywhere ⇔ the stream suppressed every planted duplicate; the key
    set ⇔ batch D1 semantics (stream ≡ batch, now hash-checked, not just
    pytest-asserted)."""
    import os
    import tempfile

    from pie_spark.streaming.dedup import streaming_dedup_docs

    base = tempfile.mkdtemp(prefix="pie_stream_q_")
    docs = _t(spark, sf_dir, "documents")
    spans_col = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            F.col("text").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        )
    ).alias("spans")
    one = docs.select(F.col("doc_id").cast("string").alias("doc_id"), spans_col)
    dup = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.concat(F.lit("dup-"), F.col("doc_id").cast("string")).alias("doc_id"),
        spans_col,
    )
    landing = os.path.join(base, "in")
    one.unionByName(dup).repartition(6).write.parquet(landing)

    out_dir = os.path.join(base, "out")
    streaming_dedup_docs(
        spark, landing, out_dir,
        checkpoint_dir=os.path.join(base, "ckpt"),
        max_files_per_trigger=2,
    )
    return (
        spark.read.parquet(out_dir)
        .groupBy("content_md5")
        .agg(F.count("*").cast("long").alias("n_out"))
    )


def _streaming_dedup_sql() -> str:
    return f"""
WITH all_docs AS (
  SELECT text FROM documents
  UNION ALL
  SELECT text FROM documents WHERE doc_id % 7 = 0
)
SELECT DISTINCT md5({_DUCK_NORM}) AS content_md5, CAST(1 AS BIGINT) AS n_out
FROM all_docs
"""


def q_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end training-data prep flow as one query: keep docs
    that are (a) high-quality, (b) English, (c) their near-dup cluster's
    representative (or singleton), (d) not contaminated by the benchmark
    slice, (e) in the train split. Every stage is an already
    hash-checked operator; this pins their COMPOSITION to DuckDB."""
    from pie_spark.dedup.clusters import near_dup_clusters
    from pie_spark.prep.decontam import contamination_hits
    from pie_spark.prep.scores import combined_doc_scores

    d = _t(spark, sf_dir, "documents").repartition(32, "doc_id")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)

    # r03: quality+lang+split fused into ONE corpus scan (the r02 form
    # joined three separately-scanned frames back on doc_id)
    scores = combined_doc_scores(
        corpus, split_weights={"train": 0.9, "val": 0.05, "test": 0.05}
    )
    drop = (
        near_dup_clusters(corpus, threshold=0.5)
        .filter(F.col("doc_id") != F.col("cluster_rep"))
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )
    contam = contamination_hits(corpus, bench, n=3, min_overlap=1).select("doc_id")
    return (
        scores.filter(
            (F.col("quality_ppm") >= 600000)
            & (F.col("lang_guess") == "en")
            & (F.col("split") == "train")
        )
        .join(drop, "doc_id", "left_anti")
        .join(contam, "doc_id", "left_anti")
        .select("doc_id", "quality_ppm", "lang_guess", "split")
    )


def _training_manifest_sql() -> str:
    # compose the already-verified per-operator SQL as CTEs, restricted
    # to the corpus slice (doc_id % 20 <> 0) exactly like the Spark side
    corp = "(SELECT * FROM documents WHERE doc_id % 20 <> 0)"
    quality = SQL_QUALITY_SCORES.replace("FROM documents", f"FROM {corp}")
    lang = _lang_id_sql().replace("FROM documents", f"FROM {corp}")
    clusters = _neardup_clusters_sql(threshold=0.5).replace("FROM documents", f"FROM {corp}")
    splits = SQL_SPLIT_ASSIGN.replace("FROM documents", f"FROM {corp}")
    return f"""
WITH q AS ({quality}),
l AS ({lang}),
s AS ({splits}),
cl AS ({clusters}),
dc AS ({SQL_DECONTAMINATE})
SELECT q.doc_id, q.quality_ppm, l.lang_guess, s.split
FROM q
JOIN l USING (doc_id)
JOIN s USING (doc_id)
WHERE q.quality_ppm >= 600000 AND l.lang_guess = 'en' AND s.split = 'train'
  AND NOT EXISTS (SELECT 1 FROM cl WHERE CAST(cl.doc_id AS BIGINT) = q.doc_id
                  AND cl.doc_id <> cl.cluster_rep)
  AND NOT EXISTS (SELECT 1 FROM dc WHERE dc.doc_id = q.doc_id)
"""


COLLOC_MIN_PAIR_DOCS = 100
COMENTION_MIN_PAIR_DOCS = 320
KCORE_K = 10

# shared oracle CTEs: the co-mention graph recipe (tokenize →
# per-doc-distinct incidence → pair counts), textually reused by the
# word_colloc / triangle_counts / kcore_nodes oracles so all three
# check the SAME graph construction
_SQL_COMENTION_CTES = """
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
inc AS (SELECT DISTINCT doc_id, token FROM toks WHERE token <> ''),
pair AS (SELECT a.token AS w1, b.token AS w2, CAST(count(*) AS BIGINT) AS pair_docs
         FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.token < b.token
         GROUP BY 1, 2)
"""


def q_word_colloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24: collocation mining (r06 operator, born folded — registry at
    the 50 cap): doc-level co-occurrence counts + integer-ppm lift over
    the documents corpus (text/colloc.py). Lift is monotone in PMI, so
    the association ranking is PMI's — without a cross-engine ``log``
    in the hash path; SQL DIV keeps every ppm exact."""
    from pie_spark.text.colloc import collocation_lift

    return collocation_lift(
        _tp(spark, sf_dir, "documents"), min_pair_docs=COLLOC_MIN_PAIR_DOCS
    )


SQL_WORD_COLLOC = f"""
WITH {_SQL_COMENTION_CTES},
df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM inc GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT w1, w2, pair_docs,
       CAST((n.n_docs * pair_docs * 1000000) // (d1.df * d2.df) AS BIGINT) AS lift_ppm
FROM pair
JOIN df d1 ON d1.token = pair.w1
JOIN df d2 ON d2.token = pair.w2
CROSS JOIN n
WHERE pair_docs >= {COLLOC_MIN_PAIR_DOCS}
"""


def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6: triangle counting (r06 operator, born folded — registry at
    the 50 cap): per-node triangle participation on the co-mention
    graph (edges = term pairs co-occurring in ≥ COMENTION_MIN_PAIR_DOCS
    docs) via
    degree-ordered orientation (graph/triangles.py). The oracle counts
    the NAIVE way — a 3-way self-join with a < b < c — so the hash
    check proves the oriented algorithm finds exactly the naive set."""
    from pie_spark.graph.triangles import triangle_counts
    from pie_spark.text.colloc import comention_edges

    edges = comention_edges(
        _tp(spark, sf_dir, "documents"), min_pair_docs=COMENTION_MIN_PAIR_DOCS
    )
    return triangle_counts(edges)


SQL_TRIANGLE_COUNTS = f"""
WITH {_SQL_COMENTION_CTES},
e AS (SELECT w1, w2 FROM pair WHERE pair_docs >= {COMENTION_MIN_PAIR_DOCS}),
tri AS (
  SELECT e1.w1 AS x, e1.w2 AS y, e2.w2 AS z
  FROM e e1
  JOIN e e2 ON e2.w1 = e1.w2
  JOIN e e3 ON e3.w1 = e1.w1 AND e3.w2 = e2.w2
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM corners GROUP BY 1
"""


_KCORE_LAST_SF_DIR: str | None = None


def q_kcore_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7: k-core decomposition (r06 operator, born folded — registry
    at the 50 cap): iterative peeling (graph/kcore.py) of the same
    co-mention graph the triangle row runs on, k=KCORE_K. The lazy
    oracle replays peeling in the independent plain-Python
    implementation over the DuckDB-read edge set, inlined as VALUES
    (the Lloyd/PageRank/LPA replay precedent)."""
    from pie_spark.graph.kcore import kcore
    from pie_spark.text.colloc import comention_edges

    global _KCORE_LAST_SF_DIR
    _KCORE_LAST_SF_DIR = sf_dir
    edges = comention_edges(
        _tp(spark, sf_dir, "documents"), min_pair_docs=COMENTION_MIN_PAIR_DOCS
    )
    return kcore(edges, k=KCORE_K)


def _kcore_nodes_sql() -> str:
    """Lazy oracle: plain-Python peel over the SAME parquet-derived
    edge set, inlined as VALUES."""
    import os

    import duckdb

    from pie_spark.graph.kcore import kcore_reference

    base = _KCORE_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH {_SQL_COMENTION_CTES.replace("FROM documents",
             f"FROM read_parquet('{base}/documents.parquet')")}
        SELECT w1, w2 FROM pair WHERE pair_docs >= {COMENTION_MIN_PAIR_DOCS}
        """
    ).fetchall()
    con.close()
    core = kcore_reference(edges, k=KCORE_K)
    if not core:
        return "SELECT CAST(NULL AS VARCHAR) AS node, CAST(NULL AS BIGINT) AS core_deg WHERE FALSE"

    def _q(v: str) -> str:
        return v.replace("'", "''")

    values = ",\n".join(
        f"('{_q(n)}', CAST({d} AS BIGINT))" for n, d in sorted(core.items())
    )
    return f"SELECT * FROM (VALUES {values}) AS t(node, core_deg)"


# k-anonymity audit constants: quasi-identifiers = (nation, segment,
# shifted-kilo balance bucket); sensitive = exact balance in centi.
# The +100000 shift keeps every bucket argument non-negative so Spark's
# truncating DIV and DuckDB's flooring // agree (negative acctbal
# exists in the fixtures: min -994.28).
_KANON_SHIFT = 100_000
_KANON_BUCKET = 100_000


def q_kanon_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2: k-anonymity / l-diversity release audit (r06 operator, born
    folded — registry at the 50 cap): the class-size × diversity
    histogram (eval/kanon.py) over customer with QI = (nation, segment,
    kilo-balance bucket) and sensitive = exact centi balance. Exact
    integer counts end to end."""
    from pie_spark.eval.kanon import kanon_report

    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_centi"),
    ).withColumn(
        "bal_bucket",
        F.expr(f"(bal_centi + {_KANON_SHIFT}L) DIV {_KANON_BUCKET}L"),
    )
    return kanon_report(
        c, ["c_nationkey", "c_mktsegment", "bal_bucket"], "bal_centi"
    )


SQL_KANON_RISK = f"""
WITH c AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_centi,
         (CAST(round(c_acctbal * 100) AS BIGINT) + {_KANON_SHIFT}) // {_KANON_BUCKET} AS bal_bucket
  FROM customer
),
per_value AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket, bal_centi,
         CAST(count(*) AS BIGINT) AS n
  FROM c GROUP BY 1, 2, 3, 4
),
classes AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket,
         CAST(sum(n) AS BIGINT) AS class_size,
         CAST(count(*) AS BIGINT) AS l_distinct
  FROM per_value GROUP BY 1, 2, 3
)
SELECT class_size,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_individuals,
       CAST(min(l_distinct) AS BIGINT) AS min_l,
       CAST(sum(CASE WHEN l_distinct = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_l1_classes
FROM classes GROUP BY 1
"""


def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6b: local clustering coefficients (r06 operator, born folded —
    registry at the 50 cap): exact integer-ppm coefficient per node of
    the same co-mention graph the triangle row runs on —
    2e6·tri DIV (deg·(deg−1)). The oracle recomputes degree AND naive
    triangle counts independently, then applies the identical DIV."""
    from pie_spark.graph.triangles import clustering_coefficients
    from pie_spark.text.colloc import comention_edges

    edges = comention_edges(
        _tp(spark, sf_dir, "documents"), min_pair_docs=COMENTION_MIN_PAIR_DOCS
    )
    return clustering_coefficients(edges)


SQL_CLUSTERING_COEFF = f"""
WITH {_SQL_COMENTION_CTES},
e AS (SELECT w1, w2 FROM pair WHERE pair_docs >= {COMENTION_MIN_PAIR_DOCS}),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT w1 AS node FROM e UNION ALL SELECT w2 FROM e) _
  GROUP BY 1
),
tri AS (
  SELECT e1.w1 AS x, e1.w2 AS y, e2.w2 AS z
  FROM e e1
  JOIN e e2 ON e2.w1 = e1.w2
  JOIN e e3 ON e3.w1 = e1.w1 AND e3.w2 = e2.w2
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n FROM corners GROUP BY 1)
SELECT d.node, d.deg,
       CAST(coalesce(tc.n, 0) AS BIGINT) AS n_triangles,
       CAST((2000000 * coalesce(tc.n, 0)) // (d.deg * (d.deg - 1)) AS BIGINT) AS cluster_ppm
FROM deg d LEFT JOIN tc ON tc.node = d.node
WHERE d.deg >= 2
"""


JACCARD_MAX_MIDDLE_DEG = 20


def q_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9: neighborhood-Jaccard alias scoring (r06 operator, born
    folded — registry at the 50 cap): distributional similarity over
    the co-mention graph (graph/similarity.py) with the hub-middle
    guard set BELOW the fixture's max degree (23) so the driver-style
    hash check covers the approximation rule itself — the oracle
    replays adjacency, the degree cut, pair counts, and the integer
    DIV verbatim."""
    from pie_spark.graph.similarity import neighborhood_jaccard
    from pie_spark.text.colloc import comention_edges

    edges = comention_edges(
        _tp(spark, sf_dir, "documents"), min_pair_docs=COMENTION_MIN_PAIR_DOCS
    )
    return neighborhood_jaccard(
        edges, max_middle_degree=JACCARD_MAX_MIDDLE_DEG
    )


SQL_NEIGHBOR_JACCARD = f"""
WITH {_SQL_COMENTION_CTES},
e AS (SELECT w1, w2 FROM pair WHERE pair_docs >= {COMENTION_MIN_PAIR_DOCS}),
adj AS (SELECT w1 AS src, w2 AS dst FROM e UNION ALL SELECT w2, w1 FROM e),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
mid AS (
  SELECT adj.src, adj.dst FROM adj
  JOIN deg ON deg.node = adj.src
  WHERE deg.deg <= {JACCARD_MAX_MIDDLE_DEG}
),
p AS (
  SELECT x.dst AS a, y.dst AS b, CAST(count(*) AS BIGINT) AS shared
  FROM mid x JOIN mid y ON x.src = y.src AND x.dst < y.dst
  GROUP BY 1, 2
)
SELECT a, b, shared, da.deg AS deg_a, db.deg AS deg_b,
       CAST((1000000 * shared) // (da.deg + db.deg - shared) AS BIGINT) AS jaccard_ppm
FROM p
JOIN deg da ON da.node = p.a
JOIN deg db ON db.node = p.b
"""


BFS_SOURCES = ["spark", "window"]
_BFS_LAST_SF_DIR: str | None = None


def q_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G8: multi-source BFS hop distances (r06 operator, born folded —
    registry at the 50 cap): blast-radius reachability over the same
    co-mention graph the triangle/k-core rows run on, sources =
    BFS_SOURCES (graph/bfs.py). The lazy oracle replays BFS in the
    independent plain-Python deque implementation over the DuckDB-read
    edge set, inlined as VALUES."""
    from pie_spark.graph.bfs import bfs_distances
    from pie_spark.text.colloc import comention_edges

    global _BFS_LAST_SF_DIR
    _BFS_LAST_SF_DIR = sf_dir
    edges = comention_edges(
        _tp(spark, sf_dir, "documents"), min_pair_docs=COMENTION_MIN_PAIR_DOCS
    )
    return bfs_distances(edges, BFS_SOURCES)


def _bfs_distances_sql() -> str:
    """Lazy oracle: plain-Python deque BFS over the SAME parquet-derived
    edge set, inlined as VALUES."""
    import os

    import duckdb

    from pie_spark.graph.bfs import bfs_reference

    base = _BFS_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH {_SQL_COMENTION_CTES.replace("FROM documents",
             f"FROM read_parquet('{base}/documents.parquet')")}
        SELECT w1, w2 FROM pair WHERE pair_docs >= {COMENTION_MIN_PAIR_DOCS}
        """
    ).fetchall()
    con.close()
    dist = bfs_reference(edges, BFS_SOURCES)

    def _q(v: str) -> str:
        return v.replace("'", "''")

    values = ",\n".join(
        f"('{_q(n)}', CAST({d} AS INTEGER))" for n, d in sorted(dist.items())
    )
    return f"SELECT * FROM (VALUES {values}) AS t(node, dist)"


KANON_SUPPRESS_K = 10


def q_kanon_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4: k-anonymity record suppression (r06 operator, born folded —
    registry at the 50 cap): the enforcement transform — customers
    whose (nation, segment) class has ≥ 10 members survive, each row
    carrying its class_size for downstream re-verification. Pure
    relational algebra; DuckDB replays it verbatim."""
    from pie_spark.eval.kanon import suppress_below_k

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    return suppress_below_k(
        c, ["c_nationkey", "c_mktsegment"], k=KANON_SUPPRESS_K
    )


SQL_KANON_SUPPRESS = f"""
WITH sizes AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS class_size
  FROM customer GROUP BY 1, 2
)
SELECT c.c_nationkey, c.c_mktsegment, c.c_custkey, s.class_size
FROM customer c JOIN sizes s
  ON s.c_nationkey = c.c_nationkey AND s.c_mktsegment = c.c_mktsegment
WHERE s.class_size >= {KANON_SUPPRESS_K}
"""


SKIPGRAM_WINDOW = 3


def q_skipgram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X25: skip-gram pair extraction (r06 operator, born folded —
    registry at the 50 cap): directional co-occurrence counts within a
    3-token window + GloVe 1/d distance weights in exact integer ppm
    (text/colloc.py:skipgram_counts) — the word2vec/GloVe feeder. One
    shuffle: all three lead offsets share the (doc_id, pos) window
    sort; the oracle replays lead/stack/weights verbatim in DuckDB."""
    from pie_spark.text.colloc import skipgram_counts

    return skipgram_counts(
        _tp(spark, sf_dir, "documents"), window=SKIPGRAM_WINDOW
    )


def _skipgram_sql() -> str:
    w = SKIPGRAM_WINDOW
    leads = ",\n         ".join(
        f"lead(token, {d}) OVER w AS c{d}" for d in range(1, w + 1)
    )
    arms = "\n  UNION ALL ".join(
        f"SELECT token AS w1, c{d} AS w2, {d} AS dist FROM led WHERE c{d} IS NOT NULL"
        for d in range(1, w + 1)
    )
    return f"""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
toks AS (
  SELECT doc_id, unnest(l) AS token, unnest(range(1, len(l) + 1)) AS i
  FROM base
),
ft AS (SELECT * FROM toks WHERE token <> ''),
led AS (
  SELECT doc_id, token,
         {leads}
  FROM ft
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
pairs AS (
  {arms}
)
SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(1000000 // dist) AS BIGINT) AS glove_weight_ppm
FROM pairs GROUP BY 1, 2
"""


def q_kanon_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3: generalization ladder (r06 operator, born folded — registry
    at the 50 cap): k-anonymity class statistics at every prefix-
    generalization level of the QI hierarchy in ONE rollup pass
    (eval/kanon.py) — the chooser for "coarsen until every class ≥ k"
    reads this bounded table, never the data. Same customer QI ladder
    as kanon_risk, finest-first (nation, segment, balance bucket)."""
    from pie_spark.eval.kanon import generalization_ladder

    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_centi"),
    ).withColumn(
        "bal_bucket",
        F.expr(f"(bal_centi + {_KANON_SHIFT}L) DIV {_KANON_BUCKET}L"),
    )
    return generalization_ladder(
        c, ["c_nationkey", "c_mktsegment", "bal_bucket"]
    )


SQL_KANON_LADDER = f"""
WITH c AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(round(c_acctbal * 100) AS BIGINT) + {_KANON_SHIFT}) // {_KANON_BUCKET} AS bal_bucket
  FROM customer
),
classes AS (
  SELECT CAST(3 - (GROUPING(c_nationkey) + GROUPING(c_mktsegment) + GROUPING(bal_bucket)) AS BIGINT) AS level,
         CAST(count(*) AS BIGINT) AS class_size
  FROM c
  GROUP BY ROLLUP (c_nationkey, c_mktsegment, bal_bucket)
)
SELECT level,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(class_size) AS BIGINT) AS min_class_size,
       CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_5,
       CAST(sum(CASE WHEN class_size < 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_25
FROM classes GROUP BY 1
"""


WALK_LEN = 5
WALKS_PER_NODE = 2
_WALKS_LAST_SF_DIR: str | None = None


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10: deterministic random-walk corpus (r06 operator, born folded —
    registry at the 50 cap): DeepWalk-style walks over the symmetrized
    co-mention graph (graph/walks.py) — the embedding-training corpus
    generator; its ``path`` column feeds skipgram_counts unchanged.
    The lazy oracle replays the walks in the independent plain-Python
    implementation over the DuckDB-read edge set, inlined as VALUES
    (the BFS/k-core/PageRank precedent)."""
    from pie_spark.graph.walks import random_walks, symmetrize
    from pie_spark.text.colloc import comention_edges

    global _WALKS_LAST_SF_DIR
    _WALKS_LAST_SF_DIR = sf_dir
    edges = comention_edges(
        _tp(spark, sf_dir, "documents"), min_pair_docs=COMENTION_MIN_PAIR_DOCS
    )
    return random_walks(
        symmetrize(edges), walk_len=WALK_LEN, walks_per_node=WALKS_PER_NODE
    )


def _random_walks_sql() -> str:
    """Lazy oracle: plain-Python walk replay over the SAME parquet-
    derived co-mention edge set (symmetrized in the replay), inlined
    as VALUES."""
    import os

    import duckdb

    from pie_spark.graph.walks import random_walks_reference

    base = _WALKS_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH {_SQL_COMENTION_CTES.replace("FROM documents",
             f"FROM read_parquet('{base}/documents.parquet')")}
        SELECT w1, w2 FROM pair WHERE pair_docs >= {COMENTION_MIN_PAIR_DOCS}
        """
    ).fetchall()
    con.close()
    sym = sorted({(a, b) for a, b in edges} | {(b, a) for a, b in edges})
    walks = random_walks_reference(sym, WALK_LEN, WALKS_PER_NODE)

    def _q(v: str) -> str:
        return v.replace("'", "''")

    values = ",\n".join(
        f"('{_q(s)}', CAST({k} AS INTEGER), '{_q(p)}')" for s, k, p in sorted(walks)
    )
    return f"SELECT * FROM (VALUES {values}) AS t(start, walk_no, path)"


def q_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9b: resource-allocation link-prediction index (r06 operator,
    born folded — registry at the 50 cap): Σ 10^6 DIV deg(middle) over
    common neighbors on the co-mention graph (graph/similarity.py) —
    the integer-exact Adamic–Adar surrogate; guard set BELOW the
    fixture max degree so the hash covers the drop rule. Fully
    relational; the oracle replays it verbatim in DuckDB SQL."""
    from pie_spark.graph.similarity import resource_allocation
    from pie_spark.text.colloc import comention_edges

    edges = comention_edges(
        _tp(spark, sf_dir, "documents"), min_pair_docs=COMENTION_MIN_PAIR_DOCS
    )
    return resource_allocation(edges, max_middle_degree=20, min_shared=2)


SQL_RESOURCE_ALLOCATION = f"""
WITH {_SQL_COMENTION_CTES},
e AS (SELECT w1, w2 FROM pair WHERE pair_docs >= {COMENTION_MIN_PAIR_DOCS}),
adj AS (SELECT w1 AS src, w2 AS dst FROM e UNION ALL SELECT w2, w1 FROM e),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
mid AS (
  SELECT a.src, a.dst, CAST(1000000 // d.deg AS BIGINT) AS w_ppm
  FROM adj a JOIN deg d ON d.node = a.src AND d.deg <= 20
)
SELECT x.dst AS a, y.dst AS b,
       CAST(count(*) AS BIGINT) AS shared,
       CAST(sum(x.w_ppm) AS BIGINT) AS ra_ppm
FROM mid x JOIN mid y ON x.src = y.src AND x.dst < y.dst
GROUP BY 1, 2
HAVING count(*) >= 2
"""


HYPERBALL_ROUNDS = 3


def q_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G13: HyperBall neighborhood-function estimation (r06 operator,
    born folded — registry at the 50 cap): per-node d-hop ball
    sketches over the symmetrized co-mention graph via elementwise
    register max along edges (graph/hyperball.py — the deterministic
    sha256 HLL registers from link/hll.py, 16 LONG columns so every
    round's union is an algebraic agg). The hash-checked columns are
    the EXACT integers (scaled register sum, empty count); the float
    estimate is pytest-pinned for accuracy, off the driver path. Lazy
    VALUES oracle from the independent Python replay."""
    from pie_spark.graph.hyperball import hyperball
    from pie_spark.text.colloc import comention_edges

    global _BFS_LAST_SF_DIR
    _BFS_LAST_SF_DIR = sf_dir
    fwd = comention_edges(
        _tp(spark, sf_dir, "documents"), min_pair_docs=COMENTION_MIN_PAIR_DOCS
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return hyperball(edges, rounds=HYPERBALL_ROUNDS)


def _hyperball_sql() -> str:
    """Lazy oracle: plain-Python HyperBall replay over the SAME
    parquet-derived symmetric edge set, inlined as VALUES."""
    import os

    import duckdb

    from pie_spark.graph.hyperball import hyperball_reference

    base = _BFS_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    fwd = con.execute(
        f"""
        WITH {_SQL_COMENTION_CTES.replace("FROM documents",
             f"FROM read_parquet('{base}/documents.parquet')")}
        SELECT w1, w2 FROM pair WHERE pair_docs >= {COMENTION_MIN_PAIR_DOCS}
        """
    ).fetchall()
    con.close()
    sym = sorted(fwd) + sorted((d, s) for s, d in fwd)
    rows = hyperball_reference(sym, rounds=HYPERBALL_ROUNDS)

    def _q(v: str) -> str:
        return v.replace("'", "''")

    values = ",\n".join(
        f"('{_q(n)}', CAST({t} AS BIGINT), CAST({s} AS BIGINT),"
        f" CAST({e} AS BIGINT))"
        for n, t, s, e in sorted(rows)
    )
    return (
        "SELECT * FROM (VALUES "
        + values
        + ") AS t(node, round, reg_sum, empties)"
    )


PPR_ITERS = 8


def q_ppr_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4b: personalized PageRank (r06 operator, born folded — registry
    at the 50 cap): seed-teleport proximity scores around BFS_SOURCES
    on the symmetrized co-mention graph (graph/pagerank.py) — the
    entity-centric relevance score for linker priors and seed
    expansion. Lazy VALUES oracle from the independent Python replay
    over the DuckDB-read edges."""
    from pie_spark.graph.pagerank import personalized_pagerank
    from pie_spark.text.colloc import comention_edges

    global _BFS_LAST_SF_DIR
    _BFS_LAST_SF_DIR = sf_dir
    fwd = comention_edges(
        _tp(spark, sf_dir, "documents"), min_pair_docs=COMENTION_MIN_PAIR_DOCS
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return personalized_pagerank(edges, BFS_SOURCES, iters=PPR_ITERS)


def _ppr_entities_sql() -> str:
    """Lazy oracle: plain-Python personalized-PageRank replay over the
    SAME parquet-derived symmetric edge set, inlined as VALUES."""
    import os

    import duckdb

    from pie_spark.graph.pagerank import personalized_pagerank_reference

    base = _BFS_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    fwd = con.execute(
        f"""
        WITH {_SQL_COMENTION_CTES.replace("FROM documents",
             f"FROM read_parquet('{base}/documents.parquet')")}
        SELECT w1, w2 FROM pair WHERE pair_docs >= {COMENTION_MIN_PAIR_DOCS}
        """
    ).fetchall()
    con.close()
    edge_list = sorted(fwd) + sorted((d, s) for s, d in fwd)
    ranks = personalized_pagerank_reference(edge_list, BFS_SOURCES, iters=PPR_ITERS)

    def _q(v: str) -> str:
        return v.replace("'", "''")

    values = ",\n".join(
        f"('{_q(n)}', CAST({r} AS BIGINT))" for n, r in sorted(ranks.items())
    )
    return f"SELECT * FROM (VALUES {values}) AS t(node, rank_ppb)"


def q_sssp_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G12: weighted shortest paths (r06 operator, born folded —
    registry at the 50 cap): association distance over the co-mention
    graph weighted by rarity cost (10^6 DIV pair_docs — rare
    co-occurrences are strong/cheap edges), sources = BFS_SOURCES
    (graph/sssp.py). The lazy oracle replays it with an independent
    Python DIJKSTRA over the DuckDB-read weighted edges — a different
    algorithm, so the hash checks the relaxation fixpoint itself."""
    from pie_spark.graph.sssp import sssp_distances
    from pie_spark.text.colloc import cooccurrence_counts, doc_term_incidence

    global _BFS_LAST_SF_DIR
    _BFS_LAST_SF_DIR = sf_dir
    w_edges = (
        cooccurrence_counts(doc_term_incidence(_tp(spark, sf_dir, "documents")))
        .filter(F.col("pair_docs") >= COMENTION_MIN_PAIR_DOCS)
        .select(
            F.col("w1").alias("src"),
            F.col("w2").alias("dst"),
            F.expr("1000000 DIV pair_docs").cast("long").alias("w"),
        )
    )
    return sssp_distances(w_edges, BFS_SOURCES)


def _sssp_distances_sql() -> str:
    """Lazy oracle: independent Python Dijkstra over the SAME parquet-
    derived weighted edge set, inlined as VALUES."""
    import os

    import duckdb

    from pie_spark.graph.sssp import sssp_reference

    base = _BFS_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH {_SQL_COMENTION_CTES.replace("FROM documents",
             f"FROM read_parquet('{base}/documents.parquet')")}
        SELECT w1, w2, CAST(1000000 // pair_docs AS BIGINT)
        FROM pair WHERE pair_docs >= {COMENTION_MIN_PAIR_DOCS}
        """
    ).fetchall()
    con.close()
    dist = sssp_reference(edges, BFS_SOURCES)

    def _q(v: str) -> str:
        return v.replace("'", "''")

    values = ",\n".join(
        f"('{_q(n)}', CAST({d} AS BIGINT))" for n, d in sorted(dist.items())
    )
    return f"SELECT * FROM (VALUES {values}) AS t(node, dist)"


N2V_WALK_LEN = 5
N2V_MAX_BIAS_DEG = 8  # below the fixture max degree → the guard BITES
                      # on some hops, so the oracle hash covers both
                      # the biased pick and the degradation rule


def q_node2vec_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10b: second-order (node2vec) biased walk corpus (r06 operator,
    born folded — registry at the 50 cap): integer p/q-weighted walks
    over the symmetrized co-mention graph (graph/walks.py). The bias
    cap is set BELOW the fixture max degree so the hub degradation
    rule is inside the hash check, the neighbor_jaccard guard
    precedent. Lazy VALUES oracle from the independent Python replay."""
    from pie_spark.graph.walks import node2vec_walks, symmetrize
    from pie_spark.text.colloc import comention_edges

    global _WALKS_LAST_SF_DIR
    _WALKS_LAST_SF_DIR = sf_dir
    edges = comention_edges(
        _tp(spark, sf_dir, "documents"), min_pair_docs=COMENTION_MIN_PAIR_DOCS
    )
    return node2vec_walks(
        symmetrize(edges),
        walk_len=N2V_WALK_LEN,
        walks_per_node=WALKS_PER_NODE,
        max_bias_degree=N2V_MAX_BIAS_DEG,
    )


def _node2vec_corpus_sql() -> str:
    """Lazy oracle: plain-Python node2vec replay over the DuckDB-read
    co-mention edge set, inlined as VALUES."""
    import os

    import duckdb

    from pie_spark.graph.walks import node2vec_walks_reference

    base = _WALKS_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH {_SQL_COMENTION_CTES.replace("FROM documents",
             f"FROM read_parquet('{base}/documents.parquet')")}
        SELECT w1, w2 FROM pair WHERE pair_docs >= {COMENTION_MIN_PAIR_DOCS}
        """
    ).fetchall()
    con.close()
    sym = sorted({(a, b) for a, b in edges} | {(b, a) for a, b in edges})
    walks = node2vec_walks_reference(
        sym,
        N2V_WALK_LEN,
        WALKS_PER_NODE,
        max_bias_degree=N2V_MAX_BIAS_DEG,
    )

    def _q(v: str) -> str:
        return v.replace("'", "''")

    values = ",\n".join(
        f"('{_q(s)}', CAST({k} AS INTEGER), '{_q(p)}')" for s, k, p in sorted(walks)
    )
    return f"SELECT * FROM (VALUES {values}) AS t(start, walk_no, path)"


def q_weighted_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10c: edge-weighted walk corpus (r06 operator, born folded —
    registry at the 50 cap): first-order walks over the co-mention
    graph with step probability ∝ pair_docs (the walk drifts toward
    strongly-associated entities) via the global-offset cumulative-
    interval draw resolved through the J9 range join
    (graph/walks.py:weighted_walks). Lazy VALUES oracle from the
    independent bisect replay over the DuckDB-read weighted edges."""
    from pie_spark.graph.walks import weighted_walks
    from pie_spark.text.colloc import cooccurrence_counts, doc_term_incidence

    global _WALKS_LAST_SF_DIR
    _WALKS_LAST_SF_DIR = sf_dir
    fwd = (
        cooccurrence_counts(doc_term_incidence(_tp(spark, sf_dir, "documents")))
        .filter(F.col("pair_docs") >= COMENTION_MIN_PAIR_DOCS)
        .select(
            F.col("w1").alias("src"),
            F.col("w2").alias("dst"),
            F.col("pair_docs").cast("long").alias("w"),
        )
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    return weighted_walks(edges, walk_len=WALK_LEN, walks_per_node=WALKS_PER_NODE)


def _weighted_walks_sql() -> str:
    """Lazy oracle: independent bisect replay over the SAME parquet-
    derived weighted edge set, inlined as VALUES."""
    import os

    import duckdb

    from pie_spark.graph.walks import weighted_walks_reference

    base = _WALKS_LAST_SF_DIR or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    fwd = con.execute(
        f"""
        WITH {_SQL_COMENTION_CTES.replace("FROM documents",
             f"FROM read_parquet('{base}/documents.parquet')")}
        SELECT w1, w2, pair_docs FROM pair
        WHERE pair_docs >= {COMENTION_MIN_PAIR_DOCS}
        """
    ).fetchall()
    con.close()
    wedges = sorted(fwd) + sorted((d, s, w) for s, d, w in fwd)
    walks = weighted_walks_reference(wedges, WALK_LEN, WALKS_PER_NODE)

    def _q(v: str) -> str:
        return v.replace("'", "''")

    values = ",\n".join(
        f"('{_q(s)}', CAST({k} AS INTEGER), '{_q(p)}')" for s, k, p in sorted(walks)
    )
    return f"SELECT * FROM (VALUES {values}) AS t(start, walk_no, path)"


TRANSE_N_NEG = 4
TRANSE_PROBES = 3
_TRANSE_PACK = 1 << 40


def q_transe_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G11: filtered TransE negative sampling (r06 operator, born
    folded — registry at the 50 cap): per true triple of the
    customer/supplier→nation KG, up to 4 deterministic tail-corruption
    negatives that provably form NO true triple (graph/negatives.py) —
    the embedding-trainer feed. Fully relational, so the oracle
    replays every stage verbatim in DuckDB SQL (row_number vocab,
    generate_series probes, md5 h64, NOT EXISTS filter, min-packed
    probe election)."""
    from pie_spark.graph.negatives import transe_negatives

    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    trip = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .select(
            F.col("c_name").alias("subj"),
            F.lit("IN_NATION").alias("pred"),
            F.col("n_name").alias("obj"),
        )
        .unionByName(
            s.join(n, s.s_nationkey == n.n_nationkey).select(
                F.col("s_name").alias("subj"),
                F.lit("FROM_NATION").alias("pred"),
                F.col("n_name").alias("obj"),
            )
        )
    )
    return transe_negatives(trip, n_neg=TRANSE_N_NEG, probes=TRANSE_PROBES)


def q_weighted_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G11b: frequency-weighted negative sampling (r06 operator, born
    folded — registry at the 50 cap): tails corrupted proportionally
    to their unigram frequency as triple tails (the word2vec hard-
    negative recipe) on the customer/supplier→nation KG; the
    categorical draw is cumulative-weight intervals matched by the
    bucketized RANGE JOIN (graph/negatives.py + events/rangejoin.py).
    The oracle replays the draw as a direct BETWEEN join (DuckDB
    IEJoin) — an independent algorithm — and every other stage
    verbatim."""
    from pie_spark.graph.negatives import weighted_negatives

    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    trip = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .select(
            F.col("c_name").alias("subj"),
            F.lit("IN_NATION").alias("pred"),
            F.col("n_name").alias("obj"),
        )
        .unionByName(
            s.join(n, s.s_nationkey == n.n_nationkey).select(
                F.col("s_name").alias("subj"),
                F.lit("FROM_NATION").alias("pred"),
                F.col("n_name").alias("obj"),
            )
        )
    )
    wts = trip.groupBy(F.col("obj").alias("entity")).agg(
        F.count("*").cast("long").alias("w")
    )
    return weighted_negatives(
        trip, wts, n_neg=TRANSE_N_NEG, probes=TRANSE_PROBES
    )


SQL_WEIGHTED_NEGATIVES = f"""
WITH trip0 AS (
  SELECT c_name AS subj, 'IN_NATION' AS pred, n_name AS obj
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION
  SELECT s_name, 'FROM_NATION', n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
wts AS (SELECT obj AS entity, CAST(count(*) AS BIGINT) AS w FROM trip0 GROUP BY 1),
cum AS (
  SELECT entity,
         CAST(row_number() OVER (ORDER BY entity) - 1 AS BIGINT) AS idx,
         CAST(sum(w) OVER (ORDER BY entity) - w AS BIGINT) AS cum_lo,
         CAST(sum(w) OVER (ORDER BY entity) - 1 AS BIGINT) AS cum_hi
  FROM wts
),
tot AS (SELECT CAST(max(cum_hi) + 1 AS BIGINT) AS wtot FROM cum),
draws AS (
  SELECT t.subj, t.pred, t.obj, k.slot, j.probe,
         ('0x' || substr(md5(t.subj || '#' || t.pred || '#' || t.obj || '#' ||
              CAST(k.slot AS VARCHAR) || '#' || CAST(j.probe AS VARCHAR)),
              1, 15))::UBIGINT::BIGINT % (SELECT wtot FROM tot) AS h
  FROM trip0 t, generate_series(1, {TRANSE_N_NEG}) AS k(slot),
       generate_series(0, {TRANSE_PROBES - 1}) AS j(probe)
),
m AS (
  SELECT d.subj, d.pred, d.obj, d.slot, d.probe, c.entity, c.idx
  FROM draws d JOIN cum c ON d.h BETWEEN c.cum_lo AND c.cum_hi
),
surv AS (
  SELECT * FROM m
  WHERE m.entity <> m.obj
    AND NOT EXISTS (SELECT 1 FROM trip0 t
                    WHERE t.subj = m.subj AND t.pred = m.pred
                      AND t.obj = m.entity)
),
el AS (
  SELECT subj, pred, obj, slot,
         min(probe * {_TRANSE_PACK} + idx) AS enc
  FROM surv GROUP BY 1, 2, 3, 4
)
SELECT el.subj, el.pred, el.obj, CAST(el.slot AS BIGINT) AS slot,
       CAST(el.enc // {_TRANSE_PACK} AS BIGINT) AS probe,
       c.entity AS neg_obj
FROM el JOIN cum c ON c.idx = el.enc % {_TRANSE_PACK}
"""


SQL_TRANSE_NEGATIVES = f"""
WITH trip AS (
  SELECT c_name AS subj, 'IN_NATION' AS pred, n_name AS obj
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION
  SELECT s_name, 'FROM_NATION', n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
ents AS (
  SELECT DISTINCT entity FROM (
    SELECT subj AS entity FROM trip UNION SELECT obj FROM trip
  )
),
vocab AS (
  SELECT entity,
         CAST(row_number() OVER (ORDER BY entity) - 1 AS BIGINT) AS idx
  FROM ents
),
nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vocab),
ti AS (
  SELECT t.subj, t.pred, vo.idx AS obj_idx
  FROM trip t JOIN vocab vo ON vo.entity = t.obj
),
cand AS (
  SELECT ti.subj, ti.pred, ti.obj_idx, k.slot, j.probe,
         ('0x' || substr(md5(ti.subj || '#' || ti.pred || '#' ||
              CAST(ti.obj_idx AS VARCHAR) || '#' || CAST(k.slot AS VARCHAR) ||
              '#' || CAST(j.probe AS VARCHAR)), 1, 15))::UBIGINT::BIGINT
           % (SELECT n FROM nv) AS cand_idx
  FROM ti, generate_series(1, {TRANSE_N_NEG}) AS k(slot),
       generate_series(0, {TRANSE_PROBES - 1}) AS j(probe)
),
surv AS (
  SELECT * FROM cand c
  WHERE c.cand_idx <> c.obj_idx
    AND NOT EXISTS (SELECT 1 FROM ti t
                    WHERE t.subj = c.subj AND t.pred = c.pred
                      AND t.obj_idx = c.cand_idx)
),
el AS (
  SELECT subj, pred, obj_idx, slot,
         min(probe * {_TRANSE_PACK} + cand_idx) AS enc
  FROM surv GROUP BY 1, 2, 3, 4
)
SELECT el.subj, el.pred, vo.entity AS obj, CAST(el.slot AS BIGINT) AS slot,
       CAST(el.enc // {_TRANSE_PACK} AS BIGINT) AS probe,
       vn.entity AS neg_obj
FROM el
JOIN vocab vo ON vo.idx = el.obj_idx
JOIN vocab vn ON vn.idx = el.enc % {_TRANSE_PACK}
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# Registry ordering note (VERDICT r03 next#2): the driver evaluates at
# most 50 queries in registration order — r03 registered 52 and the last
# two got no signal. This registry is consolidated to 50 entries
# (doc_stats = token_counts+quality_scores+fingerprints;
# media_transforms = resize+frame_sample; simhash/minhash_signatures/
# passage_dedup fold into their *_neardups / *_text consumers whose
# generated mirrors recompute them in SQL), so EVERY operator keeps a
# hard-signal row. Keep len(QUERIES) <= 50 — tests/test_oracle.py
# asserts it.
#
# Oracle values may be a ready SQL string, a zero-arg CALLABLE returning
# the SQL (for oracles that are expensive to build — resolved lazily by
# __spark_entry__.oracle_sql() and tests/test_oracle.py), or None
# (rows-only, non-SQL-expressible — each with a documented reason).
QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], object]] = {
    # flagship pipeline on the GENERATOR corpus — hash-checked since
    # r06: the lazy oracles materialize the same deterministic corpus
    # to parquet (pure gen_doc) and replay every stage in DuckDB
    # (extract/pipeline_sql.py)
    "pipeline_triples": (q_pipeline_triples, _pipeline_triples_gen_sql),
    "pipeline_mentions": (q_pipeline_mentions, _pipeline_mentions_gen_sql),
    # r05: renamed from pipeline_mentions_regex — now the FULL detector
    # union (regex ∪ gazetteer ∪ CRF Viterbi), with the tagger replayed
    # in recursive DuckDB SQL (tagger_sql.py); lazy oracle (the CTE
    # block is large)
    "pipeline_mentions_all": (q_pipeline_mentions_all, _pipeline_mentions_all_sql),
    # r05: the WHOLE real pipeline (detectors → merge → link → CC →
    # pair → triples) hash-checked against a full independent DuckDB
    # replay; funds its registry slot by folding top1_candidate (J2/W1
    # runs inside this row's linking; standalone keeps FOLDED oracle)
    "pipeline_triples_all": (q_pipeline_triples_all, _pipeline_triples_all_sql),
    "cc_canonical_map": (q_cc_canonical_map, _cc_canonical_map_sql()),
    # cc_components folded to FOLDED (r06): slot funds cc_incremental —
    # the same chain graph, but the Spark side merges a delta into an
    # existing map (incremental_components) while the oracle computes
    # the full-graph fixpoint, so the row checks incremental ≡ full
    # cross-engine; full CC stays driver-checked in cc_canonical_map
    # and pipeline_triples_all
    "cc_incremental": (q_cc_incremental, SQL_CC_COMPONENTS),
    "span_invariant": (q_span_invariant, SQL_SPAN_INVARIANT),
    # SQL-checked operator surface
    "span_explode": (q_span_explode, SQL_SPAN_EXPLODE),
    "regex_mentions": (q_regex_mentions, _regex_mentions_sql()),
    "redact_pii": (q_redact_pii, _redact_pii_sql()),
    "split_assign": (q_split_assign, SQL_SPLIT_ASSIGN),
    "pack_chunks": (q_pack_chunks, SQL_PACK_CHUNKS),
    "chunk_overlap": (q_chunk_overlap, SQL_CHUNK_OVERLAP),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "training_manifest": (q_training_manifest, _training_manifest_sql()),
    "email_extract": (q_email_extract, SQL_EMAIL_EXTRACT),
    "ssn_validity": (q_ssn_validity, SQL_SSN_VALIDITY),
    "surface_freq": (q_surface_freq, SQL_SURFACE_FREQ),
    # top1_candidate folded to FOLDED (r05): slot funds
    # pipeline_triples_all; J2/W1 covered there on real pipeline output
    "canonical_election": (q_canonical_election, SQL_CANONICAL_ELECTION),
    "broadcast_dim_join": (q_broadcast_dim_join, SQL_BROADCAST_DIM_JOIN),
    "nearest_prev_pair": (q_nearest_prev_pair, SQL_NEAREST_PREV_PAIR),
    "edges_selfjoin": (q_edges_selfjoin, SQL_EDGES_SELFJOIN),
    "triple_dedup": (q_triple_dedup, SQL_TRIPLE_DEDUP),
    "anti_join_delta": (q_anti_join_delta, SQL_ANTI_JOIN_DELTA),
    "salted_hot_join": (q_salted_hot_join, SQL_SALTED_HOT_JOIN),
    "approx_distinct": (q_approx_distinct, _approx_distinct_sql),
    "prf_score": (q_prf_score, SQL_PRF_SCORE),
    # training-data pipeline ops
    "doc_stats": (q_doc_stats, _doc_stats_sql()),
    "lang_id": (q_lang_id, _lang_id_sql()),
    "exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
    "passage_dedup_text": (q_passage_dedup_text, SQL_PASSAGE_DEDUP_TEXT),
    "vocab_topk": (q_vocab_topk, SQL_VOCAB_TOPK),
    "repetition_scores": (q_repetition_scores, SQL_REPETITION_SCORES),
    # stratified_sample folded to FOLDED (r06): its row-level salted-
    # hash threshold evidence is carried by mix_epochs (same machinery,
    # harder multiset semantics); rate derivation stays driver-checked
    # in temperature_sample
    "mix_epochs": (q_mix_epochs, SQL_MIX_EPOCHS),
    "temperature_sample": (q_temperature_sample, _temperature_sample_sql()),
    # hash_sample folded to the pytest oracle (test_oracle.FOLDED): its
    # threshold machinery is already driver-covered by stratified/
    # temperature_sample, and the slot funds the higher-information
    # bigram-LM row under the 50-query cap
    "lm_scores": (q_lm_scores, _lm_scores_sql()),
    "cm_heavy_hitters": (q_cm_heavy_hitters, _cm_heavy_hitters_sql()),
    "minhash_neardups": (q_minhash_neardups, _minhash_neardups_sql()),
    "neardup_clusters": (q_neardup_clusters, _neardup_clusters_sql()),
    "simhash_neardups": (q_simhash_neardups, None),  # generated mirror below
    "ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    # embedding_neardups folded to FOLDED (r06): embedding_clusters'
    # oracle already embeds the full cosine-pair SQL as its first CTE,
    # so the pair stage keeps a driver hash signal there; the slot
    # funds minhash_delta (incremental dedup vs a standing index —
    # incremental ≡ full cross-engine, guard semantics included)
    "minhash_delta": (q_minhash_delta, _minhash_delta_sql()),
    "embedding_clusters": (q_embedding_clusters, _embedding_clusters_sql()),
    "embedding_centroids": (q_embedding_centroids, _embedding_centroids_sql()),
    "ann_brute_force": (q_ann_brute_force, SQL_ANN_BRUTE_FORCE),
    "ann_lsh": (q_ann_lsh, _ann_lsh_sql()),
    # trained-IVF (VERDICT r04 next#1): the oracle is a CALLABLE —
    # resolved lazily by oracle_sql()/tests because building it runs
    # the plain-Python Lloyd replay over the sf0.01 fixtures
    "ann_ivf": (q_ann_ivf, _ann_ivf_trained_sql),
    "media_features": (q_media_features, _media_features_sql()),
    "media_transforms": (q_media_transforms, _media_transforms_sql()),
    "streaming_dedup": (q_streaming_dedup, _streaming_dedup_sql()),
}


def _wire_simhash_sql() -> None:
    from pie_spark.dedup.simhash import near_duplicate_pairs_sql

    fn, _ = QUERIES["simhash_neardups"]
    QUERIES["simhash_neardups"] = (fn, near_duplicate_pairs_sql(max_hamming=6))


_wire_simhash_sql()
