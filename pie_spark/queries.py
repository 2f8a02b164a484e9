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


# ---------------------------------------------------------------------------
# pipeline (rows-only: Arrow-UDF extraction + iterative CC not SQL-expressible)
# ---------------------------------------------------------------------------


def _pipeline(spark: SparkSession, sf_dir: str):
    from pie_spark.fixtures.gen import entity_dict_df, interleaved_docs
    from pie_spark.pipeline import run

    docs = interleaved_docs(spark, sf_dir)
    return run(spark, PipelineConfig(), docs, entity_dict_df(spark))


def q_pipeline_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full KG-construction pipeline → (subj,pred,obj) triples."""
    return _pipeline(spark, sf_dir).triples


def q_pipeline_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged mention set (regex ∪ gazetteer ∪ CRF after overlap dedup)."""
    res = _pipeline(spark, sf_dir)
    return res.merged_mentions.select(
        "doc_id", "span_idx", "start", "end", "mention_type", "surface", "detector"
    )


def q_cc_canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed CC canonicalization map (iterative — rows-only)."""
    from pie_spark.canon.canonical import key_canonical_map
    from pie_spark.canon.cc import connected_components
    from pie_spark.canon.edges import build_edges
    from pie_spark.fixtures.gen import entity_dict_df

    labels = connected_components(build_edges(entity_dict_df(spark)))
    return key_canonical_map(labels).select("norm_key", "canon_entity_id")


def q_span_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-sequence invariant violations — MUST be empty (0 rows)."""
    from pie_spark.extract.invariants import violation_rows
    from pie_spark.extract.spans import explode_spans
    from pie_spark.fixtures.gen import interleaved_docs

    docs = interleaved_docs(spark, sf_dir)
    return violation_rows(docs, explode_spans(docs))


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


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # pipeline (rows-only)
    "pipeline_triples": (q_pipeline_triples, None),
    "pipeline_mentions": (q_pipeline_mentions, None),
    "cc_canonical_map": (q_cc_canonical_map, None),
    "span_invariant": (q_span_invariant, None),
    # SQL-checked operator surface
    "span_explode": (q_span_explode, SQL_SPAN_EXPLODE),
    "email_extract": (q_email_extract, SQL_EMAIL_EXTRACT),
    "ssn_validity": (q_ssn_validity, SQL_SSN_VALIDITY),
    "surface_freq": (q_surface_freq, SQL_SURFACE_FREQ),
    "top1_candidate": (q_top1_candidate, SQL_TOP1_CANDIDATE),
    "canonical_election": (q_canonical_election, SQL_CANONICAL_ELECTION),
    "broadcast_dim_join": (q_broadcast_dim_join, SQL_BROADCAST_DIM_JOIN),
    "nearest_prev_pair": (q_nearest_prev_pair, SQL_NEAREST_PREV_PAIR),
    "edges_selfjoin": (q_edges_selfjoin, SQL_EDGES_SELFJOIN),
    "triple_dedup": (q_triple_dedup, SQL_TRIPLE_DEDUP),
    "prf_score": (q_prf_score, SQL_PRF_SCORE),
}
