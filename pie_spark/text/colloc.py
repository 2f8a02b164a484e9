"""Word co-occurrence statistics — collocation mining and the
co-mention graph builder (X24; KG analytics feeder).

Two consumers motivate this stage in a KG-construction engine:
  * collocation mining for the text-quality/tokenizer stack (which
    word pairs travel together far above chance — multi-word-unit
    candidates for the BPE/vocab layers), and
  * the CO-OCCURS graph: entities (here: vocabulary terms; the same
    machinery runs on mention surfaces) become nodes, strong
    co-occurrence becomes edges — the input to the triangle/k-core/
    community analytics in pie_spark/graph/.

Association scored as integer-ppm LIFT, not log-PMI:
  lift_ppm = (n_docs · pair_docs · 10^6) div (df1 · df2)
PMI = log(lift) is monotone in lift, so every ranking/threshold
decision PMI supports is available from lift — without a cross-engine
``log`` in the hash path (Spark's log and DuckDB's log disagree in the
last ulp often enough to poison value-hash parity; the integer-ppm
discipline sidesteps it the same way lm.py and bm25.py scale to
micro-units). Exactness envelope: n_docs · max_df · 10^6 must stay
inside LONG — corpora to ~3·10^6 fully-shared-vocab docs at ppm; at
the 10^12-doc design point pass ``scale=1`` (coarser units, same
total order) or widen to DECIMAL(38,0).

Scale shape (10^12-doc design point):
  * incidence = explode → (token, doc_id) distinct: two
    partial-aggregable stages, the same shape vocab.py uses.
  * the pair stage is a PER-DOC self-join: co-partitioned on doc_id,
    output bounded by Σ_d (terms_d choose 2). Whole-doc pairing is
    quadratic in per-doc DISTINCT terms, so callers bound it with
    ``vocab`` (a broadcast semi-join restricting to a chosen term set
    — top-k vocabulary, gazetteer surfaces, entity ids). With |vocab|
    = V the per-doc cost is ≤ C(V,2) regardless of doc length, and
    the pair aggregate is algebraic (map-side combine collapses the
    flood before the shuffle).
  * df join is vocab-sized → broadcast on both pair endpoints; n_docs
    is a 1-row aggregate cross-joined (broadcast), never collected.

Oracle strategy: the whole recipe is pure relational algebra —
tests/test_oracle.py replays it verbatim in DuckDB (folded
``word_colloc`` row), and the co-mention EDGE SET feeds the
triangle/k-core oracles downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LIFT_SCALE = 1_000_000  # ppm


def doc_term_incidence(
    docs: DataFrame,
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, token) distinct incidence; ``vocab`` (a 1-column
    ``token`` DataFrame) restricts the term universe via a broadcast
    semi-join — the quadratic-pair bound at scale."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    if vocab is not None:
        toks = toks.join(F.broadcast(vocab.select("token")), "token", "left_semi")
    return toks.select("doc_id", "token").distinct()


def cooccurrence_counts(incidence: DataFrame) -> DataFrame:
    """(w1, w2, pair_docs) with w1 < w2: number of docs containing
    both terms. One co-partitioned self-join on doc_id + one algebraic
    count — the map-side combine absorbs hot pairs before the shuffle."""
    a = incidence.select(F.col("doc_id"), F.col("token").alias("w1"))
    b = incidence.select(F.col("doc_id"), F.col("token").alias("w2"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("pair_docs"))
    )


def collocation_lift(
    docs: DataFrame,
    min_pair_docs: int = 1,
    text_col: str = "text",
    vocab: DataFrame | None = None,
    scale: int = LIFT_SCALE,
) -> DataFrame:
    """(w1, w2, pair_docs, lift_ppm): co-occurrence association.

    lift_ppm > scale ⇔ the pair co-occurs above independence (PMI > 0).
    All arithmetic exact-integer; deterministic across partitionings.
    """
    inc = doc_term_incidence(docs, text_col, vocab)
    pairs = cooccurrence_counts(inc).filter(F.col("pair_docs") >= min_pair_docs)
    df = inc.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    n = docs.select(F.count("*").cast("long").alias("n_docs"))
    return (
        pairs.join(F.broadcast(df.withColumnRenamed("token", "w1")), "w1")
        .withColumnRenamed("df", "df1")
        .join(F.broadcast(df.withColumnRenamed("token", "w2")), "w2")
        .withColumnRenamed("df", "df2")
        .join(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "pair_docs",
            # SQL DIV — exact integer division (pagerank.py discipline;
            # float `/` + cast would route through double past 2^53)
            F.expr(f"(n_docs * pair_docs * {int(scale)}L) DIV (df1 * df2)")
            .cast("long")
            .alias("lift_ppm"),
        )
    )


def mention_comention_edges(
    mentions: DataFrame,
    min_pair_docs: int,
    surface_col: str = "surface",
) -> DataFrame:
    """(src, dst) co-mention edges over EXTRACTED ENTITY SURFACES —
    the KG-native instantiation of this module: feed the pipeline's
    mention table (extract_stage output — any detector mix) instead of
    word tokens, and the triangle / k-core / BFS / alias-Jaccard
    family runs on the entity graph directly. Incidence = per-doc
    distinct surfaces; everything downstream is the same machinery as
    ``comention_edges``."""
    inc = mentions.select(
        "doc_id", F.col(surface_col).alias("token")
    ).distinct()
    return (
        cooccurrence_counts(inc)
        .filter(F.col("pair_docs") >= min_pair_docs)
        .select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
    )


def skipgram_counts(
    docs: DataFrame,
    window: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, n_pairs, glove_weight_ppm): directional skip-gram
    co-occurrence counts — the word2vec/GloVe pair-extraction stage of
    an embedding-training pipeline. w2 follows w1 within ``window``
    (non-empty) token positions; glove_weight_ppm is GloVe's 1/d
    distance weighting as exact integer ppm (Σ 1000000 DIV d — no
    float harmonic sums, partitioning-invariant).

    Scale shape: ONE shuffle total. Tokens window-sort by (doc_id,
    pos); the ``window`` context columns are ``lead`` offsets sharing
    that single sort; ``stack`` fans them to (dist, ctx) rows
    narrowly; the final count/sum agg is algebraic (map-side combine
    collapses Zipf-hot pairs before the shuffle). Output is
    vocab²-bounded, corpus-size-independent. No self-join — the
    window-lead formulation replaces the (doc_id, |Δpos| ≤ w)
    range-join a naive translation would shuffle twice for.
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token"),
    ).filter(F.col("token") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    led = toks.select(
        "token",
        *[F.lead("token", d).over(w).alias(f"c{d}") for d in range(1, window + 1)],
    )
    stack_args = ", ".join(f"{d}, c{d}" for d in range(1, window + 1))
    pairs = led.select(
        F.col("token").alias("w1"),
        F.expr(f"stack({window}, {stack_args}) AS (dist, w2)"),
    ).filter(F.col("w2").isNotNull())
    return pairs.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.expr("1000000 DIV dist")).cast("long").alias("glove_weight_ppm"),
    )


def comention_edges(
    docs: DataFrame,
    min_pair_docs: int,
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """(src, dst) undirected edge list (src < dst, one row per edge) of
    the co-mention graph: term pairs co-occurring in ≥ ``min_pair_docs``
    documents — the input contract of graph/triangles.py and
    graph/kcore.py."""
    return (
        cooccurrence_counts(doc_term_incidence(docs, text_col, vocab))
        .filter(F.col("pair_docs") >= min_pair_docs)
        .select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
    )
