"""BM25 query-driven document scoring / retrieval (X19 in SURVEY.md
§2.12 — the standard lexical relevance ranker a training-data pipeline
needs for eval-set mining, targeted decontamination sweeps, and
"find documents like this benchmark prompt" curation queries).

Shape: ``fit_bm25`` makes ONE pass over the corpus for term document
frequencies plus a 1-row constants aggregation (N docs, total token
length — two exact longs, the only driver collect); ``score_query``
scores every matching document against a term list and returns exact
integer micro-scores, with top-k retrieval as a TakeOrderedAndProject
(never a global sort).

Determinism discipline (the lm.py / centroids / HLL pattern):
  * idf is floated ONCE PER TERM ROW from exact ints —
    ``idf_micro = round(ln(1 + (N - df + 0.5)/(df + 0.5)) · 1e6)``
    (the Robertson/Sparck-Jones form Lucene uses, always ≥ 0) — no
    float ever crosses an aggregation boundary.
  * the per-(doc, term) score floats once per JOINED ROW from exact
    ints (idf_micro, tf, dl, N, total_len) and identical-text literals
    (k1, b), then rounds to LONG micros; the per-doc reduction sums
    exact longs. Both engines evaluate the SAME SQL expression text
    (built by :func:`score_expr_sql`), so parity is by construction —
    bit-identical across partitionings and engines.

Scale shape (10^12-doc design point):
  * fit: explode → per-doc distinct → groupBy(term) partial agg; the
    shuffle carries (doc, term) distinct pairs, the output is
    vocabulary-sized. Constants agg is algebraic (two longs).
  * score: exploded tokens are filtered to the query's terms BEFORE
    any shuffle — the tf groupBy carries only query-term hits, not the
    corpus. Term stats join is query-sized and broadcast (a query is
    human-sized; the isin literal prunes map-side).
  * top-k = orderBy(...).limit(k) → TakeOrderedAndProject, per-partition
    heaps + driver merge of k rows, no global sort at any scale.

Edge semantics: query terms should be pre-normalized with the corpus
normalizer (``dedup.shingles.norm_text`` semantics — lowercase,
``\\p{L}\\p{N} `` only); unseen terms contribute nothing (no row
survives the stats join); an all-empty corpus (total_len = 0) returns
an empty result rather than dividing by zero.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _toks(text_col: str):
    from pie_spark.text.lm import _tokens

    return _tokens(text_col)


@dataclass
class BM25Index:
    """Fitted stats: a vocabulary-sized term table + two exact longs."""

    terms: DataFrame  # (term, df, idf_micro)
    n_docs: int
    total_len: int

    def avgdl(self) -> float:
        return self.total_len / self.n_docs if self.n_docs else 0.0


def idf_expr_sql(n_docs: int) -> str:
    """The idf expression both engines evaluate verbatim (per term row,
    inputs exact ints): Robertson/Sparck-Jones with the +1 inside the
    log (Lucene's non-negative variant)."""
    return (
        f"CAST(round(ln(1.0 + ({n_docs} - df + 0.5) / (df + 0.5)) "
        f"* {MICRO}) AS BIGINT)"
    )


def score_expr_sql(n_docs: int, total_len: int, k1: float, b: float) -> str:
    """The per-(doc, term) score expression, evaluated VERBATIM by both
    Spark and DuckDB (identical literal text ⇒ identical doubles ⇒
    identical rounding): idf_micro · tf·(k1+1) / (tf + k1·(1 − b +
    b·dl/avgdl)), with avgdl expanded to the exact-int ratio
    total_len/N so every input is an exact integer column."""
    return (
        f"CAST(round(idf_micro * (tf * ({k1} + 1.0)) / "
        f"(tf + {k1} * (1.0 - {b} + {b} * dl * {n_docs}.0 / {total_len})))"
        f" AS BIGINT)"
    )


def fit_bm25(docs: DataFrame, text_col: str = "text") -> BM25Index:
    """Term document-frequencies + idf micros, corpus constants.

    One aggregation scan for df (per-doc distinct terms → term counts),
    one 1-row constants agg (the only action; two longs cross to the
    driver). The terms table stays lazy — callers joining it per query
    pay one vocabulary-sized job each, the right trade for a fit-once /
    query-many index (persist externally if querying in a loop).
    """
    toks = docs.select(_toks(text_col).alias("toks"))
    consts = toks.agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(F.sum(F.size("toks")), F.lit(0)).cast("long").alias("tl"),
    ).collect()[0]
    n_docs, total_len = int(consts["n"]), int(consts["tl"])
    df_t = (
        toks.select(F.explode(F.array_distinct("toks")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    terms = df_t.select(
        "term", "df", F.expr(idf_expr_sql(n_docs)).alias("idf_micro")
    )
    return BM25Index(terms=terms, n_docs=n_docs, total_len=total_len)


def score_query(
    docs: DataFrame,
    index: BM25Index,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_matched, bm25_micro) for every document matching ≥ 1
    query term, highest score first (ties broken by doc_id so top-k is
    total-ordered). ``n_matched`` = distinct query terms present."""
    qt = sorted(set(query_terms))
    if not qt or index.n_docs == 0 or index.total_len == 0:
        return (
            docs.select("doc_id")
            .filter(F.lit(False))
            .select(
                "doc_id",
                F.lit(0).cast("long").alias("n_matched"),
                F.lit(0).cast("long").alias("bm25_micro"),
            )
        )
    exploded = docs.select(
        "doc_id",
        F.size(_toks(text_col)).alias("dl"),
        F.explode(_toks(text_col)).alias("term"),
    ).filter(F.col("term").isin(qt))  # prune to query hits BEFORE the shuffle
    tf = exploded.groupBy("doc_id", "dl", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    # the stats join is query-term-sized: filter the vocabulary table
    # to the query's terms, then broadcast it (≤ |query| rows)
    qstats = F.broadcast(index.terms.filter(F.col("term").isin(qt)))
    per_term = tf.join(qstats, "term").select(
        "doc_id",
        F.expr(
            score_expr_sql(index.n_docs, index.total_len, k1, b)
        ).alias("s_micro"),
    )
    scored = per_term.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_matched"),
        F.sum("s_micro").cast("long").alias("bm25_micro"),
    )
    if top_k is not None:
        scored = scored.orderBy(
            F.desc("bm25_micro"), F.asc("doc_id")
        ).limit(top_k)
    return scored.select("doc_id", "n_matched", "bm25_micro")
