"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All four are pure native column expressions (WholeStageCodegen — zero
Python), deterministic, and mirrored 1:1 by DuckDB oracle SQL in
pie_spark.queries. At 100 TB these run at scan speed: no shuffle, no
UDF, filters/projections push into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# stopword profiles for the language-ID heuristic (tiny, deterministic)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "a"],
    "es": ["el", "la", "de", "y"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
}


def _word_hits(text: Column, word: str) -> Column:
    """# occurrences of ``word`` as a whitespace-delimited token, via the
    portable pad-split-count trick (no regex dialect differences)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.regexp_replace(padded, needle, " ")))
        / (len(needle) - 1)
    ).cast("int")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish budget estimate (chars/4,
    the standard subword heuristic) + distinct-token count."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(F.split(t, " ")).cast("long").alias("n_tokens"),
        F.ceil(F.length(t) / 4).cast("long").alias("n_bpe_est"),
        F.size(F.array_distinct(F.split(t, " "))).cast("long").alias("n_distinct_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition signals + a composite
    quality score, all in integer parts-per-million.

    ppm integers instead of rounded doubles is deliberate: float
    ``round`` at engine boundaries is tie-broken differently (Java
    BigDecimal HALF_UP vs binary-value rounding), so a score landing on
    x.xxxxxx5 hash-mismatches the oracle. ``floor(1e6·a/b)`` on exact
    integer inputs is bit-identical everywhere (IEEE division of exact
    ints floors identically unless the quotient is an integer — in
    which case it is exact)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = F.split(t, " ")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    punct = n_chars - F.length(F.regexp_replace(t, "[^a-zA-Z0-9 ]", ""))
    stop_hits = sum(_word_hits(t, w) for w in LANG_STOPWORDS["en"])

    def ppm(num, den):
        return F.floor(num * F.lit(1000000) / F.greatest(den, F.lit(1))).cast("long")

    punct_ppm = ppm(punct, n_chars)
    stop_ppm = ppm(stop_hits, n_tokens)
    ttr_ppm = ppm(n_distinct, n_tokens)
    len_ppm = F.least(ppm(n_chars, F.lit(400)), F.lit(1000000))
    quality_ppm = (
        F.floor(len_ppm * 2 / 5)
        + F.floor(F.least(stop_ppm * 5, F.lit(1000000)) * 3 / 10)
        + F.floor((F.lit(1000000) - punct_ppm) * 3 / 10)
    ).cast("long")
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_m"),
        n_tokens.cast("long").alias("n_tokens"),
        punct_ppm.alias("punct_ppm"),
        stop_ppm.alias("stopword_ppm"),
        ttr_ppm.alias("ttr_ppm"),
        quality_ppm.alias("quality_ppm"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language-ID heuristic: per-language stopword hit
    counts, argmax guess with deterministic tiebreak (hit count desc,
    language code asc)."""
    t = F.col(text_col)
    hit_cols = {
        lang: sum(_word_hits(t, w) for w in words).alias(f"hits_{lang}")
        for lang, words in LANG_STOPWORDS.items()
    }
    scored = docs.select("doc_id", *hit_cols.values())
    pairs = F.array(
        *[
            F.struct(
                (-F.col(f"hits_{lang}")).alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in LANG_STOPWORDS
        ]
    )
    # argmax with asc-lang tiebreak: sort (neg_hits, lang) ascending and
    # take the FIRST element — highest hits, then lexicographically
    # smallest language code (mirrored 1:1 by the generated oracle SQL)
    best = F.array_sort(pairs).getItem(0)
    return scored.select(
        "doc_id",
        *[F.col(f"hits_{lang}").cast("long") for lang in LANG_STOPWORDS],
        best["lang"].alias("lang_guess"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", shingle: int = 3) -> DataFrame:
    """Document fingerprints: full-content md5 (exact-dup key) + a
    min-shingle rolling fingerprint (word-``shingle``-gram, md5-min —
    portable across engines, unlike xxhash).

    Tokenization is bound to its own projection first — a lambda over
    the raw split expression re-evaluates normalize+split per shingle
    (the shingles.py performance invariant)."""
    from pie_spark.dedup.shingles import norm_text, shingles_of

    bound = docs.select(
        "doc_id",
        norm_text(text_col).alias("__norm"),
        F.split(norm_text(text_col), " ").alias("__toks"),
    )
    return bound.select(
        "doc_id",
        F.md5("__norm").alias("content_md5"),
        F.array_min(
            F.transform(shingles_of(F.col("__toks"), shingle), lambda s: F.md5(s))
        ).alias("min_shingle_md5"),
    )
