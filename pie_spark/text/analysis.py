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
    quality score in [0,1]. Formula mirrored exactly in the oracle SQL."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = F.split(t, " ")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    punct = n_chars - F.length(F.regexp_replace(t, "[^a-zA-Z0-9 ]", ""))
    stop_hits = sum(_word_hits(t, w) for w in LANG_STOPWORDS["en"])
    punct_ratio = F.round(punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6)
    ttr = F.round(n_distinct / F.greatest(n_tokens, F.lit(1)), 6)
    len_score = F.least(n_chars / F.lit(400.0), F.lit(1.0))
    score = F.round(
        0.4 * len_score
        + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.3 * (1 - punct_ratio),
        6,
    )
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_m"),
        n_tokens.cast("long").alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("type_token_ratio"),
        score.alias("quality_score"),
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
                F.col(f"hits_{lang}").alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in LANG_STOPWORDS
        ]
    )
    # max by (hits, then reverse-lexicographic lang) — array_max picks the
    # struct-greatest; invert lang for asc tiebreak via a sort
    best = F.array_sort(pairs).getItem(len(LANG_STOPWORDS) - 1)
    return scored.select(
        "doc_id",
        *[F.col(f"hits_{lang}").cast("long") for lang in LANG_STOPWORDS],
        best["lang"].alias("lang_guess"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", shingle: int = 3) -> DataFrame:
    """Document fingerprints: full-content md5 (exact-dup key) + a
    min-shingle rolling fingerprint (word-``shingle``-gram, md5-min —
    portable across engines, unlike xxhash)."""
    t = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.lower(t), "[^a-z0-9 ]", ""))
    toks = F.split(norm, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - shingle, F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(shingle)])
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        F.array_min(F.transform(shingles, lambda s: F.md5(s))).alias("min_shingle_md5"),
    )
