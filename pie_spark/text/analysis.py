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

# Unicode-script tier for non-Latin languages: (lang, java_class,
# re2_class, rank). Java spells scripts \p{IsX}, RE2 \p{X} — same
# Unicode script property underneath (parity-tested in
# tests/test_multilingual.py). Rank fixes the argmax tiebreak order
# (Latin/stopword tier is rank 0 so an all-zero doc falls through to
# the stopword guess, preserving r02 behavior on ASCII corpora).
SCRIPT_LANGS = [
    ("ko", r"[\p{IsHangul}]", r"[\p{Hangul}]", 1),
    ("zh", r"[\p{IsHan}]", r"[\p{Han}]", 2),
    ("ru", r"[\p{IsCyrillic}]", r"[\p{Cyrillic}]", 3),
    ("ar", r"[\p{IsArabic}]", r"[\p{Arabic}]", 4),
    ("el", r"[\p{IsGreek}]", r"[\p{Greek}]", 5),
    ("hi", r"[\p{IsDevanagari}]", r"[\p{Devanagari}]", 6),
]
KANA_JAVA = r"[\p{IsHiragana}\p{IsKatakana}]"
KANA_RE2 = r"[\p{Hiragana}\p{Katakana}]"
LATIN_JAVA = r"[\p{IsLatin}]"
LATIN_RE2 = r"[\p{Latin}]"


def _script_count(text: Column, cls: str) -> Column:
    """# characters of a Unicode script class, via the length-diff trick
    (regexp_replace-delete then subtract — no per-char UDF)."""
    return F.length(text) - F.length(F.regexp_replace(text, cls, ""))


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


def quality_columns(t: Column) -> dict[str, Column]:
    """The quality signal expressions keyed by output name (expression
    form so fused single-scan scorers can pick what they need).

    ppm integers instead of rounded doubles is deliberate: float
    ``round`` at engine boundaries is tie-broken differently (Java
    BigDecimal HALF_UP vs binary-value rounding), so a score landing on
    x.xxxxxx5 hash-mismatches the oracle. ``floor(1e6·a/b)`` on exact
    integer inputs is bit-identical everywhere (IEEE division of exact
    ints floors identically unless the quotient is an integer — in
    which case it is exact)."""
    n_chars = F.length(t)
    toks = F.split(t, " ")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    # Unicode classes (r03): the r02 [^a-zA-Z0-9 ] counted every CJK /
    # Cyrillic char as "punctuation" → quality 0 for all non-Latin docs
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\p{L}\p{N} ]", ""))
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
    return {
        "n_chars_m": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "punct_ppm": punct_ppm,
        "stopword_ppm": stop_ppm,
        "ttr_ppm": ttr_ppm,
        "quality_ppm": quality_ppm,
    }


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition signals + a composite
    quality score, all in integer parts-per-million."""
    cols = quality_columns(F.col(text_col))
    return docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])


def lang_guess_column(t: Column) -> Column:
    """The two-tier language guess as ONE column expression (so fused
    single-scan scorers can use it without an intermediate frame):

    1. **Script tier** (new r03 — the r02 stopword-only version tagged
       every CJK/Cyrillic/Arabic doc 'de' via the zero-hit tiebreak):
       any kana ⇒ 'ja' (kana is conclusive; Japanese text usually has
       MORE Han than kana, so a pure count-argmax would mislabel it
       'zh'). Otherwise the doc's dominant script — argmax over
       per-script char counts including Latin — picks ko/zh/ru/ar/el/hi.
    2. **Stopword tier**: when Latin dominates (or nothing matched),
       the r02 stopword argmax over en/es/de/fr with (hits desc,
       lang asc) tiebreak — bit-identical to r02 on ASCII corpora.
    """
    hit_exprs = {
        lang: sum(_word_hits(t, w) for w in words)
        for lang, words in LANG_STOPWORDS.items()
    }
    pairs = F.array(
        *[
            F.struct(
                (-hit_exprs[lang]).alias("neg_hits"), F.lit(lang).alias("lang")
            )
            for lang in LANG_STOPWORDS
        ]
    )
    # stopword argmax with asc-lang tiebreak: sort (neg_hits, lang)
    # ascending, take FIRST (mirrored 1:1 by the generated oracle SQL)
    stop_guess = F.array_sort(pairs).getItem(0)["lang"]
    # dominant-script argmax: (neg_count, rank, lang); Latin is rank 0
    # so count ties fall through to the stopword guess
    script_pairs = F.array(
        F.struct(
            (-_script_count(t, LATIN_JAVA)).alias("neg"),
            F.lit(0).alias("rank"),
            stop_guess.alias("lang"),
        ),
        *[
            F.struct(
                (-_script_count(t, cls)).alias("neg"),
                F.lit(rank).alias("rank"),
                F.lit(lang).alias("lang"),
            )
            for lang, cls, _re2, rank in SCRIPT_LANGS
        ],
    )
    return F.when(_script_count(t, KANA_JAVA) > 0, F.lit("ja")).otherwise(
        F.array_sort(script_pairs).getItem(0)["lang"]
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, hits_*, lang_guess) — see :func:`lang_guess_column`."""
    t = F.col(text_col)
    hit_cols = [
        sum(_word_hits(t, w) for w in words).cast("long").alias(f"hits_{lang}")
        for lang, words in LANG_STOPWORDS.items()
    ]
    return docs.select(
        "doc_id", *hit_cols, lang_guess_column(t).alias("lang_guess")
    )


def repetition_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document, integer-ppm exact:

    * ``top_bigram_ppm`` — share of bigram slots taken by the single
      most frequent bigram (boilerplate/keyword-stuffing detector);
    * ``dup_bigram_ppm`` — share of bigram slots that are repeats of an
      earlier bigram ((total − distinct) / total).

    Shape: ONE explode → (doc_id, bigram) partial-agg count → per-doc
    agg — both stages map-side combinable, no window. Docs with < 2
    tokens re-enter via left join with zero fill so the output stays
    one-row-per-doc (oracle row parity).
    """
    t = F.col(text_col)
    toks = docs.select("doc_id", F.split(t, " ").alias("toks"))
    n = F.size("toks")
    # guard: sequence(0, n-2) with n < 2 would produce a DESCENDING
    # sequence (Spark fills backwards), not an empty array
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ",
                F.try_element_at("toks", (i + 1).cast("int")),
                F.try_element_at("toks", (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    b = toks.select("doc_id", F.explode(grams).alias("bg"))
    c = b.groupBy("doc_id", "bg").agg(F.count("*").alias("n"))
    a = c.groupBy("doc_id").agg(
        F.max("n").alias("top"),
        F.sum("n").alias("total"),
        F.count("*").alias("uniq"),
    )

    def ppm(num):
        return F.coalesce(
            F.floor(num * F.lit(1_000_000) / F.col("total")), F.lit(0)
        ).cast("long")

    return (
        docs.select("doc_id")
        .join(a, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("total"), F.lit(0)).cast("long").alias("n_bigrams"),
            ppm(F.col("top")).alias("top_bigram_ppm"),
            ppm(F.col("total") - F.col("uniq")).alias("dup_bigram_ppm"),
        )
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


def exact_quantiles(
    df: DataFrame, value_col: str, probs_ppm: list[int]
) -> DataFrame:
    """EXACT distributed quantiles over a discrete-valued column (token
    counts, doc lengths, per-doc scores in ppm) with NO global data
    sort: one map-side-combinable ``groupBy(value)`` count — the
    shuffle carries one row per DISTINCT value, V rows, with V << N
    for bounded domains — then a cumulative window over that V-row
    table and one broadcast probe per probability.

    Why not ``approx_percentile``: the sketch trades exactness for
    memory, and its estimates are estimator-specific (not
    cross-engine checkable — same reason approx_distinct is the one
    permanent rows-only oracle). For bounded domains exactness costs
    only the V-row shuffle, so it's effectively free at any N; the
    single-reducer cumulative sort is over V rows, NOT N (document
    scores in ppm: V ≤ 10^6 regardless of corpus size).

    Probabilities are integer ppm and the rank threshold is computed
    in pure integer arithmetic ``(p_ppm·N + 999999) div 10^6`` =
    ceil(p·N): at N = 10^12 the product is ~10^18, past float64's
    exact-integer range, so a float path would misrank — and integer
    parity is what makes the DuckDB oracle exact (memory: integer
    weights for cross-engine parity).

    Returns (p_ppm int, value long): q_p = min{v : #{x ≤ v} ≥
    ceil(p·N/10^6)} — the left-continuous empirical inverse CDF."""
    from pyspark.sql import Window

    spark = df.sparkSession
    counts = df.groupBy(F.col(value_col).cast("long").alias("v")).agg(
        F.count("*").alias("c")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select("v", F.sum("c").over(w).alias("cum"))
    total = counts.agg(F.sum("c").alias("n"))
    probs = spark.createDataFrame(
        [(int(p),) for p in sorted(probs_ppm)], "p_ppm int"
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(probs))
        .where(F.col("cum") >= F.expr("(p_ppm * n + 999999) div 1000000"))
        .groupBy("p_ppm")
        .agg(F.min("v").alias("value"))
    )


def percentile_rank(
    df: DataFrame, value_col: str, out_col: str = "pct_ppm"
) -> DataFrame:
    """X23: percentile-rank normalization — every row gains its value's
    global empirical-CDF position in integer ppm: ``pct_ppm =
    (cum(v) · 10^6) div N`` where cum(v) = #{x ≤ v}. The mixing-step
    normalizer: per-corpus quality scores live on incomparable scales
    (LM micro-bits vs Gopher ppm vs BM25 micros); their percentile
    ranks are directly comparable and threshold rules transfer across
    corpora ("keep the top 30 %" means the same thing everywhere).

    Same machinery and scale story as exact_quantiles (X17): one
    groupBy(value) partial agg (the shuffle carries V distinct values,
    never N rows), a cumulative window over the V-row table, then the
    V-row (value → pct) map is broadcast-joined back — the corpus is
    scanned once and never shuffles on its own size. Pure integer
    arithmetic end to end (exact at N = 10^12; ties share one rank, by
    definition of the CDF)."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(value_col).cast("long").alias("__v")).agg(
        F.count("*").alias("__c")
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select("__v", F.sum("__c").over(w).alias("__cum"))
    total = counts.agg(F.sum("__c").alias("__n"))
    ranks = cum.crossJoin(F.broadcast(total)).select(
        "__v", F.expr("(__cum * 1000000) div __n").cast("long").alias(out_col)
    )
    return df.join(
        F.broadcast(ranks), F.col(value_col).cast("long") == F.col("__v")
    ).drop("__v")


def compression_signals(
    docs: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """zlib compression ratio per document (X27) — the curation signal
    CCNet/RefinedWeb-class pipelines use beside token/quality stats: a
    LOW ratio_ppm means the text is machine-repetitive (boilerplate,
    keyword stuffing, generated spam — compresses away), a very HIGH
    ratio means high-entropy non-text (base64 blobs, minified code).

    (doc_id, raw_bytes, zlib_bytes, ratio_ppm) with
    ratio_ppm = zlib_bytes·10^6 // max(raw_bytes, 1) — exact integers.

    Shape: ONE ``mapInPandas`` pass (zlib is not expressible in native
    expressions; Arrow-batched like the media codecs — never per-row
    Python), zero shuffles, output one row per input row. Determinism:
    zlib with a fixed ``level`` is deterministic for a given zlib
    build — byte-stability is per-environment, not cross-platform
    (same caveat as any compression-based signal; the folded oracle
    replays zlib over the duckdb-read corpus IN THIS environment, so
    it checks the Spark-side plumbing — encoding, batching, row
    alignment — not zlib itself)."""
    import pandas as pd

    def run(batches):
        import zlib

        for pdf in batches:
            raw = [
                (t if isinstance(t, str) else "").encode("utf-8")
                for t in pdf[text_col]
            ]
            rb = [len(b) for b in raw]
            zb = [len(zlib.compress(b, level)) for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_bytes": rb,
                    "zlib_bytes": zb,
                    "ratio_ppm": [
                        z * 1_000_000 // max(r, 1) for r, z in zip(rb, zb)
                    ],
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, raw_bytes long, zlib_bytes long, ratio_ppm long"
    )
