"""M6 at dictionary scale: shuffle-join gazetteer matching (SURVEY.md
§2.3 M6 fallback; VERDICT r03 next#8).

The in-UDF Aho-Corasick matcher (gazetteer.py) needs every dictionary
surface on the driver and in every Python worker — broadcast-small by
spec (BASELINE.json:6), but a billion-surface dictionary cannot ship
that way. This module is the degradation path the pipeline switches to
when ``try_collect_surfaces`` finds the dictionary over
``PipelineConfig.dict_max_surfaces``: candidate token n-grams are
generated NATIVELY from the text (zero Python), matched against the
dictionary with a distributed equi-join on punctuation-stripped cores,
then re-verified as EXACT substring occurrences of the full surface
with the automaton's non-alnum flank guard — the dictionary never
touches the driver.

Parity with the automaton (asserted by tests/test_gazetteer_join.py on
the generator corpus + adversarial punctuation + a seeded fuzz batch):
every emitted hit is a verbatim substring occurrence of the full
surface with non-alnum flanks — exactly what AhoCorasick.finditer +
_boundary_ok accepts, so join hits ⊆ automaton hits ALWAYS (soundness
is unconditional). Coverage contract (documented, not silent): an
automaton hit is also found here iff its occurrence is TOKEN-ALIGNED —
the surface's alnum core starts at the first alnum char of some token
and ends at the last alnum char of a later token — and the surface's
own leading/trailing punctuation runs are shorter than ``CTX_PAD``.
The candidate n-gram width is DERIVED from the dictionary by default
(max surface token count, from the same bounded agg as the per-n
length bounds), so fallback mode no longer silently drops 4+-token
surfaces the automaton would match (ADVICE r04). True for person-name
gazetteers over prose (what M6 matches). Known non-covered shapes, automaton-path-only by design: a
surface buried mid-token behind INTERIOR punctuation
(``aa-Whitfield-bb`` — flanks are non-alnum but the occurrence is not
token-aligned), cores embedding doubled spaces, pure-punctuation
surfaces.

Scale shape (what shuffles at 10^12 docs):
  * candidate generation + core extraction: ONE narrow projection
    (``substring_index`` scans for char offsets — no window, no
    shuffle, no per-token array reallocation) and
    one ``explode``. Each candidate carries its core plus a
    ``CTX_PAD``-bounded context snippet (≤ core+16 chars) — the span
    text itself NEVER enters a shuffle and is scanned exactly once.
  * the ONLY shuffle is candidate cores ⋈ dictionary cores — salted on
    caller-supplied hot surfaces via the already-green J6 operator
    (AQE skew-join is the backstop; explicit salting also protects the
    downstream groupBys). Verification (full-surface equality + flank
    guard against the carried context) is a narrow filter after the
    join — r04's first cut verified by re-joining span text on doc_id,
    which the plan audit showed shuffles corpus-sized text; this shape
    does not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pie_spark.canon.salting import salted_join

_ALNUM = r"[\p{L}\p{N}]"
_NOT_ALNUM_HEAD = r"^[^\p{L}\p{N}]+"
_NOT_ALNUM_TAIL = r"[^\p{L}\p{N}]+$"

# context chars carried on each side of a candidate core: bounds the
# dictionary surfaces' leading/trailing punctuation (strictly <) plus
# one flank char. 8 covers any sane gazetteer entry ("Dr. ", " Jr.",
# quotes, parens) while keeping candidate rows tiny.
CTX_PAD = 8

# skip the candidate first-char isin-prefilter when the dictionary
# cores start with more distinct chars than this: for Latin-script
# person names it is a ~52-literal filter with real selectivity (the
# measured r04 64.7→38.4 s win), but for e.g. a CJK-surname dictionary
# it would be thousands of literals with ~zero selectivity — pure plan
# bloat (VERDICT r04 what's-wrong#1). The per-n length bounds and the
# join's bloom runtime filter carry that regime instead.
FIRST_CHAR_PREFILTER_MAX = 128


def _strip_core(col: Column) -> Column:
    return F.regexp_replace(F.regexp_replace(col, _NOT_ALNUM_HEAD, ""), _NOT_ALNUM_TAIL, "")


def _strip_core_py(s: str) -> str:
    """Python mirror of :func:`_strip_core` for driver-side hot-surface
    core derivation. [\\W_], not [^\\w]: ``\\w`` keeps underscores but
    ``\\p{L}\\p{N}`` does not, so a hot surface flanked by underscores
    would otherwise derive a core that never matches the dict-side skey
    and silently skip its salting (ADVICE r04 — perf-only)."""
    import re

    return re.sub(r"[\W_]+$", "", re.sub(r"^[\W_]+", "", s, flags=re.UNICODE))


def _exploded_candidates(
    text_spans: DataFrame,
    bounds_by_n: dict[int, tuple[int, int]],
    first_chars: list[str] | None = None,
) -> DataFrame:
    """(doc_id, span_idx, span_offset, g) rows, one per token-aligned
    candidate span: for token i and length n the core runs from the
    first alnum char of token i to the last alnum char of token i+n-1;
    ``g.skey`` is the exact core substring (the join key), ``g.ctx``
    is the core ± CTX_PAD chars of surrounding text, ``g.p`` the
    core's 0-based offset within ctx.

    ``bounds_by_n`` maps token count n → (min, max) core CHAR length of
    the dictionary surfaces with exactly n tokens; candidates are
    generated ONLY for the ns the dictionary actually contains, and each
    n prunes against its own bounds (VERDICT r04 next#2 — one global
    [min,max] let 2/3-gram candidates survive bounds set by short 1-gram
    surfaces; per-n bounds are what kill them before the substring
    builds).

    Shape (r06 — VERDICT r05 next#1): FILTER FIRST, COMPUTE LATER. The
    r05 shape computed a char-offset array (one ``substring_index``
    scan per token — O(text²) chars per span) and a lead/core strip
    struct (two regexes per token) for EVERY token, then pruned; the
    1M-doc profile showed this narrow stage alone cost 26–28 s of the
    27–29 s fallback wall while only ~2 tokens per doc survive the
    first-char prefilter. Now the ONLY per-token work is a first-char
    dispatch (alnum head → one ``isin``; punctuation head → strip then
    test; impossible head → false), and offsets/strips/substrings are
    computed inside the per-SURVIVOR candidate lambda. Re-inlining is
    the intended behavior here — each survivor's offsets are genuinely
    per-element scalars, unlike the r02/r04 shingle pathology where a
    SHARED whole-array expression was re-inlined per element. With the
    large-alphabet guard active (first_chars=None) the dispatch passes
    every alnum-containing token and the shape degrades gracefully
    toward the r05 cost (the per-n bounds still prune)."""
    toks = F.split(F.col("text"), " ")

    bound = text_spans.select(
        "doc_id",
        "span_idx",
        F.col("offset").alias("span_offset"),
        "text",
        toks.alias("__toks"),
    )

    text, t = F.col("text"), F.col("__toks")
    n_toks = F.size(t)

    valid_ns = sorted(bounds_by_n)

    def tok_offset(i) -> Column:
        # char offset (0-based) of token i: length of the first i
        # tokens + their i separators — ONE linear substring_index scan
        return F.when(i == F.lit(0), F.lit(0)).otherwise(
            F.length(
                F.call_function("substring_index", text, F.lit(" "), i)
            )
            + 1
        )

    def lead_of(x: Column) -> Column:
        return F.length(x) - F.length(F.regexp_replace(x, _NOT_ALNUM_HEAD, ""))

    def core_of(x: Column) -> Column:
        return F.length(_strip_core(x))

    def gram(i: Column, n: int) -> Column:
        lo, hi = bounds_by_n[n]
        tok_i = F.element_at(t, i + 1)
        last_tok = F.element_at(t, i + F.lit(n))
        start = tok_offset(i) + lead_of(tok_i)
        end = tok_offset(i + F.lit(n) - 1) + lead_of(last_tok) + core_of(last_tok)
        ctx_start = F.greatest(start - F.lit(CTX_PAD), F.lit(0))
        keep = (
            (i + F.lit(n) <= n_toks)
            & (end > start)
            & (end - start >= F.lit(lo))
            & (end - start <= F.lit(hi))
        )
        return F.when(
            keep,
            F.struct(
                start.cast("int").alias("cstart"),
                end.cast("int").alias("cend"),
                F.substring(text, start + 1, end - start).alias("skey"),
                (start - ctx_start).cast("int").alias("p"),
                F.substring(
                    text, ctx_start + 1, end - ctx_start + F.lit(CTX_PAD)
                ).alias("ctx"),
            ),
        )

    def is_candidate_start(i: Column) -> Column:
        """Cheap per-token dispatch — equivalent to the r05 per-gram
        ``substring(text, start+1, 1).isin(first_chars)`` guard (the
        core's first char IS the token's stripped first char), hoisted
        so it runs once per TOKEN with zero offset computation."""
        tok = F.element_at(t, i + 1)
        head = F.substring(tok, 1, 1)
        if first_chars is None:
            # large-alphabet regime: any token with an alnum char can
            # start a core (empty-core tokens die on end > start)
            return tok.rlike(_ALNUM)
        stripped_head = F.substring(
            F.regexp_replace(tok, _NOT_ALNUM_HEAD, ""), 1, 1
        )
        return F.when(head.isin(first_chars), F.lit(True)).otherwise(
            # punctuation-headed token ("(Mei"): strip, then test; an
            # alnum head NOT in first_chars can never match
            ~head.rlike(_ALNUM) & stripped_head.isin(first_chars)
        )

    cands = F.flatten(
        F.transform(
            F.filter(
                F.sequence(F.lit(0), F.greatest(n_toks - 1, F.lit(0))),
                is_candidate_start,
            ),
            lambda i: F.filter(
                # a python-side list comprehension, NOT a sequence
                # transform over n: only the token counts the dictionary
                # actually contains get a candidate expression at all
                F.array(*[gram(i, n) for n in valid_ns]),
                lambda g: g.isNotNull(),
            ),
        )
    )
    return bound.select(
        "doc_id", "span_idx", "span_offset", F.explode(cands).alias("g")
    )


def gazetteer_join_matches(
    text_spans: DataFrame,
    dict_df: DataFrame,
    max_ngram: int | None = None,
    hot: list[str] | None = None,
    salt_k: int = 1,
    score: float = 0.9,
) -> DataFrame:
    """Gazetteer mentions via distributed join — MENTION_SCHEMA rows
    with detector='gazetteer', same shape as the automaton path.

    ``dict_df`` needs a ``surface`` column; it is NEVER collected or
    broadcast. ``hot`` surfaces (e.g. from A4 top-k, streaming hot-key
    counters, or known-hot dictionary entries) are salted ``salt_k``
    ways in the core join; pass the SURFACE form (hot cores are derived
    here).

    ``max_ngram`` defaults to DERIVED from the dictionary (the max
    token count over surface cores, from the same bounded agg that
    yields the per-n length bounds) — ADVICE r04: a fixed default of 3
    silently never matched 4+-token surfaces in fallback mode while the
    automaton path did, a hit-set regression triggered just by the
    dictionary crossing ``dict_max_surfaces``. Pass it explicitly only
    to CAP candidate generation against an adversarial dictionary (one
    1000-token surface would otherwise cost 1000 candidate exprs per
    token position); an explicit cap re-introduces the documented
    coverage gap for longer surfaces.
    """
    head_len = F.length("surface") - F.length(
        F.regexp_replace("surface", _NOT_ALNUM_HEAD, "")
    )
    tail_len = F.length("surface") - F.length(
        F.regexp_replace("surface", _NOT_ALNUM_TAIL, "")
    )
    d = (
        dict_df.select("surface")
        .distinct()
        .select(
            "surface",
            _strip_core(F.col("surface")).alias("skey"),
            head_len.cast("int").alias("head_len"),
        )
        # pure-punctuation or punctuation-heavy surfaces: automaton-only
        # (coverage contract in the module docstring)
        .filter(
            (F.length("skey") > 0)
            & (head_len < CTX_PAD)
            & (tail_len < CTX_PAD)
        )
    )
    hot_cores = None
    if hot:
        hot_cores = [_strip_core_py(h) for h in hot if _strip_core_py(h)]

    # candidate length prune bounds, PER TOKEN COUNT n: one small agg
    # over the (possibly huge, never collected) dictionary — its result
    # is one row per distinct surface token count, bounded by the
    # longest surface, not the dictionary size. Per-n bounds beat the
    # r04 global [min,max] two ways: 2/3-gram candidates no longer
    # survive bounds set by short 1-gram surfaces, and token counts the
    # dictionary lacks entirely generate NO candidate expression at all.
    stats = (
        d.groupBy(F.size(F.split("skey", " ")).alias("n"))
        .agg(F.min(F.length("skey")).alias("lo"), F.max(F.length("skey")).alias("hi"))
        .collect()
    )
    bounds_by_n = {
        int(r["n"]): (int(r["lo"]), int(r["hi"]))
        for r in stats
        if max_ngram is None or int(r["n"]) <= max_ngram
    }
    if not bounds_by_n:  # empty dictionary → no hits, cheap plan
        sch = (
            "doc_id string, span_idx int, span_offset int, start int, end int,"
            " mention_type string, surface string, detector string, score double"
        )
        return text_spans.sparkSession.createDataFrame([], sch)
    # distinct first chars of dictionary cores: a 1-row-per-char agg
    # whose result is alphabet-bounded no matter how large the
    # dictionary is — NOT a dictionary collect. Skipped past the
    # alphabet guard (large-alphabet dictionaries: zero selectivity,
    # pure plan bloat — VERDICT r04 what's-wrong#1).
    first_chars: list[str] | None = [
        r["c"]
        for r in d.select(F.substring("skey", 1, 1).alias("c"))
        .distinct()
        .limit(FIRST_CHAR_PREFILTER_MAX + 1)  # early-out past the guard
        .collect()
    ]
    if len(first_chars) > FIRST_CHAR_PREFILTER_MAX:
        first_chars = None

    cand = _exploded_candidates(text_spans, bounds_by_n, first_chars).select(
        "doc_id",
        "span_idx",
        "span_offset",
        F.col("g.cstart").alias("cstart"),
        F.col("g.skey").alias("skey"),
        F.col("g.p").alias("p"),
        F.col("g.ctx").alias("ctx"),
    )

    core_hits = salted_join(cand, d, "skey", "doc_id", hot_cores or [], salt_k)

    # exact-substring verification against the carried context (the
    # automaton semantic): full surface = head punctuation + core + tail
    # punctuation must occur verbatim, with non-alnum flanks. All ctx
    # positions are guaranteed in range by the dict-side head/tail <
    # CTX_PAD filter (see module docstring).
    slen = F.length("surface")
    text_start = F.col("cstart") - F.col("head_len")  # absolute, for output
    cp = F.col("p") - F.col("head_len")  # surface offset within ctx, 0-based
    # flank-before guard only when text_start>0: Spark's substring treats
    # pos=0 like pos=1, which would read the match's OWN first char and
    # falsely reject every span-initial occurrence
    bad_before = (text_start > 0) & F.substring(F.col("ctx"), cp, 1).rlike(_ALNUM)
    verified = core_hits.filter(
        (text_start >= 0)
        & (cp >= 0)
        & (F.substring(F.col("ctx"), cp + 1, slen) == F.col("surface"))
        & ~bad_before
        & ~F.substring(F.col("ctx"), cp + slen + 1, 1).rlike(_ALNUM)
    )
    return verified.select(
        "doc_id",
        "span_idx",
        "span_offset",
        text_start.cast("int").alias("start"),
        (text_start + slen).cast("int").alias("end"),
        F.lit("PERSON").alias("mention_type"),
        "surface",
        F.lit("gazetteer").alias("detector"),
        F.lit(score).alias("score"),
    )
