"""DuckDB mirror of the CRF sequence tagger (T1/T2) — the full
tokenize → features → integer emissions → Viterbi DP → backtrace →
BIO-assembly chain re-expressed as SQL with recursive CTEs, so the
driver's hash gate can cross-check the tagger layer that was
"not SQL-expressible" in r03/r04.

Why this is EXACT (not approximately right):

* the tagger's weights are integer deci-units (tagger.py, r05) and its
  features are 0/1 indicators, so every lattice score is an exact
  int64 — no float summation order, no float near-ties; both engines
  compute literally the same integers;
* the Viterbi tie policy ("first max": the LOWEST state index among
  maxima, both for backpointers and the final state) is replicated by
  ordered CASE chains with ``>=`` against all later states;
* the coefficient expressions below are GENERATED from the very
  W_EMIT / W_TRANS / W_START arrays the Spark UDF decodes with (the
  inlined-literals precedent of the LSH-plane oracles), so the two
  sides cannot drift;
* tokenization parity: the Python side tokenizes ``\\S+`` with char
  offsets; the SQL side splits on single spaces, computes offsets by a
  running length sum, and drops empty pieces — identical on any text
  whose whitespace is single ASCII spaces. Both oracle corpora satisfy
  this BY CONSTRUCTION: the SQL-built corpus concatenates with single
  spaces, and the generator corpus joins ``str.split()`` tokens with
  ``' '.join`` (fixtures/gen.py — tokens can contain no whitespace);
  the pytest parity tests cover both corpora;
* case-feature parity on non-ASCII tokens (r06): ``fu``/``fl`` use
  RE2 ``\\p{Lu}`` / ``\\p{Ll}`` — the same answer as Python's
  ``str.isupper()/islower()`` on single chars for every letter
  category L* (the generator's multilingual filler: Cyrillic/Greek
  lowercase, accented Latin, CJK caseless). Known residual gap:
  Python counts some non-letter cased chars (e.g. Roman-numeral Nl)
  as upper — none can appear in any fixture vocabulary.

The generated block expects a CTE ``t(doc_id, text)`` in scope and
must be embedded under ``WITH RECURSIVE``. It terminates in a CTE
``crf_mentions(doc_id, mention_type, surface, s, e)`` — mentions of
≥ 2 tokens, exactly ``pie_spark.extract.tagger.tag_text``.
"""

from __future__ import annotations

from pie_spark.extract.tagger import (
    ALLCAPS,
    BIAS,
    CAP,
    DIGIT_LONG,
    DIGIT_SHORT,
    FIRSTLEX,
    HASDIGIT,
    INITDOT,
    LASTLEX,
    LOWER,
    STREETLEX,
    SUFFIX,
    W_EMIT,
    W_START,
    W_TRANS,
)
from pie_spark.fixtures import gazetteer as gz

K = 5

# feature id → SQL 0/1 column name (built in the fx CTE below)
_FEAT_COL = {
    BIAS: "1",
    CAP: "cap",
    ALLCAPS: "allcaps",
    FIRSTLEX: "firstlex",
    LASTLEX: "lastlex",
    INITDOT: "initdot",
    DIGIT_SHORT: "dshort",
    DIGIT_LONG: "dlong",
    STREETLEX: "streetlex",
    SUFFIX: "suffix",
    LOWER: "lowr",
    HASDIGIT: "hasdigit",
}


def _emission_expr(tag: int) -> str:
    """Integer emission for one tag as a sum of weight·indicator terms,
    generated from W_EMIT so Spark and the oracle share one source."""
    terms = [
        f"({int(w)} * {_FEAT_COL[f]})"
        for f, w in enumerate(W_EMIT[tag])
        if int(w) != 0
    ]
    return "CAST(" + (" + ".join(terms) or "0") + " AS BIGINT)"


def _lex_list(words) -> str:
    # escape embedded quotes (O'Brien) so generated literals stay valid
    return "(" + ", ".join(
        "'" + w.lower().replace("'", "''") + "'" for w in sorted(set(words))
    ) + ")"


def _argmax_case(scores: list[str], values: list[str]) -> str:
    """First-max argmax: the LOWEST index whose score is >= all later
    scores — exactly viterbi()'s strict-> update policy."""
    whens = []
    for i in range(len(scores) - 1):
        cond = " AND ".join(
            f"({scores[i]}) >= ({scores[j]})" for j in range(i + 1, len(scores))
        )
        whens.append(f"WHEN {cond} THEN {values[i]}")
    return "CASE " + " ".join(whens) + f" ELSE {values[-1]} END"


def crf_sql_ctes(t: str = "t") -> str:
    """CTE block (see module docstring). ``t`` names the corpus CTE."""
    split = "string_split(text, ' ')"
    # forward-DP step scores and the post-hoc backpointer scores both
    # come from the same generated (delta_i + T[i][j]) terms
    def step_terms(j: int, prefix: str) -> list[str]:
        return [f"{prefix}.d{i} + {int(W_TRANS[i][j])}" for i in range(K)]

    fwd_cols = ",\n    ".join(
        f"greatest({', '.join(step_terms(j, 'v'))}) + em.e{j} AS d{j}"
        for j in range(K)
    )
    base_cols = ", ".join(f"e{j} + {int(W_START[j])} AS d{j}" for j in range(K))
    bp_cols = ",\n    ".join(
        _argmax_case(step_terms(j, "v"), [str(i) for i in range(K)]) + f" AS b{j}"
        for j in range(K)
    )
    last_tag = _argmax_case([f"v.d{j}" for j in range(K)], [str(j) for j in range(K)])
    back_pick = (
        "CASE bt.tag "
        + " ".join(f"WHEN {j} THEN bp.b{j}" for j in range(K - 1))
        + f" ELSE bp.b{K - 1} END"
    )
    emis = ",\n    ".join(f"{_emission_expr(j)} AS e{j}" for j in range(K))

    return f"""
crf_toks AS (
  SELECT doc_id, text,
         unnest({split}) AS tok,
         unnest(range(1, len({split}) + 1)) AS i
  FROM {t}
),
crf_offs AS (
  SELECT *, CAST(COALESCE(sum(length(tok) + 1) OVER (
              PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS ts
  FROM crf_toks
),
crf_tk AS MATERIALIZED (
  SELECT doc_id, tok, ts, ts + length(tok) AS te,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) AS INT) AS pos
  FROM crf_offs WHERE tok <> ''
),
crf_ft AS (
  SELECT doc_id, pos, tok, ts, te,
    regexp_replace(lower(tok), '[.,;:]+$', '') AS low,
    regexp_matches(tok, '^\\p{{Lu}}') AS fu,
    regexp_matches(tok, '^\\p{{Ll}}') AS fl,
    (length(tok) > 1 AND upper(tok) = tok AND lower(tok) <> tok) AS multiupper,
    regexp_matches(tok, '^[A-Z]\\.$') AS idot,
    regexp_matches(tok, '^[0-9]+$') AS isdig
  FROM crf_tk
),
crf_fx AS MATERIALIZED (
  SELECT doc_id, pos, tok, ts, te,
    CASE WHEN fu AND multiupper THEN 1 ELSE 0 END AS allcaps,
    CASE WHEN fu AND NOT multiupper AND NOT idot THEN 1 ELSE 0 END AS cap,
    CASE WHEN NOT fu AND fl THEN 1 ELSE 0 END AS lowr,
    CASE WHEN idot THEN 1 ELSE 0 END AS initdot,
    CASE WHEN isdig AND length(tok) <= 5 THEN 1 ELSE 0 END AS dshort,
    CASE WHEN isdig AND length(tok) > 5 THEN 1 ELSE 0 END AS dlong,
    CASE WHEN regexp_matches(tok, '[0-9]') THEN 1 ELSE 0 END AS hasdigit,
    CASE WHEN low IN {_lex_list(gz.FIRST_NAMES)} THEN 1 ELSE 0 END AS firstlex,
    CASE WHEN low IN {_lex_list(gz.LAST_NAMES)} THEN 1 ELSE 0 END AS lastlex,
    CASE WHEN low IN {_lex_list(gz.STREET_NAMES)} THEN 1 ELSE 0 END AS streetlex,
    CASE WHEN low IN {_lex_list(gz.STREET_SUFFIXES)} THEN 1 ELSE 0 END AS suffix
  FROM crf_ft
),
crf_em AS MATERIALIZED (
  SELECT doc_id, pos, ts, te,
    {emis}
  FROM crf_fx
),
crf_n AS (SELECT doc_id, max(pos) AS n FROM crf_em GROUP BY doc_id),
crf_v AS (
  SELECT doc_id, pos, {base_cols}
  FROM crf_em WHERE pos = 1
  UNION ALL
  SELECT em.doc_id, em.pos,
    {fwd_cols}
  FROM crf_v v JOIN crf_em em ON em.doc_id = v.doc_id AND em.pos = v.pos + 1
),
crf_bp AS MATERIALIZED (
  SELECT em.doc_id, em.pos,
    {bp_cols}
  FROM crf_v v JOIN crf_em em ON em.doc_id = v.doc_id AND em.pos = v.pos + 1
),
crf_bt AS (
  SELECT v.doc_id, v.pos, {last_tag} AS tag
  FROM crf_v v JOIN crf_n n ON n.doc_id = v.doc_id AND v.pos = n.n
  UNION ALL
  SELECT bp.doc_id, bp.pos - 1, {back_pick} AS tag
  FROM crf_bt bt JOIN crf_bp bp ON bp.doc_id = bt.doc_id AND bp.pos = bt.pos
),
crf_tags AS (
  SELECT tk.doc_id, tk.pos, tk.ts, tk.te, bt.tag,
         lag(bt.tag) OVER (PARTITION BY tk.doc_id ORDER BY tk.pos) AS ptag
  FROM crf_tk tk JOIN crf_bt bt ON bt.doc_id = tk.doc_id AND bt.pos = tk.pos
),
crf_grp AS (
  SELECT *, sum(CASE WHEN (tag = 2 AND ptag IN (1, 2))
                       OR (tag = 4 AND ptag IN (3, 4)) THEN 0 ELSE 1 END)
            OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
  FROM crf_tags
),
crf_mg AS (
  SELECT doc_id, grp, min(ts) AS s, max(te) AS e, count(*) AS cnt,
         min_by(tag, pos) AS head_tag
  FROM crf_grp GROUP BY doc_id, grp
),
crf_mentions AS (
  SELECT mg.doc_id,
         CASE WHEN head_tag = 1 THEN 'PERSON' ELSE 'ADDRESS' END AS mention_type,
         substr({t}.text, s + 1, e - s) AS surface, s, e
  FROM crf_mg mg JOIN {t} ON {t}.doc_id = mg.doc_id
  WHERE head_tag IN (1, 3) AND cnt >= 2
)"""
