"""Generator-corpus DuckDB oracle for the FLAGSHIP pipeline queries
(``pipeline_mentions`` / ``pipeline_triples`` — VERDICT r05 next#2).

r05 left exactly these two rows "rows-only", for one stated reason: the
numpy corpus *generator* is not SQL-expressible. The fix (blessed by
the verdict) is that the oracle never generates — it READS the same
corpus, materialized once to parquet by the pure per-doc generator
(``fixtures.gen.gen_doc`` — a pure function of (doc_id, text), so the
pure materialization is bit-identical to Spark's distributed
``interleaved_docs``; pinned by tests/test_fixtures.py), and replays
every pipeline stage independently in SQL.

What had to generalize beyond the r05 ``_merged_mention_ctes`` (which
exploits the SQL-constructed corpus's "each surface occurs at most
once per doc, single span" invariants):

* **multi-span documents** — every mention CTE runs per
  (doc_id, span_idx) text unit via a composite ``ckey``; W4 pairing
  re-assembles global offsets as ``span.offset + start`` exactly like
  graph/triples.py, and media spans contribute HAS_MEDIA rows;
* **position-accurate regex scan** — ``strpos(text, surface)`` (first
  occurrence) is replaced by a faithful replay of Python's
  ``finditer`` over the combined alternation
  (extract/matchers.py:_COMBINED): at every char position the FIRST
  alternative that matches anchored there (EMAIL > SSN > PHONE >
  ADDRESS — RE2 and Python both use leftmost-first alternation), with
  Python's *unicode* ``\\b`` replicated as explicit
  ``[\\p{L}\\p{N}_]`` flank guards (RE2's own ``\\b`` is ASCII), then
  the greedy non-overlapping chain (scan resumes at match end) via a
  next-pointer + recursive walk. EMAIL url-context and SSN validity
  are post-filters on ACCEPTED matches — rejected matches still
  consume text, exactly like find_matches;
* **all-occurrence gazetteer** — Aho-Corasick hits = every (position,
  surface) pair where the literal surface occurs with non-alnum
  (unicode, per Python ``str.isalnum``) flanks. Since every surface
  starts with an ASCII alnum char and needs a non-alnum left flank,
  hits can start only at maximal-[A-Za-z0-9]-run starts; candidates
  join dictionary surfaces on the run's first word, then verify the
  full literal with one ``substr`` equality + flank guards.

The CRF layer reuses extract/tagger_sql.py verbatim (per-span ckey);
its case features were upgraded to unicode classes in the same round
so parity holds on the generator's multilingual filler tokens.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pie_spark.extract.matchers import (
    ADDRESS_RE,
    EMAIL_RE,
    PHONE_RE,
    SSN_RE,
)

# Python \w (unicode) ≈ [\p{L}\p{N}_] for every char the fixtures can
# contain; Python str.isalnum() ≈ [\p{L}\p{N}] likewise.
_WORD = r"[\p{L}\p{N}_]"
_ALNUM = r"[\p{L}\p{N}]"


def _lit(pattern: str) -> str:
    """Python regex string → DuckDB single-quoted literal body (single
    quotes doubled; RE2 does no backslash processing in '...')."""
    return pattern.replace("'", "''")


# ---------------------------------------------------------------------------
# corpus materialization (pure python — NO Spark)
# ---------------------------------------------------------------------------


def materialize_corpus(sf_dir: str) -> str:
    """Materialize the deterministic interleaved corpus for ``sf_dir``
    to a cached parquet file and return its path.

    Pure-python twin of ``fixtures.gen.interleaved_docs``: reads the
    SAME (doc_id, text) rows from ``documents.parquet`` via pyarrow and
    maps the SAME pure ``gen_doc`` over them — bit-identical by
    construction (gen_doc's RNG is keyed per doc_id), pinned by
    tests/test_fixtures.py::test_pure_materialization_matches_spark.
    Cache key = resolved sf_dir; the file is tiny (sf0.01 ≈ 500 docs)
    and rebuilt on demand.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pie_spark.fixtures.gen import gen_doc

    real = os.path.realpath(sf_dir)
    tag = hashlib.md5(real.encode()).hexdigest()[:12]
    out_dir = os.path.join(tempfile.gettempdir(), "pie_oracle_corpus")
    out = os.path.join(out_dir, f"corpus_{tag}.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(out_dir, exist_ok=True)

    src = pq.read_table(
        os.path.join(real, "documents.parquet"), columns=["doc_id", "text"]
    )
    doc_ids, spans = [], []
    for d, t in zip(src.column("doc_id").to_pylist(), src.column("text").to_pylist()):
        g = gen_doc(str(d), t)
        doc_ids.append(g.doc_id)
        spans.append(g.spans)
    schema = pa.schema(
        [
            pa.field("doc_id", pa.string(), nullable=False),
            pa.field(
                "spans",
                pa.list_(
                    pa.struct(
                        [
                            pa.field("kind", pa.string(), nullable=False),
                            pa.field("text", pa.string()),
                            pa.field("media_ref", pa.string()),
                            pa.field("offset", pa.int32(), nullable=False),
                        ]
                    )
                ),
                nullable=False,
            ),
        ]
    )
    tbl = pa.Table.from_pydict({"doc_id": doc_ids, "spans": spans}, schema=schema)
    tmp = out + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, out)  # atomic vs a concurrent builder
    return out


# ---------------------------------------------------------------------------
# CTE builders
# ---------------------------------------------------------------------------


def corpus_ctes(parquet_path: str) -> str:
    """``sp`` (all spans, exploded with ordinality), ``tsp`` (text
    spans + composite ckey), ``t`` (the ckey-keyed corpus every
    downstream mention CTE — including crf_sql_ctes — expects)."""
    return f"""
corpus AS (SELECT doc_id, spans FROM read_parquet('{parquet_path}')),
sp AS (
  SELECT doc_id AS rdoc,
         CAST(generate_subscripts(spans, 1) - 1 AS INT) AS span_idx,
         unnest(spans) AS s
  FROM corpus
),
tsp AS MATERIALIZED (
  SELECT rdoc, span_idx, s.offset AS span_offset, s.text AS text,
         rdoc || '#' || CAST(span_idx AS VARCHAR) AS ckey
  FROM sp
  WHERE s.kind = 'text' AND s.text IS NOT NULL AND length(s.text) > 0
),
t AS MATERIALIZED (SELECT ckey AS doc_id, text FROM tsp)"""


def regex_scan_ctes() -> str:
    """Faithful combined-alternation finditer replay ending in
    ``rxp(doc_id, mention_type, surface, detector, s, e)``. See module
    docstring for the semantics argument."""
    ssn_core = r"\d{3}-\d{2}-\d{4}"  # leading/trailing \b handled as guards
    return f"""
px AS MATERIALIZED (
  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM t
),
rxm AS (
  SELECT doc_id, text, i,
    regexp_extract(substr(text, i), '^(?:{_lit(EMAIL_RE)})') AS m_email,
    CASE WHEN (i = 1 OR NOT regexp_matches(substr(text, i - 1, 1), '{_WORD}'))
          AND (i + 11 > length(text)
               OR NOT regexp_matches(substr(text, i + 11, 1), '{_WORD}'))
         THEN regexp_extract(substr(text, i), '^(?:{_lit(ssn_core)})') ELSE '' END AS m_ssn,
    regexp_extract(substr(text, i), '^(?:{_lit(PHONE_RE)})') AS m_phone,
    CASE WHEN (i = 1 OR NOT regexp_matches(substr(text, i - 1, 1), '{_WORD}'))
         THEN regexp_extract(substr(text, i), '^(?:{_lit(ADDRESS_RE)})') ELSE '' END AS m_addr
  FROM px
),
rxc AS MATERIALIZED (
  SELECT doc_id, i,
    CASE WHEN m_email <> '' THEN 'EMAIL'
         WHEN m_ssn <> '' THEN 'SSN'
         WHEN m_phone <> '' THEN 'PHONE'
         ELSE 'ADDRESS' END AS mention_type,
    CASE WHEN m_email <> '' THEN m_email
         WHEN m_ssn <> '' THEN m_ssn
         WHEN m_phone <> '' THEN m_phone
         ELSE m_addr END AS surface,
    row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
  FROM rxm
  WHERE m_email <> '' OR m_ssn <> '' OR m_phone <> '' OR m_addr <> ''
),
rxn AS MATERIALIZED (
  SELECT c.doc_id, c.rn, min(c2.rn) AS next_rn
  FROM rxc c LEFT JOIN rxc c2
    ON c2.doc_id = c.doc_id AND c2.i >= c.i + length(c.surface)
  GROUP BY c.doc_id, c.rn
),
rxsel AS (
  SELECT doc_id, rn FROM rxc WHERE rn = 1
  UNION ALL
  SELECT n.doc_id, n.next_rn
  FROM rxsel s JOIN rxn n ON n.doc_id = s.doc_id AND n.rn = s.rn
  WHERE n.next_rn IS NOT NULL
),
rxp AS (
  SELECT c.doc_id, c.mention_type, c.surface, 'regex' AS detector,
         c.i - 1 AS s, c.i - 1 + length(c.surface) AS e
  FROM rxsel sel
  JOIN rxc c ON c.doc_id = sel.doc_id AND c.rn = sel.rn
  JOIN t ON t.doc_id = c.doc_id
  WHERE NOT (c.mention_type = 'EMAIL' AND c.i > 1
             AND substr(t.text, c.i - 1, 1) IN ('/', ':', '@'))
    AND (c.mention_type <> 'SSN' OR (
      substr(c.surface, 1, 3) NOT IN ('000', '666')
      AND substr(c.surface, 1, 3) < '900'
      AND substr(c.surface, 5, 2) <> '00'
      AND substr(c.surface, 8, 4) <> '0000'))
)"""


def gazetteer_scan_ctes(surfaces: list[str]) -> str:
    """All-occurrence Aho-Corasick replay ending in
    ``gb(doc_id, mention_type, surface, detector, s, e)``."""
    import re

    rows = []
    for s in sorted(set(surfaces)):
        # join key = the surface's LEADING [A-Za-z0-9]+ run (matches the
        # text-side run word exactly — "Y. Jankowski" keys on "Y", not
        # the space-split "Y.")
        m = re.match(r"[A-Za-z0-9]+", s)
        assert m, f"gazetteer surface not alnum-led: {s!r}"
        rows.append(f"('{_lit(s)}', '{_lit(m.group(0))}', {len(s)})")
    vals = ",\n".join(rows)
    return f"""
gruns AS (
  SELECT doc_id, text, i AS rs1,
         regexp_extract(substr(text, i), '^[A-Za-z0-9]+') AS w
  FROM px
  WHERE regexp_matches(substr(text, i, 1), '[A-Za-z0-9]')
    AND (i = 1 OR NOT regexp_matches(substr(text, i - 1, 1), '[A-Za-z0-9]'))
),
gdict(surface, first_word, slen) AS (VALUES {vals}),
gb AS (
  SELECT g.doc_id, 'PERSON' AS mention_type, d.surface,
         'gazetteer' AS detector, g.rs1 - 1 AS s, g.rs1 - 1 + d.slen AS e
  FROM gruns g JOIN gdict d ON g.w = d.first_word
  WHERE substr(g.text, g.rs1, d.slen) = d.surface
    AND (g.rs1 = 1
         OR NOT regexp_matches(substr(g.text, g.rs1 - 1, 1), '{_ALNUM}'))
    AND (g.rs1 - 1 + d.slen >= length(g.text)
         OR NOT regexp_matches(substr(g.text, g.rs1 + d.slen, 1), '{_ALNUM}'))
)"""


def merge_ctes() -> str:
    """T3/W3 chain split + priority winner over ``allm`` → ``win``.
    Identical logic to queries._merged_mention_ctes (the ckey IS the
    per-(doc, span) unit, matching merge_mentions' synthetic
    span-disjoint coordinates)."""
    return """
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


def _mention_stack(parquet_path: str) -> str:
    """corpus → detectors → merged ``win`` (shared by both oracles)."""
    from pie_spark.extract.tagger_sql import crf_sql_ctes
    from pie_spark.fixtures.gazetteer import dictionary_entries

    surfaces = sorted({e.surface for e in dictionary_entries()})
    return ",\n".join(
        [
            corpus_ctes(parquet_path).strip(),
            crf_sql_ctes("t").strip(),
            regex_scan_ctes().strip(),
            gazetteer_scan_ctes(surfaces).strip(),
            merge_ctes().strip(),
        ]
    )


def pipeline_mentions_sql(sf_dir: str) -> str:
    """Oracle for q_pipeline_mentions: merged mention set on the
    generator corpus (doc_id, span_idx, start, end, mention_type,
    surface, detector)."""
    path = materialize_corpus(sf_dir)
    return f"""
WITH RECURSIVE
{_mention_stack(path)}
SELECT m.rdoc AS doc_id, m.span_idx,
       CAST(w.s AS INT) AS "start", CAST(w.e AS INT) AS "end",
       w.mention_type, w.surface, w.detector
FROM win w JOIN tsp m ON m.ckey = w.doc_id
"""


def pipeline_triples_sql(sf_dir: str) -> str:
    """Oracle for q_pipeline_triples: the whole pipeline's
    (subj, pred, obj) output on the generator corpus — linking (J1/J2),
    CC canonicalization (G1), W4 nearest-preceding pairing with
    media-aware global offsets, HAS_MEDIA rows, A5 dedup. Stage SQL
    mirrors queries._pipeline_triples_all_sql; only the corpus and the
    per-span→global offset reassembly differ."""
    from pie_spark.fixtures.gazetteer import dictionary_entries
    from pie_spark.queries import _cc_canonical_map_sql

    path = materialize_corpus(sf_dir)
    entries = sorted(
        {(e.surface, e.norm_key, e.entity_id, e.prior) for e in dictionary_entries()}
    )
    dict_vals = ",\n".join(
        f"('{_lit(s)}', '{_lit(k)}', '{_lit(eid)}', CAST({p!r} AS DOUBLE))"
        for s, k, eid, p in entries
    )
    jac = (
        "CAST(len(list_intersect(string_split(lower(surface), ' '),"
        " string_split(lower(dict_surface), ' '))) AS DOUBLE)"
        " / len(list_distinct(list_concat(string_split(lower(surface), ' '),"
        " string_split(lower(dict_surface), ' '))))"
    )
    return f"""
WITH RECURSIVE
{_mention_stack(path)},
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
  SELECT m.rdoc, m.span_offset + b.s AS goff, b.link_score, k.canon_entity_id
  FROM best b
  JOIN kcanon k USING (norm_key)
  JOIN tsp m ON m.ckey = b.doc_id
),
ev AS (
  SELECT rdoc, goff, canon_entity_id AS person, link_score,
         CAST(NULL AS VARCHAR) AS pii_type, CAST(NULL AS VARCHAR) AS pii_value
  FROM linked
  UNION ALL
  SELECT m.rdoc, m.span_offset + w.s, NULL, NULL, w.mention_type, w.surface
  FROM win w JOIN tsp m ON m.ckey = w.doc_id
  WHERE w.detector = 'regex'
    AND w.mention_type IN ('EMAIL', 'SSN', 'PHONE', 'ADDRESS')
),
pr AS (
  SELECT *, last_value(person IGNORE NULLS) OVER w AS prev_person,
            last_value(link_score IGNORE NULLS) OVER w AS prev_score
  FROM ev
  WINDOW w AS (PARTITION BY rdoc ORDER BY goff ASC, person ASC NULLS LAST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
pii_t AS (
  SELECT prev_person AS subj, 'HAS_' || pii_type AS pred, pii_value AS obj,
         'PERSON' AS subj_type, pii_type AS obj_type, rdoc AS doc_id,
         prev_score AS confidence
  FROM pr WHERE pii_type IS NOT NULL AND prev_person IS NOT NULL
),
men_t AS (
  SELECT rdoc AS subj, 'MENTIONS' AS pred, canon_entity_id AS obj,
         'DOC' AS subj_type, 'PERSON' AS obj_type, rdoc AS doc_id,
         link_score AS confidence
  FROM linked
),
media_t AS (
  SELECT rdoc AS subj, 'HAS_MEDIA' AS pred, s.media_ref AS obj,
         'DOC' AS subj_type, 'MEDIA' AS obj_type, rdoc AS doc_id,
         CAST(1.0 AS DOUBLE) AS confidence
  FROM sp WHERE s.kind <> 'text'
)
SELECT subj, pred, obj, max(subj_type) AS subj_type, max(obj_type) AS obj_type,
       doc_id, max(confidence) AS confidence
FROM (SELECT * FROM men_t UNION ALL SELECT * FROM pii_t
      UNION ALL SELECT * FROM media_t)
GROUP BY subj, pred, obj, doc_id
"""
