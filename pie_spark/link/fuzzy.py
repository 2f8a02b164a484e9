"""Fuzzy gazetteer linking (M7 — the near-miss fallback for J1): link
surfaces that match NO dictionary key exactly but sit within edit
distance 1 of one ("jon smith" → "john smith"), the single-typo class
that dominates real-world surface noise.

Blocking is FastSS deletion neighborhoods (Bocek et al. 2007, public):
for d = 1, two strings are within edit distance 1 ONLY IF their
{self} ∪ delete-one-character variant sets intersect —
  * equal strings share self;
  * a substitution at position i makes both del-i variants equal;
  * an insertion/deletion makes one string a del-variant of the other.
So exploding BOTH sides to their variants and equi-joining on the
variant is an EXACT candidate generator (no recall loss — pytest
proves it exhaustively over every ≤-1-edit pair of a planted set),
with false positives (e.g. "ab"/"ba" share variants at distance 2)
removed by one native ``levenshtein() <= 1`` verify on the candidate
pairs — never on the cross product.

Scale shape: each string of length L yields L+1 variant rows (linear,
like shingling); the join is an equi-join on the variant string, so
skew is bounded by how many strings share a variant (dictionary-like,
not corpus-like) and AQE's skew split backstops. The verify runs on
candidate pairs only; best-match election is one ``min_by`` aggregate
with the total order (distance, dict key, entity) — deterministic.
Restricted to d = 1 BY DESIGN: deletion neighborhoods for d ≥ 2 blow
up combinatorially (L² variants) and the d = 1 class is the
empirically dominant one; greater distances belong to the
MinHash/embedding near-dup family, not the linker.

Cross-engine: ``levenshtein`` is bit-identical in DuckDB (checked:
substitution/equal/empty cases), and variant generation is plain
substring arithmetic — the folded oracle replays the whole pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# self + delete-one-char variants; 1-based substring arithmetic:
# dropping 0-indexed char i = first i chars + everything from i+2 on
_VARIANTS_SQL = (
    "array_union(array({c}), transform(sequence(0, length({c}) - 1), "
    "i -> concat(substring({c}, 1, i), substring({c}, i + 2))))"
)


def _variants(col: str) -> Column:
    return F.expr(_VARIANTS_SQL.format(c=col))


def fuzzy_link(
    surfaces: DataFrame,
    dictionary: DataFrame,
    surface_col: str = "surface_key",
    dict_key: str = "norm_key",
    entity_col: str = "entity_id",
) -> DataFrame:
    """(surface_col, norm_key, entity_id, dist): each distinct surface
    linked to its best dictionary key within edit distance 1 — best =
    min (dist, norm_key, entity_id), a total order. Surfaces with no
    dictionary key within distance 1 emit nothing (the caller's
    unlinked pool, same contract as exact linking)."""
    s_var = (
        surfaces.select(F.col(surface_col).alias("__s"))
        .distinct()
        .select("__s", F.explode(_variants("__s")).alias("__v"))
        .distinct()
    )
    d_var = (
        dictionary.select(
            F.col(dict_key).alias("__k"), F.col(entity_col).alias("__e")
        )
        .distinct()
        .select("__k", "__e", F.explode(_variants("__k")).alias("__v"))
        .distinct()
    )
    pairs = (
        s_var.join(d_var, "__v")
        .select("__s", "__k", "__e")
        .distinct()
        .withColumn("__dist", F.levenshtein("__s", "__k"))
        .filter(F.col("__dist") <= 1)
    )
    best = pairs.groupBy("__s").agg(
        F.expr("min_by(struct(__k, __e, __dist), struct(__dist, __k, __e))").alias(
            "__b"
        )
    )
    return best.select(
        F.col("__s").alias(surface_col),
        F.col("__b.__k").alias(dict_key),
        F.col("__b.__e").alias(entity_col),
        F.col("__b.__dist").cast("int").alias("dist"),
    )
