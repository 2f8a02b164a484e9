"""Surface normalization — native Catalyst expressions only (SURVEY.md §2.9).

Must stay in lockstep with the Python-side
``pie_spark.fixtures.gazetteer.normalize_surface`` (lower, strip
punctuation → space, collapse, trim), which golden construction uses.
``tests/test_normalize.py`` asserts the two agree on every dictionary
surface and planted mention.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_key(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))
