"""Property test for T3/W3 overlap dedup (SURVEY.md §7.3 item 3):
random mention sets vs a brute-force pure-Python reference of the spec —
one winner per overlap chain, by (detector priority, longer span,
earlier start, surface, detector). Runs as ONE Spark job over many
random docs (seeded → reproducible)."""

from __future__ import annotations

import numpy as np
import pytest

from pie_spark.extract.merge import merge_mentions
from pie_spark.schemas import MENTION_SCHEMA

PRIORITY = {"regex": 1, "gazetteer": 2, "crf": 3}
TYPES = {"regex": "EMAIL", "gazetteer": "PERSON", "crf": "PERSON"}


def _random_mentions(rng: np.random.Generator, n_docs: int) -> list[tuple]:
    rows = []
    for d in range(n_docs):
        doc = f"doc{d}"
        for span in range(int(rng.integers(1, 4))):
            offset = span * 200
            for _ in range(int(rng.integers(0, 9))):
                start = int(rng.integers(0, 80))
                length = int(rng.integers(1, 25))
                det = ["regex", "gazetteer", "crf"][int(rng.integers(0, 3))]
                surface = "s" + str(int(rng.integers(0, 5)))
                rows.append(
                    (doc, span, offset, start, start + length,
                     TYPES[det], surface, det, 1.0)
                )
    return rows


def _reference_merge(rows: list[tuple]) -> set[tuple]:
    """Brute force: chain overlapping intervals per (doc, span), pick the
    winner by the documented total order."""
    from collections import defaultdict

    by_span = defaultdict(list)
    for r in rows:
        by_span[(r[0], r[1])].append(r)
    winners = set()
    for _, ms in by_span.items():
        ms.sort(key=lambda r: (r[3], -r[4]))
        chains: list[list[tuple]] = []
        max_end = None
        for r in ms:
            if max_end is None or r[3] >= max_end:
                chains.append([r])
                max_end = r[4]
            else:
                chains[-1].append(r)
                max_end = max(max_end, r[4])
        for chain in chains:
            w = min(
                chain,
                key=lambda r: (PRIORITY[r[7]], -(r[4] - r[3]), r[3], r[6], r[7]),
            )
            winners.add((w[0], w[1], w[3], w[4], w[5], w[6], w[7]))
    return winners


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_merge_matches_bruteforce_on_random_mentions(spark, seed):
    rng = np.random.default_rng(seed)
    rows = _random_mentions(rng, n_docs=40)
    # dedup exact duplicates the generator may produce (union semantics)
    rows = sorted(set(rows))
    if not rows:
        pytest.skip("empty draw")
    out = merge_mentions(spark.createDataFrame(rows, schema=MENTION_SCHEMA))
    got = {
        (r.doc_id, r.span_idx, r.start, r.end, r.mention_type, r.surface, r.detector)
        for r in out.collect()
    }
    assert got == _reference_merge(rows)
