"""A7: precision/recall scoring vs golden triples (SURVEY.md §2.6 A7;
BASELINE.json:2,6 — P/R ≥ 0.95 gate). Exact (subj, pred, obj, doc_id)
set intersection via inner join — fully SQL-expressible."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PRF:
    precision: float
    recall: float
    emitted: int
    golden: int
    matched: int

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 0.0 if p + r == 0 else 2 * p * r / (p + r)


KEY = ["subj", "pred", "obj", "doc_id"]


def score(emitted: DataFrame, golden: DataFrame) -> PRF:
    e = emitted.select(*KEY).distinct().cache()
    g = golden.select(*KEY).distinct().cache()
    ne, ng = e.count(), g.count()
    m = e.join(g, KEY, "inner").count()
    e.unpersist(); g.unpersist()
    return PRF(
        precision=m / ne if ne else 0.0,
        recall=m / ng if ng else 0.0,
        emitted=ne, golden=ng, matched=m,
    )
