"""Passage-level dedup (C4-style sub-document dedup), vocab top-k and
repetition scores — unit semantics beyond the sf0.01 oracle parity."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

DOCS = [
    # doc 1: two unique lines + the shared boilerplate line
    (1, "unique alpha line\nSHARED BOILERPLATE\nunique beta line"),
    # doc 2: boilerplate twice (second is an intra-doc dup too)
    (2, "SHARED BOILERPLATE\nunique gamma line\nSHARED BOILERPLATE"),
    # doc 3: nothing but boilerplate — disappears entirely after dedup
    (3, "SHARED BOILERPLATE"),
    # doc 4: empty lines are dropped, not deduped
    (4, "unique delta line\n\nunique epsilon line"),
]


def _df(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


BOILER_OCCS = {(1, 1), (2, 0), (2, 2), (3, 0)}


def test_passage_dedup_map_one_survivor(spark):
    from pie_spark.dedup.passages import passage_dedup_map

    m = {
        (r["doc_id"], r["passage_idx"]): r["is_dup"]
        for r in passage_dedup_map(_df(spark)).collect()
    }
    # exactly ONE deterministic survivor among the 4 boilerplate copies
    survivors = {k for k in BOILER_OCCS if not m[k]}
    assert len(survivors) == 1, m
    # unique lines never flagged
    assert not any(dup for k, dup in m.items() if k not in BOILER_OCCS)
    # doc 4's empty middle line was dropped before keying
    assert (4, 1) not in m and (4, 0) in m and (4, 2) in m
    # election is partitioning-independent (same survivor at 1 partition)
    m1 = {
        (r["doc_id"], r["passage_idx"]): r["is_dup"]
        for r in passage_dedup_map(_df(spark).repartition(1)).collect()
    }
    assert m1 == m


def test_dedup_passages_text_reassembly(spark):
    from pie_spark.dedup.passages import dedup_passages_text

    out = {r["doc_id"]: r["text"] for r in dedup_passages_text(_df(spark)).collect()}
    # unique lines survive in original order; boilerplate appears exactly
    # once across the whole corpus
    assert "unique alpha line" in out[1] and "unique beta line" in out[1]
    assert out[1].index("unique alpha line") < out[1].index("unique beta line")
    assert "unique gamma line" in out[2]
    total_boiler = sum(t.count("SHARED BOILERPLATE") for t in out.values())
    assert total_boiler == 1
    assert out[4] == "unique delta line\nunique epsilon line"


def test_passage_dedup_block_mode(spark):
    from pie_spark.dedup.passages import passages

    df = spark.createDataFrame(
        pd.DataFrame([(1, "a b c d e f g")], columns=["doc_id", "text"])
    )
    got = {
        r["passage_idx"]: r["passage"]
        for r in passages(df, block_words=3).collect()
    }
    assert got == {0: "a b c", 1: "d e f", 2: "g"}


def test_vocab_topk_deterministic_cut(spark):
    from pie_spark.text.vocab import vocab_topk

    df = spark.createDataFrame(
        pd.DataFrame(
            [(1, "z z y y x w"), (2, "w x y")], columns=["doc_id", "text"]
        )
    )
    rows = vocab_topk(df, k=3).collect()
    got = [(r["token"], r["tf"], r["df"]) for r in rows]
    # tf: y=3 (docs 1,2), z=2, x=2, w=2 → tie among w/x/z broken token-asc
    assert sorted(got, key=lambda t: (-t[1], t[0])) == got
    assert got[0] == ("y", 3, 2)
    assert [t for t, *_ in got[1:]] == ["w", "x"]


def test_repetition_scores_edges(spark):
    from pie_spark.text.analysis import repetition_scores

    df = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, "spam spam spam spam"),  # 3 identical bigrams
                (2, "all tokens differ here"),  # all bigrams unique
                (3, "single"),  # no bigrams — zero-filled row
            ],
            columns=["doc_id", "text"],
        )
    )
    got = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    assert got[1]["n_bigrams"] == 3
    assert got[1]["top_bigram_ppm"] == 1_000_000
    assert got[1]["dup_bigram_ppm"] == 666_666
    assert got[2]["dup_bigram_ppm"] == 0
    assert got[3]["n_bigrams"] == 0 and got[3]["top_bigram_ppm"] == 0


def test_cm_sketch_guarantee(spark):
    """est(x) >= true(x) ALWAYS (min over rows can only overcount via
    collisions); with a tiny width collisions must appear yet never an
    undercount; estimates are partitioning-independent."""
    from pie_spark.text.sketch import build_sketch, estimate_counts

    rows = [(i, " ".join(f"tok{j}" for j in range(i % 17))) for i in range(1, 120)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    truth = {
        r["token"]: r["n"]
        for r in df.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    sk = build_sketch(df, width=8)  # tiny → heavy collisions
    toks = spark.createDataFrame(pd.DataFrame({"token": list(truth)}))
    est = {r["token"]: r["est"] for r in estimate_counts(sk, toks, width=8).collect()}
    assert all(est[t] >= n for t, n in truth.items()), "CM undercounted"
    assert any(est[t] > n for t, n in truth.items()), "width=8 must collide"

    sk2 = build_sketch(df.repartition(7), width=8)
    est2 = {r["token"]: r["est"] for r in estimate_counts(sk2, toks, width=8).collect()}
    assert est2 == est


def test_dedup_passages_text_regex_delimiter_join(spark):
    """ADVICE r03: splitting on a REGEX delimiter must not splice the
    raw pattern back into the rebuilt text — a regex delimiter without
    an explicit join_str is rejected, and join_str controls rejoining."""
    import pytest

    from pie_spark.dedup.passages import dedup_passages_text

    rows = [
        (1, "alpha beta\n\ngamma delta\n\n\nshared passage"),
        (2, "shared passage\n\nunique tail"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    with pytest.raises(ValueError, match="join_str"):
        dedup_passages_text(df, delimiter=r"\n{2,}")

    out = {
        r["doc_id"]: r["text"]
        for r in dedup_passages_text(df, delimiter=r"\n{2,}", join_str="\n\n").collect()
    }
    # no raw pattern text in any rebuilt doc
    assert all("\\n{2,}" not in t for t in out.values())
    # the duplicate passage survives in exactly one doc
    n_with_shared = sum("shared passage" in t for t in out.values())
    assert n_with_shared == 1
    # literal newline delimiter still round-trips unchanged
    out2 = dedup_passages_text(df, delimiter="\n\n")
    assert out2.count() == 2
