"""Distributed BPE training/encoding (pie_spark/text/bpe.py): exact
cross-implementation merge-sequence equality vs an independent Python
trainer, partitioning invariance, planted-merge expectations, encode
parity and lossless-ness."""

from pyspark.sql import functions as F

from pie_spark.text.bpe import (
    END,
    bpe_encode,
    encode_word,
    train_bpe,
    train_bpe_reference,
    word_frequencies,
)

from .conftest import SF_DIR


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
        .limit(300)
        .localCheckpoint(eager=True)
    )


def test_train_bpe_matches_python_reference_exactly(spark):
    docs = _docs(spark)
    got = [(r.rank, r.left, r.right, r.pair_count)
           for r in train_bpe(docs, n_merges=25).collect()]
    wf = [(r.word, int(r.freq)) for r in word_frequencies(docs).collect()]
    want = train_bpe_reference(wf, n_merges=25)
    assert got == want  # every rank: same pair, same count
    assert len(got) == 25
    # repartition invariance: same merge sequence from any layout
    again = [(r.rank, r.left, r.right, r.pair_count)
             for r in train_bpe(docs.repartition(7), n_merges=10).collect()]
    assert again == want[:10]


def test_train_bpe_planted_corpus(spark):
    """On a corpus dominated by one word the first merges must build
    exactly that word's characters up."""
    docs = spark.createDataFrame(
        [(str(i), "zqx zqx zqx zqx") for i in range(10)] + [("x", "ab")],
        ["doc_id", "text"],
    )
    merges = train_bpe(docs, n_merges=3).collect()
    # all pairs tie at count 40; the total order (count desc, left asc,
    # right asc) resolves ('q','x') first, then builds the word up
    assert [(m.left, m.right) for m in merges] == [
        ("q", "x"), ("qx", END), ("z", "qx" + END),
    ]
    assert merges[0].pair_count == 40
    # min_freq early stop: the leftover 'ab' word (freq 1) trains nothing
    more = train_bpe(docs, n_merges=10).collect()
    assert len(more) <= 10 and all(m.pair_count >= 2 for m in more)


def test_bpe_encode_parity_and_lossless(spark):
    docs = _docs(spark)
    merges = train_bpe(docs, n_merges=20)
    ranks = {(r.left, r.right): r.rank for r in merges.collect()}
    enc = bpe_encode(docs, merges).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert enc and all(r.n_tokens == len(r.tokens) for r in enc)
    for r in enc:
        words = [w for w in texts[r.doc_id].split(" ") if w]
        # parity with the driver-side reference encoder
        want = [t for w in words for t in encode_word(w, ranks)]
        assert r.tokens == want
        # lossless: stripping END and concatenating restores the words
        joined = "".join(r.tokens).replace(END, " ").rstrip()
        assert joined == " ".join(words)
    # with zero merges every token is a single char or END
    empty = train_bpe(docs.limit(0), n_merges=5)
    chars = bpe_encode(docs.limit(5), empty).collect()
    assert all(
        all(t == END or len(t) == 1 for t in r.tokens) for r in chars
    )
