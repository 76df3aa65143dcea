"""BPE trainer/encoder tests (datapipe/bpe.py).

The r130 oracle row pins the distributed pair-count stage; these pin
the driver-side greedy merge loop and the Arrow encode stage (not
SQL-expressible)."""

from __future__ import annotations

from datalake_backend_spark.datapipe.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    word_counts,
)


def _corpus(spark):
    return spark.createDataFrame(
        [("low low low lower lowest",), ("new newer newest low",)],
        "text string",
    )


def test_bpe_train_textbook_merges(spark):
    """The classic low/lower/lowest corpus: most frequent pairs merge
    first, in the deterministic (count desc, pair asc) order."""
    merges = bpe_train(_corpus(spark), 3)
    assert merges == [("l", "o"), ("lo", "w"), ("low", EOW)]


def test_bpe_encode_roundtrip_and_compression(spark):
    docs = _corpus(spark)
    merges = bpe_train(docs, 8)
    rows = bpe_encode(docs, merges).collect()
    for r in rows:
        # round trip: tokens concatenate back to the words (EOW = space)
        rebuilt = "".join(r.bpe_tokens).replace(EOW, " ").strip()
        assert rebuilt == r.text.lower()
    # more merges never increase token count (monotone compression)
    def total(n):
        enc = bpe_encode(docs, bpe_train(docs, n))
        return sum(len(r.bpe_tokens) for r in enc.collect())

    t0, t4, t8 = total(0), total(4), total(8)
    assert t0 >= t4 >= t8
    assert t8 < t0  # merges actually compress


def test_bpe_partition_invariance(spark):
    """Merges are a pure function of the word-count table — the same
    list regardless of how the corpus is partitioned."""
    docs = _corpus(spark)
    assert bpe_train(docs.repartition(7), 6) == bpe_train(
        docs.coalesce(1), 6
    )


def test_bpe_top_words_bound_and_early_stop(spark):
    docs = _corpus(spark)
    # bounding the word table keeps only the dominant words' statistics
    wc = {r.word: r["count"] for r in word_counts(docs, top_words=2).collect()}
    assert set(wc) == {"low", "new"} or len(wc) == 2
    # min_pair_count stops before inventing single-occurrence merges
    tiny = spark.createDataFrame([("a b",)], "text string")
    assert bpe_train(tiny, 10, min_pair_count=2) == []


def test_bpe_encode_unknown_words_fall_back_to_chars(spark):
    docs = _corpus(spark)
    merges = bpe_train(docs, 8)
    other = spark.createDataFrame([("zzq",)], "text string")
    toks = bpe_encode(other, merges).first().bpe_tokens
    assert toks == ["z", "z", "q", EOW]


def test_bpe_train_word_cap_guard_fires(spark, monkeypatch):
    """bpe_train must probe the distinct-word count distributedly and
    refuse the driver collect when it exceeds the cap — a caller
    passing top_words=10**9 (or None over a huge corpus) must get a
    loud ValueError, not a driver OOM. The cap is shrunk via the
    module constant instead of building a 2M-word corpus."""
    import pytest

    import datalake_backend_spark.datapipe.bpe as bpe_mod

    docs = _corpus(spark)  # > 2 distinct words
    monkeypatch.setattr(bpe_mod, "_MAX_DRIVER_WORDS", 2)
    with pytest.raises(ValueError, match="distinct words"):
        bpe_mod.bpe_train(docs, 1, top_words=10**9)
    with pytest.raises(ValueError, match="distinct words"):
        bpe_mod.bpe_train(docs, 1, top_words=None)
    # under the cap (explicitly or via top_words) still trains
    monkeypatch.setattr(bpe_mod, "_MAX_DRIVER_WORDS", 2_000_000)
    assert bpe_mod.bpe_train(docs, 1, top_words=None)
