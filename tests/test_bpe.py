"""BPE tokenizer (functions/bpe.py): hand-computed merges, reconstruction
invariant, determinism across partitioning, cache-correct apply."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferenda_spark.functions.bpe import (
    _encode_word,
    bpe_token_count,
    bpe_tokens_udf,
    train_bpe_merges,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hand_computed_merges_and_encoding(spark):
    # words: low x3, lower x1 → (l,o) wins at 4; then (lo,w</w>) at 3;
    # then a 3-way count-1 tie resolved lexicographically to (e, r</w>)
    df = _corpus(spark, ["low low low lower"])
    merges = train_bpe_merges(df, n_merges=3, sample_docs=10)
    assert merges == [("l", "o"), ("lo", "w</w>"), ("e", "r</w>")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert _encode_word("low", ranks) == ["low</w>"]
    assert _encode_word("lower", ranks) == ["lo", "w", "er</w>"]


def test_apply_udf_and_reconstruction(spark):
    texts = [
        "the cat sat on the mat",
        "lower low lowest",
        "",
        "  spaced   out  ",
        "naïve café déjà-vu",
    ]
    df = _corpus(spark, texts)
    merges = train_bpe_merges(df, n_merges=50, sample_docs=10)
    out = df.select(
        "doc_id", "text", bpe_tokens_udf(merges)(F.col("text")).alias("toks")
    ).collect()
    for r in out:
        words = [w for w in r.text.split() if w]
        # tokens concatenate back to the exact words (</w> marks ends)
        rebuilt = "".join(r.toks).replace("</w>", " ").split()
        assert rebuilt == words, (r.text, r.toks)
    counts = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", bpe_token_count(merges)(F.col("text")).alias("n")
        ).collect()
    }
    assert counts[2] == 0  # empty text
    assert all(v >= 0 for v in counts.values())


def test_training_deterministic_across_partitioning(spark):
    texts = [f"alpha beta gamma delta{i % 7} epsilon zeta" for i in range(100)]
    a = train_bpe_merges(_corpus(spark, texts), n_merges=30)
    b = train_bpe_merges(
        _corpus(spark, texts).repartition(13), n_merges=30
    )
    assert a == b


def test_more_merges_never_increase_token_count(spark):
    texts = ["the quick brown fox jumps over the lazy dog"] * 20
    df = _corpus(spark, texts)
    m10 = train_bpe_merges(df, n_merges=10)
    m80 = train_bpe_merges(df, n_merges=80)
    n10 = df.select(
        F.sum(bpe_token_count(m10)(F.col("text"))).alias("s")
    ).head().s
    n80 = df.select(
        F.sum(bpe_token_count(m80)(F.col("text"))).alias("s")
    ).head().s
    assert n80 <= n10
    assert m80[: len(m10)] == m10  # merge list is prefix-stable


def test_null_text_yields_empty(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    merges = [("l", "o")]
    row = df.select(bpe_tokens_udf(merges)(F.col("text")).alias("t")).head()
    assert row.t == []
