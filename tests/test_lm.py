"""Stupid-backoff bigram LM perplexity (functions/lm.py) vs a naive
Python reference."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ferenda_spark.functions.lm import score_perplexity, train_ngram_lm


def _py_score(train_texts, text, alpha=0.4):
    uni, bi = {}, {}
    n = 0
    for t in train_texts:
        ts = t.lower().split()
        n += len(ts)
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    ts = text.lower().split()
    pairs = list(zip(ts, ts[1:]))
    if not pairs:
        return 0, None, None
    nll = 0.0
    for a, b in pairs:
        if (a, b) in bi:
            s = bi[(a, b)] / uni[a]
        else:
            s = alpha * (uni.get(b, 0) + 1) / (n + 1)
        nll += -math.log(s)
    nll /= len(pairs)
    return len(pairs), nll, math.exp(nll)


def test_score_matches_reference(spark):
    train = ["the cat sat on the mat", "the dog sat on the rug"]
    docs = [
        (1, "the cat sat on the rug"),   # all-seen bigrams
        (2, "the cat flew over mars"),   # unseen bigrams + unseen words
        (3, "cat"),                      # no bigrams
        (4, ""),                         # empty
    ]
    lm = train_ngram_lm(
        spark.createDataFrame([(t,) for t in train], "text string")
    )
    out = {
        r["id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"])
        for r in score_perplexity(
            spark.createDataFrame(docs, "doc_id bigint, text string"), lm
        ).collect()
    }
    assert len(out) == 4
    for i, text in docs:
        nb, nll, ppl = _py_score(train, text)
        assert out[i][0] == nb
        if nll is None:
            assert out[i][1] is None and out[i][2] is None
        else:
            assert out[i][1] == pytest.approx(nll, rel=1e-12)
            assert out[i][2] == pytest.approx(ppl, rel=1e-12)
    # sanity: in-domain text scores lower perplexity than gibberish
    assert out[1][2] < out[2][2]


@settings(max_examples=10, deadline=None)
@given(
    train=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=30),
        min_size=1, max_size=4,
    ),
    doc=st.text(alphabet="abcd ", min_size=0, max_size=30),
)
def test_property_matches_reference(spark, train, doc):
    lm = train_ngram_lm(
        spark.createDataFrame([(t,) for t in train], "text string")
    )
    got = score_perplexity(
        spark.createDataFrame([(0, doc)], "doc_id bigint, text string"), lm
    ).collect()[0]
    nb, nll, _ppl = _py_score(train, doc)
    assert got["n_bigrams"] == nb
    if nll is None:
        assert got["avg_nll"] is None
    else:
        assert got["avg_nll"] == pytest.approx(nll, rel=1e-12)
