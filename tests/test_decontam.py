"""Eval-set decontamination (operators/decontam.py) vs a naive Python
reference."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ferenda_spark.operators.decontam import decontaminate, doc_ngrams


def _py_grams(text, n, lowercase=True):
    if lowercase:
        text = text.lower()
    toks = [t for t in re.split(r"\s+", text.strip()) if t != ""]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_doc_ngrams_exact(spark):
    df = spark.createDataFrame(
        [(1, "A b c b c"), (2, "x"), (3, ""), (4, "  p  q\tr \n")],
        "doc_id bigint, text string",
    )
    got = {
        (r["id"], r["gram"]) for r in doc_ngrams(df, n=2).collect()
    }
    assert got == {
        (1, "a b"), (1, "b c"), (1, "c b"),  # distinct: "b c" once
        (4, "p q"), (4, "q r"),
    }


def test_decontaminate_report(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # fully inside eval
            (2, "the quick brown cat sits"),    # partial overlap
            (3, "nothing shared here at all"),  # none
            (4, "shorty"),                      # no grams at n=3
        ],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [("THE QUICK BROWN FOX JUMPS over",)], "text string"
    )
    out = {
        r["id"]: r
        for r in decontaminate(docs, ev, n=3, threshold=0.5).collect()
    }
    assert (out[1]["n_grams"], out[1]["n_matched"]) == (3, 3)
    assert out[1]["contaminated"] is True
    assert (out[2]["n_grams"], out[2]["n_matched"]) == (3, 1)
    assert out[2]["contaminated"] is False  # 1/3 < 0.5
    assert (out[3]["n_matched"], out[3]["contaminated"]) == (0, False)
    assert (out[4]["n_grams"], out[4]["contaminated"]) == (0, False)
    assert len(out) == 4


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab \t", min_size=0, max_size=40),
        min_size=1, max_size=6,
    ),
    ev_texts=st.lists(
        st.text(alphabet="ab \t", min_size=0, max_size=40),
        min_size=1, max_size=3,
    ),
    n=st.integers(min_value=1, max_value=3),
)
def test_matches_naive_reference(spark, texts, ev_texts, n):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    ev = spark.createDataFrame([(t,) for t in ev_texts], "text string")
    got = {
        r["id"]: (r["n_grams"], r["n_matched"])
        for r in decontaminate(docs, ev, n=n).collect()
    }
    ev_set = set().union(*(_py_grams(t, n) for t in ev_texts))
    for i, t in enumerate(texts):
        g = _py_grams(t, n)
        assert got[i] == (len(g), len(g & ev_set))
