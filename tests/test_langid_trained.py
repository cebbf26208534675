"""Trained char-n-gram language ID (functions/langid_trained.py) vs a
naive Python reference."""

import math
from collections import Counter

import pytest

from ferenda_spark.functions.langid_trained import (
    char_ngrams,
    predict_lang,
    train_langid,
)

TRAIN = [
    ("en", "the quick brown fox and the lazy dog with the usual things"),
    ("en", "this is another english sentence with the and of words"),
    ("sv", "det här är en svensk mening med och utan vanliga ord"),
    ("sv", "katten sitter på mattan och hunden ligger i korgen"),
    ("fr", "le chat est sur le tapis et le chien dans le panier"),
]


def _py_model(train, n=3):
    counts, nd = {}, Counter()
    for lang, text in train:
        nd[lang] += 1
        s = text.lower()
        for i in range(len(s) - n + 1):
            counts[(lang, s[i : i + n])] = counts.get((lang, s[i : i + n]), 0) + 1
    v = len({g for (_l, g) in counts})
    n_lang = Counter()
    for (lang, _g), c in counts.items():
        n_lang[lang] += c
    total = sum(nd.values())
    return counts, v, n_lang, nd, total


def _py_score(train, text, n=3):
    counts, v, n_lang, nd, total = _py_model(train, n)
    s = text.lower()
    grams = [s[i : i + n] for i in range(max(len(s) - n + 1, 0))]
    out = {}
    for lang in nd:
        sc = math.log(nd[lang] / total)
        for g in grams:
            c = counts.get((lang, g))
            if c is not None:
                sc += math.log((c + 1) / (n_lang[lang] + v))
            else:
                sc += math.log(1 / (n_lang[lang] + v))
        out[lang] = sc
    best = max(out, key=lambda k: (round(out[k], 9), -ord(k[0])))
    # tie-break: round desc, lang asc — replicate exactly
    best = sorted(out, key=lambda k: (-round(out[k], 9), k))[0]
    return best, out


def test_predictions_match_reference(spark):
    labeled = spark.createDataFrame(TRAIN, "lang string, text string")
    model = train_langid(labeled)
    docs = [
        (1, "the brown dog and the fox"),
        (2, "katten och hunden på mattan"),
        (3, "le chien est sur le tapis"),
        (4, "xq"),          # shorter than n → prior-only → smallest lang
        (5, ""),
    ]
    got = {
        r["id"]: (r["lang_pred"], r["score"])
        for r in predict_lang(
            spark.createDataFrame(docs, "doc_id bigint, text string"), model
        ).collect()
    }
    assert len(got) == 5
    for i, text in docs:
        lang, scores = _py_score(TRAIN, text)
        assert got[i][0] == lang, (i, text, got[i], scores)
        assert got[i][1] == pytest.approx(scores[lang], rel=1e-9)
    # sensible predictions on separable inputs
    assert got[1][0] == "en" and got[2][0] == "sv" and got[3][0] == "fr"


def test_char_ngrams_duplicates_and_short(spark):
    df = spark.createDataFrame(
        [(1, "AbAb"), (2, "ab")], "doc_id bigint, text string"
    )
    got = sorted(
        (r["id"], r["gram"]) for r in char_ngrams(df, "doc_id", "text", 3).collect()
    )
    assert got == [(1, "aba"), (1, "bab")]


def test_deterministic_across_partitioning(spark):
    labeled = spark.createDataFrame(TRAIN, "lang string, text string")
    docs = spark.createDataFrame(
        [(i, t) for i, (_l, t) in enumerate(TRAIN * 3)],
        "doc_id bigint, text string",
    )
    a = {
        r["id"]: r["lang_pred"]
        for r in predict_lang(docs, train_langid(labeled)).collect()
    }
    b = {
        r["id"]: r["lang_pred"]
        for r in predict_lang(
            docs.repartition(7), train_langid(labeled.repartition(3))
        ).collect()
    }
    assert a == b
