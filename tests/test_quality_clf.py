"""Hashed-feature quality classifier (functions/quality_clf.py)."""

import pytest

from ferenda_spark.functions.quality_clf import (
    score_quality,
    train_quality_classifier,
)

POS_WORDS = "the quick brown fox jumps over lazy dog with great style".split()
NEG_WORDS = "zzz qqq xxx kkk vvv jjj www uuu yyy hhh ggg".split()


def _texts(words, n, k=8):
    return [
        " ".join(words[(i * 3 + j) % len(words)] for j in range(k))
        for i in range(n)
    ]


def test_separable_classes_and_determinism(spark):
    pos = spark.createDataFrame(
        [(t,) for t in _texts(POS_WORDS, 30)], "text string"
    )
    neg = spark.createDataFrame(
        [(t,) for t in _texts(NEG_WORDS, 30)], "text string"
    )
    model = train_quality_classifier(
        pos, neg, n_buckets=512, sample_per_class=30
    )
    # held-out docs built from the same vocabularies, different mixes
    held = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_texts(POS_WORDS, 10, k=5))]
        + [(100 + i, t) for i, t in enumerate(_texts(NEG_WORDS, 10, k=5))],
        "doc_id bigint, text string",
    )
    got = {r["id"]: r["quality_score"] for r in score_quality(held, model).collect()}
    pos_scores = [got[i] for i in range(10)]
    neg_scores = [got[100 + i] for i in range(10)]
    assert min(pos_scores) > max(neg_scores)  # AUC 1.0 on separable data
    assert all(s > 0.5 for s in pos_scores)
    assert all(s < 0.5 for s in neg_scores)
    # deterministic across partitioning: retrain on repartitioned inputs
    model2 = train_quality_classifier(
        pos.repartition(7), neg.repartition(5), n_buckets=512,
        sample_per_class=30,
    )
    got2 = {
        r["id"]: r["quality_score"]
        for r in score_quality(held.repartition(3), model2).collect()
    }
    for k in got:
        assert got2[k] == pytest.approx(got[k], rel=1e-12)


def test_empty_and_missing_docs_score_bias(spark):
    import math

    pos = spark.createDataFrame([("a a a",)], "text string")
    neg = spark.createDataFrame([("b b b",)], "text string")
    model = train_quality_classifier(
        pos, neg, n_buckets=64, sample_per_class=5
    )
    docs = spark.createDataFrame(
        [(1, ""), (2, "a a"), (3, "b")], "doc_id bigint, text string"
    )
    got = {r["id"]: r["quality_score"] for r in score_quality(docs, model).collect()}
    assert len(got) == 3
    assert got[1] == pytest.approx(
        1.0 / (1.0 + math.exp(-model.bias)), rel=1e-12
    )
    assert got[2] > 0.5 > got[3]
