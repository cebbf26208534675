"""Fulltext index + ranked search tests (reference surface
[ref: ferenda/fulltextindex.py :: FulltextIndex.update, query], upstream
tested in test/testFulltextIndex.py with small indexed corpora + asserted
hit lists — same shape here, with hand-computed tf-idf expectations)."""

from __future__ import annotations

import math

import pytest

from ferenda_spark.operators.fulltext import (
    build_fulltext_index,
    facet_counts,
    search,
    tokenize_query,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "Spark, spark JOIN window!", "en", "srcA"),
        (2, "spark window", "en", "srcB"),
        (3, "filter scan", "de", "srcA"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, lang string, source string")


def test_analyzer_consistency():
    assert tokenize_query("Spark, JOIN! wind0w--x") == ["join", "spark", "wind0w", "x"]
    assert tokenize_query("  ") == []


def test_postings_and_stopword_guard(corpus):
    # max_df_ratio 0.5 on 3 docs → df ≤ 1: 'spark'/'window' (df=2) dropped
    postings, n = build_fulltext_index(corpus, "text", "doc_id", max_df_ratio=0.5)
    assert n == 3
    terms = {r["term"] for r in postings.select("term").distinct().collect()}
    assert terms == {"join", "filter", "scan"}

    postings, _ = build_fulltext_index(corpus, "text", "doc_id", max_df_ratio=1.0)
    tf = {(r["term"], r["id"]): (r["tf"], r["df"]) for r in postings.collect()}
    assert tf[("spark", 1)] == (2, 2)  # lowercased, punctuation split
    assert tf[("window", 2)] == (1, 2)


def test_search_scoring_and_semantics(corpus):
    postings, n = build_fulltext_index(corpus, "text", "doc_id", max_df_ratio=1.0)
    got = search(postings, n, "Spark window", top_k=10).collect()
    # AND semantics: d3 lacks both terms
    assert [r["id"] for r in got] == [1, 2]
    idf = math.log(3 / 2)
    assert got[0]["score"] == pytest.approx(
        round((1 + math.log(2)) * idf + idf, 6)
    )  # d1: tf(spark)=2, tf(window)=1
    assert got[1]["score"] == pytest.approx(round(2 * idf, 6))

    # OR semantics includes the partial match, ranked below full matches
    got_or = search(postings, n, "spark filter", top_k=10, require_all=False).collect()
    assert {r["id"]: r["n_matched"] for r in got_or} == {1: 1, 2: 1, 3: 1}
    # d3 matched 'filter' (df=1 → higher idf than 'spark')
    d3 = next(r for r in got_or if r["id"] == 3)
    assert d3["score"] == pytest.approx(round(math.log(3), 6))

    assert search(postings, n, "", top_k=5).count() == 0
    assert search(postings, n, "nosuchterm spark", top_k=5).count() == 0  # AND


def test_topk_tiebreak_deterministic(spark):
    rows = [(i, "alpha beta") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    postings, n = build_fulltext_index(df, "text", "doc_id", max_df_ratio=1.0)
    got = [r["id"] for r in search(postings, n, "alpha", top_k=7).collect()]
    assert got == list(range(7))  # equal scores → id ascending


def test_facet_counts(corpus):
    postings, n = build_fulltext_index(corpus, "text", "doc_id", max_df_ratio=1.0)
    hits = search(postings, n, "spark window", top_k=10)
    fc = {
        (r["facet"], r["value"]): r["n_hits"]
        for r in facet_counts(hits, corpus, "doc_id", ["lang", "source"]).collect()
    }
    assert fc == {
        ("lang", "en"): 2,
        ("source", "srcA"): 1,
        ("source", "srcB"): 1,
    }
