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


def _bm25_ref(docs, query_terms, k1=1.2, b=0.75, max_df_ratio=1.0):
    """Naive BM25 over tokenized docs, mirroring the operator's dl
    definition (kept postings only)."""
    import re
    from collections import Counter

    toks = {i: [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t] for i, txt in docs}
    n = len(docs)
    df = Counter(t for ts in toks.values() for t in set(ts))
    kept = {
        i: {t: c for t, c in Counter(ts).items() if df[t] <= int(max_df_ratio * n)}
        for i, ts in toks.items()
    }
    dl = {i: sum(c.values()) for i, c in kept.items() if c}
    avgdl = sum(dl.values()) / len(dl)
    out = {}
    for i, c in kept.items():
        matched = [t for t in query_terms if t in c]
        if len(matched) != len(query_terms):
            continue
        s = 0.0
        for t in matched:
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            tfn = c[t] * (k1 + 1) / (c[t] + k1 * (1 - b + b * dl[i] / avgdl))
            s += idf * tfn
        out[i] = (len(matched), round(s, 6))
    return out


def test_bm25_matches_reference(spark):
    from ferenda_spark.operators.fulltext import bm25_search

    docs = [
        (1, "spark window join join join spark"),
        (2, "spark window"),
        (3, "window filter scan spark window window"),
        (4, "unrelated text entirely"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    postings, n = build_fulltext_index(df, "text", "doc_id", max_df_ratio=1.0)
    got = {
        r["id"]: (r["n_matched"], r["score"])
        for r in bm25_search(postings, n, "spark window").collect()
    }
    assert got == _bm25_ref(docs, ["spark", "window"])


def test_bm25_length_normalization_prefers_short_doc(spark):
    from ferenda_spark.operators.fulltext import bm25_search

    # same tf for 'spark' but doc 2 is much shorter → higher bm25
    docs = [
        (1, "spark " + "filler " * 30),
        (2, "spark x"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    postings, n = build_fulltext_index(df, "text", "doc_id", max_df_ratio=1.0)
    rows = bm25_search(postings, n, "spark").collect()
    assert [r["id"] for r in rows] == [2, 1]


def test_bm25_empty_query(spark):
    from ferenda_spark.operators.fulltext import bm25_search

    docs = [(1, "a b")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    postings, n = build_fulltext_index(df, "text", "doc_id")
    assert bm25_search(postings, n, " , ").count() == 0


def test_bm25_empty_query_schema_matches_id_type(spark):
    from ferenda_spark.operators.fulltext import bm25_search

    docs = [(1, "a b")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    postings, n = build_fulltext_index(df, "text", "doc_id")
    empty = bm25_search(postings, n, "!!!")
    full = bm25_search(postings, n, "a")
    assert empty.schema["id"].dataType == full.schema["id"].dataType
    assert empty.unionByName(full).count() == full.count()
