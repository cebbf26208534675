"""Vocabulary alignment (operators/alignment.py) vs a brute-force
token-Jaccard reference."""

from __future__ import annotations

import re

import pytest

from ferenda_spark.operators.alignment import align_vocabularies, name_tokens


def _toks(iri):
    ln = re.split(r"[#/]", iri)[-1]
    spaced = re.sub(r"([a-z0-9])([A-Z])", r"\1 \2", ln)
    return {t for t in re.split(r"[^a-z0-9]+", spaced.lower()) if t}


def _brute(left, right, min_score=0.5, max_df=100):
    from collections import Counter

    ldf = Counter(t for i in set(left) for t in _toks(i))
    rdf = Counter(t for i in set(right) for t in _toks(i))
    out = {}
    for li in set(left):
        lt = _toks(li)
        best = None
        for ri in set(right):
            rt = _toks(ri)
            inter = {t for t in lt & rt
                     if ldf[t] <= max_df and rdf[t] <= max_df}
            if not inter:
                continue
            score = len(inter) / (len(lt) + len(rt) - len(inter))
            if score < min_score:
                continue
            key = (-score, ri)
            if best is None or key < best[0]:
                best = (key, (ri, len(inter), len(lt), len(rt), score))
        if best:
            out[li] = best[1]
    return out


def test_name_tokens_camel_and_separators(spark):
    df = spark.createDataFrame(
        [("https://schema.org/NewsArticle",),
         ("http://purl.org/dc/terms/date-created",),
         ("https://x.example/vocab#blog_post",)], "iri string")
    got = [r.t for r in df.select(name_tokens(df.iri).alias("t")).collect()]
    assert got[0] == ["news", "article"]
    assert got[1] == ["date", "created"]
    assert got[2] == ["blog", "post"]


def test_alignment_hand_case(spark):
    left = [("https://schema.org/NewsArticle",),
            ("https://schema.org/datePublished",),
            ("https://schema.org/UniqueThing",)]
    right = [("http://other.example/vocab#ArticleNews",),
             ("http://other.example/vocab#published_date",),
             ("http://other.example/vocab#wholly-different",)]
    l = spark.createDataFrame(left, "iri string")
    r = spark.createDataFrame(right, "iri string")
    got = {x.left_iri: (x.right_iri, x.score)
           for x in align_vocabularies(l, r).collect()}
    assert got["https://schema.org/NewsArticle"][0].endswith("ArticleNews")
    assert got["https://schema.org/NewsArticle"][1] == pytest.approx(1.0)
    assert got["https://schema.org/datePublished"][0].endswith(
        "published_date")
    assert "https://schema.org/UniqueThing" not in got


def test_alignment_random_vs_brute(spark):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    left = [f"https://a.example/{words[i % 6]}{words[(i * 2) % 6].title()}"
            for i in range(30)]
    right = [f"https://b.example/v#{words[(i * 2) % 6]}_{words[(i * 5) % 6]}"
             for i in range(30)]
    l = spark.createDataFrame([(x,) for x in left], "iri string")
    r = spark.createDataFrame([(x,) for x in right], "iri string")
    got = {x.left_iri: (x.right_iri, x.n_shared, x.n_left, x.n_right,
                        pytest.approx(x.score, abs=1e-9))
           for x in align_vocabularies(l, r, min_score=0.3).collect()}
    want = _brute(left, right, min_score=0.3)
    assert got == want


def test_stop_token_df_cap(spark):
    # every right term shares token 'has'; cap kills that block
    left = [("https://a.example/hasName",)]
    right = [(f"https://b.example/has{i}x",) for i in range(12)]
    l = spark.createDataFrame(left, "iri string")
    r = spark.createDataFrame(right, "iri string")
    got = align_vocabularies(l, r, min_score=0.1, max_token_df=10).collect()
    assert got == []  # 'has' df=12 > 10 on the right side; 'name' unshared
