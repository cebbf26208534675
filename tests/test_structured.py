"""Structured-data extraction (operators/structured.py): JSON-LD +
microdata → triples. Pure-python unit tests for the extractor subset,
fuzz (never raises), plus a Spark plumbing test."""

import json
import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ferenda_spark.operators.structured import (
    RDF_TYPE,
    extract_structured,
    structured_triples,
)


def test_jsonld_basic_with_context_expansion():
    html = (
        '<html><head><script type="application/ld+json">'
        '{"@context": "https://schema.org", "@id": "https://ex.org/d/1",'
        ' "@type": "Article", "name": "Doc 1", "wordCount": 42,'
        ' "author": {"@type": "Person", "name": "Ada"}}'
        "</script></head><body></body></html>"
    )
    t = extract_structured(html)
    assert ("https://ex.org/d/1", RDF_TYPE, "https://schema.org/Article") in t
    assert ("https://ex.org/d/1", "https://schema.org/name", "Doc 1") in t
    assert ("https://ex.org/d/1", "https://schema.org/wordCount", "42") in t
    # nested author: blank node, edge + type + literal
    assert ("https://ex.org/d/1", "https://schema.org/author", "_:b0") in t
    assert ("_:b0", RDF_TYPE, "https://schema.org/Person") in t
    assert ("_:b0", "https://schema.org/name", "Ada") in t
    assert len(t) == 6


def test_jsonld_graph_arrays_values_bools():
    html = (
        '<script type="application/ld+json">'
        '{"@context": "https://schema.org/", "@graph": ['
        '{"@id": "e:a", "keywords": ["x", "y"], "free": true,'
        '  "rating": {"@value": 4.5}},'
        '{"@id": "e:b", "@type": ["Book", "https://other.org/T"]}]}'
        "</script>"
    )
    t = extract_structured(html)
    assert ("e:a", "https://schema.org/keywords", "x") in t
    assert ("e:a", "https://schema.org/keywords", "y") in t
    assert ("e:a", "https://schema.org/free", "true") in t
    assert ("e:a", "https://schema.org/rating", "4.5") in t
    assert ("e:b", RDF_TYPE, "https://schema.org/Book") in t
    # absolute IRI type passes through unexpanded
    assert ("e:b", RDF_TYPE, "https://other.org/T") in t


def test_jsonld_bad_json_and_other_scripts_ignored():
    html = (
        '<script type="application/ld+json">{not json</script>'
        '<script type="text/javascript">{"@id": "x", "name": "no"}</script>'
        '<script type="application/ld+json">{"@id": "ok", "k": "v"}</script>'
    )
    assert extract_structured(html) == [("ok", "k", "v")]


def test_microdata_scopes_props_and_url_attrs():
    html = (
        '<div itemscope itemtype="https://schema.org/WebPage"'
        ' itemid="https://ex.org/p/1">'
        "<span itemprop=\"name\">Page <b>One</b></span>"
        '<a itemprop="url" href="https://ex.org/d/1">link</a>'
        '<meta itemprop="position" content="3">'
        '<div itemprop="author" itemscope'
        ' itemtype="https://schema.org/Person">'
        '<span itemprop="name">Ada</span></div>'
        "</div>"
    )
    t = extract_structured(html)
    p = "https://ex.org/p/1"
    assert (p, RDF_TYPE, "https://schema.org/WebPage") in t
    assert (p, "https://schema.org/name", "Page One") in t  # nested text
    assert (p, "https://schema.org/url", "https://ex.org/d/1") in t
    assert (p, "https://schema.org/position", "3") in t
    # nested scope: blank node edge, type, inner prop with INNER vocab
    assert (p, "https://schema.org/author", "_:b0") in t
    assert ("_:b0", RDF_TYPE, "https://schema.org/Person") in t
    assert ("_:b0", "https://schema.org/name", "Ada") in t
    assert len(t) == 7


def test_microdata_multiprop_and_unclosed_soup():
    html = (
        '<div itemscope itemid="i:1">'
        '<span itemprop="a b">v</span>'
        '<span itemprop="tail">never closed'
    )
    t = extract_structured(html)
    assert ("i:1", "a", "v") in t and ("i:1", "b", "v") in t
    assert ("i:1", "tail", "never closed") in t  # EOF closes captures


def test_blank_counter_is_document_local_and_ordered():
    html = (
        '<script type="application/ld+json">'
        '{"a": {"x": "1"}, "b": {"x": "2"}}</script>'
    )
    t = extract_structured(html)
    # outer node _:b0, children _:b1, _:b2 in key order
    assert ("_:b0", "a", "_:b1") in t and ("_:b0", "b", "_:b2") in t
    # a second document starts over at _:b0
    assert extract_structured(html) == t


def test_bytes_none_and_empty():
    assert extract_structured(None) == []
    assert extract_structured(b"") == []
    assert extract_structured("plain text, no markup") == []
    html = '<script type="application/ld+json">{"@id":"x","k":"v"}</script>'
    assert extract_structured(html.encode()) == [("x", "k", "v")]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.printable + "åä<>&\"'", max_size=400))
def test_fuzz_never_raises(s):
    out = extract_structured(s)
    assert isinstance(out, list)


@settings(max_examples=50, deadline=None)
@given(
    st.recursive(
        st.one_of(st.text(max_size=8), st.integers(), st.booleans()),
        lambda ch: st.one_of(
            st.lists(ch, max_size=3),
            st.dictionaries(st.text(string.ascii_lowercase, min_size=1,
                                    max_size=5), ch, max_size=3),
        ),
        max_leaves=12,
    )
)
def test_fuzz_arbitrary_jsonld_never_raises(doc):
    html = ('<script type="application/ld+json">' + json.dumps(doc)
            + "</script>")
    out = extract_structured(html)
    assert all(len(t) == 3 for t in out)


def test_spark_structured_triples(spark):
    rows = [
        (
            "https://a.example/1",
            '<script type="application/ld+json">'
            '{"@id": "d:1", "k": "v1"}</script>'.encode(),
        ),
        ("https://a.example/2", b"<p>nothing structured</p>"),
        (
            "https://b.example/3",
            '<div itemscope itemid="m:3"><span itemprop="n">x</span>'
            "</div>".encode(),
        ),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = structured_triples(df).orderBy("src").collect()
    assert [tuple(r) for r in out] == [
        ("https://a.example/1", "d:1", "k", "v1"),
        ("https://b.example/3", "m:3", "n", "x"),
    ]
