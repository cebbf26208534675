"""Outlink/anchor harvest (operators/weblinks.py)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ferenda_spark.operators.weblinks import (
    anchor_profiles,
    extract_links,
    outlinks,
)

BASE = "https://h.example/dir/page"


def test_relative_absolute_protocol_relative_and_dotdot():
    html = (
        '<a href="/doc/5">abs path</a>'
        '<a href="next">sibling</a>'
        '<a href="../up">up</a>'
        '<a href="//other.example/x">proto-rel</a>'
        '<a href="https://full.example/y?q=1">full</a>'
    )
    got = extract_links(html, BASE)
    assert got == [
        ("https://h.example/doc/5", "abs path", False),
        ("https://h.example/dir/next", "sibling", False),
        ("https://h.example/up", "up", False),
        ("https://other.example/x", "proto-rel", False),
        ("https://full.example/y?q=1", "full", False),
    ]


def test_fragment_stripped_and_bad_schemes_dropped():
    html = (
        '<a href="#sec">self</a>'
        '<a href="/p#frag">fragged</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a href="tel:+123">tel</a>'
        '<a href="data:text/plain,x">data</a>'
        "<a>no href</a>"
    )
    got = extract_links(html, BASE)
    assert got == [
        (BASE, "self", False),
        ("https://h.example/p", "fragged", False),
    ]


def test_nofollow_nested_anchor_text_and_unclosed():
    html = (
        '<a href="/a" rel="NoFollow external">one <b>two</b>\n three</a>'
        '<a href="/b">never closed'
    )
    got = extract_links(html, BASE)
    assert got == [
        ("https://h.example/a", "one two three", True),
        ("https://h.example/b", "never closed", False),
    ]


def test_bytes_none_empty_base():
    assert extract_links(None, BASE) == []
    assert extract_links(b'<a href="https://x.example/p">t</a>', "") == [
        ("https://x.example/p", "t", False)
    ]
    # relative href with empty base resolves to no scheme -> dropped
    assert extract_links('<a href="/only/rel">t</a>', "") == []


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.printable + "<>&\"'#:", max_size=300))
def test_fuzz_never_raises(s):
    out = extract_links(s, BASE)
    assert all(u.startswith("http") for u, _a, _n in out)


def test_spark_outlinks_and_anchor_profiles(spark):
    rows = [
        ("https://a.example/1",
         b'<a href="/t">Home</a><a href="https://b.example/z">B</a>'),
        ("https://a.example/2", b'<a href="/t">Home</a>'),
        ("https://c.example/3",
         b'<a href="https://a.example/t">Start</a>'
         b'<a href="https://a.example/t">Home</a>'),
    ]
    docs = spark.createDataFrame(rows, "url string, html binary")
    links = outlinks(docs)
    assert links.count() == 5
    prof = {
        r["dst"]: r
        for r in anchor_profiles(links, k=2).collect()
    }
    t = prof["https://a.example/t"]
    assert t["n_links"] == 4 and t["n_src"] == 3
    # Home count 3 beats Start count 1
    assert t["anchors"] == ["Home", "Start"]
    assert prof["https://b.example/z"]["anchors"] == ["B"]


def test_anchor_alias_dictionary(spark):
    from ferenda_spark.operators.weblinks import anchor_alias_dictionary

    rows = [
        ("s1", "https://t.example/", "ACME Corp"),
        ("s2", "https://t.example/", "acme   corp"),  # normalizes same
        ("s3", "https://t.example/", "ACME"),
        ("s4", "https://t.example/", "ACME"),
        ("s5", "https://t.example/", "once-only"),  # below min_count
        ("s6", "https://u.example/", ""),  # empty anchor dropped
    ]
    df = spark.createDataFrame(rows, "src string, dst string, anchor string")
    got = {
        (r["alias_key"], r["canonical_uri"]): (r["alias"], r["n_links"], r["kind"])
        for r in anchor_alias_dictionary(df, min_count=2, k=3).collect()
    }
    assert got == {
        ("acme corp", "https://t.example/"): ("ACME Corp", 2, "anchor"),
        ("acme", "https://t.example/"): ("ACME", 2, "anchor"),
    }


def test_anchor_alias_dictionary_topk(spark):
    from ferenda_spark.operators.weblinks import anchor_alias_dictionary

    rows = [("s", "d", f"a{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "src string, dst string, anchor string")
    got = anchor_alias_dictionary(df, min_count=1, k=2).collect()
    assert len(got) == 2  # k bound per dst
    assert {r["alias_key"] for r in got} == {"a0", "a1"}  # count ties → asc key
