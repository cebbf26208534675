"""URL canonicalization / SURT / registrable-domain tests.

Strategy (the repo's two-form contract, tests/test_uris.py pattern): the
Column expressions and the pure-Python twins MUST agree byte-for-byte —
checked on a hand-built adversarial set plus hypothesis-generated URLs —
and the canonical semantics themselves are pinned against hand-derived
expected strings so BOTH forms can't drift together.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ferenda_spark.functions.urls import (
    canonicalize_url,
    canonicalize_url_py,
    registrable_domain,
    registrable_domain_py,
    surt_key,
    surt_key_py,
)

PINNED = [
    # (input, canonical, surt, etld1)
    (
        "HTTP://WWW.Example.COM:80/a/./b/../c?utm_source=x&b=2&a=1&fbclid=z#f",
        "http://example.com/a/c?a=1&b=2",
        "com,example)/a/c?a=1&b=2",
        "example.com",
    ),
    (
        "https://news.site.co.uk:443/x//y/",
        "https://news.site.co.uk/x/y/",
        "uk,co,site,news)/x/y/",
        "site.co.uk",
    ),
    # tracking-only query → no '?'; trailing-dot host; fragment dropped
    (
        "https://Host.Org./p?gclid=1&utm_campaign=c#frag",
        "https://host.org/p",
        "org,host)/p",
        "host.org",
    ),
    # dot-segment escape above root clamps; empty path → '/'
    ("http://a.b/../../x", "http://a.b/x", "b,a)/x", "a.b"),
    ("https://www.a.b", "https://a.b/", "b,a)/", "a.b"),
    # trailing '..' keeps the directory slash (RFC 3986 output buffer)
    ("http://h.io/a/b/..", "http://h.io/a/", "io,h)/a/", "h.io"),
    # non-default port survives; param without value survives; empty
    # params ('&&') drop
    (
        "https://h.io:8443/p?z=1&&m",
        "https://h.io:8443/p?m&z=1",
        "io,h:8443)/p?m&z=1",
        "h.io",
    ),
    # www is stripped only as a label prefix, wwwx is not
    ("http://wwwx.e.com/", "http://wwwx.e.com/", "com,e,wwwx)/", "e.com"),
    # not a URL → identity for canonical/surt, host rules for etld1
    ("not a url", "not a url", "not a url", "not a url"),
]


def _col_eval(spark, fn, inputs):
    df = spark.createDataFrame([(u,) for u in inputs], "u string")
    return [r.v for r in df.select(fn(F.col("u")).alias("v")).collect()]


def test_pinned_semantics(spark):
    ins = [p[0] for p in PINNED]
    got_c = _col_eval(spark, canonicalize_url, ins)
    got_s = _col_eval(spark, surt_key, ins)
    got_d = _col_eval(spark, registrable_domain, ins)
    for (u, c, s, d), gc, gs, gd in zip(PINNED, got_c, got_s, got_d):
        assert gc == c, f"canonical({u!r}) = {gc!r} != {c!r}"
        assert gs == s, f"surt({u!r}) = {gs!r} != {s!r}"
        assert gd == d, f"etld1({u!r}) = {gd!r} != {d!r}"
        # python twins agree with the pinned strings too
        assert canonicalize_url_py(u) == c
        assert surt_key_py(u) == s
        assert registrable_domain_py(u) == d


def test_canonical_idempotent(spark):
    ins = [p[1] for p in PINNED]
    assert _col_eval(spark, canonicalize_url, ins) == ins
    for u in ins:
        assert canonicalize_url_py(u) == u


def test_registrable_domain_on_bare_hosts(spark):
    cases = {
        "deep.sub.example.com": "example.com",
        "a.b.c.gov.uk": "c.gov.uk",
        "localhost": "localhost",
        "example.com:8080": "example.com",
        "com.au": "com.au",  # the suffix itself: best-effort last-2
    }
    got = _col_eval(spark, registrable_domain, list(cases))
    assert got == list(cases.values())
    for h, d in cases.items():
        assert registrable_domain_py(h) == d


_seg = st.sampled_from(["a", "B", ".", "..", "", "p1", "x%7E", "~y"])
_param = st.sampled_from(
    ["a=1", "b=2", "utm_source=t", "gclid=9", "z", "", "a=2", "_ga=G-1"]
)
_host_label = st.sampled_from(["www", "Ex", "site7", "co", "uk", "a"])


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "HTTPS", "ftp"]))
    host = ".".join(draw(st.lists(_host_label, min_size=1, max_size=4)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = "/".join([""] + draw(st.lists(_seg, max_size=5)))
    query = draw(
        st.one_of(
            st.just(""),
            st.lists(_param, max_size=4).map(lambda p: "?" + "&".join(p)),
        )
    )
    frag = draw(st.sampled_from(["", "#f", "#"]))
    return f"{scheme}://{host}{port}{path}{query}{frag}"


@given(st.lists(_urls(), min_size=1, max_size=40))
@settings(max_examples=20, deadline=None)
def test_column_matches_python_twin(spark, urls):
    got_c = _col_eval(spark, canonicalize_url, urls)
    got_s = _col_eval(spark, surt_key, urls)
    got_d = _col_eval(spark, registrable_domain, urls)
    for u, gc, gs, gd in zip(urls, got_c, got_s, got_d):
        assert gc == canonicalize_url_py(u)
        assert gs == surt_key_py(u)
        assert gd == registrable_domain_py(u)


def test_canonical_plan_is_scan_side(spark):
    """The whole canonicalization must stay in the scan stage: project
    over one source, zero Exchange — the property that makes URL dedup
    keys free at 10^12-row width."""
    df = spark.range(8).select(
        F.concat(F.lit("https://www.h"), F.col("id"), F.lit(".com/a?b=1"))
        .alias("u")
    )
    plan = df.select(
        canonicalize_url(F.col("u")).alias("c")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- URL template mining ------------------------------------------------

def test_url_template_basic(spark):
    from ferenda_spark.functions.urls import url_template

    cases = [
        ("https://a.com/news/2024/05/story-12345", "/news/{d}/{d}/story-{d}"),
        ("https://a.com/doc/deadbeefcafe1234/view", "/doc/{x}/view"),
        # uuid: hex runs survive as {x} with dashes between
        ("https://a.com/u/123e4567-e89b-42d3-a456-426614174000",
         "/u/{x}-e{d}b-{d}d{d}-a{d}-{x}"),
        ("https://a.com/", "/"),
        ("https://a.com", "/"),
        ("https://a.com/p?id=99&x=abc", "/p?id={d}&x=abc"),
        ("https://a.com/p#frag42", "/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.t for r in df.select(url_template(F.col("url")).alias("t")).collect()]
    assert got == [w for _, w in cases]


def test_mine_url_templates(spark):
    from ferenda_spark.functions.urls import mine_url_templates

    urls = (
        [f"https://h1.com/news/{i}" for i in range(6)]
        + [f"https://h1.com/about" for _ in range(2)]
        + ["https://h1.com/contact"]            # singleton -> filtered
        + [f"https://h2.com/item/{i}/buy" for i in range(4)]
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = mine_url_templates(df).collect()
    got = {(r.host, r.template): (r.n_urls, round(r.host_share, 6))
           for r in rows}
    assert got == {
        ("h1.com", "/news/{d}"): (6, round(6 / 9, 6)),
        ("h1.com", "/about"): (2, round(2 / 9, 6)),
        ("h2.com", "/item/{d}/buy"): (4, 1.0),
    }
