"""Extraction spec + golden byte-identity (port of the reference's
parse_test golden pattern [ref: ferenda/testutil.py :: RepoTester.parse_test];
the per-row invariant from input_hint: byte-identical extracted text per url).
"""

import hashlib

import pyarrow.parquet as pq

from ferenda_spark.functions.extract import extract_text, sniff_charset
from ferenda_spark.sources.corpus import gen_doc

N_GOLDEN = 500


def test_basic_blocks():
    html = b"<html><head><title>T1</title></head><body><h2>H</h2><p>a b</p><p>c</p></body></html>"
    assert extract_text(html) == "T1\n\nH\n\na b\n\nc"


def test_script_style_comments_dropped():
    html = (
        b"<body><p>keep</p><script>var x=1;</script><style>.a{}</style>"
        b"<!-- nope --><p>also<!-- inner --> kept</p></body>"
    )
    assert extract_text(html) == "keep\n\nalso kept"


def test_entities_decoded():
    html = b"<p>a &amp; b &eacute; c &#8212; d</p>"
    assert extract_text(html) == "a & b \xe9 c — d"


def test_whitespace_collapsed_and_inline_preserved():
    html = b"<p>foo  <b> bar </b>\n\t baz <i>qux</i>!</p>"
    assert extract_text(html) == "foo bar baz qux!"


def test_br_flushes():
    assert extract_text(b"<p>one<br>two</p>") == "one\n\ntwo"


def test_charset_sniff_and_latin1():
    raw = '<html><head><meta charset="iso-8859-1"></head><body><p>café</p></body>'.encode(
        "iso-8859-1"
    )
    assert sniff_charset(raw) == "iso-8859-1"
    assert extract_text(raw) == "café"
    assert sniff_charset(b"<meta charset=utf-8>") == "utf-8"
    assert sniff_charset(b"no declaration") == "utf-8"


def test_deterministic():
    d = gen_doc(3, 100)
    assert extract_text(d["html"]) == extract_text(d["html"]) == d["text"]


def test_golden_byte_identity():
    """Regenerate a sample of the frozen corpus and sha256-compare — this is
    the contract that extraction behavior never drifts implicitly."""
    g = pq.read_table("fixtures/golden_text.parquet").to_pylist()
    by_url = {r["url"]: r for r in g}
    assert len(by_url) == N_GOLDEN
    for i in range(0, N_GOLDEN, 7):  # 72 sampled docs
        d = gen_doc(i, N_GOLDEN)
        b = extract_text(d["html"]).encode("utf-8")
        row = by_url[d["url"]]
        assert hashlib.sha256(b).hexdigest() == row["text_sha256"], d["url"]
        assert len(b) == row["text_len"]


# ---------------------------------------------------------------------------
# fast-path / stdlib differential equivalence (the fast tokenizer must be
# event-stream-identical to html.parser on everything it accepts; anything
# else must fall back)
# ---------------------------------------------------------------------------

from ferenda_spark.functions.extract import (  # noqa: E402
    _decode,
    _extract_stdlib,
    _fast_scan,
    _TextExtractor,
)


def _fast_or_none(html: str):
    p = _TextExtractor()
    if not _fast_scan(html, p):
        return None
    p._flush()
    return "\n\n".join(p.chunks)


ADVERSARIAL = [
    "", "<", "a<", "</", "a</", "<p", "abc<p>x</p", "<p>&amp test", "&notaref;",
    "<p>&amp;</p>", "<!-- unterminated", "<!--c--  >after", "<!-->x",
    "<!doctype html><p>y</p>", "<script>var a='</div>';</script>ok",
    "<script>no end", "<SCRIPT>x</ScRiPt>Y", "<script/>visible</script>",
    "<style>p{}</style>t", "<p/>x", "<br/>y", "<p class='a\"b'>t</p>",
    '<p data-x = "1 > 2">q</p>', "<p <b>weird</p>", "< p>not a tag</p>",
    "<3 hearts", "<p>a<  b</p>", "<?pi data>z", "<?unterminated",
    "<div><ul><li>a<li>b</ul></div>", "<h1>T</h1><p>x<br>y</p>",
    "<p>x&#65;&#x42;c</p>", "<p>tail&am", "<p>t&ampx</p>", "<td>no block</td>",
    "</p  >x", "</p attr>x", "<p\tclass=x>tab</p>", "<a href=#>l</a>",
    "<a href>m</a>", "<em>e</em >f", "<script></script' ></script>g",
    "<p>&lt;script&gt;</p>", "—<", "x<<p>y",
]


def test_fast_path_matches_stdlib_on_adversarial():
    for s in ADVERSARIAL:
        f = _fast_or_none(s)
        if f is not None:
            assert f == _extract_stdlib(s), repr(s)


def test_fast_path_covers_corpus_without_fallback():
    """The corpus must ride the fast path (it is the throughput story) AND
    match the stdlib implementation byte-for-byte."""
    for i in range(0, 400):
        html = _decode(gen_doc(i, 400)["html"])
        f = _fast_or_none(html)
        assert f is not None, f"doc {i} fell back"
        assert f == _extract_stdlib(html), f"doc {i} diverged"


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _PIECES = [
        "<p>", "</p>", "<b>", "</b>", "<br>", "<br/>", "<div>", "</div>",
        "<li>", "text ", "&amp;", "&", ";", "<", ">", "/", "<!--", "-->",
        "<script>", "</script>", "<style>", "</style>", "x y", "&eacute;",
        "&#65;", "&#x42;", "<h2>", "</h2>", "\n", "  ", "<a href='q'>",
        "</a>", '<p class="z">', "é", "—", "<!", "<?", "?>", "--", "<em/>",
        "</ p>", "<P>", "</P>", "<SCRIPT>", "</SCRIPT>", "<p/>",
    ]

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.sampled_from(_PIECES), max_size=25).map("".join))
    def test_fast_path_matches_stdlib_fuzz_pieces(s):
        f = _fast_or_none(s)
        if f is not None:
            assert f == _extract_stdlib(s)

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="<>/!-?&;ab pé—\"'=x", max_size=40))
    def test_fast_path_matches_stdlib_fuzz_chars(s):
        f = _fast_or_none(s)
        if f is not None:
            assert f == _extract_stdlib(s)

except ImportError:  # pragma: no cover
    pass
