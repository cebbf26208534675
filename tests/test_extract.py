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
