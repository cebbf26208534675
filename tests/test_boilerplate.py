"""Main-content extraction (functions/boilerplate.py)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ferenda_spark.functions.boilerplate import (
    extract_main_content,
    main_content,
)

PAGE = (
    "<html><body>"
    '<nav>Home | About | <a href="/x">a navigation bar with links</a></nav>'
    "<h1>Short title</h1>"
    "<p>This paragraph is long enough to clear the length gate easily.</p>"
    '<p><a href="/a">spam link</a> <a href="/b">more spam link text</a> y</p>'
    "<p>tiny</p>"
    "<footer>copyright Example Corp, all rights reserved forever</footer>"
    "</body></html>"
)


def test_block_classification():
    text, n_blocks, n_kept = extract_main_content(PAGE)
    assert n_blocks == 6
    assert n_kept == 2
    assert text == (
        "Short title\n\n"
        "This paragraph is long enough to clear the length gate easily."
    )


def test_link_density_and_heading_exemption():
    # heading below min_chars is kept; link-heavy long block is dropped
    html = (
        "<h2>Hi</h2>"
        '<p><a href="/">' + "x" * 40 + "</a> yz</p>"
        "<p>" + "w " * 20 + "</p>"
    )
    text, nb, nk = extract_main_content(html)
    assert nb == 3 and nk == 2
    assert text.startswith("Hi\n\n")
    assert "xxxx" not in text


def test_script_style_suppressed_and_nested_boiler():
    html = (
        "<script>var x = 'never seen';</script>"
        "<style>.c { color: red }</style>"
        "<aside><div>deeply nested sidebar content that is long enough"
        "</div></aside>"
        "<p>The only real content block on this page, kept intact.</p>"
    )
    text, nb, nk = extract_main_content(html)
    assert "never seen" not in text and "color" not in text
    assert nk == 1
    assert text == "The only real content block on this page, kept intact."


def test_br_splits_and_unclosed_soup():
    html = (
        "<p>first half of a long enough paragraph here<br>"
        "second half also long enough to keep alone"
    )
    text, nb, nk = extract_main_content(html)
    assert nb == 2 and nk == 2
    assert text == (
        "first half of a long enough paragraph here\n\n"
        "second half also long enough to keep alone"
    )


def test_bytes_none_empty():
    assert extract_main_content(None) == ("", 0, 0)
    assert extract_main_content(b"") == ("", 0, 0)
    assert extract_main_content("no tags but a long enough plain text line")[
        2
    ] == 1


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.printable + "<>&\"'", max_size=400))
def test_fuzz_never_raises(s):
    text, nb, nk = extract_main_content(s)
    assert nk <= nb


def test_spark_main_content(spark):
    df = spark.createDataFrame(
        [(1, PAGE.encode()), (2, b"<p>tiny</p>"), (3, None)],
        "doc_id bigint, html binary",
    )
    got = {r.doc_id: r for r in main_content(df).collect()}
    assert got[1]["n_kept"] == 2 and "Short title" in got[1]["main_text"]
    assert (got[2]["n_blocks"], got[2]["n_kept"]) == (1, 0)
    assert got[3]["main_text"] == "" and got[3]["n_blocks"] == 0
