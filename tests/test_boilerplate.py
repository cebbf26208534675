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


# ------------------------------------------- corpus-frequency line removal
import random as _random

from ferenda_spark.functions.boilerplate import remove_frequent_lines


def _naive_linefreq(rows, min_docs, min_frac):
    from collections import defaultdict

    host_docs = defaultdict(set)
    df = defaultdict(set)
    for i, h, t in rows:
        host_docs[h].add(i)
        for ln in {x.strip() for x in t.split("\n")}:
            if ln:
                df[(h, ln)].add(i)
    out = {}
    for i, h, t in rows:
        kept, removed = [], 0
        lines = t.split("\n")
        for ln in lines:
            s = ln.strip()
            n = len(df.get((h, s), ()))
            if s and n >= min_docs and n >= len(host_docs[h]) * min_frac:
                removed += 1
            else:
                kept.append(ln)
        out[i] = ("\n".join(kept), len(lines), removed)
    return out


def _run_linefreq(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = remove_frequent_lines(df, **kw).collect()
    return {r.doc_id: (r.clean_text, r.n_lines, r.n_removed) for r in got}


def test_linefreq_basic_nav_stripped(spark):
    rows = [
        (1, "a.com", "NAV\nreal one\nCopyright"),
        (2, "a.com", "NAV\nreal two\nCopyright"),
        (3, "a.com", "NAV\nreal three\nCopyright"),
        (4, "b.com", "NAV\nother host keeps it"),  # freq only on a.com
    ]
    got = _run_linefreq(spark, rows, min_docs=3)
    assert got[1] == ("real one", 3, 2)
    assert got[2] == ("real two", 3, 2)
    assert got[4] == ("NAV\nother host keeps it", 2, 0)
    assert got == _naive_linefreq(rows, 3, 0.0)


def test_linefreq_blank_lines_exempt_and_bytes_exact(spark):
    rows = [
        (1, "a.com", "  spaced  \n\nNAV\n\ttabbed\t"),
        (2, "a.com", "NAV\n\nx"),
        (3, "a.com", "NAV"),
    ]
    got = _run_linefreq(spark, rows, min_docs=3)
    # blank line survives; kept lines keep their exact bytes
    assert got[1] == ("  spaced  \n\n\ttabbed\t", 4, 1)
    assert got[3] == ("", 1, 1)  # every line removed → empty text
    assert got == _naive_linefreq(rows, 3, 0.0)


def test_linefreq_min_frac_gate(spark):
    # line in 2 of 10 docs: passes min_docs=2 but not min_frac=0.5
    rows = [(i, "h", f"unique {i}\nSEMI" if i < 2 else f"unique {i}")
            for i in range(10)]
    got = _run_linefreq(spark, rows, min_docs=2, min_frac=0.5)
    assert got[0] == ("unique 0\nSEMI", 2, 0)
    got2 = _run_linefreq(spark, rows, min_docs=2, min_frac=0.2)
    assert got2[0] == ("unique 0", 2, 1)
    assert got == _naive_linefreq(rows, 2, 0.5)
    assert got2 == _naive_linefreq(rows, 2, 0.2)


def test_linefreq_random_matches_naive(spark):
    rnd = _random.Random(7)
    pool = ["NAV", "Copyright 2026", "alpha", "beta gamma", "  indent",
            "", "x", "NAV", "longer line with words"]
    rows = []
    for i in range(60):
        host = f"h{i % 3}"
        lines = [rnd.choice(pool) for _ in range(rnd.randint(1, 8))]
        rows.append((i, host, "\n".join(lines)))
    for md, mf in [(2, 0.0), (3, 0.3), (5, 0.9)]:
        assert _run_linefreq(spark, rows, min_docs=md, min_frac=mf) == \
            _naive_linefreq(rows, md, mf)
