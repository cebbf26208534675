"""TOC HTML page generation tests ([ref: ferenda/documentrepository.py ::
toc_generate_pages] — upstream checks generated toc pages in
test/testDocRepo.py; same shape: render, re-parse, assert listing/nav/
pagination)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

from ferenda_spark.operators.rollups import toc_rollup
from ferenda_spark.operators.toc_html import toc_pages

XH = {"x": "http://www.w3.org/1999/xhtml"}


@pytest.fixture(scope="module")
def toc(spark):
    rows = [
        (f"u{i}", 1, f"{'AB'[i % 2]}doc & {i:02d}", f"202{i % 3}-01-05", "en")
        for i in range(10)
    ]
    docmeta = spark.createDataFrame(
        rows, "uri string, part_key int, title string, issued string, lang string"
    )
    return toc_rollup(docmeta)


def test_toc_pages_listing_and_nav(toc):
    out = {
        (r["facet"], r["value"], r["page"]): r
        for r in toc_pages(toc, "https://ex.org", page_size=3).collect()
    }
    a0 = out[("letter", "A", 0)]
    root = ET.fromstring(a0["html"])  # well-formed XHTML
    lis = root.findall(".//x:ul/x:li/x:a", XH)
    assert a0["n_page_docs"] == len(lis) == 3
    # sorted by sort_key (title) and escaped: 'Adoc & 00' first
    assert lis[0].text == "Adoc & 00"
    assert lis[0].get("href") == "u0"
    # nav lists sibling letter values, linking page 0 of each
    nav = root.findall(".//x:nav/x:a", XH)
    assert [a.text for a in nav] == ["A", "B"]
    assert nav[1].get("href") == "https://ex.org/toc/letter/B/0.html"


def test_toc_pagination(toc):
    out = {
        (r["facet"], r["value"], r["page"]): r
        for r in toc_pages(toc, "https://ex.org", page_size=3).collect()
    }
    # 5 'A' docs at size 3 → pages 0 (3 docs) and 1 (2 docs)
    assert out[("letter", "A", 0)]["n_page_docs"] == 3
    assert out[("letter", "A", 1)]["n_page_docs"] == 2
    assert ("letter", "A", 2) not in out
    rels = lambda r: {
        a.get("rel"): a.get("href")
        for a in ET.fromstring(r["html"]).findall(".//x:a[@rel]", XH)
    }
    assert rels(out[("letter", "A", 0)]) == {
        "next": "https://ex.org/toc/letter/A/1.html"
    }
    assert rels(out[("letter", "A", 1)]) == {
        "prev": "https://ex.org/toc/letter/A/0.html"
    }
    # the 'all' bucket pages over every doc
    assert sum(
        r["n_page_docs"] for (f, v, _), r in out.items() if f == "all"
    ) == 10


def test_page_href_percent_encodes_values(spark):
    """Facet values are uncontrolled corpus strings: '/', space, '?', '#'
    must be percent-encoded in hrefs, not break the URL structure."""
    toc = spark.createDataFrame(
        [
            ("letter", "A/B", 1,
             [{"sort_key": "t", "uri": "u1", "title": "t"}]),
            ("letter", "C #x", 1,
             [{"sort_key": "t2", "uri": "u2", "title": "t2"}]),
        ],
        "facet string, value string, n_docs long, "
        "page_docs array<struct<sort_key:string,uri:string,title:string>>",
    )
    pages = {r["value"]: r["html"] for r in toc_pages(toc, "https://ex.org").collect()}
    import xml.etree.ElementTree as ET

    for html in pages.values():
        root = ET.fromstring(html)  # still well-formed
        hrefs = [a.get("href") for a in root.iter() if a.tag.endswith("a")]
        for h in hrefs:
            if h.startswith("https://ex.org/toc/"):
                tail = h[len("https://ex.org/toc/"):]
                assert " " not in h and "#" not in h
                assert len(tail.split("/")) == 3  # facet/value/page.html
    assert "A%2FB" in pages["A/B"]
    assert "C%20%23x" in pages["C #x"]


def test_capped_global_bucket_paginates_list_not_count(spark):
    """The global bucket's page_docs is capped below n_docs at scale —
    pagination must follow the materialized list, never emit empty pages."""
    docs = [{"sort_key": f"t{i:02d}", "uri": f"u{i}", "title": f"t{i:02d}"} for i in range(6)]
    toc = spark.createDataFrame(
        [("all", "*", 1000, docs)],
        "facet string, value string, n_docs long, "
        "page_docs array<struct<sort_key:string,uri:string,title:string>>",
    )
    rows = toc_pages(toc, "https://ex.org", page_size=3).collect()
    assert len(rows) == 2  # 6 capped docs / 3 per page — NOT 334 pages
    assert sorted(r["n_page_docs"] for r in rows) == [3, 3]
