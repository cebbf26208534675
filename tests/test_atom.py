"""Atom feed rendering tests ([ref: ferenda/documentrepository.py ::
news_generate_feeds] — upstream asserts feed XML structure in
test/testDocRepo.py's news tests; same shape: render, parse back with
ElementTree, assert entries/ordering/pagination/escaping)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

from ferenda_spark.operators.atom import ATOM_NS, atom_feeds
from ferenda_spark.operators.rollups import feeds_topk

NS = {"a": ATOM_NS}


@pytest.fixture(scope="module")
def feeds(spark):
    rows = [
        ("u1", 1, "Alpha & <b>doc</b>", "2024-01-05", "en"),
        ("u2", 1, "Beta doc", "2024-03-01", "en"),
        ("u3", 2, "Gamma", "2024-02-09", "en"),
        ("u4", 2, 'Quo"te', "2023-03-01", "de"),
    ]
    docmeta = spark.createDataFrame(
        rows, "uri string, part_key int, title string, issued string, lang string"
    )
    return feeds_topk(docmeta, page_size=2)


def test_atom_well_formed_and_ordered(feeds):
    out = {
        (r["feed"], r["page"]): r
        for r in atom_feeds(feeds, "https://ex.org").collect()
    }
    en0 = out[("en", 0)]
    root = ET.fromstring(en0["atom_xml"])  # must be well-formed XML
    assert root.tag == f"{{{ATOM_NS}}}feed"
    entries = root.findall("a:entry", NS)
    assert en0["n_entries"] == len(entries) == 2
    # newest first: u2 (2024-03-01) then u3 (2024-02-09)
    assert [e.find("a:id", NS).text for e in entries] == ["u2", "u3"]
    assert root.find("a:updated", NS).text == "2024-03-01T00:00:00Z"
    # title escaping round-trips through the XML parser
    en1 = out[("en", 1)]
    assert (
        ET.fromstring(en1["atom_xml"]).find("a:entry/a:title", NS).text
        == "Alpha & <b>doc</b>"
    )
    de = ET.fromstring(out[("de", 0)]["atom_xml"])
    assert de.find("a:entry/a:title", NS).text == 'Quo"te'


def test_atom_archive_links(feeds):
    out = {
        (r["feed"], r["page"]): ET.fromstring(r["atom_xml"])
        for r in atom_feeds(feeds, "https://ex.org").collect()
    }
    rels = lambda el: {
        l.get("rel"): l.get("href") for l in el.findall("a:link", NS)
    }
    en0, en1 = rels(out[("en", 0)]), rels(out[("en", 1)])
    assert en0["self"] == "https://ex.org/feed/lang/en/0.atom"
    assert en0["prev-archive"] == "https://ex.org/feed/lang/en/1.atom"
    assert "next-archive" not in en0  # newest page
    assert en1["next-archive"] == "https://ex.org/feed/lang/en/0.atom"
    assert "prev-archive" not in en1  # oldest page
    assert set(rels(out[("de", 0)])) == {"self"}  # single-page feed
