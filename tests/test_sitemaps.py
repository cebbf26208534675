"""Sitemap ingestion (sources/sitemaps.py)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ferenda_spark.sources.sitemaps import parse_sitemap, parse_sitemaps

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h.example/a</loc><lastmod>2024-01-05</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc> https://h.example/b </loc></url>
  <url><lastmod>2024-01-06</lastmod></url>
</urlset>"""

INDEX = b"""<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://h.example/sitemap1.xml</loc>
           <lastmod>2024-02-01</lastmod></sitemap>
</sitemapindex>"""


def test_urlset_fields_and_loc_required():
    got = parse_sitemap(URLSET)
    assert got[0] == {
        "kind": "url", "loc": "https://h.example/a",
        "lastmod": "2024-01-05", "changefreq": "daily", "priority": "0.8",
        "sitemap_error": None,
    }
    # whitespace trimmed; loc-less entries dropped
    assert got[1]["loc"] == "https://h.example/b"
    assert len(got) == 2


def test_sitemapindex_children_and_errors():
    got = parse_sitemap(INDEX)
    assert got == [
        {
            "kind": "sitemap", "loc": "https://h.example/sitemap1.xml",
            "lastmod": "2024-02-01", "changefreq": None, "priority": None,
            "sitemap_error": None,
        }
    ]
    bad = parse_sitemap(b"<urlset><url><loc>x</loc>")
    assert len(bad) == 1 and bad[0]["sitemap_error"].startswith("bad xml")
    other = parse_sitemap(b"<html><body/></html>")
    assert other[0]["sitemap_error"] == "unexpected root <html>"
    assert parse_sitemap(None) == []


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=string.printable + "<>&", max_size=300))
def test_fuzz_never_raises(s):
    out = parse_sitemap(s.encode())
    assert isinstance(out, list)


def test_spark_parse_sitemaps(spark):
    rows = [
        ("https://h.example/sitemap.xml", URLSET),
        ("https://h.example/simap_index.xml", INDEX),
        ("https://broken.example/s.xml", b"not xml at all"),
    ]
    df = spark.createDataFrame(rows, "sitemap_url string, xml binary")
    got = parse_sitemaps(df)
    assert got.filter("kind = 'url'").count() == 2
    assert got.filter("kind = 'sitemap'").count() == 1
    err = got.filter("sitemap_error is not null").collect()
    assert len(err) == 1 and err[0]["sitemap_url"].startswith("https://broken")
