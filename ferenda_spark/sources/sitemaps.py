"""Sitemap ingestion — the crawl frontier's seed source (public spec:
sitemaps.org protocol 0.9: ``<urlset>`` of ``<url>`` entries with
loc/lastmod/changefreq/priority, and ``<sitemapindex>`` of ``<sitemap>``
children). A Common-Crawl-style pipeline uses these to seed and
re-prioritize the frontier (robots.py gates what may be fetched,
sitemaps say what exists and how fresh it is).

Parsing is stdlib ElementTree inside one Arrow-batched pandas UDF —
map-only over the (sitemap_url, xml) table, which is host-vocabulary-
sized next to the URL corpus. Namespaces are handled by local-name
matching (publishers ship a zoo of xmlns declarations); malformed XML
emits one ``sitemap_error`` row (errors-as-data, same convention as
warc_error) and never raises. ``<sitemapindex>`` children come out as
kind='sitemap' rows — frontier code joins them back for another fetch
round rather than this operator recursing into IO it cannot do."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(xml) -> list[dict]:
    """One sitemap/sitemapindex document → entry dicts. Never raises."""
    if xml is None:
        return []
    if isinstance(xml, (bytes, bytearray)):
        xml = bytes(xml)
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as exc:
        return [
            {
                "kind": None, "loc": None, "lastmod": None,
                "changefreq": None, "priority": None,
                "sitemap_error": f"bad xml: {exc}",
            }
        ]
    root_kind = _local(root.tag)
    if root_kind not in ("urlset", "sitemapindex"):
        return [
            {
                "kind": None, "loc": None, "lastmod": None,
                "changefreq": None, "priority": None,
                "sitemap_error": f"unexpected root <{root_kind}>",
            }
        ]
    kind = "url" if root_kind == "urlset" else "sitemap"
    out: list[dict] = []
    for child in root:
        if _local(child.tag) not in ("url", "sitemap"):
            continue
        fields = {"loc": None, "lastmod": None, "changefreq": None,
                  "priority": None}
        for el in child:
            name = _local(el.tag)
            if name in fields and el.text is not None:
                fields[name] = el.text.strip()
        if fields["loc"]:
            out.append(
                {"kind": kind, **fields, "sitemap_error": None}
            )
    return out


_SCHEMA = (
    "array<struct<kind:string,loc:string,lastmod:string,changefreq:string,"
    "priority:string,sitemap_error:string>>"
)


def parse_sitemaps(
    df: DataFrame, url_col: str = "sitemap_url", xml_col: str = "xml"
) -> DataFrame:
    """(sitemap_url, kind, loc, lastmod, changefreq, priority,
    sitemap_error) — one row per entry; error rows have kind NULL."""

    @pandas_udf(_SCHEMA)
    def _p(xmls: pd.Series) -> pd.Series:
        return xmls.map(parse_sitemap)

    return (
        df.select(
            F.col(url_col).alias("sitemap_url"), _p(F.col(xml_col)).alias("_e")
        )
        .select("sitemap_url", F.explode("_e").alias("e"))
        .select(
            "sitemap_url", "e.kind", "e.loc", "e.lastmod", "e.changefreq",
            "e.priority", "e.sitemap_error",
        )
    )
