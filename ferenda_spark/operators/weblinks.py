"""Outlink + anchor-text harvest from web pages: the link-graph
construction step of a Common-Crawl-style pipeline (WAT-file equivalent).
Feeds the host graph that pagerank/HITS (operators/graph.py) rank and the
anchor-text profiles that entity linking uses as alias evidence.

Per page, one linear HTML pass collects every ``<a href>``: the href is
resolved against the page URL (stdlib ``urljoin`` — relative paths,
protocol-relative ``//host/…``, ``..`` segments), the fragment is
stripped (``#…``-only links resolve to the page itself), non-http(s)
schemes (javascript:, mailto:, data:, tel:, …) are dropped, and the
anchor is the whitespace-normalized textContent of the ``<a>`` element
(nested markup included). ``rel="nofollow"`` (token match, case-
insensitive) is surfaced as a boolean — rankers downweight it, they
don't re-parse rel.

Scale shape: ``outlinks`` is ONE Arrow-batched pandas UDF + explode —
map-only, zero shuffle; the html column never leaves the executor.
``anchor_profiles`` is the only shuffle consumer: one groupBy on
(dst, anchor) with map-side combine, then a bounded top-k window per dst
— uniform dst keys at web scale (popular targets are exactly what the
profile is for; k bounds the fan-in per target).
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urldefrag, urljoin, urlsplit

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_KEEP_SCHEMES = ("http", "https")


class _LinkCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str, bool]] = []  # href, anchor, nofollow
        self._open: list[tuple[str, bool, list[str]]] = []  # per <a>

    def handle_starttag(self, tag, attrs):
        if tag != "a":
            return
        a = dict(attrs)
        href = a.get("href")
        if href is None:
            return
        rel = (a.get("rel") or "").lower().split()
        self._open.append((href.strip(), "nofollow" in rel, []))

    def handle_endtag(self, tag):
        if tag == "a" and self._open:
            href, nofollow, buf = self._open.pop()
            anchor = " ".join("".join(buf).split())
            self.links.append((href, anchor, nofollow))

    def handle_data(self, data):
        for _href, _nf, buf in self._open:
            buf.append(data)


def extract_links(html, base_url: str) -> list[tuple[str, str, bool]]:
    """html (str/bytes) + page URL → [(dst, anchor, nofollow)] in
    document order. dst is absolute, fragment-stripped, http(s)-only.
    Never raises on malformed input."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    c = _LinkCollector()
    try:
        c.feed(html)
        c.close()
    except Exception:
        pass
    # EOF with unclosed <a>: keep what was captured
    for href, nofollow, buf in c._open:
        c.links.append((href, " ".join("".join(buf).split()), nofollow))
    out = []
    for href, anchor, nofollow in c.links:
        try:
            dst = urldefrag(urljoin(base_url or "", href))[0]
            if urlsplit(dst).scheme in _KEEP_SCHEMES:
                out.append((dst, anchor, nofollow))
        except ValueError:
            continue  # unparseable href (bad IPv6 literal etc.)
    return out


_LINKS_SCHEMA = "array<struct<dst:string,anchor:string,nofollow:boolean>>"


def outlinks(
    docs: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(src, dst, anchor, nofollow) — one row per kept link."""

    @pandas_udf(_LINKS_SCHEMA)
    def _ex(htmls: pd.Series, urls: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_links(h, u) for h, u in zip(htmls, urls)]
        )

    return (
        docs.select(
            F.col(url_col).alias("src"),
            _ex(F.col(html_col), F.col(url_col)).alias("_l"),
        )
        .select("src", F.explode("_l").alias("l"))
        .select("src", "l.dst", "l.anchor", "l.nofollow")
    )


def anchor_profiles(links: DataFrame, k: int = 5) -> DataFrame:
    """Per-target anchor evidence: (dst, n_links, n_src, anchors) where
    anchors is the top-k distinct anchor texts by (count desc, anchor
    asc) — the alias signal entity linking consumes. Two aggregations on
    the same dst key (one shuffle each, map-side combined); the window
    is bounded to k rows per dst."""
    per_anchor = (
        links.filter(F.length("anchor") > 0)
        .groupBy("dst", "anchor")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("dst").orderBy(F.desc("n"), F.asc("anchor"))
    topk = (
        per_anchor.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .groupBy("dst")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.lit(0) - F.col("n"), "anchor"))
            ).alias("_s")
        )
        .select(
            "dst", F.transform("_s", lambda s: s["anchor"]).alias("anchors")
        )
    )
    totals = links.groupBy("dst").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("src").alias("n_src"),
    )
    return totals.join(topk, "dst", "left").select(
        "dst", "n_links", "n_src",
        F.coalesce("anchors", F.array().cast("array<string>")).alias(
            "anchors"
        ),
    )


def anchor_alias_dictionary(
    links: DataFrame, *, min_count: int = 2, k: int = 3
) -> DataFrame:
    """Mine an entity-linking alias dictionary from anchor text — the
    web-native alias source (what people CALL a page is anchor text, the
    signal behind classic entity-linking dictionaries built from
    Wikipedia anchors): per target URL, the top-``k`` normalized anchor
    strings seen at least ``min_count`` times become dictionary rows
    ``(alias, alias_key, canonical_uri, kind='anchor', n_links)``
    compatible with the linking dictionary shape (schemas.URI_DICTIONARY;
    feed them to link_mentions alongside the curated dictionary).

    ``alias_key`` is the exact-tier join normalization (casefold +
    whitespace collapse — mirrors uris.normalize_alias); ``alias`` keeps
    a deterministic original surface form (min by bytes). One (dst, key)
    aggregation + a k-bounded window per dst."""
    norm = F.lower(F.regexp_replace(F.trim(F.col("anchor")), r"\s+", " "))
    per = (
        links.filter(F.length(F.trim("anchor")) > 0)
        .groupBy(F.col("dst"), norm.alias("alias_key"))
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.min(F.trim(F.col("anchor"))).alias("alias"),
        )
        .filter(F.col("n_links") >= min_count)
    )
    w = Window.partitionBy("dst").orderBy(
        F.desc("n_links"), F.asc("alias_key")
    )
    return (
        per.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select(
            "alias", "alias_key", F.col("dst").alias("canonical_uri"),
            F.lit("anchor").alias("kind"), "n_links",
        )
    )
