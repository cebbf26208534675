"""Atom feed XML generation (SURVEY §2.1 S7 sink, W1).

Reference analog: ``news_generate_feeds`` renders the per-facet feedsets to
paginated Atom XML files — newest entries first, N per page, with
RFC-4287 feed metadata and prev/next-archive links between pages
([ref: ferenda/documentrepository.py :: news_generate_feeds,
news_write_atom], feedset classes in the same module).

Spark form: one row per (facet, feed, page) holding the complete Atom
document in an ``atom_xml`` column — rendered entirely with column
expressions (collect_list + sort_array + transform/aggregate string
concat), zero Python in the hot path, same pattern as ``operators.xhtml``.
The input is the ``feeds_topk`` table ([facet,] feed, rn, page, uri,
title, issued — the facet column is optional for single-feedset callers),
so the window/top-k shuffle happens once upstream; rendering itself adds
only the per-(facet, feed, page) groupBy — vocabulary-sized keys,
skew-free.

At 100 TB the feed tables are tiny (rollup output); the design point is
that XML assembly never leaves the JVM and the sink is an ordinary
partitioned-table write (one row per file if a downstream publisher wants
files, via ``catalog``)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ATOM_NS = "http://www.w3.org/2005/Atom"
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def _esc(c: Column) -> Column:
    out = F.replace(c, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def _esc_attr(c: Column) -> Column:
    return F.replace(_esc(c), F.lit('"'), F.lit("&quot;"))


def _pct(c: Column) -> Column:
    """Percent-encode a URL path SEGMENT (shared with operators.toc_html):
    facet/feed values are uncontrolled corpus-derived strings, so '/',
    '?', '#', space must not reach the URL structurally. url_encode is
    form-encoding (space → '+'); patch '+' to '%20' for path semantics."""
    return F.regexp_replace(F.url_encode(c), r"\+", "%20")


def _entry_xml(e: Column) -> Column:
    """One (rn, uri, title, issued) struct → '<entry>…</entry>'. The uri is
    both id and link target, as in the reference's entries."""
    ts = F.date_format(e["issued"], TS_FMT)
    return F.concat(
        F.lit("<entry><id>"), _esc(e["uri"]),
        F.lit("</id><title>"), _esc(F.coalesce(e["title"], F.lit(""))),
        F.lit('</title><link href="'), _esc_attr(e["uri"]),
        F.lit('"/><updated>'), ts,
        F.lit("</updated></entry>"),
    )


def atom_feeds(feeds: DataFrame, base_url: str) -> DataFrame:
    """feeds_topk table → ([facet,] feed, page, n_entries, updated,
    atom_xml).

    Multi-facet feedsets (reference: news_feedsets — one feed per facet
    value of EVERY feed facet): when the input carries a ``facet`` column
    the feed identity is (facet, feed) and hrefs are facet-scoped
    (…/feed/<facet>/<value>/<page>.atom), so same-valued feeds of different
    facets never collide. A facet-less input (single implicit feedset)
    keeps the round-1 schema and URLs.

    Per Atom semantics: feed ``updated`` = newest entry timestamp on the
    page; entries newest-first (the input's ``rn`` order); ``prev-archive``
    / ``next-archive`` links stitch the pages of one feed together."""
    has_facet = "facet" in feeds.columns
    keys = ["facet", "feed"] if has_facet else ["feed"]
    pages = (
        feeds.groupBy(*keys, "page")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("rn", "uri", "title", "issued"))
            ).alias("es"),
            F.count(F.lit(1)).cast("int").alias("n_entries"),
            F.max(F.col("issued")).alias("max_issued"),
        )
    )
    npages = feeds.groupBy(*keys).agg(F.max("page").alias("last_page"))
    pages = pages.join(F.broadcast(npages), keys)

    def href(page_col: Column) -> Column:
        segs: list[Column] = [F.lit(base_url + "/feed/")]
        if has_facet:
            segs += [_pct(F.col("facet")), F.lit("/")]
        # NULL feed (docs without the facet value form their own feed):
        # same "~none" sentinel convention as toc_html — '~' in a real
        # value always encodes to %7E, so no collision
        return F.concat(
            *segs, _pct(F.coalesce(F.col("feed"), F.lit("~none"))),
            F.lit("/"), page_col.cast("string"), F.lit(".atom"),
        )

    prev_link = F.when(
        F.col("page") < F.col("last_page"),
        F.concat(
            F.lit('<link rel="prev-archive" href="'),
            _esc_attr(href(F.col("page") + 1)), F.lit('"/>'),
        ),
    ).otherwise(F.lit(""))
    next_link = F.when(
        F.col("page") > 0,
        F.concat(
            F.lit('<link rel="next-archive" href="'),
            _esc_attr(href(F.col("page") - 1)), F.lit('"/>'),
        ),
    ).otherwise(F.lit(""))

    xml = F.concat(
        F.lit('<?xml version="1.0" encoding="utf-8"?>'),
        F.lit(f'<feed xmlns="{ATOM_NS}"><id>'),
        _esc(href(F.col("page"))), F.lit("</id><title>"),
        _esc(F.coalesce(F.col("feed"), F.lit("~none"))),
        F.lit("</title><updated>"),
        F.date_format(F.col("max_issued"), TS_FMT),
        F.lit('</updated><link rel="self" href="'),
        _esc_attr(href(F.col("page"))), F.lit('"/>'),
        prev_link, next_link,
        F.aggregate(
            F.col("es"), F.lit(""), lambda acc, e: F.concat(acc, _entry_xml(e))
        ),
        F.lit("</feed>"),
    )
    return pages.select(
        *keys, "page", "n_entries",
        F.date_format(F.col("max_issued"), TS_FMT).alias("updated"),
        xml.alias("atom_xml"),
    )
