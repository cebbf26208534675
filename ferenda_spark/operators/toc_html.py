"""TOC page generation: the toc rollup rendered to XHTML listing pages
(SURVEY §2.1 S7, E3 step 1).

Reference analog: ``toc_generate_pages`` — for every (facet, value) bucket
of the pagesets, write an HTML page listing that bucket's documents, with a
nav bar linking the sibling values of the same pageset ([ref:
ferenda/documentrepository.py :: toc_generate_pages, toc_select_for_pages];
the XSLT presentation step is out of scope per SURVEY T10 — we emit the
structural XHTML directly).

Spark form: input is the ``toc_rollup`` table (facet, value, n_docs,
page_docs sorted by sort_key). Pagination = explode over a ``sequence`` of
page indices + ``slice`` of the collected doc array — no second shuffle
over the corpus; the only joins are against the vocabulary-sized
(facet → sibling values) frame, broadcast. All HTML assembly is column
expressions (same pattern as ``operators.atom`` / ``operators.xhtml``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.operators.atom import _esc, _esc_attr, _pct


def toc_pages(toc: DataFrame, base_url: str, page_size: int = 25) -> DataFrame:
    """toc_rollup table → (facet, value, page, n_page_docs, html).

    Page p of a bucket lists ``page_docs[p·size : (p+1)·size]``; the nav
    links every sibling value of the facet (the reference's pageset nav);
    prev/next links paginate within the bucket."""
    # (facet, NULL) buckets are real rollup rows (docs lacking the facet
    # value); NULL would null-propagate through every concat (title, h1,
    # hrefs) and vanish from the collect_list nav. Render them under the
    # sentinel "~none": '~' always percent-encodes to %7E for REAL corpus
    # values, so the literal sentinel can never collide with one.
    toc = toc.withColumn("value", F.coalesce(F.col("value"), F.lit("~none")))
    nav_vals = toc.groupBy("facet").agg(
        F.sort_array(F.collect_list("value")).alias("siblings")
    )
    # paginate over the MATERIALIZED list, not n_docs: the global ('all')
    # bucket's page_docs is capped (rollups.toc_rollup global_cap), so
    # n_docs-based pagination would emit thousands of empty pages at scale;
    # greatest(…,1) keeps one (possibly empty) page for empty buckets
    n_pages_src = F.greatest(F.size("page_docs"), F.lit(1))
    pages = (
        toc.join(F.broadcast(nav_vals), "facet")
        .select(
            "facet", "value", "page_docs", "siblings",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((n_pages_src - 1) / page_size).cast("int"),
                )
            ).alias("page"),
        )
        .withColumn(
            "chunk",
            F.slice(
                F.col("page_docs"), F.col("page") * page_size + 1, page_size
            ),
        )
        .withColumn("last_page", F.floor((F.size("page_docs") - 1) / page_size))
    )

    def page_href(facet, value, page) -> F.Column:
        return F.concat(
            F.lit(base_url + "/toc/"), _pct(facet), F.lit("/"), _pct(value),
            F.lit("/"), page.cast("string"), F.lit(".html"),
        )

    nav = F.concat(
        F.lit("<nav>"),
        F.aggregate(
            F.col("siblings"),
            F.lit(""),
            lambda acc, v: F.concat(
                acc,
                F.lit('<a href="'),
                _esc_attr(page_href(F.col("facet"), v, F.lit(0))),
                F.lit('">'), _esc(v), F.lit("</a> "),
            ),
        ),
        F.lit("</nav>"),
    )
    items = F.aggregate(
        F.col("chunk"),
        F.lit(""),
        lambda acc, d: F.concat(
            acc,
            F.lit('<li><a href="'), _esc_attr(d["uri"]), F.lit('">'),
            _esc(F.coalesce(d["title"], F.lit(""))), F.lit("</a></li>"),
        ),
    )
    pager = F.concat(
        F.when(
            F.col("page") > 0,
            F.concat(
                F.lit('<a rel="prev" href="'),
                _esc_attr(page_href(F.col("facet"), F.col("value"), F.col("page") - 1)),
                F.lit('">prev</a>'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("page") < F.col("last_page"),
            F.concat(
                F.lit('<a rel="next" href="'),
                _esc_attr(page_href(F.col("facet"), F.col("value"), F.col("page") + 1)),
                F.lit('">next</a>'),
            ),
        ).otherwise(F.lit("")),
    )
    html = F.concat(
        F.lit('<html xmlns="http://www.w3.org/1999/xhtml"><head><title>'),
        _esc(F.concat(F.col("facet"), F.lit(": "), F.col("value"))),
        F.lit("</title></head><body><h1>"),
        _esc(F.concat(F.col("facet"), F.lit(": "), F.col("value"))),
        F.lit("</h1>"), nav, F.lit("<ul>"), items, F.lit("</ul>"),
        pager, F.lit("</body></html>"),
    )
    return pages.select(
        "facet", "value", "page",
        F.size("chunk").alias("n_page_docs"),
        html.alias("html"),
    )
