"""XHTML+RDFa rendering of parsed documents (SURVEY §2.1 S7 / §2.3 T9).

Reference analog: ``render_xhtml`` serializes each Document's element tree
plus its metadata graph to ``parsed/{basefile}.xhtml`` — XHTML whose RDFa
attributes (``about``/``property``/``rel``/``typeof``) carry the doc's
triples, and ``distill`` re-extracts the RDF graph from that file
([ref: ferenda/documentrepository.py :: render_xhtml],
[ref: ferenda/elements/__init__.py :: AbstractElement.as_xhtml]).

Spark form: the serializer is a **pure column expression** over the nested
``sections`` struct — string concat + transform/aggregate higher-order
functions, fully JVM-side inside whole-stage codegen, zero Python. The
round-trip contract (the reference's distill semantics) is tested by
re-extracting triples from the emitted XHTML with ElementTree and comparing
them to ``assemble_triples``'s grammar triples for the same docs
(tests/test_xhtml.py).

Vocabulary: dcterms/bibo CURIEs as in the reference's default ontologies;
entity mentions that were not resolvable at parse time render as
``<span typeof="ferenda:Mention">`` rather than links — the canonical link
set lives in the triple tables (entity edges are minted by the linking
stage, which runs after parse; the XHTML is the *parsed* layer, exactly as
in the reference where relate runs later).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _esc(c: Column) -> Column:
    """XML text escaping: & < > (attribute values additionally need _esc_at)."""
    out = F.replace(c, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def _esc_attr(c: Column) -> Column:
    return F.replace(_esc(c), F.lit('"'), F.lit("&quot;"))


def _para_html(p: Column) -> Column:
    """One paragraph struct (idx, text, refs[]) → '<p>…</p>' with each ref
    span replaced by an <a rel="dcterms:references"> (resolved citations)
    or <span typeof="ferenda:Mention"> (unlinked entity mentions).

    The splice is an ``aggregate`` over refs carrying (html-so-far,
    chars-consumed); spans are the parse stage's 0-based char offsets.
    """
    text = p["text"]
    init = F.struct(F.lit("").alias("h"), F.lit(0).alias("pos"))

    def step(acc, r):
        before = _esc(F.substr(text, acc["pos"] + 1, r["span_start"] - acc["pos"]))
        frag = F.when(
            r["uri"].isNotNull(),
            F.concat(
                F.lit('<a rel="dcterms:references" href="'),
                _esc_attr(r["uri"]),
                F.lit('">'),
                _esc(r["text"]),
                F.lit("</a>"),
            ),
        ).otherwise(
            F.concat(
                F.lit('<span typeof="ferenda:Mention">'),
                _esc(r["text"]),
                F.lit("</span>"),
            )
        )
        return F.struct(
            F.concat(acc["h"], before, frag).alias("h"),
            r["span_end"].alias("pos"),
        )

    spliced = F.aggregate(
        p["refs"],
        init,
        step,
        lambda acc: F.concat(
            acc["h"], _esc(F.substr(text, acc["pos"] + 1, F.length(text) - acc["pos"]))
        ),
    )
    return F.concat(F.lit("<p>"), spliced, F.lit("</p>"))


def _section_html(url: Column, sec: Column) -> Column:
    # anchor + isPartOf follow the nesting path: "#S2.1"'s parent resource
    # is "#S2"; a top-level section's parent is the document itself.
    # Emission stays flat in document order (the path attribute carries the
    # recursion — same bounded-depth design as the struct schema); heading
    # level = depth (h2/h3/h4 for "2"/"2.1"/"2.1.3").
    path = sec["ordinal_path"]
    parent = F.when(
        path.contains("."),
        F.concat(url, F.lit("#S"), F.regexp_replace(path, r"\.[^.]*$", "")),
    ).otherwise(url)
    # cap at h6: the grammar accepts arbitrarily deep dotted ordinals, but
    # <h7> is not a valid (X)HTML element
    hlevel = F.concat(
        F.lit("h"),
        F.least(F.size(F.split(path, r"\.")) + 1, F.lit(6)).cast("string"),
    )
    return F.concat(
        F.lit('<section about="'),
        _esc_attr(F.concat(url, F.lit("#S"), path)),
        F.lit('" typeof="bibo:DocumentPart" rel="dcterms:isPartOf" resource="'),
        _esc_attr(parent),
        F.lit('"><'), hlevel, F.lit(' property="dcterms:title">'),
        _esc(sec["title"]),
        F.lit("</"), hlevel, F.lit(">"),
        F.array_join(F.transform(sec["paras"], _para_html), ""),
        F.lit("</section>"),
    )


def xhtml_col(
    url: Column, title: Column, lang: Column, issued: Column, sections: Column
) -> Column:
    """Full XHTML+RDFa document as one string column."""
    return F.concat(
        F.lit(
            '<?xml version="1.0" encoding="utf-8"?>\n'
            '<html xmlns="http://www.w3.org/1999/xhtml" about="'
        ),
        _esc_attr(url),
        F.lit('" lang="'),
        _esc_attr(lang),
        F.lit('" typeof="bibo:Document"><head><title property="dcterms:title">'),
        _esc(title),
        F.lit('</title><meta property="dcterms:issued" datatype="xsd:date" content="'),
        _esc_attr(F.date_format(issued, "yyyy-MM-dd")),
        F.lit('"/><meta property="dcterms:language" content="'),
        _esc_attr(lang),
        F.lit('"/></head><body>'),
        F.array_join(
            F.transform(sections, lambda s: _section_html(url, s)), ""
        ),
        F.lit("</body></html>"),
    )


def render_xhtml(docs: DataFrame) -> DataFrame:
    """doc rows (parse_stage with_sections=True) → (url, part_key, xhtml).

    Map-only: no shuffle, no Python — the parsed-layer sink writes straight
    from the parse stage's output partitioning.
    """
    return docs.select(
        "url",
        "part_key",
        xhtml_col(
            F.col("url"), F.col("title"), F.col("lang"),
            F.col("issued"), F.col("sections"),
        ).alias("xhtml"),
    )
